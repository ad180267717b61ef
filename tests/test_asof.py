"""As-of join semantics vs hand-computed expectations; range join
bucketing exactness."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.asof import asof_join, range_join_bucketed


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts("2024-01-10")), (2, "u1", ts("2024-01-20")),
         (3, "u2", ts("2024-01-05")), (4, "u3", ts("2024-01-01"))],
        "event_id int, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", ts("2024-01-10"), 100.0),  # same instant as event 1 → matches
         ("u1", ts("2024-01-15"), 200.0),
         ("u2", ts("2024-01-09"), 300.0)],  # after u2's event → no match
        "user string, ts timestamp, price double",
    )
    out = asof_join(left, right, "ts", "ts", "user", "user", ["price"])
    got = {r.event_id: r.price for r in out.collect()}
    assert got == {1: 100.0, 2: 200.0}  # >= semantics; u2/u3 dropped (inner)

    outer = asof_join(left, right, "ts", "ts", "user", "user", ["price"], inner=False)
    got2 = {r.event_id: r.price for r in outer.collect()}
    assert got2 == {1: 100.0, 2: 200.0, 3: None, 4: None}


def test_range_join_bucketed_exact(spark):
    left = spark.createDataFrame([(i, float(i)) for i in range(100)], "id int, v double")
    ranges = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 9.0, 55.0), ("c", 95.0, 200.0)],
        "name string, lo double, hi double",
    )
    out = range_join_bucketed(left, "v", ranges, lo_col="lo", hi_col="hi", band_width=7.0)
    got = sorted((r.id, r.name) for r in out.collect())
    want = sorted(
        [(i, n) for i in range(100) for n, lo, hi in [("a", 0, 10), ("b", 9, 55), ("c", 95, 200)] if lo <= i < hi]
    )
    assert got == want  # overlapping ranges both match; band width arbitrary
