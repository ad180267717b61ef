"""Row-level snapshot reconciliation (operators/diff.py)."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.diff import diff_summary, snapshot_diff

OLD = [
    (1, "alpha", 10),
    (2, "beta", 20),
    (3, "gamma", 30),
    (4, "delta", 40),
    (5, None, 50),
]
NEW = [
    (1, "alpha", 10),      # unchanged
    (2, "BETA", 20),       # changed: txt
    (3, "gamma", 31),      # changed: num
    # 4 removed
    (5, "eps", 50),        # changed: NULL -> value must count as changed
    (6, "zeta", 60),       # added
]
SCHEMA = "id long, txt string, num long"


def _frames(spark):
    return (
        spark.createDataFrame(OLD, SCHEMA),
        spark.createDataFrame(NEW, SCHEMA),
    )


def test_change_classification(spark):
    old, new = _frames(spark)
    out = {r.id: r for r in snapshot_diff(old, new, "id").collect()}
    assert out[2].change_type == "changed" and out[2].changed_columns == ["txt"]
    assert out[3].change_type == "changed" and out[3].changed_columns == ["num"]
    assert out[4].change_type == "removed"
    assert out[5].change_type == "changed"  # NULL -> value is a change
    assert out[6].change_type == "added"
    assert 1 not in out  # unchanged filtered by default
    with_unchanged = snapshot_diff(old, new, "id", include_unchanged=True)
    assert {r.id: r.change_type for r in with_unchanged.collect()}[1] == "unchanged"


def test_diff_summary_counts(spark):
    old, new = _frames(spark)
    s = diff_summary(old, new, "id").collect()[0]
    assert (s.added, s.removed, s.changed, s.unchanged) == (1, 1, 3, 0 + 1)
    assert s.changed_txt == 2 and s.changed_num == 1


def test_compare_cols_subset(spark):
    old, new = _frames(spark)
    # only watch `num`: the txt-only change disappears
    s = diff_summary(old, new, "id", compare_cols=["num"]).collect()[0]
    assert s.changed == 1 and s.changed_num == 1


def test_payloads_never_ride_the_diff_shuffle(spark):
    """The full-outer join moves (key, per-column xxhash64 digests) only —
    the payload column must not appear in any Exchange of the plan."""
    old = spark.range(0, 1000).select(
        F.col("id"), F.concat(F.lit("payload"), F.col("id")).alias("txt")
    )
    new = old.withColumn("txt", F.when(F.col("id") % 7 == 0, F.lit("x")).otherwise(F.col("txt")))
    plan = (
        snapshot_diff(old, new, "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "xxhash64" in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "txt" not in line  # digests move, payloads don't


def test_identical_snapshots_empty_diff(spark):
    old, _ = _frames(spark)
    assert snapshot_diff(old, old, "id").count() == 0
    s = diff_summary(old, old, "id").collect()[0]
    assert s.unchanged == len(OLD) and s.added == s.removed == s.changed == 0


def test_apply_changes_scd1(spark):
    """MERGE semantics: U replaces, I inserts, D deletes, untouched rows
    survive; applying the diff between two snapshots reproduces the
    target exactly (roundtrip property)."""
    from dataprofiler_spark.operators.diff import apply_changes, snapshot_diff

    base = spark.createDataFrame(OLD, SCHEMA)
    changes = spark.createDataFrame(
        [
            (2, "BETA", 20, "U"),
            (4, None, None, "D"),
            (6, "zeta", 60, "I"),
        ],
        SCHEMA + ", op string",
    )
    out = {r.id: r for r in apply_changes(base, changes, "id").collect()}
    assert out[2].txt == "BETA"          # upsert applied
    assert 4 not in out                  # delete applied
    assert out[6].txt == "zeta"          # insert applied
    assert out[1].txt == "alpha" and out[3].txt == "gamma"  # untouched
    assert set(out) == {1, 2, 3, 5, 6}

    # roundtrip: base + (diff base->new as CDC ops) == new
    new = spark.createDataFrame(NEW, SCHEMA)
    d = snapshot_diff(base, new, "id")
    ops = d.select(
        "id",
        F.when(F.col("change_type") == "removed", "D").otherwise("U").alias("op"),
    ).join(new, "id", "left").select("id", "txt", "num", "op")
    rebuilt = apply_changes(base, ops, "id")
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_null_key_rows_match_null_safely(spark):
    """A NULL-keyed row present unchanged in both snapshots is MATCHED
    (unchanged), not misread as an added+removed pair."""
    old = spark.createDataFrame([(None, "x", 1), (1, "y", 2)], SCHEMA)
    new = spark.createDataFrame([(None, "x", 1), (1, "y", 3)], SCHEMA)
    s = diff_summary(old, new, "id").collect()[0]
    assert s.added == 0 and s.removed == 0
    assert s.changed == 1 and s.unchanged == 1  # only id=1 changed


def test_apply_changes_rejects_malformed_rows(spark):
    """A NULL op or NULL key in the change feed is a data-quality bug the
    engine must SURFACE (a NULL op would vanish through op != 'D'; a NULL
    key never matches the anti join) — validate=True raises, and
    validate=False keeps the documented permissive behavior."""
    from dataprofiler_spark.operators.diff import apply_changes

    base = spark.createDataFrame(OLD, SCHEMA)
    bad_op = spark.createDataFrame([(2, "b", 2, None)], SCHEMA + ", op string")
    with pytest.raises(ValueError, match="NULL op"):
        apply_changes(base, bad_op, "id").collect()

    bad_key = spark.createDataFrame([(None, "b", 2, "U")], SCHEMA + ", op string")
    with pytest.raises(ValueError, match="NULL key"):
        apply_changes(base, bad_key, "id").collect()

    # explicit opt-out preserves the old silent-drop semantics: the NULL-op
    # row removes base key 2 via the anti join, then vanishes through
    # op != 'D' — the row disappears, which is exactly the bug validate
    # exists to surface
    out = apply_changes(base, bad_op, "id", validate=False)
    assert out.count() == len(OLD) - 1
    assert out.filter("id = 2").count() == 0
