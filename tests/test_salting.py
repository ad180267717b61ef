"""Salted two-level aggregation: exact metrics must equal the unsalted
single-pass profile; sketch metrics within tolerance (SURVEY.md §7.4 —
partials must merge sketches, not finished metrics)."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.profile import profile
from dataprofiler_spark.plans.salting import salted_numeric_profile, with_salt
from dataprofiler_spark.sources import gen_sequences


@pytest.fixture(scope="module")
def seqs(spark):
    return gen_sequences(spark, 20_000)


def test_salt_deterministic(spark, seqs):
    a = with_salt(seqs, 16, ["doc_id"]).select("doc_id", "__salt")
    b = with_salt(seqs, 16, ["doc_id"]).select("doc_id", "__salt")
    assert a.exceptAll(b).count() == 0  # same rows → same salt (retry-safe)
    spread = a.filter(F.col("doc_id") == "doc-000000000001").collect()
    assert 0 <= spread[0]["__salt"] < 16


def test_salted_exact_metrics_match_unsalted(spark, seqs):
    salted = {
        r.source: r
        for r in salted_numeric_profile(
            seqs, "n_tok", "source", salt_buckets=8, hist_bucket_width=4.0
        ).collect()
    }
    plain = {
        (r.source): r
        for r in profile(seqs, "t", group_by=["source"], columns=["n_tok"]).collect()
    }
    exact_median = {
        r.source: r.m
        for r in seqs.groupBy("source").agg(F.expr("percentile(n_tok, 0.5)").alias("m")).collect()
    }
    for src, p in plain.items():
        s = salted[src]
        assert s.row_count == p.row_count
        assert s.not_null_count == p.not_null_count
        assert float(s.avg) == pytest.approx(p.avg_value, abs=1e-4)
        assert float(s.stddev_pop) == pytest.approx(p.stddev_pop, abs=1e-3)
        assert s.min == int(p.min_value) and s.max == int(p.max_value)
        # HLL estimate within rsd bounds
        assert abs(s.distinct_est - p.distinct_count) / max(p.distinct_count, 1) < 0.05
        # histogram median within one bucket width of the exact percentile
        assert abs(s.median_est - exact_median[src]) <= 4.0


def test_salted_profile_shuffles_on_salt(spark, seqs):
    plan = salted_numeric_profile(seqs, "n_tok", "source", salt_buckets=8)._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # level-1 exchange keys include the salt
