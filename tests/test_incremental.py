"""Incremental profiling: merge-safe partials across snapshots equal the
direct whole-table profile; merging is order-insensitive; partials survive
a parquet round-trip (the stored-state contract)."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.incremental import (
    PARTIAL_SCHEMA,
    finalize_partials,
    merge_partials,
    numeric_partials,
)
from dataprofiler_spark.sources import gen_sequences


@pytest.fixture(scope="module")
def halves(spark):
    df = gen_sequences(spark, 4000)
    a = df.filter(F.col("doc_id").substr(-1, 1).isin(["0", "2", "4", "6", "8"]))
    b = df.subtract(a)
    return df, a, b


def _final_rows(df):
    return {r.column_name: r for r in df.collect()}


def test_merged_partials_equal_direct(spark, halves):
    df, a, b = halves
    cols = ["n_tok"]
    merged = finalize_partials(merge_partials(numeric_partials(a, cols), numeric_partials(b, cols)))
    direct = finalize_partials(numeric_partials(df, cols))
    m, d = _final_rows(merged)["n_tok"], _final_rows(direct)["n_tok"]
    assert (m.row_count, m.not_null_count, m.min_value, m.max_value) == (
        d.row_count, d.not_null_count, d.min_value, d.max_value)
    assert m.avg_value == pytest.approx(d.avg_value, abs=1e-6)
    assert m.stddev_pop == pytest.approx(d.stddev_pop, abs=1e-6)
    # HLL sketches unite without double counting (halves are disjoint)
    assert m.distinct_est == pytest.approx(d.distinct_est, rel=0.05)


def test_merge_is_order_insensitive(spark, halves):
    _, a, b = halves
    pa, pb = numeric_partials(a, ["n_tok"]), numeric_partials(b, ["n_tok"])
    r1 = _final_rows(finalize_partials(merge_partials(pa, pb)))["n_tok"]
    r2 = _final_rows(finalize_partials(merge_partials(pb, pa)))["n_tok"]
    assert (r1.row_count, r1.min_value, r1.max_value, r1.distinct_est) == (
        r2.row_count, r2.min_value, r2.max_value, r2.distinct_est)


def test_partials_survive_storage_roundtrip(spark, halves, tmp_path):
    """The stored-state contract: write partials to parquet (binary HLL
    included), read back, merge with a NEW snapshot's partials — no rescan
    of the old data."""
    _, a, b = halves
    numeric_partials(a, ["n_tok"]).write.mode("overwrite").parquet(str(tmp_path / "p"))
    stored = spark.read.schema(PARTIAL_SCHEMA).parquet(str(tmp_path / "p"))
    merged = finalize_partials(merge_partials(stored, numeric_partials(b, ["n_tok"])))
    direct = finalize_partials(numeric_partials(a.unionByName(b), ["n_tok"]))
    m, d = _final_rows(merged)["n_tok"], _final_rows(direct)["n_tok"]
    assert m.row_count == d.row_count and m.distinct_est == d.distinct_est


def test_incremental_median_from_merged_histograms(spark):
    """Quantile state merges: the median interpolated from histogram
    partials merged across 3 disjoint slices is within one bucket width of
    the exact median, identical under any merge order, and NULL when no
    histogram state was requested."""
    from dataprofiler_spark.operators.incremental import (
        finalize_partials,
        merge_partials,
        numeric_partials,
    )

    df = spark.range(1, 10001).select((F.col("id") % 997).alias("x"))
    width = 10.0
    slices = [df.filter(F.abs(F.xxhash64("x")) % 3 == i) for i in range(3)]
    parts = [numeric_partials(s, ["x"], hist_widths={"x": width}) for s in slices]

    exact = df.agg(F.expr("percentile(x, 0.5)")).collect()[0][0]
    fin = finalize_partials(merge_partials(*parts)).collect()[0]
    assert fin.median_est is not None
    assert abs(fin.median_est - exact) <= width
    assert fin.row_count == 10000

    # merge order never changes the state
    reordered = finalize_partials(merge_partials(parts[2], parts[0], parts[1])).collect()[0]
    assert reordered.median_est == fin.median_est

    # old-style partials (no histogram columns) still merge; median NULL
    legacy = numeric_partials(slices[0], ["x"]).drop("hist", "hist_width")
    mixed = finalize_partials(merge_partials(legacy, parts[1].drop("hist", "hist_width"))).collect()[0]
    assert mixed.median_est is None and mixed.row_count > 0


def test_histogram_invalidated_on_partial_or_mismatched_state(spark):
    """A merged histogram is only trusted when EVERY partial carries one
    with the SAME width: legacy+hist mixes and width mismatches must yield
    median_est = NULL (absent), never a silently shifted value."""
    from dataprofiler_spark.operators.incremental import (
        finalize_partials,
        merge_partials,
        numeric_partials,
    )

    df = spark.range(1, 2001).select((F.col("id") % 97).alias("x"))
    a, b = (df.filter(F.abs(F.xxhash64("x", F.lit(i))) % 2 == 0) for i in (1, 2))
    with_hist = numeric_partials(a, ["x"], hist_widths={"x": 10.0})
    legacy = numeric_partials(b, ["x"]).drop("hist", "hist_width")
    mixed = finalize_partials(merge_partials(with_hist, legacy)).collect()[0]
    assert mixed.median_est is None  # incomplete mass → no median claim
    assert mixed.row_count == a.count() + b.count()  # moments still merge

    other_width = numeric_partials(b, ["x"], hist_widths={"x": 25.0})
    clash = finalize_partials(merge_partials(with_hist, other_width)).collect()[0]
    assert clash.median_est is None  # mismatched widths → no median claim


def test_zero_mass_partial_does_not_invalidate_histogram(spark):
    """An empty/all-NULL slice (e.g. an empty micro-batch) carries no
    histogram but also no mass — merging it must keep the median claim."""
    from dataprofiler_spark.operators.incremental import (
        finalize_partials,
        merge_partials,
        numeric_partials,
    )

    full = spark.range(1, 1001).select((F.col("id") % 97).alias("x"))
    empty = full.filter(F.lit(False))
    a = numeric_partials(full, ["x"], hist_widths={"x": 10.0})
    b = numeric_partials(empty, ["x"], hist_widths={"x": 10.0})
    merged = finalize_partials(merge_partials(a, b)).collect()[0]
    assert merged.row_count == 1000
    assert merged.median_est is not None  # zero-mass slice is harmless
