"""Salted two-level aggregation for skewed partition keys.

The north_rule requires hot `source` partitions (40% of a 10^12-row table
in one key) to be handled with salted repartitioning + AQE. A salted
aggregation only works if every metric is computed from MERGE-SAFE partial
states (SURVEY.md §7.4) — you cannot average two averages. Level 1 groups
by (key, salt) and computes:

  count / not_null_count / sum / sum_sq   → recombine by addition
  min / max                               → recombine by min/max
  distinct                                → HLL sketch (hll_sketch_agg),
                                            recombined with hll_union_agg
  median                                  → fixed-width bucket histogram,
                                            recombined by bucket-count sum,
                                            quantile interpolated from the
                                            merged histogram

Level 2 groups by (key) and merges. avg = Σx/n; stddev from the moment
identity  var_pop = Σx²/n − (Σx/n)²  (Welford-style recombination).

For plain aggregations Spark's own partial aggregation already absorbs most
skew; salting matters when the per-key state is heavy (HLL sketches,
histograms) or when a downstream stage keys on the hot column.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, buckets): xxhash of stable columns (NOT
    rand() — resubmitted tasks must salt identically for exactly-once
    semantics under retries)."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("__salt", (F.abs(F.xxhash64(*basis)) % buckets).cast("int"))


def salted_numeric_profile(
    df: DataFrame,
    value_col: str,
    group_by: str,
    salt_buckets: int = 16,
    hist_bucket_width: float | None = None,
    hll_rsd: float = 0.02,
) -> DataFrame:
    """Two-level salted profile of one numeric column per group:
    (group, row_count, not_null_count, distinct_est, min, max, avg,
    stddev_pop, median_est).

    Level-1 shuffle keys are (group, salt) — the hot group's rows spread
    over `salt_buckets` reducers; level 2 merges `buckets` tiny partial
    rows per group. Exactness: count/min/max/avg/stddev exact; distinct is
    HLL++ (union-merged, same estimate as unsalted); median from the merged
    fixed-width histogram (error ≤ bucket width)."""
    c = F.col(value_col)
    salted = with_salt(df, salt_buckets, [value_col, group_by])

    lvl1 = salted.groupBy(group_by, "__salt").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(c).alias("nn"),
        F.sum(c.cast("double")).alias("s"),
        F.sum((c * c).cast("double")).alias("s2"),
        F.min(c).alias("mn"),
        F.max(c).alias("mx"),
        F.hll_sketch_agg(c).alias("hll"),
    )
    merged = lvl1.groupBy(group_by).agg(
        F.sum("n").alias("row_count"),
        F.sum("nn").alias("not_null_count"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.min("mn").alias("min"),
        F.max("mx").alias("max"),
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("distinct_est"),
    )
    nn, s, s2 = F.col("not_null_count"), F.col("s"), F.col("s2")
    out = merged.select(
        group_by,
        "row_count",
        "not_null_count",
        "distinct_est",
        F.col("min"),
        F.col("max"),
        F.when(nn > 0, s / nn).alias("avg"),
        F.when(nn > 0, F.sqrt(F.greatest(s2 / nn - (s / nn) * (s / nn), F.lit(0.0)))).alias(
            "stddev_pop"
        ),
    )

    if hist_bucket_width is not None:
        med = _salted_median(df, value_col, group_by, salt_buckets, hist_bucket_width)
        out = out.join(med, group_by, "left")
    return out


def _salted_median(
    df: DataFrame, value_col: str, group_by: str, salt_buckets: int, width: float
) -> DataFrame:
    """Merge-safe median: per-(group, salt, bucket) counts → merged
    histogram → linear interpolation within the bucket containing the
    n/2-th value."""
    from pyspark.sql import Window

    c = F.col(value_col)
    bucket = F.floor(c / F.lit(width))
    salted = with_salt(df.filter(c.isNotNull()), salt_buckets, [value_col, group_by])
    hist = (
        salted.groupBy(group_by, "__salt", bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(group_by, "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    totals = hist.groupBy(group_by).agg(F.sum("cnt").alias("total"))
    w = Window.partitionBy(group_by).orderBy("b")
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).join(totals, group_by)
    target = (F.col("total") + 1) / 2.0
    # first bucket where the cumulative count crosses the halfway point,
    # then linear interpolation within that bucket
    crossing = (
        cum.filter(F.col("cum") >= target)
        .groupBy(group_by)
        .agg(F.min_by(F.struct("b", "cnt", "cum", "total"), "b").alias("x"))
    )
    b, cnt = F.col("x.b"), F.col("x.cnt")
    tgt = (F.col("x.total") + 1) / 2.0
    below = F.col("x.cum") - cnt
    return crossing.select(
        group_by,
        (b * width + width * (tgt - below) / cnt).alias("median_est"),
    )
