"""Incremental profiling: merge-safe partial states per (table, column).

At 10^12 rows you cannot re-profile the whole table because one partition
was appended. The fix is the classic partial-aggregation contract lifted to
the STORAGE layer: profile each snapshot/partition once into mergeable
partial states, then combine stored partials instead of rescanning —
exactly how Spark's own partial/final aggregation works inside a job
(count/sum/sumsq add; min/max combine; distinct is an HLL sketch united
with hll_union_agg). avg and stddev come from the moment identity at
finalize time, so they stay EXACT under any merge order.

This composes with the manifest's resume semantics (plans/manifest.py):
validated partitions are skipped by the scan AND their stored partials
still contribute to the whole-table profile.

Reference analog: the closed metrics loop (its sink is also a source,
/root/reference/src/core/autoincrement_metrics.py:155-212) — the reference
stores finished metrics; we store the mergeable STATE so finished metrics
of any union of partitions are derivable without touching the data again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARTIAL_COLS = [
    "column_name", "n", "nn", "s", "s2", "mn", "mx", "hll",
]


def numeric_partials(df: DataFrame, columns: list[str]) -> DataFrame:
    """One row of merge-safe state per numeric column: (column_name, n, nn,
    s, s2, mn, mx, hll-sketch-binary). ONE scan for all columns (a single
    multi-aggregate job, stacked to long format in-expression)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(columns):
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).alias(f"__nn_{i}"),
            F.sum(col).alias(f"__s_{i}"),
            F.sum(col * col).alias(f"__s2_{i}"),
            F.min(col).alias(f"__mn_{i}"),
            F.max(col).alias(f"__mx_{i}"),
            F.hll_sketch_agg(F.col(c)).alias(f"__hll_{i}"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n"),
                F.col(f"__nn_{i}").alias("nn"),
                F.col(f"__s_{i}").alias("s"),
                F.col(f"__s2_{i}").alias("s2"),
                F.col(f"__mn_{i}").alias("mn"),
                F.col(f"__mx_{i}").alias("mx"),
                F.col(f"__hll_{i}").alias("hll"),
            )
            for i, c in enumerate(columns)
        ]
    )
    return wide.select(F.explode(entries).alias("e")).select("e.*")


def merge_partials(*partials: DataFrame) -> DataFrame:
    """Combine any number of stored partial frames (snapshots, partitions,
    incremental appends) into one partial frame — counts/sums add, min/max
    combine, HLL sketches unite. Associative and commutative: merge order
    never changes the result."""
    allp = partials[0]
    for p in partials[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("column_name").agg(
        F.sum("n").alias("n"),
        F.sum("nn").alias("nn"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.hll_union_agg("hll").alias("hll"),
    )


def finalize_partials(partials: DataFrame, num_decimals: int = 6) -> DataFrame:
    """Finished metrics from merged state: row_count, not_null_count,
    min/max, avg = Σx/n, stddev_pop = sqrt(Σx²/n − (Σx/n)²) (exact moment
    identity), distinct_est from the united sketch."""
    nn, s, s2 = F.col("nn"), F.col("s"), F.col("s2")
    rnd = lambda x: F.round(x, num_decimals)  # noqa: E731
    return partials.select(
        "column_name",
        F.col("n").cast("long").alias("row_count"),
        nn.cast("long").alias("not_null_count"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
        F.when(nn > 0, rnd(s / nn)).alias("avg_value"),
        F.when(
            nn > 0, rnd(F.sqrt(F.greatest(s2 / nn - (s / nn) * (s / nn), F.lit(0.0))))
        ).alias("stddev_pop"),
        F.hll_sketch_estimate("hll").cast("long").alias("distinct_est"),
    )


PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("column_name", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("nn", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("s2", T.DoubleType()),
        T.StructField("mn", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
        T.StructField("hll", T.BinaryType()),
    ]
)
