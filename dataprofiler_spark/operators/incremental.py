"""Incremental profiling: merge-safe partial states per (table, column).

At 10^12 rows you cannot re-profile the whole table because one partition
was appended. The fix is the classic partial-aggregation contract lifted to
the STORAGE layer: profile each snapshot/partition once into mergeable
partial states, then combine stored partials instead of rescanning —
exactly how Spark's own partial/final aggregation works inside a job
(count/sum/sumsq add; min/max combine; distinct is an HLL sketch united
with hll_union_agg). avg and stddev come from the moment identity at
finalize time, so they stay EXACT under any merge order.

Quantiles are the one metric with no exact merge — the stored state is a
fixed-width bucket histogram (map<bucket, count>): bucket counts ADD under
merge, and the median interpolates from the combined histogram with error
bounded by the bucket width (the same histogram-merge scheme as the salted
profile, plans/salting.py). The width is part of the stored state and must
match across snapshots to merge.

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
    "column_name", "n", "nn", "s", "s2", "mn", "mx", "hll", "hist", "hist_width",
]


def numeric_partials(
    df: DataFrame,
    columns: list[str],
    hist_widths: dict[str, float] | None = None,
) -> DataFrame:
    """One row of merge-safe state per numeric column: (column_name, n, nn,
    s, s2, mn, mx, hll-sketch-binary[, hist, hist_width]). ONE scan for all
    moment/sketch state (a single multi-aggregate job, stacked to long
    format in-expression); requesting quantile state (`hist_widths`:
    column → bucket width) adds ONE more scan computing every requested
    histogram (explode → groupBy collapses map-side to |buckets| keys)."""
    hist_widths = hist_widths or {}
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
    out = wide.select(F.explode(entries).alias("e")).select("e.*")

    if hist_widths:
        buckets = df.select(
            F.explode(
                F.array_compact(
                    F.array(
                        *[
                            F.when(
                                F.col(c).isNotNull(),
                                F.struct(
                                    F.lit(c).alias("column_name"),
                                    F.floor(F.col(c).cast("double") / F.lit(w)).alias("b"),
                                ),
                            )
                            for c, w in hist_widths.items()
                        ]
                    )
                )
            ).alias("e")
        ).select("e.*")
        hists = (
            buckets.groupBy("column_name", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("column_name")
            .agg(
                F.map_from_entries(
                    F.sort_array(F.collect_list(F.struct("b", "c")))
                ).alias("hist")
            )
        )
        widths = F.create_map(
            *[x for c, w in hist_widths.items() for x in (F.lit(c), F.lit(float(w)))]
        )
        out = out.join(hists, "column_name", "left").withColumn(
            "hist_width", widths[F.col("column_name")]
        )
    else:
        out = out.withColumn(
            "hist", F.lit(None).cast("map<bigint,bigint>")
        ).withColumn("hist_width", F.lit(None).cast("double"))
    return out


def merge_partials(*partials: DataFrame) -> DataFrame:
    """Combine any number of stored partial frames (snapshots, partitions,
    incremental appends) into one partial frame — counts/sums add, min/max
    combine, HLL sketches unite, histogram bucket counts add. Associative
    and commutative: merge order never changes the result.

    Histogram validity under merge: the combined histogram is kept ONLY
    when every contributing partial carries one (a legacy partial without
    quantile state leaves rows unrepresented — a median interpolated over
    part of the mass would be silently wrong) AND all stored widths agree
    (bucket ids under different widths mean different value ranges).
    Otherwise hist/hist_width merge to NULL and finalize_partials reports
    median_est = NULL — absent, never garbage. Moment/HLL state merges
    regardless."""
    allp = partials[0]
    for p in partials[1:]:
        allp = allp.unionByName(p, allowMissingColumns=True)
    for c, t in (("hist", "map<bigint,bigint>"), ("hist_width", "double")):
        if c not in allp.columns:
            allp = allp.withColumn(c, F.lit(None).cast(t))
    base = allp.groupBy("column_name").agg(
        F.sum("n").alias("n"),
        F.sum("nn").alias("nn"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.hll_union_agg("hll").alias("hll"),
        F.max("hist_width").alias("__w"),
        # a zero-mass partial (empty/all-NULL slice — e.g. an empty
        # micro-batch) represents no rows, so a missing histogram there
        # must not invalidate the merged one
        F.bool_and(F.col("hist").isNotNull() | (F.col("nn") == 0)).alias(
            "__complete"
        ),
        F.count_distinct("hist_width").alias("__n_widths"),
    )
    merged_hist = (
        allp.select("column_name", F.explode("hist").alias("b", "c"))
        .groupBy("column_name", "b")
        .agg(F.sum("c").alias("c"))
        .groupBy("column_name")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("b", "c")))
            ).alias("__hist")
        )
    )
    hist_ok = F.col("__complete") & (F.col("__n_widths") == 1)
    return base.join(merged_hist, "column_name", "left").select(
        "column_name", "n", "nn", "s", "s2", "mn", "mx", "hll",
        F.when(hist_ok, F.col("__hist")).alias("hist"),
        F.when(hist_ok, F.col("__w")).alias("hist_width"),
    )


def finalize_partials(partials: DataFrame, num_decimals: int = 6) -> DataFrame:
    """Finished metrics from merged state: row_count, not_null_count,
    min/max, avg = Σx/n, stddev_pop = sqrt(Σx²/n − (Σx/n)²) (exact moment
    identity), distinct_est from the united sketch, and — when histogram
    state is present — median_est interpolated from the merged histogram
    (error ≤ the stored bucket width; NULL without histogram state)."""
    nn, s, s2 = F.col("nn"), F.col("s"), F.col("s2")
    rnd = lambda x: F.round(x, num_decimals)  # noqa: E731

    width = F.col("hist_width")
    target = (nn + 1) / 2.0
    entries = F.sort_array(F.map_entries("hist"))
    # running-sum fold over the (small, bucket-count-sized) entry array:
    # first bucket whose cumulative count crosses the halfway target, with
    # linear interpolation inside it (same math as plans/salting.py)
    acc0 = F.struct(
        F.lit(0.0).cast("double").alias("cum"),
        F.lit(None).cast("double").alias("med"),
    )

    def step(acc, e):
        newcum = acc["cum"] + e["value"]
        med = (
            F.when(acc["med"].isNotNull(), acc["med"])
            .when(
                newcum >= target,
                e["key"] * width + width * (target - acc["cum"]) / e["value"],
            )
        )
        return F.struct(newcum.alias("cum"), med.alias("med"))

    median = F.when(
        F.col("hist").isNotNull() & (nn > 0),
        F.aggregate(entries, acc0, step, lambda a: a["med"]),
    )

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
        rnd(median).alias("median_est"),
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
        T.StructField("hist", T.MapType(T.LongType(), T.LongType())),
        T.StructField("hist_width", T.DoubleType()),
    ]
)
