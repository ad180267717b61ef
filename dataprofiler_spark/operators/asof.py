"""As-of and range joins — operators Spark lacks natively, built as
compositions of existing DataFrame ops (task guidance: composition first,
Pandas-UDF only if semantics require — they don't here).

as-of join (union + window):
  Tag left rows 1 and right rows 0, union on the shared key/time axis, and
  carry the right payload forward with last(ignorenulls) over
  (key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING). One shuffle on the key —
  the same cost shape as a sort-merge join, but expressing "most recent
  right row at or before ts" exactly. Right-side ties must be pre-deduped
  for determinism (DuckDB ASOF leaves them unspecified).

range join (banded):
  A naive theta-join (l.v BETWEEN r.lo AND r.hi) is a cartesian product in
  Spark. Bucketize both sides by a band width: each range explodes to the
  buckets it overlaps, the probe side joins on its single bucket, then the
  exact predicate filters. Shuffle volume = rows + Σ range-spans, never
  |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    right_values: list[str],
    inner: bool = True,
) -> DataFrame:
    """For every left row, attach `right_values` from the most recent right
    row with right_ts <= left_ts and matching key. Right rows at the exact
    same timestamp ARE visible to the left row (>= semantics, matching
    DuckDB ASOF JOIN)."""
    lcols = left.columns
    l = left.select(
        F.col(left_by).alias("__by"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_values],
    )
    r = right.select(
        F.col(right_by).alias("__by"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
    )
    # right tag 0 sorts before left tag 1 at equal ts → same-instant rows match
    w = (
        Window.partitionBy("__by")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        *lcols,
        "__tag",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in right_values],
    )
    out = carried.filter(F.col("__tag") == 1).drop("__tag")
    if inner:
        out = out.filter(F.col(right_values[0]).isNotNull())
    return out


def range_join_bucketed(
    left: DataFrame,
    value_col: str,
    ranges: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    band_width: float = 50.0,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Join each left row to the range rows whose [lo, hi) contains its
    value. Ranges explode to every band they overlap; the probe joins on
    its single band; the exact BETWEEN filter runs post-join."""
    r = ranges.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / band_width).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / band_width).cast("long"),
            )
        ),
    )
    l = left.withColumn("__band", F.floor(F.col(value_col) / band_width).cast("long"))
    return (
        l.join(F.broadcast(r) if broadcast_ranges else r, "__band")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__band")
    )
