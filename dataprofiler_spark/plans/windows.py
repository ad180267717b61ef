"""Skew-safe top-k-per-group (the two-stage rank-window pattern).

A single `row_number() OVER (PARTITION BY g ORDER BY o) <= k` shuffles
EVERY row of a group into one task and sorts it there — fine when groups
are bounded (events per user), a stall when a group can be table-sized
(violations of a wholly-corrupt partition, corpus rows per query, rows
per stratum). The standard fix is top-k containment: the global k
smallest rows of a group are contained in the union of the k smallest
per (group, input task), so a map-local pre-trim bounds every sort group
by the scan split and the final window sees at most k × n_tasks rows per
group. Output is identical to the single window (up to row_number's
arbitrary choice among order-key ties, which the single window does not
pin either).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_rows_per_group(
    df: DataFrame,
    group_cols: list[str | Column],
    order_cols: list[str | Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Rows ranking ≤ k within their group under order_cols, computed
    with a map-local pre-trim so no sort group exceeds max(scan split,
    k × n_tasks) rows. `rank_col` keeps the final 1-based rank as a
    column; otherwise ranks are dropped."""
    w0 = Window.partitionBy(*group_cols, F.spark_partition_id()).orderBy(*order_cols)
    trimmed = (
        df.withColumn("__rn0", F.row_number().over(w0))
        .filter(F.col("__rn0") <= k)
        .drop("__rn0")
    )
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    name = rank_col or "__rn"
    out = trimmed.withColumn(name, F.row_number().over(w)).filter(F.col(name) <= k)
    return out if rank_col else out.drop(name)
