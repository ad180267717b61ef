"""Global contiguous id / dense-rank assignment at scale.

`ROW_NUMBER() OVER (ORDER BY key)` plans as Exchange SinglePartition →
one task sorts the entire table — the classic global-window scale
killer (fine at 60k rows, dead at 10^12). A training pipeline still
needs stable contiguous ids (shard/offset addressing, resumable
iteration order). This operator produces the EXACT same ids with no
single-task stage, via range bucketing:

1. one column-pruned pass estimates bucket cut points
   (`approxQuantile` on the key — sampled sketch, any error only
   skews bucket SIZES, never correctness);
2. one group-sized aggregate counts rows per bucket → driver-side
   running offsets (≤ num_buckets scalars);
3. row_number within each bucket (window partitioned BY BUCKET — each
   task sorts ~n/num_buckets rows) + the bucket's offset.

Ids are identical to the global ROW_NUMBER because bucket ranges are
disjoint and ordered: every row in bucket b sorts after all rows of
buckets < b. The oracle states exactly that equivalence.

The reference has no analog (single-node engines get global order for
free); this is the Spark-first replacement for the pattern.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _common_prefix(a: str, b: str) -> str:
    """Longest common prefix of a SORTED sample's first and last element
    = the LCP of the whole sample."""
    i = 0
    for ca, cb in zip(a, b):
        if ca != cb:
            break
        i += 1
    return a[:i]


def _prefix_proxy(s: str, lcp: str) -> int:
    """Order-preserving 56-bit integer proxy of a string's first 7 bytes
    AFTER the common prefix (zero-padded big-endian — matches the column
    expression rpad(encode(substr(...)), 7, x'00') byte for byte)."""
    b = s[len(lcp):].encode("utf-8")[:7]
    return int.from_bytes(b.ljust(7, b"\x00"), "big")


def assign_sequential_ids(
    df: DataFrame,
    key_col: str,
    id_col: str = "seq_id",
    num_buckets: int = 32,
    sample_error: float = 0.001,
) -> DataFrame:
    """Add `id_col` = the 0-based global rank of `key_col` — exactly
    ROW_NUMBER() OVER (ORDER BY key) − 1 — without a single-partition
    sort. NON-NULL keys only; ids are deterministic iff the
    key is unique (duplicate keys straddling a cut point get an arbitrary
    relative order, like any engine's underspecified ROW_NUMBER tie).

    Numeric keys get their cut points from an approxQuantile sketch;
    STRING keys (a doc_id like "doc-000123") from a seeded deterministic
    sample — either way the cuts only shape bucket SIZES, never
    correctness, so a bad sample costs balance, not ids.

    Cost: two column-pruned metadata passes (quantile sketch / sample +
    bucket counts) + the main pass. At 100 TB the metadata passes read
    one column and the window sorts ~1/num_buckets of the data per task."""
    key = F.col(key_col)
    dtype = dict(df.dtypes)[key_col]
    if dtype == "string":
        # deterministic hash-selected subset (engine's md5 bucketing —
        # uncorrelated with key ORDER, so even its first N rows are an
        # unbiased order-sample; a bare .limit() would take the first N
        # storage rows and collapse every cut into one key prefix), then
        # sorted -> evenly spaced cuts. limit caps the driver transfer
        # regardless of table size.
        from dataprofiler_spark.operators.sampling import hash_bucket

        sample = [
            r[0]
            for r in df.select(key_col)
            .filter(key.isNotNull())
            .filter(hash_bucket(key, salt="seq-id-cuts") < 100)  # ~1%
            .limit(num_buckets * 200)
            .collect()
        ]
        sample.sort()
        # String cuts compared directly cost up to num_buckets-1 chained
        # STRING comparisons per row (measured 4.6× the numeric variant).
        # Instead: strip the sample's longest common prefix (generated ids
        # like doc-000012345 share a constant prefix carrying zero
        # discriminating bytes), then read the next 7 suffix BYTES as a
        # zero-padded big-endian long — an ORDER-PRESERVING proxy (UTF-8
        # byte order = string order; zero-padding keeps prefixes smaller),
        # so bucketing is codegen'd long compares. Proxy ties (keys equal
        # through lcp+7 bytes) only merge buckets, never reorder them.
        # Keys NOT carrying the lcp sort entirely before (key < lcp) or
        # after (key > lcp) every lcp-prefixed key, so they route to edge
        # buckets by one string compare.
        bucket = F.lit(0)
        interior: list = []
        if sample:
            lcp = _common_prefix(sample[0], sample[-1])
            step = max(len(sample) // num_buckets, 1)
            cut_proxies = [
                _prefix_proxy(sample[i], lcp)
                for i in range(step, len(sample), step)
            ][: num_buckets - 1]
            interior = sorted(set(cut_proxies))
            # materialize the proxy as a COLUMN before the chained
            # comparisons reference it — inlining it re-evaluates the
            # conv∘hex∘rpad∘encode chain per comparison (gotcha 8;
            # measured 10× at 4M rows before this split)
            df = df.withColumn(
                "__proxy",
                F.conv(
                    F.hex(
                        F.expr(
                            f"rpad(encode(substr(`{key_col}`, {len(lcp) + 1}), "
                            "'utf-8'), 7, x'00')"
                        )
                    ),
                    16,
                    10,
                ).cast("long"),
            )
            proxy = F.col("__proxy")
            inner = F.lit(1)
            for c in interior:
                inner = inner + (proxy >= F.lit(c)).cast("int")
            if lcp:
                bucket = (
                    F.when(key < F.lit(lcp), F.lit(0))
                    .when(~key.startswith(lcp), F.lit(len(interior) + 2))
                    .otherwise(inner)
                )
            else:
                bucket = inner
    else:
        probs = [i / num_buckets for i in range(1, num_buckets)]
        cuts = df.stat.approxQuantile(key_col, probs, sample_error)
        # dedupe (heavy skew can collapse adjacent quantiles), keep order
        interior = sorted(set(cuts))
        if interior:
            # sum of boolean casts stays in whole-stage codegen (an
            # aggregate() HOF here would be interpreted per element —
            # CLAUDE.md gotcha 15)
            bucket = reduce(
                lambda a, b: a + b,
                [(key >= F.lit(c)).cast("int") for c in interior],
            )
        else:
            bucket = F.lit(0)
    # a NULL key has no rank: keep its bucket NULL (even in the no-cuts
    # case) so the counts pass below detects it and raises a clear error
    # instead of a driver TypeError or silently NULLS-FIRST ids
    staged = df.withColumn("__bucket", F.when(key.isNotNull(), bucket))

    counts = {
        r["__bucket"]: r["cnt"]
        for r in staged.groupBy("__bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    if None in counts:
        raise ValueError(
            f"assign_sequential_ids: {key_col} contains {counts[None]} NULL "
            "value(s) — a NULL has no position in a total order. Filter them "
            "out (or assign a sentinel) before calling."
        )
    offsets, run = {}, 0
    for b in sorted(counts):
        offsets[b] = run
        run += counts[b]
    off_expr = F.lit(0)
    for b, off in offsets.items():
        off_expr = F.when(F.col("__bucket") == b, F.lit(off)).otherwise(off_expr)

    w = Window.partitionBy("__bucket").orderBy(key_col)
    return (
        staged.withColumn(
            id_col, (off_expr + F.row_number().over(w) - 1).cast("long")
        )
        .drop("__bucket", "__proxy")
    )


def shuffle_corpus(
    df: DataFrame,
    key_col: str,
    seed: int = 0,
    num_shards: int = 256,
    shard_col: str = "shard",
    pos_col: str = "pos",
    portable: bool = True,
) -> DataFrame:
    """Deterministic distributed corpus shuffle — the training-order
    randomizer: every row gets a (shard, pos) address such that reading
    shards in order, rows in pos order, yields a pseudo-random global
    permutation that is (a) fully determined by (key, seed), independent
    of input partitioning/row order, (b) different per seed (epoch
    reshuffles = new seed, no data movement until the write), and
    (c) computed with NO global sort: shard assignment is a map-side
    hash, intra-shard order is a window partitioned BY SHARD, so each
    task sorts ~n/num_shards rows (the assign_sequential_ids principle:
    a global `ORDER BY rand()` plans an Exchange SinglePartition — one
    task sorting 10^12 rows).

    Write `partitionBy(shard)` and the training reader streams shards
    sequentially — the standard sharded-shuffle shape (a deterministic
    re-keying, not Spark's own shuffle).

    portable=True derives shard and order from md5 so a DuckDB oracle
    replays the exact permutation; portable=False swaps in xxhash64
    (cheaper per row — the production choice). Ties on the 60-bit order
    hash break by key, so the permutation is total iff keys are unique."""
    key = F.col(key_col)
    salted = F.concat_ws("\x1f", key.cast("string"), F.lit(str(int(seed))))
    if portable:
        h = F.md5(salted)
        order_h = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
        shard_h = F.conv(F.substring(h, 16, 15), 16, 10).cast("long")
    else:
        order_h = F.xxhash64(salted)
        shard_h = F.xxhash64(salted, F.lit(1))
    staged = df.withColumn(shard_col, F.pmod(shard_h, F.lit(int(num_shards))))
    # order within the shard by an INDEPENDENT hash half: decorrelates
    # intra-shard order from the shard congruence class
    staged = staged.withColumn("__ord", order_h)
    w = Window.partitionBy(shard_col).orderBy("__ord", key_col)
    return staged.withColumn(
        pos_col, (F.row_number().over(w) - 1).cast("long")
    ).drop("__ord")
