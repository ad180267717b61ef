"""Distributed contiguous id assignment (operators/ordering.py)."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.ordering import assign_sequential_ids


def test_ids_equal_global_rank(spark):
    """Two-level range-bucketed ids == ROW_NUMBER() OVER (ORDER BY key)-1,
    on a scattered non-contiguous key."""
    df = spark.range(0, 50000).select((F.col("id") * 7919 % 1000003).alias("k"))
    out = assign_sequential_ids(df, "k").orderBy("k").collect()
    assert [r.seq_id for r in out] == list(range(len(out)))


def test_no_single_partition_stage(spark):
    """The whole point: the plan must contain NO SinglePartition exchange
    (the global-window scale killer this operator replaces)."""
    df = spark.range(0, 10000).select((F.col("id") * 31 % 99991).alias("k"))
    plan = (
        assign_sequential_ids(df, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_skewed_key_still_correct(spark):
    """Heavy skew collapses quantile cuts (deduped); ids stay a valid
    contiguous rank — skew only unbalances bucket sizes, never breaks
    correctness."""
    df = spark.range(0, 20000).select(
        F.when(F.col("id") < 19000, F.col("id") % 5)  # 95% mass on 5 keys
        .otherwise(F.col("id"))
        .alias("k")
    )
    out = assign_sequential_ids(df, "k").select("seq_id").collect()
    ids = sorted(r.seq_id for r in out)
    assert ids == list(range(20000))  # contiguous 0..n-1, no dupes/gaps


def test_null_keys_raise_clearly(spark):
    """NULL keys have no rank: a clear ValueError, never a driver
    TypeError or silent NULLS-FIRST ids — in BOTH the with-cuts and the
    collapsed-cuts (constant key) paths."""
    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 100 == 0, None).otherwise(F.col("id")).alias("k")
    )
    with pytest.raises(ValueError, match="NULL"):
        assign_sequential_ids(df, "k")
    const_with_null = spark.createDataFrame([(7,), (7,), (None,)], "k int")
    with pytest.raises(ValueError, match="NULL"):
        assign_sequential_ids(const_with_null, "k")


def test_string_keys_exact_rank(spark):
    """String keys (sampled cut strings instead of approxQuantile): ids
    still equal the global ROW_NUMBER, no SinglePartition stage, and the
    work spreads over multiple buckets."""
    df = spark.range(0, 30000).select(
        F.concat(F.lit("doc-"), F.lpad((F.col("id") * 37 % 99991).cast("string"), 6, "0")).alias("k")
    ).distinct()
    out = assign_sequential_ids(df, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    rows = out.orderBy("k").collect()
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    # tiny string table: few/no cuts, still exact
    small = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
    got = {r.k: r.seq_id for r in assign_sequential_ids(small, "k").collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_string_keys_prefix_proxy_edge_cases(spark):
    """The numeric prefix-proxy bucketing (7 suffix bytes after the
    sample's common prefix) must stay exact under: outlier keys that sort
    before/after every common-prefixed key (not in the sample's LCP),
    keys equal through lcp+7 bytes (proxy ties), multi-byte UTF-8, and
    keys shorter than the proxy window."""
    base = [f"doc-{i*37 % 99991:06d}x{'pad'*4}{j}" for i in range(4000) for j in (0,)]
    outliers = ["", "a", "Zzz", "ééé", "zzz~", "doc", "doc-"]
    ties = [f"doc-000001{'same7bytes'}{i:03d}" for i in range(50)]
    keys = sorted(set(base + outliers + ties))
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    out = assign_sequential_ids(df, "k", num_buckets=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    got = {r.k: r.seq_id for r in out.collect()}
    assert got == {k: i for i, k in enumerate(keys)}


def test_shuffle_corpus_permutation_properties(spark):
    """Deterministic sharded shuffle: (a) positions are contiguous per
    shard, (b) same (key, seed) -> identical addresses regardless of
    input order, (c) a different seed yields a different permutation,
    (d) no single-task global sort in the plan."""
    from dataprofiler_spark.operators.ordering import shuffle_corpus

    keys = [(f"doc-{i:05d}",) for i in range(500)]
    df = spark.createDataFrame(keys, "k string")
    out = shuffle_corpus(df, "k", seed=3, num_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    rows = out.collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert all(sorted(v) == list(range(len(v))) for v in by_shard.values())

    # input order/partitioning cannot influence the addresses
    df_rev = spark.createDataFrame(list(reversed(keys)), "k string").repartition(13)
    again = {r.k: (r.shard, r.pos) for r in shuffle_corpus(df_rev, "k", seed=3, num_shards=8).collect()}
    assert again == {r.k: (r.shard, r.pos) for r in rows}

    other = {r.k: (r.shard, r.pos) for r in shuffle_corpus(df, "k", seed=4, num_shards=8).collect()}
    assert other != again

    # portable and xx64 modes both yield valid (if different) permutations
    fast = shuffle_corpus(df, "k", seed=3, num_shards=8, portable=False).collect()
    fs: dict[int, list[int]] = {}
    for r in fast:
        fs.setdefault(r.shard, []).append(r.pos)
    assert all(sorted(v) == list(range(len(v))) for v in fs.values())
