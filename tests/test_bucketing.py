"""Storage-level scale paths, plan-verified:

1. Bucketed co-located join — at 10^12 rows both the sequence table and its
   golden reference live bucketed by doc_id (Iceberg bucket transform /
   Spark bucketBy). The token-equality join then needs NO exchange at all:
   the only remaining cost is the zipped scan. This test proves the plan.
2. Resume partition pruning — the manifest's skip filter on a
   source-partitioned table must prune files at the scan (skipped
   partitions cost zero I/O), which is the whole point of
   lineage-keyed resume.
"""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.sources import gen_sequences


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf — uses ./spark-warehouse (gitignored).
    # DROP TABLE only clears the in-memory catalog; orphan dirs from prior
    # sessions must go too or the managed-table write collides.
    import shutil

    for t in ("seq_bucketed", "ref_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    gen_sequences(spark, 2000).write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("seq_bucketed")
    gen_sequences(spark, 2000).write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("ref_bucketed")

    a = spark.table("seq_bucketed")
    b = spark.table("ref_bucketed").select("doc_id", F.col("tokens").alias("ref_tokens"))
    j = a.join(b, "doc_id").groupBy("source").agg(
        F.sum(F.when(F.xxhash64("tokens") != F.xxhash64("ref_tokens"), 1).otherwise(0)).alias("mismatches")
    )
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    join_section = plan.split("HashAggregate")[-1] if "SortMergeJoin" in plan else plan
    # the JOIN itself must not exchange: bucket layout co-locates both sides
    # (the only exchange allowed is the tiny groupBy(source) re-agg)
    n_exchanges = plan.count("Exchange hashpartitioning(doc_id")
    assert n_exchanges == 0, plan[:1500]
    assert j.count() > 0


def test_resume_filter_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "seq_part")
    gen_sequences(spark, 5000).write.partitionBy("source").parquet(path)
    df = spark.read.parquet(path)
    # the manifest resume filter: exclude validated partitions
    skipped = ["web", "books", "code"]
    q = df.filter(~F.col("source").isin(skipped)).groupBy("source").count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # attr ids vary (source#N) — match the filter's shape
    assert "NOT source#" in plan and "IN (web,books,code)" in plan
    # pruned partitions truly unread: only non-skipped sources appear
    got = {r.source for r in q.collect()}
    assert got.isdisjoint(set(skipped)) and len(got) > 0
