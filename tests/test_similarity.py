"""Similarity search: brute-force exactness vs numpy, IVF recall, LSH near-dup."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_build,
    ivf_search,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]


def test_brute_force_matches_numpy(spark, emb, qvec):
    got = brute_force_topk(emb, qvec, k=10).collect()
    rows = emb.collect()
    q = np.array(qvec)
    sims = {
        r.vec_id: round(float(np.dot(r.embedding, q) / (np.linalg.norm(r.embedding) * np.linalg.norm(q))), 6)
        for r in rows
    }
    want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.vec_id, r.cos_sim) for r in got] == [(i, pytest.approx(s, abs=2e-6)) for i, s in want]
    assert got[0].vec_id == 0 and got[0].cos_sim == 1.0  # query is in the set


def test_ivf_full_probe_equals_brute_force(spark, emb, qvec):
    assigned, cents = ivf_build(emb, num_centroids=8)
    full = ivf_search(assigned, cents, qvec, k=10, nprobe=8)
    brute = brute_force_topk(emb, qvec, k=10)
    assert [r.vec_id for r in full.collect()] == [r.vec_id for r in brute.collect()]


def test_ivf_partial_probe_recall(spark, emb, qvec):
    assigned, cents = ivf_build(emb, num_centroids=8)
    part = {r.vec_id for r in ivf_search(assigned, cents, qvec, k=10, nprobe=3).collect()}
    brute = {r.vec_id for r in brute_force_topk(emb, qvec, k=10).collect()}
    assert len(part & brute) / 10 >= 0.5  # partial probe keeps decent recall


def test_embedding_near_dup_finds_duplicates(spark, emb):
    # plant an exact duplicate vector with a new id
    dup = emb.filter(F.col("vec_id") == 7).withColumn("vec_id", F.lit(100007).cast("long"))
    df = emb.unionByName(dup)
    pairs = embedding_near_dup_pairs(df, dim=64, threshold=0.999)
    got = {(r.key1, r.key2) for r in pairs.collect()}
    assert (7, 100007) in got
