#!/usr/bin/env python
"""Per-entry isolation bench (guide §1.4): times SELECTED operator
queries with the same shapes as bench.py, each warmed once untimed, then
min-of-K. Used for the r6 optimization loop so a 30-minute full-bench
run is not needed per iteration; the frozen bench.py stays the artifact
of record.

Usage:
  python bench_extra.py [entry ...]          # default: all entries
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py batch_knn
  BENCH_EXTRA_EXPLAIN=plans/r06/suffix  -> also dump explain("formatted")
    for each selected entry to <dir>/<entry>_<suffix>.txt
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from dataprofiler_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("BENCH_REPEAT", "2"))


def main() -> None:
    spark = get_spark(
        app_name="dataprofiler-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dataprofiler_spark.operators.dedup import (
        cluster_survivors,
        cross_source_overlap,
        dedup_clusters,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )
    from dataprofiler_spark.functions.expressions import words as _words
    from dataprofiler_spark.operators.drift import histogram, token_frequency
    from dataprofiler_spark.operators.profile import profile
    from dataprofiler_spark.operators.sampling import (
        dsir_log_ratios,
        dsir_resample,
        dsir_score,
        select_token_budget,
    )
    from dataprofiler_spark.operators.similarity import (
        batch_topk,
        brute_force_topk,
        semantic_dedup,
    )
    from dataprofiler_spark.operators.textstats import (
        bigram_logprob,
        hashed_linear_score,
        threshold_sweep,
        token_count,
        tokenizer_fertility,
        unigram_logprob,
    )
    from dataprofiler_spark.pipeline import CurationConfig, curate_corpus
    from dataprofiler_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    qvec = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]

    def _dsir_select(dc):
        target = dc.filter(F.col("doc_id") % 7 == 0)
        raw = dc.filter(F.col("doc_id") % 7 != 0)
        model = dsir_log_ratios(target, raw, n_buckets=1 << 16)
        return dsir_resample(dsir_score(raw, model), 1000, salt="b")

    # frame builders (fresh plan per call — gotcha 10); timed via noop
    # sink unless the bench entry itself collects an aggregate-sized frame.
    # NOTE: profile_grouped here runs over the DOCUMENTS table for
    # self-contained iteration; the frozen bench.py's profile_grouped
    # runs over the generated 4M-row sequence table — compare those
    # numbers against bench.py runs, not this entry.
    entries = {
        "profile_grouped": lambda: profile(docs, "documents", group_by=["source"]),
        "profile_lineitem": lambda: profile(
            lineitem, "lineitem", group_by=["l_returnflag"]
        ),
        # bench.py runs this on the generated sequence table's `tokens`
        # array; here the docs table stands in via the shared tokenizer
        "token_frequency_top100": lambda: token_frequency(
            docs.select(_words(F.col("text")).alias("tokens")), top_k=100
        ),
        "minhash_lsh_pairs": lambda: lsh_candidate_pairs(
            docs, "doc_id", num_hashes=16, bands=8
        ),
        "ngram_jaccard_pairs": lambda: ngram_jaccard_pairs(
            docs, "doc_id", threshold=0.2, max_shingle_doc_freq=1000
        ),
        "ngram_jaccard_uncapped": lambda: ngram_jaccard_pairs(
            docs, "doc_id", threshold=0.2, max_shingle_doc_freq=None
        ),
        "simhash_pairs": lambda: simhash_near_dup_pairs(docs, "doc_id"),
        "knn_cosine_top10": lambda: brute_force_topk(emb, qvec, k=10),
        "dedup_clusters": lambda: dedup_clusters(
            docs, "doc_id", num_hashes=16, bands=8
        ),
        "batch_knn_top5": lambda: batch_topk(
            emb,
            emb.filter(F.col("vec_id") % 97 == 0).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ),
            k=5,
        ),
        "semantic_dedup": lambda: semantic_dedup(
            emb.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
            ),
            dim=64,
            num_clusters=8,
            threshold=0.9,
        ).filter(~F.col("is_survivor")),
        "semantic_dedup_arrow": lambda: semantic_dedup(
            emb.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
            ),
            dim=64,
            num_clusters=8,
            threshold=0.9,
            pair_backend="arrow",
            assign_backend="arrow",
        ).filter(~F.col("is_survivor")),
        "hashed_classifier": lambda: hashed_linear_score(docs),
        "threshold_sweep": lambda: threshold_sweep(
            hashed_linear_score(docs).withColumn("y", F.col("doc_id") % 3 == 0),
            "quality_score",
            "y",
        ),
        "unigram_logprob": lambda: unigram_logprob(docs),
        "bigram_logprob": lambda: bigram_logprob(docs),
        "fertility_by_source": lambda: tokenizer_fertility(docs),
        "cross_source_overlap": lambda: cross_source_overlap(docs),
        "cluster_survivors": lambda: cluster_survivors(
            dedup_clusters(docs, "doc_id", num_hashes=16, bands=8),
            docs.select("doc_id", F.col("n_chars").alias("priority")),
            "priority",
        ),
        "dsir_select": lambda: _dsir_select(docs),
        "token_budget_select": lambda: select_token_budget(
            docs.select(
                "doc_id",
                (F.pmod(F.col("doc_id") * 37, F.lit(101)) / 101.0).alias("score"),
                token_count("text").alias("n_tok"),
            ),
            "score",
            "n_tok",
            1_000_000,
        ).filter(F.col("selected")),
        "curation_funnel": lambda: curate_corpus(
            spark, docs.select("doc_id", "text"), CurationConfig()
        ).funnel,
    }

    selected = sys.argv[1:] or list(entries)
    unknown = [s for s in selected if s not in entries]
    if unknown:
        raise SystemExit(f"unknown entries {unknown}; known: {sorted(entries)}")

    explain_tag = os.environ.get("BENCH_EXTRA_EXPLAIN")

    timings: dict[str, float] = {}
    for name in selected:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        frame = entries[name]()
        if explain_tag:
            import contextlib
            import io

            d, _, suffix = explain_tag.partition(":")
            os.makedirs(d, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                frame.explain("formatted")
            with open(
                os.path.join(d, f"{name}_{suffix or 'plan'}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        if os.environ.get("BENCH_EXTRA_PLAN_ONLY") == "1":
            continue
        frame.write.format("noop").mode("overwrite").save()  # warm untimed
        best = float("inf")
        for i in range(REPEAT):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            entries[name]().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(json.dumps({name: timings[name]}), flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "timings": timings}))


if __name__ == "__main__":
    main()
