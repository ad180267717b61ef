"""End-to-end pipeline: verdict matrix, sinks, drift gate, and
checkpoint/resume semantics (SURVEY.md §5 rebuild test plan item 4)."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.drift import histogram
from dataprofiler_spark.pipeline import ValidationConfig, run_validation
from dataprofiler_spark.plans.manifest import Manifest
from dataprofiler_spark.sources import gen_sequences, gen_sources_ref

N = 5_000


def test_pipeline_end_to_end(spark, tmp_path):
    bad = gen_sequences(spark, N, violations=True)
    ref = gen_sequences(spark, N)
    cfg = ValidationConfig(
        output_dir=str(tmp_path / "out"),
        manifest_dir=str(tmp_path / "manifest"),
        lineage="snap-1",
    )
    res = run_validation(spark, bad, gen_sources_ref(spark), reference=ref, cfg=cfg)
    assert res.summary["passed"] is False
    assert res.summary["partitions_skipped"] == 0
    assert res.summary["rows_validated"] == N
    # sinks written
    v = spark.read.parquet(str(tmp_path / "out" / "validation_verdicts"))
    assert v.filter("NOT passed").count() > 0
    x = spark.read.parquet(str(tmp_path / "out" / "violations"))
    assert x.count() > 0
    # manifest has per-partition lineage + row counts + check matrix
    recs = Manifest(cfg.manifest_dir).load()
    assert "web" in recs and recs["web"].lineage == "snap-1"
    assert recs["web"].row_count > 0
    assert recs["web"].checks["unique_doc_id"] is False
    assert recs["ghost"].checks["ri_source"] is False


def test_pipeline_single_execution_with_output_dir(spark, tmp_path):
    """With output_dir set, the suite's input scans must not re-execute per
    sink write (the round-2 ~3× regression): the input is persisted across
    the verdict collect + violations write, and the aggregate-sized frames
    (profiles, drift) are collect-funneled into LOCAL frames whose writes
    execute no input scans."""
    # patch the CONCRETE class (pyspark.sql.DataFrame is an abstract parent
    # in Spark 4; instances are classic.dataframe.DataFrame)
    DataFrame = type(spark.range(1))

    calls = {"persist": 0, "unpersist": 0}
    orig_persist, orig_unpersist = DataFrame.persist, DataFrame.unpersist

    def counting_persist(self, *a, **k):
        calls["persist"] += 1
        return orig_persist(self, *a, **k)

    def counting_unpersist(self, *a, **k):
        calls["unpersist"] += 1
        return orig_unpersist(self, *a, **k)

    DataFrame.persist, DataFrame.unpersist = counting_persist, counting_unpersist
    try:
        bad = gen_sequences(spark, N, violations=True)
        ref = gen_sequences(spark, N)
        baseline = histogram(ref, "n_tok", 16.0, group_by=["source"])
        cfg = ValidationConfig(output_dir=str(tmp_path / "out"))
        res = run_validation(
            spark, bad, gen_sources_ref(spark), reference=ref,
            baseline_hist=baseline, cfg=cfg,
        )
    finally:
        DataFrame.persist, DataFrame.unpersist = orig_persist, orig_unpersist

    # input persisted exactly once for the multi-action phase, then released
    assert calls["persist"] == 1 and calls["unpersist"] == 1
    # profiles + drift are local (collect-funneled) frames: executing or
    # writing them cannot re-run any input scan
    for frame in (res.profiles, res.drift, res.verdicts):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Scan parquet" not in plan and "Exchange" not in plan, plan
    # sinks still correct
    assert spark.read.parquet(str(tmp_path / "out" / "violations")).count() > 0
    assert spark.read.parquet(str(tmp_path / "out" / "data_profiles")).count() > 0
    assert spark.read.parquet(str(tmp_path / "out" / "drift_metrics")).count() > 0


def test_pipeline_resume_skips_validated(spark, tmp_path):
    clean = gen_sequences(spark, N)
    cfg = ValidationConfig(
        manifest_dir=str(tmp_path / "manifest"), lineage="snap-A"
    )
    r1 = run_validation(spark, clean, gen_sources_ref(spark), cfg=cfg)
    assert r1.summary["partitions_skipped"] == 0
    n_parts = r1.summary["partitions_validated"]
    # the registered-but-empty partition fails row_count_gt_0 even on clean
    # data → recorded as 'failed', never skipped (a failing partition must
    # be revalidated, not silently skipped on resume)
    recs = Manifest(cfg.manifest_dir).load()
    assert recs["empty_src"].status == "failed"
    assert all(
        rec.status == "validated" for p, rec in recs.items() if p != "empty_src"
    )

    # resubmission with the same lineage: every PASSING partition skipped;
    # the failing empty partition is re-checked
    r2 = run_validation(spark, clean, gen_sources_ref(spark), cfg=cfg)
    assert r2.summary["partitions_skipped"] == n_parts - 1
    assert r2.summary["partitions_validated"] == 1
    assert r2.summary["rows_validated"] == 0

    # lineage change (new snapshot) invalidates the skip
    cfg2 = ValidationConfig(manifest_dir=cfg.manifest_dir, lineage="snap-B")
    r3 = run_validation(spark, clean, gen_sources_ref(spark), cfg=cfg2)
    assert r3.summary["partitions_skipped"] == 0


def test_pipeline_failed_partitions_not_skipped_on_resume(spark, tmp_path):
    """A rerun on bad data with the same lineage must RE-validate the
    failing partitions and report the failures again — a 'validated' status
    for failed partitions would make known violations read as a clean run."""
    bad = gen_sequences(spark, N, violations=True)
    cfg = ValidationConfig(
        manifest_dir=str(tmp_path / "manifest"), lineage="snap-bad"
    )
    r1 = run_validation(spark, bad, gen_sources_ref(spark), cfg=cfg)
    assert r1.summary["checks_failed"] > 0
    failed_parts = {
        p for p, rec in Manifest(cfg.manifest_dir).load().items()
        if rec.status == "failed"
    }
    assert failed_parts  # bad data must mark partitions failed

    r2 = run_validation(spark, bad, gen_sources_ref(spark), cfg=cfg)
    assert r2.summary["checks_failed"] > 0  # still reported, not skipped
    assert not (failed_parts & r2.skipped_partitions)


def test_config_approx_implies_prefilter():
    """ValidationConfig(exact=False) must resolve the 'auto' equality mode
    to the prefilter scale path (the full-UDF mode anti-scales)."""
    assert ValidationConfig(exact=False).equality_udf_mode == "prefilter"
    assert ValidationConfig(exact=True).equality_udf_mode == "full"
    assert ValidationConfig(exact=False, equality_udf_mode="full").equality_udf_mode == "full"


def test_pipeline_drift_gate(spark, tmp_path):
    base = gen_sequences(spark, N)
    shifted = base.filter(F.col("n_tok") > 80)  # distribution shift
    base_hist = histogram(base, "n_tok", 16.0, group_by=["source"])
    cfg = ValidationConfig()
    res = run_validation(
        spark, shifted, gen_sources_ref(spark), baseline_hist=base_hist, cfg=cfg
    )
    drift_fails = res.verdicts.filter(
        (F.col("check_name") == "n_tok_drift_psi") & ~F.col("passed")
    ).count()
    assert drift_fails > 0  # shift detected per partition
    assert res.drift is not None
    # identical snapshot → no drift failures
    res2 = run_validation(
        spark, base, gen_sources_ref(spark), baseline_hist=base_hist, cfg=cfg
    )
    assert (
        res2.verdicts.filter(
            (F.col("check_name") == "n_tok_drift_psi") & ~F.col("passed")
        ).count()
        == 0
    )


def test_pipeline_token_frequency_drift(spark):
    """Token-frequency drift gate: a vocabulary shift (tokens restricted to
    the low half) must fail token_freq_drift_psi per partition; same
    distribution passes."""
    base = gen_sequences(spark, N)
    base_freq = (
        base.select("source", F.explode("tokens").alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # vocabulary shift: keep only rows whose first token is in the low half,
    # then truncate arrays to even positions — changes token distribution
    shifted = base.withColumn("tokens", F.filter("tokens", lambda t: t < 25000)).filter(
        F.size("tokens") > 0
    ).withColumn("n_tok", F.size("tokens"))
    res = run_validation(
        spark, shifted, gen_sources_ref(spark), baseline_token_freq=base_freq,
        cfg=ValidationConfig(),
    )
    fails = res.verdicts.filter(
        (F.col("check_name") == "token_freq_drift_psi") & ~F.col("passed")
    ).count()
    assert fails > 0
    res2 = run_validation(
        spark, base, gen_sources_ref(spark), baseline_token_freq=base_freq,
        cfg=ValidationConfig(),
    )
    assert (
        res2.verdicts.filter(
            (F.col("check_name") == "token_freq_drift_psi") & ~F.col("passed")
        ).count()
        == 0
    )


def test_curate_corpus_end_to_end(spark, tmp_path):
    """The materializing curation run: quality gate, exact-dedup survivor,
    PII redaction in the OUTPUT, split assignment, and a funnel that
    accounts for every document. One scan + one fingerprint window."""
    from dataprofiler_spark.pipeline import CurationConfig, curate_corpus

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today", "a"),
        (2, "the quick brown fox jumps over the lazy dog again and again today", "a"),
        (3, "short text", "a"),
        (4, "call me at 555-123-4567 about the offer we discussed yesterday regarding payment", "b"),
        (5, "a a a a a a a a a a a a", "b"),
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(path)
    docs = spark.read.parquet(path)
    res = curate_corpus(spark, docs, CurationConfig(min_words=10))
    # capture BEFORE executing: a finalized AQE plan prints initial+final
    # sections and doubles every node string
    plan = res.funnel._jdf.queryExecution().executedPlan().toString()
    f = res.funnel.collect()[0]
    assert f.n_input == 5 and f.n_quality == 3 and f.n_kept == 2
    assert f.n_kept_with_pii == 1
    assert f.n_train + f.n_val + f.n_test == f.n_kept
    curated = {r.doc_id: r for r in res.curated.collect()}
    assert set(curated) == {1, 4}
    assert "[PHONE]" in curated[4].text and "555" not in curated[4].text
    assert curated[1].split in ("train", "val", "test")

    # plan shape: exactly TWO corpus scans — the narrow survivor
    # aggregate (map-side combine; skew-immune replacement for the
    # fingerprint rank window, which sorted each content's entire
    # duplicate set in one task) plus the flagged full-row frame. No
    # rank window over fingerprint groups, no Python in the plan.
    assert plan.count("Scan parquet") == 2
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_curate_guards_and_rest_split(spark):
    """Reserved-column collision raises clearly; sub-1.0 split fractions
    produce an accounted 'rest' bucket; missing key/text raise."""
    import pytest as _pytest

    from dataprofiler_spark.pipeline import CurationConfig, curate_corpus

    base = [(i, f"unique words number {i} pad pad2 pad3 pad4 pad5 pad6 pad7", "s")
            for i in range(40)]
    docs = spark.createDataFrame(base, "doc_id long, text string, source string")

    with _pytest.raises(ValueError, match="collide"):
        curate_corpus(spark, docs.withColumn("split", F.lit("x")), CurationConfig())
    with _pytest.raises(ValueError, match="no column"):
        curate_corpus(spark, docs, CurationConfig(key_col="nope"))

    res = curate_corpus(
        spark, docs, CurationConfig(splits={"train": 0.5, "val": 0.2})
    )
    f = res.funnel.collect()[0]
    assert f.n_train + f.n_val + f.n_rest == f.n_kept  # rest accounted
    # output contract: original columns + split, nothing engineered
    assert res.curated.columns == ["doc_id", "text", "source", "split"]


def test_snapshot_resume_reinvalidates_only_appended_partition(spark, tmp_path):
    """Snapshot-id lineage model (SURVEY §7.4 / VERDICT r3 action 6):
    validate a hive-partitioned input against its Snapshot; append data to
    ONE partition → the new snapshot has a new snapshot_id, the stale
    partition's skip is invalidated, every untouched partition still
    skips. The global-fingerprint mode would re-validate everything."""
    from dataprofiler_spark.plans.manifest import snapshot_from_path

    inp = str(tmp_path / "table")
    clean = gen_sequences(spark, N)
    clean.write.partitionBy("source").parquet(inp)

    snap1 = snapshot_from_path(inp, part_prefix="source")
    cfg = ValidationConfig(
        manifest_dir=str(tmp_path / "manifest"), snapshot=snap1
    )
    stored = spark.read.parquet(inp)
    r1 = run_validation(spark, stored, gen_sources_ref(spark), cfg=cfg)
    assert r1.summary["partitions_skipped"] == 0
    recs = Manifest(cfg.manifest_dir).load()
    some_part = next(p for p, rec in recs.items() if rec.status == "validated")
    assert recs[some_part].snapshot_id == snap1.snapshot_id
    assert recs[some_part].lineage == snap1.partition_lineage[some_part]

    # append rows to ONE partition
    extra = clean.filter(F.col("source") == some_part).limit(50)
    extra.write.mode("append").partitionBy("source").parquet(inp)
    snap2 = snapshot_from_path(inp, part_prefix="source")
    assert snap2.snapshot_id != snap1.snapshot_id
    assert snap2.partition_lineage[some_part] != snap1.partition_lineage[some_part]
    untouched = [
        p for p in snap1.partition_lineage
        if p != some_part and snap2.partition_lineage[p] == snap1.partition_lineage[p]
    ]
    assert untouched

    cfg2 = ValidationConfig(manifest_dir=cfg.manifest_dir, snapshot=snap2)
    r2 = run_validation(
        spark, spark.read.parquet(inp), gen_sources_ref(spark), cfg=cfg2
    )
    # the appended partition re-validates; untouched VALIDATED partitions skip
    assert some_part not in r2.skipped_partitions
    validated_untouched = {
        p for p in untouched if recs[p].status == "validated"
    }
    assert validated_untouched <= r2.skipped_partitions


def test_curate_with_paragraph_dedup(spark):
    from dataprofiler_spark.pipeline import CurationConfig, curate_corpus

    long_para = " ".join(f"w{j}" for j in range(12))
    other = " ".join(f"x{j}" for j in range(12))
    rows = [
        (1, long_para + "\n" + other),     # keeps both paragraphs
        (2, long_para + "\nunique tail"),  # loses the duplicated paragraph
        (3, long_para),                    # fully duplicated -> empty text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CurationConfig(min_words=10, min_distinct_ratio=0.0, dedup_paragraphs=True)
    res = curate_corpus(spark, df, cfg)
    f = res.funnel.collect()[0]
    # doc1 survives (24 words), doc2 drops to 2 words (< 10), doc3 empties
    assert f.n_input == 3 and f.n_paragraphs_removed == 2
    assert f.n_quality == 1 and f.n_kept == 1
    kept = res.curated.collect()
    assert [r.doc_id for r in kept] == [1]
    assert kept[0].text == long_para + "\n" + other
    # staging columns never leak
    assert set(res.curated.columns) == {"doc_id", "text", "split"}


def test_curate_paragraph_dedup_off_is_unchanged(spark):
    from dataprofiler_spark.pipeline import CurationConfig, curate_corpus

    df = spark.createDataFrame(
        [(1, " ".join(f"w{j}" for j in range(12)))], "doc_id long, text string"
    )
    base = curate_corpus(spark, df, CurationConfig(min_words=10, min_distinct_ratio=0.0))
    assert "n_paragraphs_removed" not in base.funnel.columns
    assert base.funnel.collect()[0].n_kept == 1


def test_curate_with_span_removal(spark):
    from dataprofiler_spark.pipeline import CurationConfig, curate_corpus

    chrome = "nav home about contact"
    bodies = [" ".join(f"b{i}x{j}" for j in range(12)) for i in range(3)]
    rows = [(i, chrome + " " + bodies[i]) for i in range(3)]
    rows.append((9, chrome))  # chrome-only doc: empties after removal
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CurationConfig(
        min_words=10, min_distinct_ratio=0.0, remove_spans=True, span_max_doc_freq=2
    )
    res = curate_corpus(spark, df, cfg)
    f = res.funnel.collect()[0]
    # 4 chrome words removed from each of the 4 docs
    assert f.n_input == 4 and f.n_span_words_removed == 16
    assert f.n_quality == 3 and f.n_kept == 3  # chrome-only doc emptied out
    kept = {r.doc_id: r.text for r in res.curated.collect()}
    assert set(kept) == {0, 1, 2}
    for i in range(3):
        assert kept[i] == bodies[i]  # chrome stripped, body intact
    assert set(res.curated.columns) == {"doc_id", "text", "split"}


def test_curate_paragraph_then_span_stages_compose(spark):
    from dataprofiler_spark.pipeline import CurationConfig, curate_corpus

    chrome = "nav home about contact"
    body = " ".join(f"w{j}" for j in range(12))
    # duplicated paragraph + chrome spans in the surviving text
    rows = [
        (1, chrome + " " + body + "\n" + "shared para line"),
        (2, chrome + " " + body + "x\n" + "shared para line"),
        (3, chrome + " other unique twelve word body " + body),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CurationConfig(
        min_words=5, min_distinct_ratio=0.0,
        dedup_paragraphs=True, remove_spans=True, span_max_doc_freq=2,
    )
    f = curate_corpus(spark, df, cfg).funnel.collect()[0]
    assert "n_paragraphs_removed" in f.asDict() and "n_span_words_removed" in f.asDict()
    assert f.n_paragraphs_removed >= 1  # the shared para's second copy
    assert f.n_span_words_removed >= 9  # chrome in all three docs


def test_curate_with_url_dedup_and_model_gate(spark):
    """URL stage: refetches of one canonical URL collapse to the min-key
    doc before any text judgment; model gate: a trained weight table
    drops low-scoring docs; the funnel accounts for both stages."""
    import hashlib

    from dataprofiler_spark.pipeline import CurationConfig, curate_corpus

    good = "informative well written article with many distinct words here today"
    spam = "buy buy buy cheap cheap pills pills now now now click here fast"
    rows = [
        (1, good, "https://Example.COM:443/a?utm_source=x"),
        (2, good + " refetched", "https://www.example.com:443/a/"),  # same canon URL
        (3, spam, "https://example.com/b"),
        (4, good + " other page entirely with words", "https://example.com/c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")

    bk = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:7], 16) % (1 << 18)
    weights = spark.createDataFrame(
        [(bk(w), 5.0) for w in set(good.split())]
        + [(bk(w), -5.0) for w in set(spam.split())],
        "bucket long, weight double",
    )
    res = curate_corpus(
        spark,
        docs,
        CurationConfig(
            min_words=5,
            min_distinct_ratio=0.0,
            url_col="url",
            min_model_score=0.5,
            model_weights=weights,
        ),
    )
    f = res.funnel.collect()[0]
    # doc 2 is a URL refetch (not a survivor); doc 3 fails the model gate
    assert f.n_input == 4 and f.n_url_survivors == 3
    assert f.n_model_pass == 3  # 1, 2, 4 score high; 3 scores low
    kept = {r.doc_id for r in res.curated.collect()}
    assert kept == {1, 4}
    assert "url" in res.curated.columns and "norm_url" not in res.curated.columns


def test_snapshot_ops_replay_append_compact_overwrite(spark, tmp_path):
    """Iceberg-operation simulation (VERDICT r4 #5): replay an
    append → compact → overwrite sequence against the manifest skip
    logic. Compaction (file rewrite, same data) must NOT invalidate any
    partition — the case the file-fingerprint lineage of
    snapshot_from_path gets wastefully wrong — while append and
    overwrite invalidate exactly the touched partition."""
    from dataprofiler_spark.plans.manifest import (
        PartitionRecord,
        Snapshot,
        snapshot_append,
        snapshot_compact,
        snapshot_overwrite,
    )

    snap0 = Snapshot(
        snapshot_id="", partition_lineage={"web": "t-web", "books": "t-books", "code": "t-code"}
    )
    man = Manifest(str(tmp_path / "m"))
    for p, tok in snap0.partition_lineage.items():
        man.record(PartitionRecord(p, "validated", tok, 100))
    assert man.validated_partitions_for(snap0) == {"web", "books", "code"}

    # append to web: only web re-validates
    snap1 = snapshot_append(snap0, "web", "files-batch-2")
    assert man.validated_partitions_for(snap1) == {"books", "code"}
    assert snap1.snapshot_id != snap0.snapshot_id
    man.record(PartitionRecord("web", "validated", snap1.partition_lineage["web"], 150))

    # compaction: every skip survives, nothing re-validates
    snap2 = snapshot_compact(snap1)
    assert man.validated_partitions_for(snap2) == {"web", "books", "code"}
    assert snap2.partition_lineage == snap1.partition_lineage

    # overwrite books: exactly books re-validates, and the fresh token is
    # NOT the append-chain evolution of the old one
    snap3 = snapshot_overwrite(snap2, "books", "rewrite-1")
    assert man.validated_partitions_for(snap3) == {"web", "code"}
    assert snap3.partition_lineage["books"] != snapshot_append(
        snap2, "books", "rewrite-1"
    ).partition_lineage["books"]

    # same data identity == same snapshot id (content-addressed)
    assert snapshot_compact(snap3).snapshot_id == snap3.snapshot_id


def test_content_lineage_survives_physical_compaction(spark, tmp_path):
    """content_lineage is layout-invariant and data-sensitive: rewriting
    a parquet partition's files (real compaction: many files → one)
    keeps the token; changing one row flips it; the file-fingerprint
    lineage flips on compaction (documented waste)."""
    from dataprofiler_spark.plans.manifest import content_lineage, input_fingerprint

    inp = str(tmp_path / "t")
    df = gen_sequences(spark, 2_000).filter(F.col("source") == "web")
    df.repartition(8).write.parquet(inp)  # 8 files

    before_content = content_lineage(spark.read.parquet(inp))
    before_files = input_fingerprint(inp)

    # physical compaction: same rows, one file
    compacted = str(tmp_path / "t2")
    spark.read.parquet(inp).coalesce(1).write.parquet(compacted)
    assert content_lineage(spark.read.parquet(compacted)) == before_content
    assert input_fingerprint(compacted) != before_files  # the wasteful case

    # a one-row change flips the content token
    mutated = spark.read.parquet(compacted).withColumn(
        "n_tok",
        F.when(F.col("doc_id") == df.select(F.min("doc_id")).collect()[0][0],
               F.col("n_tok") + 1).otherwise(F.col("n_tok")),
    )
    assert content_lineage(mutated) != before_content
    # duplicate rows are multiset-visible (xor-style digests would cancel)
    doubled = spark.read.parquet(compacted).unionAll(spark.read.parquet(compacted))
    assert content_lineage(doubled) != before_content
