"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (all-JVM expression math via
zip_with/aggregate — no UDF, no collect); the scale paths are IVF (coarse
quantizer + probed partitions) and random-hyperplane LSH. On a 1000-executor
cluster the IVF index is the one you want: the centroid assignment is a
broadcast join (centroids are tiny) and probing reads only matching
partitions of a centroid-partitioned table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (whole-stage codegen, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _unrolled_dot(a: Column, b: Column, dim: int) -> Column:
    """Left-assoc unrolled Σ aᵢ·bᵢ — bit-identical to dot()'s fold order
    ((0.0 + a₀b₀) + a₁b₁) + …, including the float-vs-double coercion of
    each product (element types drive the same multiply width as
    zip_with's lambda). Unlike the fold, the chain is NOT a
    higher-order function (CodegenFallback), so a stage containing it
    stays on the whole-stage-codegen path — which is exactly what the
    BroadcastHashJoin pair stage needs (fold there: 50 s; this chain:
    2 s at 25 M pairs). In FLAT projections the interpreted fold is the
    faster form (0.7 s vs 4.1 s on the centroid panel) — use dot(), not
    this, outside join stages. Measurements in OPTIMIZATION_r06.md."""
    s: Column = F.lit(0.0)
    for i in range(dim):
        s = s + a[i] * b[i]
    return s


def dot_fast(a: Column, b: Column, dim: int | None = None) -> Column:
    """dot() with a codegen fast path for known-dim vectors; NULL for
    rows whose arrays are not exactly `dim` long.

    Semantics vs the fold: identical whenever at least one side IS
    dim-length (zip_with pads the shorter side with NULLs → NULL dot,
    exactly what the guard yields), which covers every declared query
    (fixed-dim corpora, literal/panel queries of length dim). The one
    divergence is a pair of EQUALLY-short ragged arrays (fold scored the
    truncated prefix; now NULL = "no cosine"), a data-corruption corner.
    The fallback must NOT be the fold itself: a HigherOrderFunction is
    CodegenFallback, and one CodegenFallback branch anywhere in the
    expression takes the entire stage off the codegen path — measured
    24 s vs 2 s on the 25 M-pair SemDeDup scoring stage. The guarded
    a[i] accesses never see an out-of-range index, so they are
    ANSI-safe."""
    if dim is None:
        return dot(a, b)
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), _unrolled_dot(a, b, dim)
    ).otherwise(F.lit(None).cast("double"))


def _unrolled_sq_norm(a: Column, dim: int) -> Column:
    s: Column = F.lit(0.0)
    for i in range(dim):
        s = s + a[i] * a[i]
    return s


def norm_fast(a: Column, dim: int | None = None) -> Column:
    """l2_norm() with the same guarded codegen fast path as dot_fast
    (identical fold order: ((0.0 + a₀²) + a₁²) + … then sqrt); NULL for
    non-dim rows — such rows' cosines are NULL either way, and a fold
    fallback would take the stage off codegen (see dot_fast)."""
    if dim is None:
        return l2_norm(a)
    return F.when(F.size(a) == dim, F.sqrt(_unrolled_sq_norm(a, dim))).otherwise(
        F.lit(None).cast("double")
    )


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for one query: one scan + global top-k
    (Spark's TakeOrderedAndProject — per-partition heaps, no full sort).
    Deterministic tie-break on id."""
    q = _lit_vec(query_vec)
    # the query norm is a Python-side constant — folding the literal
    # array per row would cost an extra interpreted HOF pass per row
    qn = float(sum(x * x for x in query_vec) ** 0.5)
    scored = df.select(
        F.col(id_col),
        # nullif: a zero-norm vector has no cosine — NULL, excluded below
        # (Spark would otherwise rank NaN ABOVE every real score)
        F.round(
            dot(F.col(vec_col), q)
            / F.nullif(l2_norm(F.col(vec_col)) * F.lit(qn), F.lit(0.0)),
            6,
        ).alias("cos_sim"),
    )
    return (
        scored.filter(F.col("cos_sim").isNotNull())
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _assign_to_centroids(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    backend: str = "expr",
) -> DataFrame:
    """Nearest-centroid assignment as a PURE MAP-SIDE PROJECTION: the tiny
    centroid frame (it was broadcast-sized by contract already) is
    collected to driver-side literals, each data row scores all centroids
    into a sims array of per-centroid literal-dot columns and takes the
    argmax with array_max/array_position. No join, no row inflation, no
    shuffle, no sort, no aggregate — the previous row_number()-over-
    (partitionBy id) plan shuffled AND sorted a ~num_centroids×-inflated
    frame for an argmax (VERDICT r3 'what's wrong' #2), and the r4-r5
    broadcast-row + transform(__cents) shape re-ran the whole per-row
    transform once per consumer after CollapseProject inlined it into
    array_max AND array_position (gotcha 8) — measured 3.8 s vs 0.7 s
    for this shape at 20 k rows × 8 centroids.

    Ties: centroids ride sorted by id and array_position returns the FIRST
    index of the max, so ties go to the smallest centroid_id — the old
    desc-sim/asc-id window order. Centroid norms are precomputed in the
    broadcast row; the data vector's norm is materialized once per row
    (not once per centroid — CLAUDE.md gotcha 8).

    backend="arrow": one NumPy GEMM (batch × dim @ dim × centroids) +
    argmax per Arrow batch inside mapInPandas — np.argmax takes the first
    max, matching the array_position tie rule over id-sorted centroids.
    The production setting when assignment itself is matmul-bound (IVF
    k-means sweeps over 10^9 vectors); GEMM summation order can flip an
    argmax only for FP-level near-ties (standard Arrow disclosure)."""
    if backend == "arrow":
        from pyspark.sql import types as T

        crows = centroids.orderBy("centroid_id").collect()
        # centroid_id keeps the centroid frame's own id type (ivf uses
        # vector ids as seeds -> bigint; LCG centroids -> int). Fresh
        # StructType: .add() would MUTATE df's cached schema object and
        # poison df.columns with the phantom output column.
        out_schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField("centroid_id", centroids.schema["centroid_id"].dataType)]
        )
        return df.mapInPandas(
            _assign_gemm(
                [int(r["centroid_id"]) for r in crows],
                [list(r["centroid_vec"]) for r in crows],
                vec_col,
            ),
            out_schema,
        )
    # Centroids are tiny by contract (they were broadcast before);
    # collecting them to Python LITERALS lets the whole per-row scoring
    # compile under whole-stage codegen — the previous broadcast-row +
    # transform(__cents, …) shape evaluated an INTERPRETED cosine fold
    # per (row × centroid), and CollapseProject inlined the __sims
    # transform into array_max AND array_position, re-running it per
    # reference (gotcha 8). Norms are Python floats: the left-assoc
    # Python sum replays l2_norm's fold order bit-for-bit on IEEE
    # doubles, so every score is unchanged.
    crows = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    cvecs = [[float(x) for x in r["centroid_vec"]] for r in crows]
    cnorms = [float(sum(x * x for x in v) ** 0.5) for v in cvecs]
    cids = [r["centroid_id"] for r in crows]
    vnorm = F.col("__vnorm")
    sims = F.array(
        *[
            # nullif+coalesce: a zero-norm data vector scores -2 against
            # every centroid -> deterministic first-centroid assignment,
            # identical to the arrow kernel's nan_to_num(-2).
            # dot (fold) against the literal vector, NOT the unrolled
            # chain: in this flat projection the interpreted fold
            # measured 0.67 s vs 4.1 s for the unrolled variant at 20 k
            # rows × 8 centroids (the unrolled chain only wins inside
            # the BroadcastHashJoin pair stage — OPTIMIZATION_r06.md)
            F.coalesce(
                dot(F.col(vec_col), _lit_vec(cvecs[i]))
                / F.nullif(vnorm * F.lit(cnorms[i]), F.lit(0.0)),
                F.lit(-2.0),
            )
            for i in range(len(cvecs))
        ]
    )
    staged = df.withColumn("__vnorm", l2_norm(F.col(vec_col))).withColumn(
        "__sims", sims
    )
    best_idx = F.array_position("__sims", F.array_max("__sims"))
    # ties: sims rides in centroid_id order and array_position returns
    # the FIRST index of the max -> smallest centroid_id, as before.
    # Cast each literal to the centroid frame's own id type (ivf seeds
    # centroids with bigint vec_ids; LCG centroids are int) so the
    # output schema is exactly what the broadcast-row shape produced.
    ctype = centroids.schema["centroid_id"].dataType
    cid_arr = F.array(*[F.lit(c).cast(ctype) for c in cids])
    return staged.withColumn(
        "centroid_id", F.element_at(cid_arr, best_idx.cast("int"))
    ).drop("__vnorm", "__sims")


def _assign_gemm(cids, cvecs, vec_col: str):
    """mapInPandas kernel factory for _assign_to_centroids(backend=
    'arrow'): GEMM against the (id-sorted) centroid matrix + first-max
    argmax per batch; passes every input column through unchanged. Lazy
    per call (CLAUDE.md gotcha 3)."""

    def gen(batches):
        import numpy as np

        C = np.asarray(cvecs, dtype=np.float64)
        cn = np.sqrt((C * C).sum(axis=1))
        ci = np.asarray(cids, dtype=np.int64)  # Arrow downcasts to the declared type
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            an = np.sqrt((A * A).sum(axis=1))
            with np.errstate(invalid="ignore", divide="ignore"):
                S = (A @ C.T) / np.outer(an, cn)
            # zero-norm rows: -2 everywhere -> first centroid, same as expr
            S = np.nan_to_num(S, nan=-2.0)
            pdf = pdf.copy()
            pdf["centroid_id"] = ci[np.argmax(S, axis=1)]
            yield pdf

    return gen


def ivf_build(
    df: DataFrame,
    num_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_sweeps: int = 1,
    assign_backend: str = "expr",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse index. Seeds = the vectors with the `num_centroids`
    smallest ids, then `refine_sweeps` k-means sweeps: assign → recompute
    each centroid as the per-dimension mean of its members → re-assign.
    One sweep materially improves probe recall over raw seeds (measured in
    test_similarity). Returns (assigned_df with `centroid_id`, centroids_df).

    Scale shape: assignment is a broadcast of the tiny centroid frame; the
    mean recomputation is posexplode + groupBy over (centroid × dim) keys —
    map-side partial aggregation collapses it. At scale: write assigned_df
    partitioned by centroid_id; a probe then reads only nprobe partitions
    (partition pruning does the pruning)."""
    centroids = (
        df.orderBy(id_col)
        .limit(num_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
        )
    )
    for _ in range(refine_sweeps):
        assigned = _assign_to_centroids(df, centroids, vec_col, id_col, assign_backend)
        dim_means = (
            assigned.select(
                "centroid_id", F.posexplode(vec_col).alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("val").alias("m"))
        )
        # rebuild the mean vectors in dimension order (struct sort is
        # lexicographic: pos first) — empty clusters drop out naturally.
        # localCheckpoint truncates the sweep-over-sweep plan chain: each
        # sweep's centroids otherwise embed the previous sweep's whole
        # assignment plan, re-executing it per downstream materialization
        centroids = (
            dim_means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id", F.transform("pm", lambda s: s["m"]).alias("centroid_vec")
            )
            .localCheckpoint(eager=True)
        )
    assigned = _assign_to_centroids(df, centroids, vec_col, id_col, assign_backend)
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the nprobe nearest centroids, exact cosine within them.
    Centroid ranking happens on the tiny centroid frame (collected — it is
    the index metadata, not data)."""
    q = _lit_vec(query_vec)
    top_cents = [
        r["centroid_id"]
        for r in centroids.select(
            "centroid_id", cosine(F.col("centroid_vec"), q).alias("s")
        )
        .orderBy(F.desc("s"), F.asc("centroid_id"))
        .limit(nprobe)
        .collect()
    ]
    return (
        assigned.filter(F.col("centroid_id").isin(top_cents))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_write(assigned: DataFrame, path: str) -> None:
    """Persist the IVF-assigned corpus PARTITIONED BY centroid_id — the
    storage layout the probe path depends on: `ivf_search`'s
    `centroid_id.isin(probes)` filter becomes a partition filter at the
    file-listing level, so a probe reads only nprobe of num_centroids
    partitions (plan-gated in tests via PartitionFilters on the scan)."""
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivf_search_stored(
    spark,
    path: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a stored (centroid-partitioned) IVF index: identical semantics
    to ivf_search, but the isin(probe) filter prunes whole directories
    instead of scanning every row — the 100 TB shape where a probe touches
    nprobe/num_centroids of the corpus bytes."""
    assigned = spark.read.parquet(path)
    return ivf_search(assigned, centroids, query_vec, k, nprobe, vec_col, id_col)


def batch_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    backend: str = "expr",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of queries in one corpus pass:
    broadcast the (small) query frame, score every (corpus, query) pair
    map-side, keep the top k per query with a rank window keyed on
    query_id. One shuffle on query_id — per-query driver loops (Q jobs,
    Q corpus scans) become one job, one scan.

    Scale shape: the broadcast bounds the query batch (~10^4 queries ×
    dim doubles); for larger batches, chunk the queries and union —
    corpus scans stay O(batches), never O(queries). The per-query group
    is CORPUS-sized, so the rank uses the skew-safe two-stage window
    (plans/windows.top_rows_per_group): each map task keeps its own top k
    per query before the per-query ordering — no task ever sorts a
    corpus-sized group.

    backend: "expr" (default) scores pairs with column expressions —
    SQL-replayable, zero Python. "arrow" scores each Arrow batch of
    corpus rows against ALL queries as ONE NumPy/BLAS GEMM inside
    mapInPandas and keeps only each batch's per-query top k (same
    (cos desc, id asc) order as the global rank, so top-k containment
    holds) — the production setting for the matmul-bound regime.
    Requires integral ids; NumPy half-even rounding vs Spark HALF_UP can
    differ in the last 1e-6 digit (standard Arrow-kernel disclosure)."""
    from dataprofiler_spark.plans.windows import top_rows_per_group

    if backend == "arrow":
        for frame, col in ((corpus, id_col), (queries, query_id_col)):
            t = dict(frame.dtypes)[col]
            if t not in ("int", "bigint", "smallint", "tinyint"):
                raise ValueError(f"backend='arrow' needs an integral {col} (got {t})")
        qrows = queries.select(query_id_col, query_vec_col).collect()
        qtype = dict(queries.dtypes)[query_id_col]
        ctype = dict(corpus.dtypes)[id_col]
        cand = corpus.select(id_col, vec_col).mapInPandas(
            _batch_gemm_scorer(
                [r[0] for r in qrows],
                [list(r[1]) for r in qrows],
                k,
                id_col,
                vec_col,
                query_id_col,
            ),
            # schema follows the INPUT id types (Arrow downcasts the
            # kernel's int64 arrays) so expr and arrow return identical
            # schemas — the backend is a performance knob, not a cast
            f"{query_id_col} {qtype}, {id_col} {ctype}, cos_sim double",
        )
        scored = cand
    else:
        from dataprofiler_spark.operators.dedup import _spread_small_input

        # a single-row-group corpus file otherwise serializes the whole
        # pair scoring on one task — THE dominant cost of this entry at
        # sf1.0 (53.9 s single-task → ~3 s spread); no-op at real scale
        # (gotcha 45). The per-pair math stays the interpreted fold: in
        # the BroadcastNestedLoopJoin stage the fold measured 2.75 s vs
        # 14 s for the unrolled codegen chain (the opposite of the
        # BroadcastHashJoin pair stage in semantic_dedup — codegen cost
        # is join-shape-specific; both measured, see OPTIMIZATION_r06.md)
        corpus = _spread_small_input(corpus)
        # norms once per corpus row and once per query — NOT per
        # (row × query) pair, which is what a per-pair cosine() would fold
        corpus_n = corpus.withColumn("__cn", l2_norm(F.col(vec_col)))
        queries_n = queries.withColumn("__qn", l2_norm(F.col(query_vec_col)))
        scored = corpus_n.crossJoin(F.broadcast(queries_n)).select(
            F.col(query_id_col),
            F.col(id_col),
            # nullif: zero-norm rows have no cosine -> NULL -> excluded
            # below, matching the arrow kernel's NaN masking
            F.round(
                dot(F.col(vec_col), F.col(query_vec_col))
                / F.nullif(F.col("__cn") * F.col("__qn"), F.lit(0.0)),
                6,
            ).alias("cos_sim"),
        ).filter(F.col("cos_sim").isNotNull())
    return top_rows_per_group(
        scored,
        [query_id_col],
        [F.desc("cos_sim"), F.asc(id_col)],
        k,
        rank_col="rank",
    ).select(query_id_col, id_col, "cos_sim", "rank")


def _batch_gemm_scorer(qids, qvecs, k: int, id_col: str, vec_col: str, query_id_col: str):
    """mapInPandas kernel factory for batch_topk(backend='arrow'): one
    GEMM per Arrow batch (batch_rows × dim @ dim × n_queries), then a
    per-query (cos desc, id asc) lexsort trim to k rows per batch — the
    map-local half of the two-stage top-k, so only k × n_batches
    candidate rows per query cross back to the JVM. Lazy per call: no
    pandas_udf at module import (CLAUDE.md gotcha 3)."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        if not qvecs:  # no queries: emit nothing
            return
        Q = np.asarray(qvecs, dtype=np.float64)
        qn = np.sqrt((Q * Q).sum(axis=1))
        qi = np.asarray(qids, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            an = np.sqrt((A * A).sum(axis=1))
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            with np.errstate(invalid="ignore", divide="ignore"):
                S = np.round((A @ Q.T) / np.outer(an, qn), 6)
            finite = np.isfinite(S)
            out_q, out_i, out_c = [], [], []
            for j in range(len(qi)):
                ok = finite[:, j]
                if not ok.any():
                    continue
                order = np.lexsort((ids[ok], -S[ok, j]))[:k]
                order = np.nonzero(ok)[0][order]
                out_q.append(np.full(len(order), qi[j], dtype=np.int64))
                out_i.append(ids[order])
                out_c.append(S[order, j])
            if not out_q:  # empty query batch: nothing to emit
                continue
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    id_col: np.concatenate(out_i),
                    "cos_sim": np.concatenate(out_c),
                }
            )

    return gen


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q", scale_col: str = "scale"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v|/127,
    q_i = round(v_i / scale) ∈ [-127, 127]. The storage/bandwidth workhorse
    of embedding pipelines — 4× smaller than float32, 8× than float64;
    cosine on dequantized vectors is within ~1e-3 of exact for
    unit-ish vectors.

    The scale is materialized as a COLUMN before the transform references
    it: putting the array_max subtree inside the per-element lambda would
    re-evaluate it once per element (gotcha: codegen inlines referenced
    subtrees). Zero vectors get scale 1e-12 (quantize to all-zero, no
    division by zero)."""
    scale = F.greatest(
        F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x))) / 127.0,
        F.lit(1e-12),
    )
    staged = df.withColumn(scale_col, scale)
    return staged.withColumn(
        out_col,
        F.transform(F.col(vec_col), lambda x: F.round(x / F.col(scale_col)).cast("int")),
    )


def dequantize_int8(
    df: DataFrame, q_col: str = "q", scale_col: str = "scale", out_col: str = "deq"
) -> DataFrame:
    return df.withColumn(
        out_col, F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col))
    )


def _hyperplane(dim: int, plane_id: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random hyperplane from a seeded LCG (no RNG
    state, reproducible across engine and tests)."""
    out, state = [], seed * 1_000_003 + plane_id
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append((state % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def lsh_cosine_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit string over num_planes
    projections. Cosine-similar vectors collide with high probability;
    candidate generation is then a bucket equi-join."""
    bits = [
        (dot(F.col(vec_col), _lit_vec(_hyperplane(dim, p, seed))) > 0).cast("int").cast("string")
        for p in range(num_planes)
    ]
    return df.withColumn("bucket", F.concat(*bits))


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-dup detection: LSH-bucket candidates, then
    exact cosine verification ≥ threshold — within-bucket only, the scale
    path for 'find semantic duplicates in the corpus'.

    Physical shape: groupBy(bucket) + sorted collect_list + in-expression
    pair expansion, NOT a bucket self-join — referencing the LSH-bucketed
    frame twice would recompute the num_planes-projection pipeline for both
    sides and shuffle the table twice; this shape computes projections once
    and shuffles once (plan-gated: one scan in tests). Members are sorted
    by id, so array order gives key1 < key2 for free, and each vector lives
    in exactly ONE bucket so pairs cannot repeat — no distinct needed.

    max_bucket_size drops degenerate hot buckets (e.g. zero-ish embeddings
    sharing a sign pattern) whose pair expansion is quadratic in one task —
    same cap + disclosure as the minhash/simhash paths."""
    b = lsh_cosine_buckets(df, dim, num_planes, vec_col, seed).select(
        F.col(id_col).alias("key"),
        F.col(vec_col).alias("v"),
        # one norm fold per VECTOR — cosine() per pair would fold both
        # sides' norms again for every candidate pair
        l2_norm(F.col(vec_col)).alias("nrm"),
        "bucket",
    )
    buckets = (
        b.groupBy("bucket")
        .agg(F.sort_array(F.collect_list(F.struct("key", "v", "nrm"))).alias("ms"))
        .filter((F.size("ms") > 1) & (F.size("ms") <= max_bucket_size))
    )
    # outer: size(ms) > 1 makes the expansion non-empty, and a plain
    # explode's inferred filter re-runs the pair transform (gotcha 43)
    pairs = buckets.select(
        F.explode_outer(
            F.flatten(
                F.expr(
                    "transform(ms, (x, i) -> transform(slice(ms, i + 2, size(ms)), "
                    "y -> struct(x.key AS key1, y.key AS key2, x.v AS v1, y.v AS v2, "
                    "x.nrm * y.nrm AS nn)))"
                )
            )
        ).alias("p")
    ).select(
        "p.key1",
        "p.key2",
        # nullif: zero-norm pairs have no cosine; NULL fails the threshold
        # filter on both backends (Spark treats NaN as the LARGEST double,
        # which would silently "match" zero vectors)
        F.round(
            dot(F.col("p.v1"), F.col("p.v2")) / F.nullif(F.col("p.nn"), F.lit(0.0)), 6
        ).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= threshold)


def _lcg_centroids(spark, dim: int, num_clusters: int, seed: int = 42) -> DataFrame:
    """Deterministic pseudo-random centroids from the seeded-LCG hyperplane
    family (plane-id namespace offset by 1000 so they never coincide with
    the LSH planes of the same seed). Data-independent by design: the
    oracle replays them as SQL literals (CLAUDE.md gotcha 19)."""
    rows = [(c, _hyperplane(dim, 1000 + c, seed)) for c in range(num_clusters)]
    return spark.createDataFrame(rows, "centroid_id int, centroid_vec array<double>")


def semantic_dedup(
    df: DataFrame,
    dim: int,
    num_clusters: int = 8,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    blocks_per_cluster: int = 4,
    centroids: DataFrame | None = None,
    pair_backend: str = "expr",
    assign_backend: str = "expr",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    embedding space, compute exact pairwise cosine WITHIN each cluster,
    and drop every vector that has a same-cluster neighbor with
    cos >= threshold and a smaller id (deterministic min-id survivor per
    near-duplicate neighborhood). Returns (id_col, centroid_id,
    is_survivor) for every input row.

    Clustering defaults to data-independent seeded-LCG centroids so the
    whole decision is SQL-replayable; pass `centroids` (e.g. from
    ivf_build's k-means) for data-dependent clusters in production.

    Scale shape: assignment is the broadcast map-side argmax (no shuffle);
    within-cluster pairwise — inherently quadratic per cluster, the
    SemDeDup contract — is distributed by hash-blocking each cluster into
    `blocks_per_cluster` blocks (block = xxhash64(id) % B, NO rank window,
    no table-sized sort group): every pair lives in exactly one block pair
    (bi <= bj), same-block pairs expand i<j within one array, cross-block
    pairs expand across two arrays, so the per-task buffer is bounded by
    cluster_size/B and tasks scale as clusters × B(B+1)/2. The blocked
    frame is localCheckpointed once — its two join sides and the same-block
    branch reread the materialized blocks, not the assignment pipeline
    (gotchas 16/24). Blocking choice never changes the answer (the pair
    SET is all within-cluster pairs), so the oracle replays semantics, not
    blocks.

    pair_backend: "expr" (default) scores pairs with pure column
    expressions — SQL-replayable, zero Python. "arrow" scores each block
    pair as ONE NumPy/BLAS matrix product inside mapInPandas and emits
    only the >= threshold hits from the kernel — the production setting
    for the matmul-bound regime (SemDeDup at 10^8+ vectors), where a
    per-pair interpreted fold is the bottleneck. Requires an integral
    id_col; NumPy's half-even rounding can differ from Spark's HALF_UP
    in the last 1e-6 digit for pairs landing exactly on a rounding
    boundary (same disclosure as every Arrow kernel here)."""
    from dataprofiler_spark.operators.dedup import _spread_small_input

    if centroids is None:
        centroids = _lcg_centroids(df.sparkSession, dim, num_clusters, seed)
    assigned = _assign_to_centroids(
        _spread_small_input(df.select(F.col(id_col), F.col(vec_col))),
        centroids, vec_col, id_col,
        assign_backend,
    ).select(F.col(id_col).alias("key"), F.col(vec_col).alias("v"), "centroid_id")
    # one norm PER VECTOR here, not three per pair below
    # (cosine() would recompute both sides' norms for every pair)
    blocked = (
        assigned.withColumn("nrm", norm_fast(F.col("v"), dim))
        .withColumn("block", F.pmod(F.xxhash64("key"), F.lit(blocks_per_cluster)))
        .groupBy("centroid_id", "block")
        .agg(F.sort_array(F.collect_list(F.struct("key", "v", "nrm"))).alias("ms"))
        # eager: the pair joins below may BROADCAST a side derived from
        # this frame, and concurrent broadcast subqueries race a lazy
        # checkpoint into double-computing the assignment (gotcha 44)
        .localCheckpoint(eager=True)
    )
    if pair_backend == "arrow":
        id_type = dict(df.dtypes)[id_col]
        if id_type not in ("int", "bigint", "smallint", "tinyint"):
            raise ValueError(
                f"pair_backend='arrow' needs an integral {id_col} (got {id_type})"
            )
        a = blocked.select(
            "centroid_id", F.col("block").alias("ba"), F.col("ms").alias("ma")
        )
        b = blocked.select(
            "centroid_id", F.col("block").alias("bb"), F.col("ms").alias("mb")
        )
        joined = (
            a.join(b, "centroid_id")
            .filter(F.col("ba") <= F.col("bb"))
            .select("ba", "bb", "ma", "mb")
        )
        pairs = joined.mapInPandas(
            _arrow_pair_scorer(threshold), "key1 long, key2 long, cos_sim double"
        )
    else:
        # Pair expansion as two equi-JOINS over the exploded members —
        # every operator in the pair path is whole-stage-codegen. The
        # r4-r5 shape (nested transform(slice(ms, …)) building pair
        # structs, then an interpreted cosine fold per pair) walked
        # ~128 interpreted tree nodes per pair: measured 103 s for the
        # 25 M-pair stage at 20 k vectors where this shape takes seconds
        # (OPTIMIZATION_r06.md). The pair SET is identical: sorted-array
        # i<j expansion ≡ key1<key2 within a block; (ba<bb, x∈ma, y∈mb)
        # ≡ the block-target join below. Scale bound preserved: both
        # joins are keyed on (centroid_id, block), so a build/sort group
        # is one BLOCK of one cluster (cluster_size/B), never a cluster.
        mem = blocked.select(
            "centroid_id", "block", F.explode("ms").alias("m")
        ).select(
            "centroid_id",
            "block",
            F.col("m.key").alias("key"),
            F.col("m.v").alias("v"),
            F.col("m.nrm").alias("nrm"),
        )
        a = mem.select(
            "centroid_id",
            "block",
            F.col("key").alias("key1"),
            F.col("v").alias("v1"),
            F.col("nrm").alias("n1"),
        )
        b = mem.select(
            "centroid_id",
            "block",
            F.col("key").alias("key2"),
            F.col("v").alias("v2"),
            F.col("nrm").alias("n2"),
        )
        same = a.join(b, ["centroid_id", "block"]).filter(
            F.col("key1") < F.col("key2")
        )
        # cross-block pairs: expand each left row to its TARGET blocks
        # (block+1 … B-1) and equi-join on (centroid_id, target block) —
        # the build side stays one block. explode drops the NULL the
        # when() yields for the last block (no empty-sequence corner);
        # the inferred generate filter (gotcha 43) re-evaluates only a
        # tiny int sequence, not a document chain.
        a_x = a.select(
            "centroid_id",
            F.explode(
                F.when(
                    F.col("block") < blocks_per_cluster - 1,
                    F.sequence(
                        F.col("block") + F.lit(1),
                        F.lit(blocks_per_cluster - 1),
                    ),
                )
            ).alias("block"),
            "key1",
            "v1",
            "n1",
        )
        cross = a_x.join(b, ["centroid_id", "block"])
        pairs = same.unionByName(cross).select(
            "key1",
            "key2",
            # nullif: zero-norm pairs have no cosine -> NULL -> no match,
            # identical to the arrow kernel's NaN >= threshold == False
            F.round(
                dot_fast(F.col("v1"), F.col("v2"), dim)
                / F.nullif(F.col("n1") * F.col("n2"), F.lit(0.0)),
                6,
            ).alias("cos_sim"),
        )
    dropped = (
        pairs.filter(F.col("cos_sim") >= threshold)
        .select(F.greatest("key1", "key2").alias("key"))
        .distinct()
    )
    # membership comes from the MATERIALIZED blocked frame (explode of the
    # checkpointed block lists), NOT from `assigned` — consuming assigned
    # again would re-execute the whole centroid-assignment pipeline
    # (second corpus scan + argmax pass) for the final join side
    membership = blocked.select(
        "centroid_id", F.explode("ms").alias("m")
    ).select(F.col("m.key").alias("key"), "centroid_id")
    return (
        membership
        .join(dropped.withColumn("__dropped", F.lit(True)), "key", "left")
        .select(
            F.col("key").alias(id_col),
            "centroid_id",
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("is_survivor"),
        )
    )


def _arrow_pair_scorer(threshold: float):
    """mapInPandas kernel factory for semantic_dedup(pair_backend='arrow'):
    each input row is one block pair (ba, bb, ma, mb); the kernel scores
    the whole block-vs-block cosine matrix as ONE NumPy/BLAS matmul and
    emits only pairs >= threshold — at 10^8+ vectors the per-pair work is
    a dense GEMM, which no interpreted expression fold approaches. The
    threshold filter runs INSIDE the kernel, so only near-duplicate hits
    (a tiny fraction of the quadratic pair space) cross Arrow back to the
    JVM. Created lazily per call: no pandas_udf at module import
    (CLAUDE.md gotcha 3)."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            k1s, k2s, css = [], [], []
            for ba, bb, ma, mb in zip(pdf["ba"], pdf["bb"], pdf["ma"], pdf["mb"]):
                A = np.asarray([e["v"] for e in ma], dtype=np.float64)
                na = np.asarray([e["nrm"] for e in ma], dtype=np.float64)
                ka = np.asarray([e["key"] for e in ma], dtype=np.int64)
                if ba == bb:
                    if len(ka) < 2:
                        continue
                    S = np.round((A @ A.T) / np.outer(na, na), 6)
                    iu, ju = np.triu_indices(len(ka), k=1)
                    s = S[iu, ju]
                    m = s >= threshold
                    k1s.append(ka[iu[m]])
                    k2s.append(ka[ju[m]])
                    css.append(s[m])
                else:
                    B = np.asarray([e["v"] for e in mb], dtype=np.float64)
                    nb = np.asarray([e["nrm"] for e in mb], dtype=np.float64)
                    kb = np.asarray([e["key"] for e in mb], dtype=np.int64)
                    S = np.round((A @ B.T) / np.outer(na, nb), 6)
                    ii, jj = np.nonzero(S >= threshold)
                    k1s.append(ka[ii])
                    k2s.append(kb[jj])
                    css.append(S[ii, jj])
            if k1s:
                yield pd.DataFrame(
                    {
                        "key1": np.concatenate(k1s),
                        "key2": np.concatenate(k2s),
                        "cos_sim": np.concatenate(css),
                    }
                )

    return gen


@dataclass
class PCAModel:
    """Fitted PCA: row-vector components (k × dim), population mean, and
    per-component explained variance (descending)."""

    mean: list[float]
    components: list[list[float]]
    explained_variance: list[float]
    whiten: bool = False


def _infer_vec_dim(df: DataFrame, vec_col: str, op: str) -> int:
    """Probe the first row's vector length for dim=None callers, with a
    clear validation error on an empty frame or a NULL leading vector
    (first()[0] would otherwise surface as an obscure TypeError)."""
    head = df.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError(
            f"{op}: cannot infer vector dim — input is empty or the first "
            f"'{vec_col}' is NULL; pass dim= explicitly or clean the input"
        )
    return len(head[0])


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    k: int = 8,
    whiten: bool = False,
) -> PCAModel:
    """Fit PCA over an embedding column with ONE distributed pass of
    partial moments: each Arrow batch contributes (n, Σx, ΣxxT) via a
    NumPy GEMM (X.T @ X — the gotcha-35 regime where the Arrow kernel is
    the scale path: the d² cross-moment matrix cannot be expressed as a
    hash aggregate without a d²-per-row explode), the driver merges the
    partition partials (a few hundred rows of d+d² doubles) and runs the
    d×d eigendecomposition locally — the standard big-data PCA shape
    (moments are associative ⇒ merge-safe, same family as
    operators/incremental.py partials).

    Returns the model only; projection is `pca_project` (map-side)."""
    import numpy as np
    from pyspark.sql import types as T

    if dim is None:
        dim = _infer_vec_dim(df, vec_col, "pca_fit")
    out_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(partials, out_schema).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in rows], axis=0).reshape(dim, dim)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T  # k × dim rows
    ev = np.maximum(eigvals[order], 0.0)
    return PCAModel(
        mean=mean.tolist(),
        components=comps.tolist(),
        explained_variance=ev.tolist(),
        whiten=whiten,
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project onto the fitted components — pure whole-stage-codegen
    arithmetic, zero shuffle: each output component is a literal-weighted
    sum of element_at terms (plain expressions, NOT an interpreted HOF
    fold — gotcha 15/33), centered with the model mean; whiten divides by
    σ. The components ride in the plan as literals (k·dim doubles — fine
    for k·dim ≲ 10⁴; larger models should broadcast + Arrow-GEMM like
    batch_topk's backend)."""
    import math

    comps = []
    for i, w in enumerate(model.components):
        term = None
        for j, wj in enumerate(w):
            if wj == 0.0:
                continue
            t = (F.element_at(F.col(vec_col), j + 1) - F.lit(model.mean[j])) * F.lit(wj)
            term = t if term is None else term + t
        c = term if term is not None else F.lit(0.0)
        if model.whiten:
            sd = math.sqrt(model.explained_variance[i]) or 1.0
            c = c / F.lit(sd)
        comps.append(c.cast("double"))
    return df.withColumn(out_col, F.array(*comps))


@dataclass
class PQModel:
    """Product-quantization codebook: `m` subspaces × `num_codes`
    centroids × (dim/m) floats. Codes are 0-based subspace-local."""

    m: int
    dsub: int
    centroids: list[list[list[float]]]


def _pq_lit_centroids(cents: list[list[list[float]]]) -> Column:
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in sub])
            for sub in cents
        ]
    )


def _pq_code_expr(subvec: Column, sub_col: Column, cents: list[list[list[float]]]) -> Column:
    """0-based nearest-centroid code for one (sub_id, subvec) row: the
    codebook rides as a plan literal (m·K·dsub doubles ≲ 10⁴ — no join,
    no shuffle); distances are an interpreted HOF fold over K candidates
    (K·dsub ≈ 10² mults/row; a GEMM backend à la _assign_gemm is the
    production knob if encode ever dominates)."""
    cands = F.element_at(_pq_lit_centroids(cents), (sub_col + 1).cast("int"))

    def _d2(c: Column) -> Column:
        return F.aggregate(
            F.zip_with(subvec, c, _sq_diff), F.lit(0.0), _acc_add
        )

    dists = F.transform(cands, _d2)
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _sq_diff(a: Column, b: Column) -> Column:
    # module-level HOF lambdas (gotcha 4)
    return (a - b) * (a - b)


def _acc_add(acc: Column, x: Column) -> Column:
    return acc + x


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    num_codes: int = 16,
    refine_sweeps: int = 1,
    dim: int | None = None,
) -> PQModel:
    """Train a PQ codebook: split each vector into `m` contiguous
    subspaces and k-means each subspace to `num_codes` centroids. Seeds =
    the vectors with the smallest ids (ivf_build's deterministic
    convention); every refine sweep runs ALL subspaces in ONE distributed
    pass (explode to (sub_id, subvec), assign against the literal
    codebook, per-(sub, code, dim) mean via hash aggregate) and collects
    only the m·K·dsub dimension means (≈10³ rows) to the driver."""
    if dim is None:
        dim = _infer_vec_dim(df, vec_col, "pq_train")
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    seed_rows = df.orderBy(id_col).limit(num_codes).select(vec_col).collect()
    if len(seed_rows) < num_codes:
        raise ValueError("pq_train: fewer vectors than num_codes")
    cents = [
        [[float(x) for x in r[0][j * dsub : (j + 1) * dsub]] for r in seed_rows]
        for j in range(m)
    ]
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("sub"),
                F.slice(F.col(vec_col), j * dsub + 1, dsub).alias("sv"),
            )
            for j in range(m)
        ]
    )
    for _ in range(refine_sweeps):
        exploded = (
            df.select(F.explode(subs).alias("e"))
            .select(F.col("e.sub").alias("sub"), F.col("e.sv").alias("sv"))
            .withColumn("code", _pq_code_expr(F.col("sv"), F.col("sub"), cents))
        )
        means = (
            exploded.select("sub", "code", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.avg("val").alias("mv"))
            .collect()
        )
        new = [[list(c) for c in sub] for sub in cents]  # empty codes keep seeds
        acc: dict[tuple[int, int], list[float]] = {}
        for r in means:
            acc.setdefault((r["sub"], r["code"]), [0.0] * dsub)[r["pos"]] = r["mv"]
        for (j, c), v in acc.items():
            new[j][c] = v
        cents = new
    return PQModel(m=m, dsub=dsub, centroids=cents)


def pq_encode(
    df: DataFrame,
    model: PQModel,
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Encode each vector as `m` subspace codes (array<int>) — pure
    map-side projection against the literal codebook, zero shuffle.
    Storage: m·log2(K) bits/vector (m=8, K=16 → 4 bytes) vs 4·dim bytes
    raw — the memory side of the ANN scale path."""
    codes = [
        _pq_code_expr(
            F.slice(F.col(vec_col), j * model.dsub + 1, model.dsub),
            F.lit(j),
            model.centroids,
        )
        for j in range(model.m)
    ]
    return df.withColumn(out_col, F.array(*codes))


def pq_search(
    encoded: DataFrame,
    model: PQModel,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the driver builds
    the m×K table of squared distances from each query SUBSPACE to each
    centroid; per row the approximate distance is m table lookups + adds
    (plain codegen arithmetic — no vector math touches the corpus), then
    TakeOrderedAndProject. Returns (id, adc_dist) ascending."""
    table = [
        [
            sum(
                (query_vec[j * model.dsub + t] - c[t]) ** 2
                for t in range(model.dsub)
            )
            for c in model.centroids[j]
        ]
        for j in range(model.m)
    ]
    lit_t = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in table])
    dist = None
    for j in range(model.m):
        term = F.element_at(
            F.element_at(lit_t, j + 1),
            (F.element_at(F.col(codes_col), j + 1) + 1).cast("int"),
        )
        dist = term if dist is None else dist + term
    return (
        encoded.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
