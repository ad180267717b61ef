"""URL canonicalization, domain extraction, URL-level dedup, and
per-domain capping — the front of every web-crawl curation pipeline.

Web-scale corpora (Common Crawl derivatives: CCNet, RefinedWeb, FineWeb)
dedup at the URL level BEFORE content dedup: the same page is fetched
many times with differing tracking parameters, schemes, `www.` prefixes,
default ports, and trailing slashes. Canonicalizing first collapses
those refetches with a pure map-side expression — no content ever
shuffles — and the per-registered-domain cap keeps a single giant host
from dominating the training mix (the FineWeb per-domain cap).

Everything here is column expressions (no UDFs, no shuffle except the
final dedup groupBy / cap rank), and every step is deliberately
SQL-portable so the DuckDB oracle replays the normalization bit-exactly.

Normalization pipeline (documented order, each stage materialized as a
column per CLAUDE.md gotcha 8/29 — regexp chains referenced twice must
not re-evaluate):

1. trim; strip the fragment (`#...`).
2. split query off at the FIRST `?` (later `?` stay inside the query).
3. scheme := lowercased `^[A-Za-z][A-Za-z0-9+.-]*` before `://`,
   defaulting to `http` for scheme-less inputs.
4. hostport := lowercased authority (up to the first `/`); path = rest.
5. drop the scheme's default port (`:80` http, `:443` https).
6. drop a leading `www.`.
7. drop trailing `/` from the path.
8. query: split on `&`, drop empty params and tracking params
   (`utm_*`, `fbclid`, `gclid`, `msclkid`, `mc_cid`, `mc_eid`,
   `igshid`, `ref`, `ref_src`), sort the survivors, rejoin.
9. reassemble `scheme://host path ?query`.

The reference engine has no URL surface; this module is part of the
LLM-data-pipeline extension mandated by the survey (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# anchored pattern for a tracking query parameter (matched on the full
# `name=value` token, lowercased). Keep in sync with the oracle SQL.
TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref|ref_src)(=.*)?$"
)

# sample of multi-label public suffixes (the full PSL is a data file a
# deployment would broadcast; this subset keeps the op self-contained
# and the oracle literal). Keep in sync with registered_domain oracles.
MULTI_LABEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "co.in", "co.nz", "co.za", "co.kr",
    "com.br", "com.mx", "com.cn", "com.tw", "com.sg",
]


def with_normalized_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "norm_url",
    host_col: str | None = None,
) -> DataFrame:
    """Append the canonical form of `url_col` as `out_col` (and the
    canonical host as `host_col` if requested). Pure projection — a scan
    at 100 TB stays a scan; Catalyst folds the whole pipeline into one
    whole-stage-codegen stage."""
    u = F.trim(F.col(url_col))
    staged = df.withColumn("__u", F.regexp_replace(u, "#.*", ""))
    staged = staged.withColumns(
        {
            "__base": F.substring_index(F.col("__u"), "?", 1),
            "__q": F.when(
                F.instr(F.col("__u"), "?") > 0,
                F.expr("substring(__u, instr(__u, '?') + 1)"),
            ).otherwise(F.lit("")),
        }
    )
    staged = staged.withColumn(
        "__scheme",
        F.coalesce(
            F.nullif(
                F.lower(
                    F.regexp_extract(F.col("__base"), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
                ),
                F.lit(""),
            ),
            F.lit("http"),
        ),
    )
    staged = staged.withColumn(
        "__rest",
        F.when(
            F.instr(F.col("__base"), "://") > 0,
            F.expr("substring(__base, instr(__base, '://') + 3)"),
        ).otherwise(F.col("__base")),
    )
    staged = staged.withColumn(
        "__hostport", F.lower(F.substring_index(F.col("__rest"), "/", 1))
    )
    staged = staged.withColumn(
        "__path",
        F.regexp_replace(
            F.expr("substring(__rest, length(__hostport) + 1)"), "/+$", ""
        ),
    )
    staged = staged.withColumn(
        "__host",
        F.regexp_replace(
            F.when(
                F.col("__scheme") == "http",
                F.regexp_replace(F.col("__hostport"), ":80$", ""),
            )
            .when(
                F.col("__scheme") == "https",
                F.regexp_replace(F.col("__hostport"), ":443$", ""),
            )
            .otherwise(F.col("__hostport")),
            r"^www\.",
            "",
        ),
    )
    staged = staged.withColumn(
        "__qn",
        F.array_join(
            F.array_sort(
                F.filter(
                    F.split(F.col("__q"), "&"),
                    _keep_param,
                )
            ),
            "&",
        ),
    )
    norm = F.concat(
        F.col("__scheme"),
        F.lit("://"),
        F.col("__host"),
        F.col("__path"),
        F.when(F.col("__qn") != "", F.concat(F.lit("?"), F.col("__qn"))).otherwise(
            F.lit("")
        ),
    )
    out = staged.withColumn(out_col, norm)
    if host_col:
        out = out.withColumn(host_col, F.col("__host"))
    return out.drop(
        "__u", "__base", "__q", "__scheme", "__rest", "__hostport", "__path",
        "__host", "__qn",
    )


def _keep_param(p: Column) -> Column:
    # module-level (gotcha 4: default-arg capture breaks HOF arity)
    return (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE)


def registered_domain(host: str | Column) -> Column:
    """eTLD+1 of a host under the built-in suffix sample: the last THREE
    labels when the last two form a known multi-label public suffix
    (`bbc.co.uk`), else the last two (`example.com`); single-label hosts
    pass through. Pure expression, broadcast-free (the suffix sample is a
    literal array)."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    is_multi = F.array_contains(
        F.array(*[F.lit(s) for s in MULTI_LABEL_SUFFIXES]), last2
    )
    return (
        F.when((n >= 3) & is_multi, last3)
        .when(n >= 2, last2)
        .otherwise(h)
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    key_col: str = "doc_id",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """URL-level exact dedup: canonicalize, then one survivor per
    canonical URL (minimum key; ties impossible on a key column). The
    survivor's payload rides IN the min(struct) aggregate buffer
    (CLAUDE.md gotcha 36 — never join winners back), so the whole op is
    one map-side-combining hash aggregate over narrow rows: the scale
    path for 10^11 crawl records. Returns
    (norm_url, survivor_<key>, dup_count[, payload...])."""
    payload = payload_cols or []
    normed = with_normalized_url(df, url_col, "norm_url")
    win = F.min(F.struct(F.col(key_col), *[F.col(c) for c in payload]))
    agg = normed.groupBy("norm_url").agg(
        win.alias("__w"), F.count(F.lit(1)).alias("dup_count")
    )
    cols = [
        F.col("norm_url"),
        F.col(f"__w.{key_col}").alias(f"survivor_{key_col}"),
        F.col("dup_count"),
        *[F.col(f"__w.{c}").alias(c) for c in payload],
    ]
    return agg.select(*cols)


def domain_stats(
    df: DataFrame, url_col: str = "url", count_col: str = "n_docs"
) -> DataFrame:
    """Docs per registered domain — the blocklist / mix-audit view. One
    hash aggregate over a derived narrow column."""
    normed = with_normalized_url(df, url_col, "norm_url", host_col="host")
    return (
        normed.withColumn("domain", registered_domain("host"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias(count_col))
    )


def domain_cap_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    cap: int,
    salt: str = "",
    rank_col: str | None = None,
) -> DataFrame:
    """At most `cap` rows per domain, chosen by deterministic md5-hash
    rank with a key tie-break (same selection machinery as
    sampling.stratified_sample: stable across reruns / cluster sizes,
    supersets nest, SQL-replayable). Skew-safe: a mega-domain (the
    reason this op exists) would funnel through ONE rank-window task;
    plans.windows.top_rows_per_group's map-local pre-trim bounds every
    sort group at the scan split."""
    from dataprofiler_spark.plans.windows import top_rows_per_group

    hashed = df.withColumn(
        "__h", F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    )
    out = top_rows_per_group(
        hashed, [domain_col], [F.col("__h"), F.col(key_col)], cap, rank_col=rank_col
    )
    return out.drop("__h")


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    mode: str = "remove",
) -> DataFrame:
    """Drop (or flag, mode="flag") documents whose registered domain is in
    a blocklist — the UT1/adult/spam-list gate every crawl pipeline runs.
    `blocklist` has one `domain` column (eTLD+1, as produced by
    `registered_domain`). Broadcast anti-join on the derived domain: the
    corpus never shuffles, the blocklist (10^4–10^6 narrow rows) ships to
    every task. mode="flag" appends `blocked:boolean` instead of
    filtering (for funnel accounting)."""
    from pyspark.sql.functions import broadcast

    if mode not in ("remove", "flag"):
        raise ValueError(f"mode must be 'remove' or 'flag', got {mode!r}")
    # NOTE: "__host" would collide with the normalizer's internal staging
    # column (which it drops) — use a distinct name
    normed = with_normalized_url(df, url_col, "__nu", host_col="__bl_host")
    staged = normed.withColumn("__dom", registered_domain("__bl_host")).drop(
        "__nu", "__bl_host"
    )
    bl = broadcast(blocklist.select(F.col("domain").alias("__dom")).distinct())
    if mode == "remove":
        return staged.join(bl, on="__dom", how="anti").drop("__dom")
    flagged = staged.join(
        bl.withColumn("__blk", F.lit(True)), on="__dom", how="left"
    )
    return flagged.withColumn("blocked", F.coalesce(F.col("__blk"), F.lit(False))).drop(
        "__dom", "__blk"
    )
