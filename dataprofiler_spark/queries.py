"""Named query registry backing `__spark_entry__.py`.

Each entry: name -> (spark_callable(spark, sf_dir) -> DataFrame, oracle_sql
string or None). Every computed column is aliased identically on both sides
(driver hash-compares after sorting columns by name).

Operator coverage map (SURVEY.md §2): profiles cover A1-A11 + P1/P2 gating;
uniqueness/RI cover A6/J5; W2 is the latest-snapshot window; SE/J2-J4 are the
set-diff / drift joins; A15 adds the histogram/PSI/chi² drift the north_star
requires.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataprofiler_spark.operators.profile import profile
from dataprofiler_spark.oracle import profile_sql
from dataprofiler_spark.sources.tables import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


# --------------------------------------------------------------------------
# Column profiling (A1-A11; reference metrics.py:232-414 in ONE pass)
# --------------------------------------------------------------------------

@register("profile_documents", profile_sql("documents"))
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(load_table(spark, sf_dir, "documents"), "documents")


@register("profile_orders", profile_sql("orders"))
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(load_table(spark, sf_dir, "orders"), "orders")


@register(
    "profile_lineitem_by_returnflag",
    profile_sql("lineitem", group_by="l_returnflag"),
)
def profile_lineitem_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition profile: the grouped variant of the single pass that
    drives per-partition verdicts (north_rule)."""
    return profile(
        load_table(spark, sf_dir, "lineitem"), "lineitem", group_by=["l_returnflag"]
    )


# --------------------------------------------------------------------------
# Uniqueness + referential integrity as data checks (A6 upgrade, J5)
# --------------------------------------------------------------------------

@register(
    "uniqueness_duplicates_orders_custkey",
    """SELECT o_custkey AS key, COUNT(*) AS duplicate_count
FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1""",
)
def uniqueness_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation groups for a uniqueness check (reference verdict
    semantics metrics.py:287, upgraded to emit the violating keys)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("duplicate_count"))
        .filter(F.col("duplicate_count") > 1)
    )


@register(
    "ri_orphans_orders_customer",
    """SELECT o.o_custkey AS key, COUNT(*) AS orphan_rows
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
GROUP BY o.o_custkey""",
)
def ri_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RI violation rows: broadcast left-anti join child→parent (the
    reference only records FKs as metadata, schema_extractor.py:231-278)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("orphan_rows"))
    )


# --------------------------------------------------------------------------
# W2: latest-snapshot-per-key window (reference app.py:251-287, 627-645)
# --------------------------------------------------------------------------

@register(
    "latest_event_per_user",
    """SELECT user_id, event_id AS latest_event_id, event_type AS latest_event_type
FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_event_type"),
        )
    )


# --------------------------------------------------------------------------
# Dashboard rollup (A13; reference app.py:163-181)
# --------------------------------------------------------------------------

@register(
    "rollup_events_by_type",
    """SELECT event_type, COUNT(*) AS event_count,
  COUNT(DISTINCT user_id) AS distinct_users,
  ROUND(AVG(value), 6) AS avg_value,
  CAST(MAX(ts) AS VARCHAR) AS last_seen
FROM events GROUP BY event_type""",
)
def rollup_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.count_distinct("user_id").alias("distinct_users"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.max("ts").cast("string").alias("last_seen"),
    )


# --------------------------------------------------------------------------
# Histogram + drift building blocks (A15, north_star PSI/chi²)
# --------------------------------------------------------------------------

@register(
    "histogram_n_chars",
    """SELECT CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS bucket, COUNT(*) AS cnt
FROM documents GROUP BY 1""",
)
def histogram_n_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        (F.floor(F.col("n_chars") / 100) * 100).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "inventory_drift_langs",
    """WITH a AS (SELECT DISTINCT lang FROM documents WHERE doc_id % 2 = 0),
     b AS (SELECT DISTINCT lang FROM documents WHERE doc_id % 2 = 1)
SELECT COALESCE(a.lang, b.lang) AS lang,
       a.lang IS NOT NULL AS in_env1, b.lang IS NOT NULL AS in_env2
FROM a FULL OUTER JOIN b ON a.lang = b.lang""",
)
def inventory_drift_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Env-vs-env set drift via full-outer join with membership flags
    (reference app.py:416-447 column merge; grafana inventory drift J3/J4)."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0).select("lang").distinct().alias("a")
    b = docs.filter(F.col("doc_id") % 2 == 1).select("lang").distinct().alias("b")
    return a.join(b, F.col("a.lang") == F.col("b.lang"), "full_outer").select(
        F.coalesce(F.col("a.lang"), F.col("b.lang")).alias("lang"),
        F.col("a.lang").isNotNull().alias("in_env1"),
        F.col("b.lang").isNotNull().alias("in_env2"),
    )


@register(
    "growth_slope_events",
    """SELECT event_type,
  ROUND(COVAR_POP(EPOCH(ts) / 86400.0, value) / VAR_POP(EPOCH(ts) / 86400.0), 6)
    AS slope_per_day
FROM events GROUP BY event_type""",
)
def growth_slope_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form linear-regression slope (replaces the reference's
    scipy.stats.linregress at autoincrement_metrics.py:78-125):
    slope = covar_pop(x,y)/var_pop(x) — pure aggregates, no UDF."""
    events = load_table(spark, sf_dir, "events")
    # NTZ → LTZ is identity under the UTC session TZ; LTZ → double = epoch secs
    days = F.col("ts").cast("timestamp").cast("double") / 86400.0
    return events.groupBy("event_type").agg(
        F.round(F.covar_pop(days, F.col("value")) / F.var_pop(days), 6).alias(
            "slope_per_day"
        )
    )
