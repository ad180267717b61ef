"""ANSI-SQL (DuckDB) oracle generators mirroring the engine's operators.

The driver contract (`__spark_entry__.py`) runs each Spark query AND the
matching SQL on the same parquet; these generators keep the two sides
mechanically in sync (same aliases, same rounding, same gating) so the
value-hash comparison is exact.
"""

from __future__ import annotations

# Static testdata schemas (TESTDATA.md tables are stable, seed=42).
# type strings use Spark simpleString() names; `kind` drives metric gating.
TESTDATA_SCHEMAS: dict[str, list[tuple[str, str]]] = {
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),  # Spark 4 reads parquet ts as NTZ
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp_ntz"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
}

NUMERIC = {"bigint", "int", "double", "float", "smallint", "tinyint", "decimal"}
MINMAX = NUMERIC | {"timestamp", "timestamp_ntz", "date"}


def profile_sql(
    table: str,
    group_by: str | None = None,
    columns: list[str] | None = None,
    where: str | None = None,
    schema: list[tuple[str, str]] | None = None,
) -> str:
    """UNION-ALL long-format profile matching operators/profile.profile():
    identical aliases, rounding (4dp proportions / 6dp numerics,
    reference metrics.py:404-413), and type gating (:193-229). `schema`
    overrides the static TESTDATA registry — used by the randomized
    differential tests to profile arbitrary generated tables."""
    schema = schema if schema is not None else TESTDATA_SCHEMAS[table]
    cols = [
        (c, t) for c, t in schema if c != group_by and (columns is None or c in columns)
    ]
    parts = []
    grp_sel = f"{group_by}, " if group_by else ""
    grp_by = f" GROUP BY {group_by}" if group_by else ""
    where_cl = f" WHERE {where}" if where else ""
    for c, t in cols:
        if t in MINMAX:
            mn, mx = f"CAST(MIN({c}) AS VARCHAR)", f"CAST(MAX({c}) AS VARCHAR)"
        else:
            mn = mx = "CAST(NULL AS VARCHAR)"
        if t in NUMERIC:
            avg = f"ROUND(AVG({c}), 6)"
            med = f"ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY {c}), 6)"
            sdp = f"ROUND(STDDEV_POP({c}), 6)"
            sds = f"ROUND(STDDEV_SAMP({c}), 6)"
        else:
            avg = med = sdp = sds = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"""SELECT {grp_sel}'{table}' AS table_name, '{c}' AS column_name, '{t}' AS data_type,
  COUNT(*) AS row_count,
  COUNT({c}) AS not_null_count,
  CASE WHEN COUNT(*) > 0 THEN ROUND(COUNT({c}) * 1.0 / COUNT(*), 4) END AS not_null_proportion,
  COUNT(DISTINCT {c}) AS distinct_count,
  CASE WHEN COUNT(*) > 0 THEN ROUND(COUNT(DISTINCT {c}) * 1.0 / COUNT(*), 4) END AS distinct_proportion,
  (COUNT(DISTINCT {c}) = COUNT({c}) AND COUNT({c}) > 0) AS is_unique,
  {mn} AS min_value, {mx} AS max_value,
  CAST({avg} AS DOUBLE) AS avg_value, CAST({med} AS DOUBLE) AS median_value,
  CAST({sdp} AS DOUBLE) AS stddev_pop, CAST({sds} AS DOUBLE) AS stddev_samp
FROM {table}{where_cl}{grp_by}"""
        )
    return "\nUNION ALL\n".join(parts)
