"""Local replica of the driver's Spark-vs-DuckDB comparison:
row count + column-name set + order-insensitive value comparison."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TESTDATA = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str = TESTDATA) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"f:{int(v)}"
        return f"f:{v!r}"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, sql: str, sf_dir: str = TESTDATA) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    con = duck_connection(sf_dir)
    dk = con.execute(sql).df()
    con.close()
    if sorted(sp.columns) != sorted(dk.columns):
        return False, f"schema mismatch: spark={sorted(sp.columns)} duck={sorted(dk.columns)}"
    if len(sp) != len(dk):
        return False, f"row count mismatch: spark={len(sp)} duck={len(dk)}"
    a, b = canonical_rows(sp), canonical_rows(dk)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
