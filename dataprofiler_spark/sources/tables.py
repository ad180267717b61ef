"""Parquet table loading for the driver-provided testdata (TESTDATA.md).

Replaces the reference's catalog discovery + connection factory
(/root/reference/src/db/connection_factory.py:48-71): in Spark the schema
travels with the data, so "get_table_metadata" is just ``df.schema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def table_exists(sf_dir: str, name: str) -> bool:
    """Analog of the reference's table_exists catalog probe
    (/root/reference/src/db/postgres.py:43-75)."""
    return os.path.exists(os.path.join(sf_dir, f"{name}.parquet"))


def list_tables(sf_dir: str) -> list[str]:
    """Analog of list_tables inventory source, sorted
    (/root/reference/src/db/postgres.py:126-166)."""
    return sorted(
        f[: -len(".parquet")]
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
