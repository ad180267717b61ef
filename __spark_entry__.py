"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the single-pass, per-partition column profile
                (the reference needs ≤3 serial full scans PER COLUMN for
                the same result, /root/reference/src/core/metrics.py:232-414).
queries()     — one entry per implemented operator (SURVEY.md §2), each
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — matching DuckDB SQL with identical column aliases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataprofiler_spark import queries as _q
from dataprofiler_spark.operators.profile import profile
from dataprofiler_spark.sources.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: profile every column of `documents` per source partition
    in ONE multi-aggregate DataFrame pass (A1-A11 of SURVEY.md §2.4)."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return profile(docs, "documents", group_by=["source"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
