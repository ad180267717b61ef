"""Reference-parity fixtures: the prod/uat users+products tables with the
reference's deliberate drift (FIXTURES.md §3; seeded data of
/root/reference/init-scripts/postgres/01-sample-data.sql:12-100, row counts
99/111 prod vs 80/90 uat per README.md:913-918).

Drift injected exactly as the reference describes: uat email becomes
nullable (with NULLs present), age gets more NULLs, salary range shifts,
uat adds middle_name (users) / sku + discount_percent (products), and drops
the unique email index (spec-level).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark.operators.compare import ColumnSpec, IndexSpec, TableSpec


def _users(spark: SparkSession, n: int, uat: bool, seed: int = 42) -> DataFrame:
    df = spark.range(1, n + 1)
    h = F.abs(F.xxhash64(F.lit(seed), F.col("id")))
    base_ts = F.lit(dt.datetime(2025, 1, 1))
    age_null_mod = 4 if uat else 10  # uat: more NULL ages (README.md:917)
    cols = {
        "id": F.col("id").cast("int"),
        "username": F.format_string("user_%03d", F.col("id")),
        "email": (
            F.when(h % 7 != 0, F.format_string("user_%03d@example.com", F.col("id")))
            if uat
            else F.format_string("user_%03d@example.com", F.col("id"))
        ),
        "age": F.when(h % age_null_mod != 0, (h % 42 + 21).cast("int")),
        "salary": F.when(
            h % 20 != 0,
            (F.round((h % 90000 + (20000 if uat else 30000)) / 100.0, 2)).cast(
                "decimal(12,2)" if uat else "decimal(10,2)"
            ),
        ),
        "is_active": (h % 10 != 0),  # ≈90% true
        "created_at": (base_ts + F.make_interval(days=(h % 365).cast("int"))).cast("timestamp"),
    }
    if uat:
        cols["middle_name"] = F.when(h % 3 == 0, F.format_string("M%02d", h % 50))
    out = df.select(*[c.alias(name) for name, c in cols.items()])
    return out


def gen_prod_users(spark: SparkSession) -> DataFrame:
    return _users(spark, 99, uat=False)


def gen_uat_users(spark: SparkSession) -> DataFrame:
    return _users(spark, 80, uat=True)


def prod_users_spec() -> TableSpec:
    return TableSpec(
        "users",
        columns={
            "id": ColumnSpec("id", "int", is_nullable=False),
            "username": ColumnSpec("username", "string", is_nullable=False, max_length=50),
            "email": ColumnSpec("email", "string", is_nullable=False, max_length=100),
            "age": ColumnSpec("age", "int"),
            "salary": ColumnSpec("salary", "decimal", precision=10, scale=2),
            "is_active": ColumnSpec("is_active", "boolean"),
            "created_at": ColumnSpec("created_at", "timestamp"),
        },
        primary_key=("id",),
        indexes=(IndexSpec("idx_users_email", ("email",), is_unique=True),),
    )


def uat_users_spec() -> TableSpec:
    base = prod_users_spec()
    cols = dict(base.columns)
    cols["email"] = ColumnSpec("email", "string", is_nullable=True, max_length=150)
    cols["salary"] = ColumnSpec("salary", "decimal", precision=12, scale=2)
    cols["middle_name"] = ColumnSpec("middle_name", "string", max_length=50)
    return TableSpec(
        "users", columns=cols, primary_key=("id",), indexes=()  # unique idx dropped
    )
