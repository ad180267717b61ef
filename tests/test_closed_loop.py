"""The reference's closed-loop pipeline (§3.3: sink is also a source):
growth snapshots append to the metrics store, a later run reads them back
as regression history; schema-profile rows land in the store sink."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.compare import ColumnSpec, IndexSpec, TableSpec, spec_to_rows
from dataprofiler_spark.operators.growth import growth_profile, growth_profile_to_row
from dataprofiler_spark.sinks import MetricsStore


def test_growth_closed_loop(spark, tmp_path):
    store = MetricsStore(spark, str(tmp_path))
    store.init()

    # five daily scans appending capacity snapshots (sink as source,
    # reference autoincrement_metrics.py:155-212)
    base = 1_700_000_000.0
    for day in range(5):
        df = spark.range(1, 1001 + day * 100).selectExpr("cast(id as int) as id")
        p = growth_profile(df, "id", "int")
        row = growth_profile_to_row(p, "events", "id")
        schema = (
            "table_name string, column_name string, current_value long, "
            "max_type_value long, usage_percentage double, remaining_values long, "
            "daily_growth_rate double, days_until_full double, alert_status string"
        )
        store.append(
            "auto_increment_metrics",
            spark.createDataFrame([tuple(row.values())], schema),
            scan_time=base + day * 86400,
        )

    history = store.read("auto_increment_metrics", table_name="events").select(
        "scan_time", F.col("current_value").cast("double").alias("current_value")
    )
    assert history.count() == 5
    df_now = spark.range(1, 1401).selectExpr("cast(id as int) as id")
    p = growth_profile(df_now, "id", "int", history=history)
    assert 95 <= p.growth_rate_per_day <= 105  # 100 ids/day slope recovered
    assert p.days_until_full == round(p.remaining_values / p.growth_rate_per_day, 2)


def test_schema_profile_rows_to_store(spark, tmp_path):
    spec = TableSpec(
        "users",
        columns={
            "id": ColumnSpec("id", "int", is_nullable=False),
            "email": ColumnSpec("email", "string", max_length=100),
        },
        primary_key=("id",),
        indexes=(IndexSpec("idx_email", ("email",), is_unique=True),),
    )
    rows = spec_to_rows(spec)
    assert {r["column_name"]: r["is_primary_key"] for r in rows} == {"id": True, "email": False}
    assert next(r for r in rows if r["column_name"] == "email")["index_names"] == "idx_email"

    schema = (
        "table_name string, column_name string, data_type string, is_nullable boolean, "
        "column_default string, max_length int, precision int, scale int, "
        "is_primary_key boolean, is_in_index boolean, index_names string, "
        "is_foreign_key boolean, fk_references string"
    )
    store = MetricsStore(spark, str(tmp_path))
    store.append(
        "validation_verdicts",
        spark.createDataFrame([tuple(r.values()) for r in rows], schema),
    )  # reuse generic sink
    got = store.read("validation_verdicts")
    assert got.count() == 2 and "is_primary_key" in got.columns
