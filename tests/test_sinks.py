"""Metrics store: append-only month-partitioned sinks, tenancy + time-range
reads (S6), latest-snapshot-per-key (W2), inventory drift (J3/J4)."""

import time

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.profile import profile
from dataprofiler_spark.sinks import MetricsStore
from dataprofiler_spark.sources import gen_sequences


def test_append_only_and_latest_snapshot(spark, tmp_path):
    store = MetricsStore(spark, str(tmp_path), environment="prod")
    store.init()
    df = gen_sequences(spark, 500)
    p = profile(df, "sequences", columns=["n_tok"])
    t0 = time.time()
    store.append("data_profiles", p, scan_time=t0 - 86400)  # yesterday
    store.append("data_profiles", p, scan_time=t0)  # today

    allrows = store.read("data_profiles")
    assert allrows.count() == 2  # append-only, both snapshots kept

    latest = store.latest_snapshot("data_profiles", ["table_name", "column_name"])
    assert latest.count() == 1  # W2: one row per key
    assert latest.collect()[0].scan_time.timestamp() == pytest.approx(t0, abs=2)

    recent = store.read("data_profiles", since_days=0.5)
    assert recent.count() == 1  # time-range read drops yesterday's row


def test_tenancy_isolation(spark, tmp_path):
    prod = MetricsStore(spark, str(tmp_path), environment="prod")
    uat = MetricsStore(spark, str(tmp_path), environment="uat")
    df = profile(gen_sequences(spark, 200), "t", columns=["n_tok"])
    prod.append("data_profiles", df)
    uat.append("data_profiles", df)
    assert prod.read("data_profiles").count() == 1  # P6 tenancy filter
    assert uat.read("data_profiles").count() == 1


def test_partitioned_by_month(spark, tmp_path):
    store = MetricsStore(spark, str(tmp_path))
    store.append("data_profiles", profile(gen_sequences(spark, 100), "t", columns=["n_tok"]))
    import os

    dirs = os.listdir(f"{tmp_path}/data_profiles")
    assert any(d.startswith("scan_month=") for d in dirs)  # F6 layout


def test_inventory_drift(spark, tmp_path):
    prod = MetricsStore(spark, str(tmp_path / "p"), environment="prod")
    uat = MetricsStore(spark, str(tmp_path / "u"), environment="uat")
    prod.init(), uat.init()
    prod.append_inventory(["users", "products", "orders"])
    uat.append_inventory(["users", "products", "legacy_tmp"])
    drift = {r.table_name: (r.in_env1, r.in_env2) for r in prod.inventory_drift(uat).collect()}
    assert drift["users"] == (True, True)
    assert drift["orders"] == (True, False)  # J4 anti
    assert drift["legacy_tmp"] == (False, True)
