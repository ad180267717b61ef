"""Format-agnostic source reading: identical engine results over
parquet/orc/csv/jsonl of the same table (the Spark analog of the
reference's 4-dialect connection factory), and the no-inference rule."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.profile import profile
from dataprofiler_spark.sources.tables import load_table, read_source

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF, "orders")


def _profile_rows(df):
    out = profile(df, "orders", columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    return sorted(map(tuple, out.collect()))


def test_same_profile_across_formats(spark, orders, tmp_path):
    base = _profile_rows(orders)
    schema = orders.schema
    # CSV cannot carry timestamp_ntz faithfully in this round-trip shape;
    # write the projected columns only (the compared surface)
    proj = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    pschema = proj.schema
    proj.write.mode("overwrite").orc(str(tmp_path / "orc"))
    proj.write.mode("overwrite").option("header", "true").csv(str(tmp_path / "csv"))
    proj.write.mode("overwrite").json(str(tmp_path / "jsonl"))

    base_proj = _profile_rows(proj)
    for fmt in ("orc", "csv", "jsonl"):
        df = read_source(spark, str(tmp_path / fmt), fmt, schema=pschema)
        assert _profile_rows(df) == base_proj, fmt
    assert base_proj == base  # projection did not change the profiled metrics


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="carries no schema"):
        read_source(spark, str(tmp_path), "csv")
    with pytest.raises(ValueError, match="unsupported format"):
        read_source(spark, str(tmp_path), "avro")


def test_load_table_spread_preserves_rows_and_parallelism(spark):
    """r6: load_table spreads single-row-group driver tables to
    defaultParallelism partitions (guarded; no-op when splits >= cores)
    without changing content, and spread=False returns the raw scan."""
    from pyspark.sql import functions as F

    from dataprofiler_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    spread = load_table(spark, sf, "documents")
    raw = load_table(spark, sf, "documents", spread=False)
    assert spread.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert raw.rdd.getNumPartitions() < spread.rdd.getNumPartitions()
    # identical multiset of rows (digest-sum is order-independent)
    dig = lambda df: df.select(  # noqa: E731
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert dig(spread) == dig(raw)
