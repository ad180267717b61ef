"""Declarative expectation suite over profile metrics."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.expectations import (
    DEFAULT_SEQUENCE_EXPECTATIONS,
    Expectation,
    evaluate_expectations,
    from_dicts,
)
from dataprofiler_spark.operators.profile import profile
from dataprofiler_spark.sources import gen_sequences


def test_expectations_on_clean_and_bad(spark):
    clean_p = profile(gen_sequences(spark, 3000), "sequences", group_by=["source"])
    v = evaluate_expectations(clean_p, DEFAULT_SEQUENCE_EXPECTATIONS, part_col="source")
    assert v.filter("NOT passed").count() == 0

    bad_p = profile(gen_sequences(spark, 3000, violations=True), "sequences", group_by=["source"])
    vb = evaluate_expectations(bad_p, DEFAULT_SEQUENCE_EXPECTATIONS, part_col="source")
    failed = {(r.partition_value, r.check_name) for r in vb.filter("NOT passed").collect()}
    # web: injected duplicate doc_ids → uniqueness expectation fails
    assert ("web", "expect_doc_id_is_unique_==") in failed
    # null doc_ids spread by hash → not_null_proportion < 1 somewhere
    assert any(c == "expect_doc_id_not_null_proportion_>=" for _, c in failed)


def test_between_and_null_metric_fails(spark):
    df = spark.createDataFrame([("a", None), ("b", None)], "name string, v int")
    p = profile(df, "t")
    # avg of all-null column is NULL → expectation on it must FAIL, not pass
    ex = [Expectation("v", "avg_value", "between", 0.0, 10.0)]
    v = evaluate_expectations(p, ex).collect()
    assert len(v) == 1 and v[0].passed is False


def test_from_dicts_config(spark):
    specs = [
        {"column": "n_tok", "metric": "row_count", "op": ">", "value": 0},
        {"column": "n_tok", "metric": "avg_value", "op": "between", "value": 1.0, "value_hi": 10000.0},
    ]
    exs = from_dicts(specs)
    p = profile(gen_sequences(spark, 500), "t")
    v = evaluate_expectations(p, exs)
    assert v.count() == 2 and v.filter("NOT passed").count() == 0


def test_missing_column_fails_loudly(spark):
    """A typo'd column name must produce a FAILING verdict, not silence."""
    p = profile(gen_sequences(spark, 200), "t")
    v = evaluate_expectations(p, [Expectation("no_such_col", "row_count", ">", 0)]).collect()
    assert len(v) == 1
    assert v[0].passed is False
    assert v[0].table_name == "<missing_column>"


def test_stringified_minmax_compares_numerically(spark):
    """min_value/max_value are stringified in the profile; a numeric
    expectation must compare numerically — lexicographic '9' >= '10' was
    True for the wrong reason."""
    from dataprofiler_spark.operators.expectations import Expectation, evaluate_expectations

    prof = spark.createDataFrame(
        [("t", "n_tok", 100, "9", "120")],
        "table_name string, column_name string, row_count long, min_value string, max_value string",
    )
    failing = evaluate_expectations(prof, [Expectation("n_tok", "min_value", ">=", 10)])
    assert failing.collect()[0].passed is False  # 9 < 10 numerically
    passing = evaluate_expectations(prof, [Expectation("n_tok", "min_value", ">=", "9")])
    assert passing.collect()[0].passed is True
    between = evaluate_expectations(
        prof, [Expectation("n_tok", "max_value", "between", 100, 130)]
    )
    assert between.collect()[0].passed is True


def test_suggest_expectations_roundtrip(spark):
    """Generated suite must pass on the profile it was generated from, and
    catch a regression (nulls injected / bound exceeded) on a later snapshot."""
    from dataprofiler_spark.operators.expectations import (
        evaluate_expectations,
        suggest_expectations,
    )
    from dataprofiler_spark.operators.profile import profile
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"u{i}", float(i % 50)) for i in range(200)],
        "id bigint, name string, score double",
    )
    prof = profile(df, "t")
    suite = suggest_expectations(prof)
    names = {e.name for e in suite}
    assert "expect_id_row_count_>" in names
    assert "expect_id_is_unique_==" in names
    assert any("min_value" in n for n in names)  # numeric bounds emitted
    assert not any(e.metric in ("min_value", "max_value") and e.column == "name"
                   for e in suite)  # no bounds for non-numeric columns
    v1 = evaluate_expectations(prof, suite)
    assert all(r.passed for r in v1.collect())

    # regression snapshot: nulls in name, score above the learned max
    bad = df.withColumn(
        "name", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("name"))
    ).withColumn("score", F.col("score") + 100.0)
    v2 = {r.check_name: r.passed for r in
          evaluate_expectations(profile(bad, "t"), suite).collect()}
    assert v2["expect_name_not_null_proportion_>="] is False
    assert v2["expect_score_max_value_<="] is False
    assert v2["expect_id_is_unique_=="] is True


def test_suggest_expectations_grouped_conservative(spark):
    """Grouped profile: the suite reduces across groups conservatively
    (worst null rate, loosest bounds, unique only if unique in EVERY group)."""
    from dataprofiler_spark.operators.expectations import suggest_expectations
    from dataprofiler_spark.operators.profile import profile

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 7, 50.0), ("b", 7, None)],
        "g string, k bigint, v double",
    )
    suite = {(e.column, e.metric, e.op): e
             for e in suggest_expectations(profile(df, "t", group_by=["g"]))}
    assert suite[("v", "not_null_proportion", ">=")].value == 0.5  # worst group
    assert ("k", "is_unique", "==") not in suite  # dup in group b
    assert suite[("k", "min_value", ">=")].value == 1.0
    assert suite[("k", "max_value", "<=")].value == 7.0
