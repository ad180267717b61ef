"""Schema-comparator semantics parity (schema_comparator.py) and
env-vs-env profile comparison shape (app.py:1094-1177)."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.compare import (
    ColumnSpec,
    ForeignKeySpec,
    IndexSpec,
    TableSpec,
    compare_profiles,
    compare_specs,
    comparison_summary,
    normalize_expr,
    schema_conformance_verdict,
    spec_from_struct,
)
from dataprofiler_spark.operators.profile import profile


def _users_spec(**drift):
    """prod.users-shaped spec (reference 01-sample-data.sql:12-100)."""
    cols = {
        "id": ColumnSpec("id", "int", is_nullable=False),
        "username": ColumnSpec("username", "string", is_nullable=False, max_length=50),
        "email": ColumnSpec("email", "string", is_nullable=False, max_length=100),
        "age": ColumnSpec("age", "int"),
        "salary": ColumnSpec("salary", "decimal", precision=10, scale=2),
    }
    cols.update(drift)
    return TableSpec(
        "users",
        columns=cols,
        primary_key=("id",),
        indexes=(IndexSpec("idx_email", ("email",), is_unique=True),),
        foreign_keys=(ForeignKeySpec("fk_dept", ("dept_id",), "departments", ("id",)),),
        check_constraints=("age >= 0",),
    )


def test_identical_specs_match():
    res = compare_specs(_users_spec(), _users_spec())
    assert res.is_match and res.total_differences == 0  # SE6 verdict :410-419


def test_uat_drift_detected():
    """email length 100→150 + nullable, extra column, missing index —
    the reference's seeded uat drift (README.md:913-918)."""
    uat = _users_spec(
        email=ColumnSpec("email", "string", is_nullable=True, max_length=150),
        middle_name=ColumnSpec("middle_name", "string", max_length=50),
    )
    uat = TableSpec(
        "users", uat.columns, primary_key=("id",),
        indexes=(), foreign_keys=_users_spec().foreign_keys,
        check_constraints=("age >= 0",),
    )
    res = compare_specs(_users_spec(), uat)
    assert not res.is_match
    assert res.missing_in_source == ["middle_name"]
    assert set(res.column_differences["email"]) == {"is_nullable", "max_length"}
    assert len(res.index_differences) == 1  # SE3 signature diff
    assert res.total_differences == 3


def test_pk_tuple_order_matters():
    a, b = _users_spec(), _users_spec()
    b = TableSpec("users", b.columns, primary_key=("username", "id"),
                  indexes=a.indexes, foreign_keys=a.foreign_keys,
                  check_constraints=a.check_constraints)
    res = compare_specs(a, b)
    assert not res.pk_match and res.total_differences == 1  # SE2


def test_index_signature_name_insensitive():
    a = _users_spec()
    renamed = TableSpec(
        "users", a.columns, a.primary_key,
        indexes=(IndexSpec("completely_different_name", ("email",), is_unique=True),),
        foreign_keys=a.foreign_keys, check_constraints=a.check_constraints,
    )
    assert compare_specs(a, renamed).is_match  # :77-79 signature ignores name


def test_check_constraint_normalization():
    assert normalize_expr("age   >=\n 0") == "AGE >= 0"  # :133-136
    a = _users_spec()
    b = TableSpec("users", a.columns, a.primary_key, a.indexes, a.foreign_keys,
                  check_constraints=("AGE   >= 0",))
    assert compare_specs(a, b).is_match


def test_schema_conformance_against_dataframe(spark):
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    expected = TableSpec("t", columns={
        "id": ColumnSpec("id", "int"),
        "name": ColumnSpec("name", "string"),
    })
    ok, res = schema_conformance_verdict(df, expected, "t")
    assert ok, res.__dict__
    # live side discovered from StructType (S1 analog)
    live = spec_from_struct("t", df.schema)
    assert live.columns["id"].data_type == "int"


def test_profile_comparison_and_summary(spark):
    env1 = spark.createDataFrame([(1, "x", 10.0), (2, "y", 20.0)], "id int, name string, v double")
    env2 = spark.createDataFrame([(1, "x", 10.0), (2, None, None)], "id int, name string, w double")
    p1 = profile(env1, "t")
    p2 = profile(env2, "t")
    cmp_df = compare_profiles(p1, p2)
    rows = {r.column_name: r for r in cmp_df.collect()}
    assert rows["v"].in_env1 and not rows["v"].in_env2  # J2 membership flags
    assert rows["w"].in_env2 and not rows["w"].in_env1
    assert rows["name"].has_differences  # distinct values differ
    assert not rows["id"].has_differences
    s = comparison_summary(cmp_df).collect()[0]
    assert s.total_columns == 4
    assert s.only_in_env1 == 1 and s.only_in_env2 == 1
    assert s.matching_columns == 1 and s.different_columns == 1


def test_schema_object_comparison():
    """Object set-diff + definition-hash drift (reference
    schema_comparator.py:140-199 object model; dashboard set-diff/hash
    semantics): missing / extra / changed classes."""
    from dataprofiler_spark.operators.compare import (
        ObjectComparisonResult,
        ProcedureSpec,
        TriggerSpec,
        ViewSpec,
        compare_schema_objects,
    )

    src = [
        ProcedureSpec("sp_load", language="sql", definition_hash="aaa"),
        ViewSpec("v_orders", definition_hash="bbb"),
        TriggerSpec("trg_audit", table_name="orders", event="INSERT",
                    timing="AFTER", definition_hash="ccc"),
    ]
    tgt = [
        ProcedureSpec("sp_load", language="sql", definition_hash="aaa"),  # same
        ViewSpec("v_orders", definition_hash="CHANGED"),  # hash drift
        ViewSpec("v_new", definition_hash="ddd"),  # only in target
    ]
    res = compare_schema_objects(src, tgt)
    assert res.missing_in_target == [("TRIGGER", "default", "trg_audit")]
    assert res.missing_in_source == [("VIEW", "default", "v_new")]
    assert res.changed == [("VIEW", "default", "v_orders")]
    assert res.total_differences == 3 and not res.is_match
    # name collision across types is NOT a match: keys include object_type
    assert compare_schema_objects(
        [ViewSpec("x", definition_hash="h")], [ProcedureSpec("x", definition_hash="h")]
    ).total_differences == 2
    # same-named objects in two schemas are two distinct objects (identity
    # includes schema_name), not one changed object
    two_schemas = compare_schema_objects(
        [ViewSpec("v", schema_name="sales", definition_hash="h1")],
        [ViewSpec("v", schema_name="hr", definition_hash="h2")],
    )
    assert two_schemas.changed == []
    assert two_schemas.missing_in_target == [("VIEW", "sales", "v")]
    assert two_schemas.missing_in_source == [("VIEW", "hr", "v")]
    assert ObjectComparisonResult().is_match


def test_schema_object_drift_dataframe(spark):
    from dataprofiler_spark.operators.compare import schema_object_drift

    e1 = spark.createDataFrame(
        [("VIEW", "v1", "h1"), ("VIEW", "v2", "h2")],
        "object_type string, object_name string, definition_hash string",
    )
    e2 = spark.createDataFrame(
        [("VIEW", "v1", "h1"), ("VIEW", "v2", "DIFFERENT"), ("TRIGGER", "t1", "h3")],
        "object_type string, object_name string, definition_hash string",
    )
    rows = {(r.object_type, r.object_name): r for r in schema_object_drift(e1, e2).collect()}
    assert rows[("VIEW", "v1")].hash_differs is False
    assert rows[("VIEW", "v2")].hash_differs is True
    t1 = rows[("TRIGGER", "t1")]
    assert (t1.in_env1, t1.in_env2, t1.hash_differs) == (False, True, None)
