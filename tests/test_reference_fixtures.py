"""End-to-end parity on the reference's own fixture shape: profile the
prod/uat users tables and detect exactly the drift the reference seeds
(01-sample-data.sql; expected comparisons per README.md:909-918)."""

import pytest

from dataprofiler_spark.operators.compare import (
    compare_profiles,
    compare_specs,
    comparison_summary,
)
from dataprofiler_spark.operators.profile import profile
from dataprofiler_spark.sources.reference_fixtures import (
    gen_prod_users,
    gen_uat_users,
    prod_users_spec,
    uat_users_spec,
)


@pytest.fixture(scope="module")
def profiles(spark):
    prod = profile(gen_prod_users(spark), "users")
    uat = profile(gen_uat_users(spark), "users")
    return prod, uat


def test_prod_profile_semantics(spark, profiles):
    p = {r.column_name: r for r in profiles[0].collect()}
    assert p["id"].row_count == 99  # README.md:913 row counts
    assert p["id"].is_unique is True
    assert p["email"].is_unique is True and p["email"].not_null_proportion == 1.0
    assert p["is_active"].is_unique is False
    assert p["is_active"].distinct_count == 2
    assert p["age"].not_null_proportion < 1.0  # seeded NULLs
    assert p["salary"].avg_value is not None  # decimal profiled as numeric


def test_uat_drift_detected_in_data(spark, profiles):
    prod, uat = profiles
    u = {r.column_name: r for r in uat.collect()}
    assert u["id"].row_count == 80
    assert u["email"].not_null_proportion < 1.0  # uat emails nullable+NULLs
    p = {r.column_name: r for r in prod.collect()}
    assert u["age"].not_null_proportion < p["age"].not_null_proportion  # more NULLs

    cmp_df = compare_profiles(prod, uat)
    rows = {r.column_name: r for r in cmp_df.collect()}
    assert rows["middle_name"].in_env2 and not rows["middle_name"].in_env1
    assert rows["email"].has_differences
    s = comparison_summary(cmp_df).collect()[0]
    assert s.only_in_env2 == 1 and s.total_columns == 8


def test_uat_drift_detected_in_schema_spec(spark):
    res = compare_specs(prod_users_spec(), uat_users_spec())
    assert not res.is_match
    assert res.missing_in_source == ["middle_name"]
    assert set(res.column_differences["email"]) == {"is_nullable", "max_length"}
    assert set(res.column_differences["salary"]) == {"precision"}
    assert len(res.index_differences) == 1  # dropped unique email index
    # SE6 verdict arithmetic (schema_comparator.py:410-419)
    assert res.total_differences == 4
