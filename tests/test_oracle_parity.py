"""Every registered query must match its DuckDB oracle at sf0.01 —
the local replica of the driver's CORRECTNESS gate."""

import pytest

from dataprofiler_spark.queries import oracle_sql, queries
from tests.oracle_utils import TESTDATA, compare

CASES = sorted(set(queries()) & set(oracle_sql()))


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, name):
    df = queries()[name](spark, TESTDATA)
    ok, msg = compare(df, oracle_sql()[name])
    assert ok, f"{name}: {msg}"
