"""Schema-evolution compatibility verdicts (operators/evolution.py) —
pure schema computation, no Spark jobs."""

from pyspark.sql import types as T

from dataprofiler_spark.operators.evolution import (
    can_read_old_with_new,
    schema_evolution,
)


def _s(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


def test_safe_evolutions():
    old = _s(("a", T.IntegerType(), True), ("b", T.FloatType(), False))
    new = _s(
        ("a", T.LongType(), True),        # int -> long: widened
        ("b", T.DoubleType(), True),      # float -> double + relax: widened
        ("c", T.StringType(), True),      # added nullable
    )
    ok, breaking = can_read_old_with_new(old, new)
    assert ok and breaking == []
    changes = {r.column: r.change for r in schema_evolution(old, new)}
    assert changes == {"a": "widened", "b": "widened", "c": "added_nullable"}


def test_breaking_evolutions():
    old = _s(
        ("a", T.LongType(), True),
        ("b", T.IntegerType(), True),
        ("c", T.StringType(), True),
        ("d", T.StringType(), True),
    )
    new = _s(
        ("a", T.DoubleType(), True),   # long -> double: LOSSY, breaking
        ("b", T.FloatType(), True),    # int -> float: LOSSY, breaking
        ("c", T.StringType(), False),  # nullable tightened: breaking
        # d removed: breaking
        ("e", T.LongType(), False),    # added REQUIRED: breaking
    )
    ok, breaking = can_read_old_with_new(old, new)
    assert not ok
    kinds = {r.column: r.change for r in breaking}
    assert kinds == {
        "a": "type_changed",
        "b": "type_changed",
        "c": "nullable_tightened",
        "d": "removed",
        "e": "added_required",
    }


def test_nested_struct_flattening():
    old = T.StructType(
        [
            T.StructField(
                "meta",
                T.StructType([T.StructField("w", T.IntegerType(), True)]),
                True,
            )
        ]
    )
    new = T.StructType(
        [
            T.StructField(
                "meta",
                T.StructType([T.StructField("w", T.StringType(), True)]),
                True,
            )
        ]
    )
    ok, breaking = can_read_old_with_new(old, new)
    assert not ok and breaking[0].column == "meta.w"
    assert breaking[0].change == "type_changed"


def test_identical_schema_all_unchanged():
    s = _s(("x", T.StringType(), True), ("y", T.LongType(), False))
    rows = schema_evolution(s, s)
    assert all(r.change == "unchanged" and not r.breaking for r in rows)
    assert can_read_old_with_new(s, s)[0] is True


def test_evolution_from_store(spark, tmp_path):
    """The schema_profiles sink history doubles as an evolution audit:
    two appended snapshots -> verdict between the LATEST two."""
    from dataprofiler_spark.operators.compare import spec_from_struct
    from dataprofiler_spark.operators.evolution import evolution_from_store
    from dataprofiler_spark.sinks import MetricsStore

    store = MetricsStore(spark, str(tmp_path / "m"), application="t", environment="e")
    store.init()
    v1 = _s(("a", T.IntegerType(), True), ("b", T.StringType(), True))
    v2 = _s(("a", T.LongType(), True), ("c", T.StringType(), True))
    store.append_schema_profile(spec_from_struct("docs", v1), scan_time=1000.0)
    store.append_schema_profile(spec_from_struct("docs", v2), scan_time=2000.0)

    rows = evolution_from_store(store.read("schema_profiles"), "docs")
    kinds = {r.column: r.change for r in rows}
    assert kinds["a"] == "widened"       # int -> bigint via stored strings
    assert kinds["b"] == "removed"
    assert kinds["c"] == "added_nullable"
    # fewer than two snapshots -> None
    assert evolution_from_store(store.read("schema_profiles"), "nope") is None
