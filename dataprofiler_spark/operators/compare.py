"""Schema comparison + environment-vs-environment profile drift.

Reimplements the reference's canonical comparison semantics
(/root/reference/src/core/schema_comparator.py) for a Spark world:

* ColumnSpec.matches — field-wise compare with strict/lenient default
  handling (schema_comparator.py:36-58)
* semantic signatures for indexes / foreign keys / check constraints —
  name-insensitive set-diffs (:61-139)
* SchemaComparisonResult verdict: total_differences = Σ category diffs +
  (pk_match ? 0 : 1); is_match = total == 0 (:410-419) — the reference's
  per-object pass/fail, reused here as the schema-conformance verdict.

Spark/Iceberg has no PK/FK/index catalog, so the "declared side" is an
expectation spec (SURVEY.md §1.3); the live side is a DataFrame's StructType.
The env-vs-env profile comparison (dashboard app.py:416-447, 1094-1177) is a
full-outer join of two profile DataFrames — distributed, tiny inputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class ColumnSpec:
    """Declared column expectation (ColumnSchema parity,
    schema_comparator.py:15-58)."""

    name: str
    data_type: str
    is_nullable: bool = True
    default: str | None = None
    max_length: int | None = None
    precision: int | None = None
    scale: int | None = None

    def matches(self, other: "ColumnSpec", strict_defaults: bool = False) -> list[str]:
        """Returns the list of differing field names (empty = match).
        Type compare is case-insensitive (schema_comparator.py:40)."""
        diffs = []
        if self.data_type.lower() != other.data_type.lower():
            diffs.append("data_type")
        if self.is_nullable != other.is_nullable:
            diffs.append("is_nullable")
        if strict_defaults and (self.default or "") != (other.default or ""):
            diffs.append("default")
        for f_ in ("max_length", "precision", "scale"):
            if getattr(self, f_) != getattr(other, f_):
                diffs.append(f_)
        return diffs


@dataclass(frozen=True)
class IndexSpec:
    """Semantic signature ignores the index name
    (schema_comparator.py:61-83)."""

    name: str
    columns: tuple[str, ...]
    is_unique: bool = False
    index_type: str = "btree"

    def signature(self) -> tuple:
        return (self.columns, self.is_unique, self.index_type.lower())


@dataclass(frozen=True)
class ForeignKeySpec:
    """Signature = columns + referenced table/cols + actions, lowercased
    (schema_comparator.py:86-118)."""

    name: str
    columns: tuple[str, ...]
    referenced_table: str
    referenced_columns: tuple[str, ...]
    on_delete: str = "NO ACTION"
    on_update: str = "NO ACTION"

    def signature(self) -> tuple:
        return (
            self.columns,
            self.referenced_table.lower(),
            self.referenced_columns,
            self.on_delete.upper(),
            self.on_update.upper(),
        )


def normalize_expr(expr: str) -> str:
    """Whitespace/case normalization for check constraints
    (schema_comparator.py:133-136)."""
    return " ".join(expr.split()).upper()


@dataclass(frozen=True)
class TableSpec:
    table_name: str
    columns: dict[str, ColumnSpec] = field(default_factory=dict)
    primary_key: tuple[str, ...] = ()
    indexes: tuple[IndexSpec, ...] = ()
    foreign_keys: tuple[ForeignKeySpec, ...] = ()
    check_constraints: tuple[str, ...] = ()  # normalized expressions


@dataclass
class SchemaComparisonResult:
    """Verdict semantics of schema_comparator.py:230-348, 410-419."""

    table_name: str
    missing_in_target: list[str] = field(default_factory=list)
    missing_in_source: list[str] = field(default_factory=list)
    column_differences: dict[str, list[str]] = field(default_factory=dict)
    pk_match: bool = True
    index_differences: list[str] = field(default_factory=list)
    fk_differences: list[str] = field(default_factory=list)
    check_differences: list[str] = field(default_factory=list)

    @property
    def total_differences(self) -> int:
        return (
            len(self.missing_in_target)
            + len(self.missing_in_source)
            + len(self.column_differences)
            + len(self.index_differences)
            + len(self.fk_differences)
            + len(self.check_differences)
            + (0 if self.pk_match else 1)
        )

    @property
    def is_match(self) -> bool:
        return self.total_differences == 0


def compare_specs(
    source: TableSpec, target: TableSpec, strict_defaults: bool = False
) -> SchemaComparisonResult:
    """Full comparison per the reference's SchemaComparator.compare
    (schema_comparator.py:368-421): column set-diff + field-wise diff (SE1),
    ordered PK tuple equality (SE2), signature-based index/FK set-diffs
    (SE3/SE4), normalized check-expression set-diff (SE5)."""
    res = SchemaComparisonResult(source.table_name)
    s_cols, t_cols = set(source.columns), set(target.columns)
    res.missing_in_target = sorted(s_cols - t_cols)
    res.missing_in_source = sorted(t_cols - s_cols)
    for name in sorted(s_cols & t_cols):
        diffs = source.columns[name].matches(target.columns[name], strict_defaults)
        if diffs:
            res.column_differences[name] = diffs

    res.pk_match = source.primary_key == target.primary_key  # SE2 ordered tuple

    s_idx = {i.signature() for i in source.indexes}
    t_idx = {i.signature() for i in target.indexes}
    res.index_differences = sorted(str(s) for s in s_idx ^ t_idx)

    s_fk = {k.signature() for k in source.foreign_keys}
    t_fk = {k.signature() for k in target.foreign_keys}
    res.fk_differences = sorted(str(s) for s in s_fk ^ t_fk)

    s_ck = {normalize_expr(c) for c in source.check_constraints}
    t_ck = {normalize_expr(c) for c in target.check_constraints}
    res.check_differences = sorted(s_ck ^ t_ck)
    return res


_SPARK_TO_SPEC = {
    # Spark simpleString → (spec type, max_length/precision defaults)
    "string": "string",
    "int": "int",
    "bigint": "bigint",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "date": "date",
}


def spec_from_struct(table_name: str, schema: T.StructType) -> TableSpec:
    """Live-side spec discovered from a DataFrame schema — the rebuild's
    analog of information_schema discovery (postgres.py:106-111)."""
    cols = {}
    for f_ in schema.fields:
        simple = f_.dataType.simpleString()
        precision = scale = None
        if isinstance(f_.dataType, T.DecimalType):
            simple, precision, scale = "decimal", f_.dataType.precision, f_.dataType.scale
        cols[f_.name] = ColumnSpec(
            name=f_.name,
            data_type=_SPARK_TO_SPEC.get(simple, simple),
            is_nullable=f_.nullable,
            precision=precision,
            scale=scale,
        )
    return TableSpec(table_name=table_name, columns=cols)


def schema_conformance_verdict(
    df: DataFrame, expected: TableSpec, table_name: str
) -> tuple[bool, SchemaComparisonResult]:
    """Schema-conformance check for the validation suite: live StructType
    vs declared expectation; verdict = reference is_match (SE6)."""
    live = spec_from_struct(table_name, df.schema)
    # declared side may omit nullability info → compare only declared fields
    res = compare_specs(expected, live)
    return res.is_match, res


def spec_to_rows(spec: TableSpec) -> list[dict]:
    """schema_profiles sink rows (reference clickhouse.py:377-457 layout,
    incl. derived per-column is_pk / is_in_index / index_names / is_fk /
    fk_references lookups, clickhouse.py:396-416)."""
    idx_by_col: dict[str, list[str]] = {}
    for ix in spec.indexes:
        for c in ix.columns:
            idx_by_col.setdefault(c, []).append(ix.name)
    fk_by_col = {
        c: f"{fk.referenced_table}({','.join(fk.referenced_columns)})"
        for fk in spec.foreign_keys
        for c in fk.columns
    }
    return [
        {
            "table_name": spec.table_name,
            "column_name": c.name,
            "data_type": c.data_type,
            "is_nullable": c.is_nullable,
            "column_default": c.default,
            "max_length": c.max_length,
            "precision": c.precision,
            "scale": c.scale,
            "is_primary_key": c.name in spec.primary_key,
            "is_in_index": c.name in idx_by_col,
            "index_names": ",".join(idx_by_col.get(c.name, [])),
            "is_foreign_key": c.name in fk_by_col,
            "fk_references": fk_by_col.get(c.name),
        }
        for c in spec.columns.values()
    ]


# ---------------------------------------------------------------------------
# Schema objects: procedures / views / triggers with definition-hash drift
# (reference StoredProcedureSchema/ViewSchema/TriggerSchema,
# schema_comparator.py:140-199; unified schema_objects sink with an
# object_type discriminator, clickhouse.py:512-593; env-vs-env drift =
# latest-snapshot set-diff on (object_type, object_name) + hash compare for
# common objects, grafana schema_objects_comparison dashboard)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ProcedureSpec:
    """StoredProcedureSchema parity (schema_comparator.py:140-159)."""

    name: str
    schema_name: str = "default"
    language: str = ""
    parameter_list: str = ""
    return_type: str = ""
    definition_hash: str = ""

    object_type = "PROCEDURE"

    def signature(self) -> tuple:
        """Semantic identity beyond the name: changed language/params/
        return type/body all count as a difference."""
        return (
            self.language.lower(),
            " ".join(self.parameter_list.split()).lower(),
            self.return_type.lower(),
            self.definition_hash,
        )


@dataclass(frozen=True)
class ViewSpec:
    """ViewSchema parity (schema_comparator.py:161-177)."""

    name: str
    schema_name: str = "default"
    definition_hash: str = ""
    is_materialized: bool = False
    columns: str = ""

    object_type = "VIEW"

    def signature(self) -> tuple:
        return (self.definition_hash, self.is_materialized, self.columns.lower())


@dataclass(frozen=True)
class TriggerSpec:
    """TriggerSchema parity (schema_comparator.py:180-199)."""

    name: str
    table_name: str
    schema_name: str = "default"
    event: str = ""
    timing: str = ""
    definition_hash: str = ""

    object_type = "TRIGGER"

    def signature(self) -> tuple:
        return (
            self.table_name.lower(),
            self.event.upper(),
            self.timing.upper(),
            self.definition_hash,
        )


@dataclass
class ObjectComparisonResult:
    """Env-vs-env schema-object drift verdict: set-diff on
    (object_type, schema_name, name) + signature compare for common
    objects — the same three difference classes the reference dashboard
    counts (missing, extra, changed)."""

    missing_in_target: list[tuple[str, str, str]] = field(default_factory=list)
    missing_in_source: list[tuple[str, str, str]] = field(default_factory=list)
    changed: list[tuple[str, str, str]] = field(default_factory=list)

    @property
    def total_differences(self) -> int:
        return len(self.missing_in_target) + len(self.missing_in_source) + len(self.changed)

    @property
    def is_match(self) -> bool:
        return self.total_differences == 0


def compare_schema_objects(source: list, target: list) -> ObjectComparisonResult:
    """Compare two schema-object sets (any mix of Procedure/View/Trigger
    specs), keyed by (object_type, schema_name, name) — schema_name is part
    of the identity, so same-named objects in two schemas are two distinct
    objects, not one changed one."""
    s = {(o.object_type, o.schema_name, o.name): o.signature() for o in source}
    t = {(o.object_type, o.schema_name, o.name): o.signature() for o in target}
    res = ObjectComparisonResult()
    res.missing_in_target = sorted(set(s) - set(t))
    res.missing_in_source = sorted(set(t) - set(s))
    res.changed = sorted(k for k in set(s) & set(t) if s[k] != t[k])
    return res


def objects_to_rows(
    procedures: list[ProcedureSpec] = (),
    views: list[ViewSpec] = (),
    triggers: list[TriggerSpec] = (),
) -> list[dict]:
    """Unified schema_objects sink rows with the object_type discriminator
    (reference insert layout, clickhouse.py:541-585). `object_schema` is
    the owning schema of the OBJECT (part of its identity key) — named so
    because the store-level `schema_name` stamp column describes the STORE
    and would overwrite a row-level field of the same name."""
    rows = []
    for p in procedures:
        rows.append(
            {
                "object_type": "PROCEDURE", "object_schema": p.schema_name,
                "object_name": p.name,
                "parent_table": "", "language": p.language,
                "parameter_list": p.parameter_list, "return_type": p.return_type,
                "event": "", "timing": "", "is_materialized": False,
                "columns": "", "definition_hash": p.definition_hash,
            }
        )
    for v in views:
        rows.append(
            {
                "object_type": "VIEW", "object_schema": v.schema_name,
                "object_name": v.name,
                "parent_table": "", "language": "", "parameter_list": "",
                "return_type": "", "event": "", "timing": "",
                "is_materialized": v.is_materialized, "columns": v.columns,
                "definition_hash": v.definition_hash,
            }
        )
    for t in triggers:
        rows.append(
            {
                "object_type": "TRIGGER", "object_schema": t.schema_name,
                "object_name": t.name,
                "parent_table": t.table_name, "language": "",
                "parameter_list": "", "return_type": "", "event": t.event,
                "timing": t.timing, "is_materialized": False, "columns": "",
                "definition_hash": t.definition_hash,
            }
        )
    return rows


def schema_object_drift(env1: DataFrame, env2: DataFrame) -> DataFrame:
    """Distributed env-vs-env object drift over (object_type[,
    object_schema], object_name, definition_hash) frames: full-outer join
    with membership flags + hash_differs for common objects (the
    dashboard's three difference classes as one DataFrame). When both
    frames carry `object_schema` it joins as part of the identity key —
    same-named objects in two schemas are distinct objects."""
    a = env1.alias("a")
    b = env2.alias("b")
    with_schema = "object_schema" in env1.columns and "object_schema" in env2.columns
    cond = (F.col("a.object_type") == F.col("b.object_type")) & (
        F.col("a.object_name") == F.col("b.object_name")
    )
    if with_schema:
        cond = cond & F.col("a.object_schema").eqNullSafe(F.col("b.object_schema"))
    schema_cols = (
        [F.coalesce(F.col("a.object_schema"), F.col("b.object_schema")).alias("object_schema")]
        if with_schema
        else []
    )
    return a.join(b, cond, "full_outer").select(
        F.coalesce(F.col("a.object_type"), F.col("b.object_type")).alias("object_type"),
        *schema_cols,
        F.coalesce(F.col("a.object_name"), F.col("b.object_name")).alias("object_name"),
        F.col("a.object_name").isNotNull().alias("in_env1"),
        F.col("b.object_name").isNotNull().alias("in_env2"),
        F.col("a.definition_hash").alias("definition_hash_env1"),
        F.col("b.definition_hash").alias("definition_hash_env2"),
        F.when(
            F.col("a.object_name").isNotNull() & F.col("b.object_name").isNotNull(),
            F.col("a.definition_hash") != F.col("b.definition_hash"),
        ).alias("hash_differs"),
    )


def compare_profiles(
    profile_env1: DataFrame,
    profile_env2: DataFrame,
    key_cols: list[str] | None = None,
    metric_cols: list[str] | None = None,
) -> DataFrame:
    """Env-vs-env profile comparison (J2/A14; dashboard app.py:416-447,
    1094-1146): full-outer join on column_name with in_env1/in_env2 flags,
    per-metric difference flags, has_differences ordering first
    (app.py:1136-1139)."""
    key_cols = key_cols or ["column_name"]
    metric_cols = metric_cols or [
        "row_count",
        "not_null_proportion",
        "distinct_count",
        "distinct_proportion",
        "is_unique",
        "min_value",
        "max_value",
        "avg_value",
    ]
    e1 = profile_env1.select(
        *key_cols, *[F.col(m).alias(f"{m}_env1") for m in metric_cols]
    )
    e2 = profile_env2.select(
        *key_cols, *[F.col(m).alias(f"{m}_env2") for m in metric_cols]
    )
    j = e1.join(e2, key_cols, "full_outer")
    in1 = F.col(f"{metric_cols[0]}_env1").isNotNull()
    in2 = F.col(f"{metric_cols[0]}_env2").isNotNull()
    diff_flags = [
        (~F.col(f"{m}_env1").eqNullSafe(F.col(f"{m}_env2"))).alias(f"{m}_differs")
        for m in metric_cols
    ]
    out = j.select(
        *key_cols,
        in1.alias("in_env1"),
        in2.alias("in_env2"),
        *[F.col(f"{m}_env1") for m in metric_cols],
        *[F.col(f"{m}_env2") for m in metric_cols],
        *diff_flags,
    )
    has_diff = None
    for m in metric_cols:
        flag = F.col(f"{m}_differs")
        has_diff = flag if has_diff is None else (has_diff | flag)
    return out.withColumn("has_differences", has_diff).orderBy(
        F.desc("has_differences"), *key_cols
    )


def comparison_summary(comparison: DataFrame) -> DataFrame:
    """Drift counts (A14; app.py:1141-1146): total / matching / different /
    only_env1 / only_env2."""
    return comparison.agg(
        F.count(F.lit(1)).alias("total_columns"),
        F.sum(
            F.when(F.col("in_env1") & F.col("in_env2") & ~F.col("has_differences"), 1).otherwise(0)
        ).alias("matching_columns"),
        F.sum(
            F.when(F.col("in_env1") & F.col("in_env2") & F.col("has_differences"), 1).otherwise(0)
        ).alias("different_columns"),
        F.sum(F.when(F.col("in_env1") & ~F.col("in_env2"), 1).otherwise(0)).alias("only_in_env1"),
        F.sum(F.when(~F.col("in_env1") & F.col("in_env2"), 1).otherwise(0)).alias("only_in_env2"),
    )
