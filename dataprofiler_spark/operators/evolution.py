"""Schema-evolution compatibility verdicts.

The reference compares schemas for DRIFT (what changed between envs —
compare.py); production pipelines also need the forward question: can the
NEW schema still read data written under the OLD one (Iceberg/parquet
schema evolution)? This module classifies every column change and renders
a single can-read verdict, with the compatibility rules parquet/Iceberg
actually guarantee:

- widening within a numeric family is safe (byte→short→int→long,
  float→double) plus int-or-smaller→double (exactly representable);
- long→double and int→float are NOT safe (mantissa narrower than the
  integer range — silent precision loss) and classify as breaking;
- added nullable columns are safe (old files read NULL), added required
  columns are breaking (old rows have no value to satisfy the contract);
- dropping a column breaks readers that referenced it; relaxing
  nullability is safe, tightening is breaking (old data may hold NULLs).

Works on live StructTypes (nested structs flattened to dotted paths) AND
on the stored `schema_profiles` sink rows, so the MetricsStore's snapshot
history doubles as an evolution audit trail (evolution_from_store). Pure
schema computation — no jobs beyond reading the profile rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# canonical numeric names across typeName() / simpleString() / SQL DDL
_CANON = {
    "tinyint": "byte", "byte": "byte",
    "smallint": "short", "short": "short",
    "int": "integer", "integer": "integer",
    "bigint": "long", "long": "long",
    "float": "float", "real": "float",
    "double": "double",
}
_INT_RANK = {"byte": 1, "short": 2, "integer": 3, "long": 4}
_FLOAT_RANK = {"float": 1, "double": 2}


def _flatten(schema: T.StructType, prefix: str = "") -> dict[str, tuple[str, bool]]:
    out: dict[str, tuple[str, bool]] = {}
    for f in schema.fields:
        name = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.update(_flatten(f.dataType, f"{name}."))
        else:
            out[name] = (f.dataType.simpleString(), f.nullable)
    return out


def _is_widening(old: str, new: str) -> bool:
    o = _CANON.get(old.lower(), old.lower())
    n = _CANON.get(new.lower(), new.lower())
    if o in _INT_RANK and n in _INT_RANK:
        return _INT_RANK[n] > _INT_RANK[o]
    if o in _FLOAT_RANK and n in _FLOAT_RANK:
        return _FLOAT_RANK[n] > _FLOAT_RANK[o]
    # integers up to int are exact in a double (2^53 > 2^31); long is not
    if o in _INT_RANK and n == "double":
        return _INT_RANK[o] <= _INT_RANK["integer"]
    return False


def _same_type(a: str, b: str) -> bool:
    return _CANON.get(a.lower(), a.lower()) == _CANON.get(b.lower(), b.lower())


@dataclass(frozen=True)
class ColumnEvolution:
    column: str
    change: str  # unchanged|widened|type_changed|removed|added_nullable|
    #              added_required|nullable_relaxed|nullable_tightened
    old_type: str | None
    new_type: str | None
    breaking: bool


def _classify(
    o: dict[str, tuple[str, bool]], n: dict[str, tuple[str, bool]]
) -> list[ColumnEvolution]:
    out: list[ColumnEvolution] = []
    for name in sorted(set(o) | set(n)):
        if name not in n:
            out.append(ColumnEvolution(name, "removed", o[name][0], None, True))
            continue
        if name not in o:
            nt, nullable = n[name]
            change = "added_nullable" if nullable else "added_required"
            out.append(ColumnEvolution(name, change, None, nt, not nullable))
            continue
        (ot, onull), (nt, nnull) = o[name], n[name]
        if _same_type(ot, nt):
            if bool(onull) == bool(nnull):
                out.append(ColumnEvolution(name, "unchanged", ot, nt, False))
            elif nnull:  # False -> True
                out.append(ColumnEvolution(name, "nullable_relaxed", ot, nt, False))
            else:
                out.append(ColumnEvolution(name, "nullable_tightened", ot, nt, True))
        elif _is_widening(ot, nt):
            out.append(ColumnEvolution(name, "widened", ot, nt, False))
        else:
            out.append(ColumnEvolution(name, "type_changed", ot, nt, True))
    return out


def schema_evolution(
    old: T.StructType, new: T.StructType
) -> list[ColumnEvolution]:
    """Per-column change classification between two schemas (nested fields
    as dotted paths). Unchanged columns are included so the result is a
    complete audit row set."""
    return _classify(_flatten(old), _flatten(new))


def can_read_old_with_new(
    old: T.StructType, new: T.StructType
) -> tuple[bool, list[ColumnEvolution]]:
    """(verdict, breaking changes): True iff every change is a safe
    evolution under the rules in the module docstring."""
    rows = schema_evolution(old, new)
    breaking = [r for r in rows if r.breaking]
    return (not breaking, breaking)


def evolution_from_store(
    schema_profiles: DataFrame, table_name: str
) -> list[ColumnEvolution] | None:
    """Evolution verdict between the two LATEST stored schema snapshots of
    `table_name` in the schema_profiles sink (S9 rows: column_name,
    data_type, is_nullable, scan_time). Returns None with fewer than two
    snapshots. The profile frame is schema-sized — the collect is rows ×
    columns of metadata, never data."""
    from pyspark.sql import functions as F

    rows = (
        schema_profiles.filter(F.col("table_name") == table_name)
        .select("column_name", "data_type", "is_nullable", "scan_time")
        .collect()
    )
    times = sorted({r.scan_time for r in rows})
    if len(times) < 2:
        return None
    old = {
        r.column_name: (r.data_type, bool(r.is_nullable))
        for r in rows
        if r.scan_time == times[-2]
    }
    new = {
        r.column_name: (r.data_type, bool(r.is_nullable))
        for r in rows
        if r.scan_time == times[-1]
    }
    return _classify(old, new)
