"""Schema-evolution compatibility verdicts.

The reference compares schemas for DRIFT (what changed between envs —
compare.py); production pipelines also need the forward question: can the
NEW schema still read data written under the OLD one (Iceberg/parquet
schema evolution)? This module classifies every column change and renders
a single can-read verdict, with the compatibility rules parquet/Iceberg
actually guarantee:

- widening within a numeric family is safe (byte→short→int→long,
  float→double) plus int/smaller→double (exactly representable);
- long→double and int→float are NOT safe (mantissa narrower than the
  integer range — silent precision loss) and classify as breaking;
- added nullable columns are safe (old files read NULL), added required
  columns are breaking (old rows have no value to satisfy the contract);
- dropping a column breaks readers that referenced it; relaxing
  nullability is safe, tightening is breaking (old data may hold NULLs).

Pure schema computation (no jobs); nested structs are flattened to dotted
paths so a type change deep inside a struct is still caught.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

_INT_RANK = {"byte": 1, "short": 2, "integer": 3, "long": 4}
_FLOAT_RANK = {"float": 1, "double": 2}


def _flatten(schema: T.StructType, prefix: str = "") -> dict[str, tuple[T.DataType, bool]]:
    out: dict[str, tuple[T.DataType, bool]] = {}
    for f in schema.fields:
        name = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.update(_flatten(f.dataType, f"{name}."))
        else:
            out[name] = (f.dataType, f.nullable)
    return out


def _is_widening(old: T.DataType, new: T.DataType) -> bool:
    o, n = old.typeName(), new.typeName()
    if o in _INT_RANK and n in _INT_RANK:
        return _INT_RANK[n] > _INT_RANK[o]
    if o in _FLOAT_RANK and n in _FLOAT_RANK:
        return _FLOAT_RANK[n] > _FLOAT_RANK[o]
    # integers up to int are exact in a double (2^53 > 2^31); long is not
    if o in _INT_RANK and n == "double":
        return _INT_RANK[o] <= _INT_RANK["integer"]
    return False


@dataclass(frozen=True)
class ColumnEvolution:
    column: str
    change: str  # unchanged|widened|type_changed|removed|added_nullable|
    #              added_required|nullable_relaxed|nullable_tightened
    old_type: str | None
    new_type: str | None
    breaking: bool


def schema_evolution(
    old: T.StructType, new: T.StructType
) -> list[ColumnEvolution]:
    """Per-column change classification between two schemas (nested fields
    as dotted paths). Unchanged columns are included so the result is a
    complete audit row set."""
    o, n = _flatten(old), _flatten(new)
    out: list[ColumnEvolution] = []
    for name in sorted(set(o) | set(n)):
        if name not in n:
            ot, _ = o[name]
            out.append(ColumnEvolution(name, "removed", ot.simpleString(), None, True))
            continue
        if name not in o:
            nt, nullable = n[name]
            change = "added_nullable" if nullable else "added_required"
            out.append(
                ColumnEvolution(name, change, None, nt.simpleString(), not nullable)
            )
            continue
        (ot, onull), (nt, nnull) = o[name], n[name]
        if ot == nt:
            if onull == nnull:
                out.append(
                    ColumnEvolution(name, "unchanged", ot.simpleString(), nt.simpleString(), False)
                )
            elif nnull:  # False -> True
                out.append(
                    ColumnEvolution(name, "nullable_relaxed", ot.simpleString(), nt.simpleString(), False)
                )
            else:
                out.append(
                    ColumnEvolution(name, "nullable_tightened", ot.simpleString(), nt.simpleString(), True)
                )
        elif _is_widening(ot, nt):
            out.append(
                ColumnEvolution(name, "widened", ot.simpleString(), nt.simpleString(), False)
            )
        else:
            out.append(
                ColumnEvolution(name, "type_changed", ot.simpleString(), nt.simpleString(), True)
            )
    return out


def can_read_old_with_new(old: T.StructType, new: T.StructType) -> tuple[bool, list[ColumnEvolution]]:
    """(verdict, breaking changes): True iff every change is a safe
    evolution under the rules in the module docstring."""
    rows = schema_evolution(old, new)
    breaking = [r for r in rows if r.breaking]
    return (not breaking, breaking)
