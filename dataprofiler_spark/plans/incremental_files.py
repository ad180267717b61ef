"""File-level incremental validation via the `_metadata` hidden column.

The partition-level resume (plans/manifest.py) skips whole partitions whose
lineage matches. For UNPARTITIONED appends — or appends landing inside an
already-validated partition — the right granularity is the FILE: Spark's
file sources expose `_metadata.file_path` per row, so "validate only what's
new since the last run" is an anti-join of the scan against the manifest's
validated-file set. This is the path-input stand-in for Iceberg's
incremental snapshot reads (`incremental-scan` between snapshot ids), which
is the production mechanism.

Scale shape: the validated-file list is file-count-sized (not row-sized) —
a broadcast anti-join; the filter happens at the scan output, and whole
already-validated files are skipped at read time when the list is pushed
into a path filter upstream (callers with file-listing control should
prefer `spark.read.parquet(*new_paths)` built from `new_files`).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataprofiler_spark.plans.manifest import Manifest


class FileLedger:
    """Validated-file set stored next to the partition manifest: one JSON
    file, atomically replaced (temp + rename) — a killed run never leaves
    a torn ledger. Append-only semantics: recording merges with what's on
    disk, so two racing runs can only over-validate files they each fully
    processed, never lose entries."""

    def __init__(self, manifest: Manifest | str):
        self.dir = manifest.dir if isinstance(manifest, Manifest) else manifest
        os.makedirs(self.dir, exist_ok=True)
        self._path = os.path.join(self.dir, "validated_files.json")

    def validated_files(self) -> set[str]:
        if not os.path.exists(self._path):
            return set()
        with open(self._path) as f:
            return set(json.load(f))

    def record_files(self, files: list[str] | set[str]) -> None:
        merged = sorted(self.validated_files() | set(files))
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(merged, f)
            os.replace(tmp, self._path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)


def input_files(df: DataFrame) -> list[str]:
    """Distinct source files of a file-sourced DataFrame (file-count-sized
    collect)."""
    return sorted(
        r.f for r in df.select(F.col("_metadata.file_path").alias("f")).distinct().collect()
    )


def filter_new_files(df: DataFrame, ledger: FileLedger) -> DataFrame:
    """Keep only rows from files NOT yet in the ledger: broadcast anti-join
    on `_metadata.file_path` (the validated list is file-count-sized). Rows
    of already-validated files are dropped before any downstream work."""
    seen = ledger.validated_files()
    if not seen:
        return df
    files = df.sparkSession.createDataFrame(
        [(f,) for f in sorted(seen)], "validated_path string"
    )
    return (
        df.withColumn("__fp", F.col("_metadata.file_path"))
        .join(
            F.broadcast(files),
            F.col("__fp") == F.col("validated_path"),
            "left_anti",
        )
        .drop("__fp")
    )


def validate_incremental(df: DataFrame, ledger: FileLedger) -> tuple[DataFrame, list[str]]:
    """(rows-from-new-files, the new file list). The caller runs its checks
    on the returned frame and, on success, commits the files with
    `ledger.record_files(new)` — the commit-after-validate order is what
    makes a crash re-validate (never skip) a half-processed file."""
    fresh = filter_new_files(df, ledger)
    return fresh, input_files(fresh)
