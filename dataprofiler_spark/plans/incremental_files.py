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
    """Validated-file set stored next to the partition manifest as
    APPEND-ONLY shards: each record_files call writes its OWN
    `files-<contenthash>.json` (temp + atomic rename), and
    validated_files() is the union over all shards. Two racing runs each
    write their own shard, so neither can lose the other's entries (a
    read-merge-rewrite of one shared file would be last-writer-wins —
    lost entries mean files get re-validated and their rows appended
    AGAIN to the append-only sinks). Identical file sets hash to the same
    shard name, so re-recording is idempotent. A killed run leaves no
    torn shard (rename is atomic)."""

    def __init__(self, manifest: Manifest | str):
        self.dir = manifest.dir if isinstance(manifest, Manifest) else manifest
        os.makedirs(self.dir, exist_ok=True)

    def _shards(self) -> list[str]:
        return [
            os.path.join(self.dir, fn)
            for fn in sorted(os.listdir(self.dir))
            if fn.startswith("files-") and fn.endswith(".json")
        ]

    def validated_files(self) -> set[str]:
        out: set[str] = set()
        # legacy single-file ledger (pre-shard format): a dir written by
        # the previous release must not read as empty — that would
        # re-validate everything and double-append rows to the sinks
        legacy = os.path.join(self.dir, "validated_files.json")
        if os.path.exists(legacy):
            with open(legacy) as f:
                out.update(json.load(f))
        for path in self._shards():
            with open(path) as f:
                out.update(json.load(f))
        return out

    def record_files(self, files: list[str] | set[str]) -> None:
        import hashlib

        entries = sorted(set(files))
        if not entries:
            return
        digest = hashlib.md5("\n".join(entries).encode()).hexdigest()[:16]
        target = os.path.join(self.dir, f"files-{digest}.json")
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(entries, f)
            os.replace(tmp, target)
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
