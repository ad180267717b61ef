"""Checkpoint/resume manifest with per-partition lineage.

north_rule: "resumable from a checkpoint manifest recording per-partition
lineage, row counts, and metric snapshots, so re-submission skips validated
partitions."

Design: one JSON file per (run-scope, partition) under the manifest dir —
written atomically (temp file + rename) so a killed run never leaves a
half-record, and a resumed run simply skips partitions whose manifest entry
matches the current input lineage. Lineage here is an input fingerprint
(Iceberg snapshot id in production; content fingerprint for path inputs) —
skipping is only sound while the input hasn't changed underneath
(SURVEY.md §7.4).

Reference analog: the closed-loop metrics store that the auto-increment
module reads back (/root/reference/src/core/autoincrement_metrics.py:155-212)
and the per-table failure isolation of main.py:792-794.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import time
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionRecord:
    partition_value: str
    status: str  # "validated" | "failed"
    lineage: str  # per-partition lineage token (data-file fingerprint)
    row_count: int
    metrics: dict = field(default_factory=dict)  # metric snapshot
    checks: dict = field(default_factory=dict)  # check_name -> passed
    recorded_at: float = 0.0
    snapshot_id: str = ""  # table snapshot the validation ran against


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", name)


class Manifest:
    def __init__(self, manifest_dir: str):
        self.dir = manifest_dir
        os.makedirs(manifest_dir, exist_ok=True)

    def _path(self, partition_value: str) -> str:
        return os.path.join(self.dir, f"partition={_safe(partition_value)}.json")

    def record(self, rec: PartitionRecord) -> None:
        """Atomic write: temp file in the same dir + rename (POSIX rename
        is atomic; a killed run leaves no partial manifest entry)."""
        rec.recorded_at = rec.recorded_at or time.time()
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(asdict(rec), f)
            os.replace(tmp, self._path(rec.partition_value))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def load(self) -> dict[str, PartitionRecord]:
        out = {}
        for fn in os.listdir(self.dir):
            if fn.startswith("partition=") and fn.endswith(".json"):
                with open(os.path.join(self.dir, fn)) as f:
                    d = json.load(f)
                out[d["partition_value"]] = PartitionRecord(**d)
        return out

    def validated_partitions(self, lineage: str) -> set[str]:
        """Partitions safe to skip: validated AND same input lineage.
        A lineage change (new snapshot appended) invalidates the skip."""
        return {
            p
            for p, rec in self.load().items()
            if rec.status == "validated" and rec.lineage == lineage
        }

    def validated_partitions_for(self, snapshot: "Snapshot") -> set[str]:
        """Per-partition resume against a table SNAPSHOT: a partition is
        skippable iff it validated against the exact lineage token its
        data files have in this snapshot. An append to partition X flips
        X's token (and the snapshot_id) but leaves other partitions'
        tokens — so only X re-validates. Stale-manifest partitions
        (recorded under a token the snapshot no longer carries) are
        excluded by construction."""
        return {
            p
            for p, rec in self.load().items()
            if rec.status == "validated"
            and snapshot.partition_lineage.get(p) == rec.lineage
        }


@dataclass
class Snapshot:
    """Iceberg-snapshot-semantics model for path inputs (SURVEY §7.4):
    a table state = (snapshot_id, per-partition data-file lineage). The
    id is content-addressed over the per-partition tokens, so ANY append/
    rewrite produces a new snapshot_id — and resume-after-append is
    provably sound per partition: a partition is skippable iff ITS data
    files are unchanged, regardless of appends elsewhere. (The global
    `input_fingerprint` token invalidates every partition on any append —
    sound but maximally wasteful; this is the per-partition refinement.)
    In production the id and per-partition file lists come from the
    Iceberg snapshot metadata instead of a directory walk."""

    snapshot_id: str
    partition_lineage: dict[str, str]  # partition_value -> lineage token


def snapshot_from_path(path: str, part_prefix: str | None = None) -> Snapshot:
    """Build a Snapshot from a hive-layout directory: each
    `<col>=<value>` subdirectory is a partition whose lineage token
    fingerprints ITS files only. `part_prefix` (e.g. "source") restricts
    to that partition column's dirs; files outside any partition dir
    fingerprint under the "" partition.

    LAYOUT-SENSITIVE by design: the token is a file fingerprint, so a
    compaction (same rows rewritten into fewer files) flips it and forces
    re-validation — sound (never skips changed data) but wasteful. When
    the table format attests data identity across rewrites, evolve the
    snapshot with snapshot_append/snapshot_compact/snapshot_overwrite
    (Iceberg operation semantics) instead of re-walking the path; or
    verify identity exactly with content_lineage (one narrow scan)."""
    part_lineage: dict[str, str] = {}
    loose: list[str] = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            full = os.path.join(path, name)
            if os.path.isdir(full) and "=" in name:
                col, _, val = name.partition("=")
                if part_prefix is None or col == part_prefix:
                    part_lineage[val] = input_fingerprint(full)
                    continue
            loose.append(name)
    if loose:
        parts = []
        for name in loose:
            full = os.path.join(path, name)
            parts.append(f"{name}:{input_fingerprint(full)}")
        import hashlib

        part_lineage[""] = hashlib.md5("|".join(parts).encode()).hexdigest()
    import hashlib

    sid = hashlib.md5(
        "|".join(f"{p}={t}" for p, t in sorted(part_lineage.items())).encode()
    ).hexdigest()
    return Snapshot(snapshot_id=sid, partition_lineage=part_lineage)


def input_fingerprint(path: str) -> str:
    """Lineage for path inputs: mtime+size walk (standing in for an Iceberg
    snapshot id, which is the production lineage token)."""
    parts = []
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            for fn in sorted(files):
                st = os.stat(os.path.join(root, fn))
                parts.append(f"{fn}:{st.st_size}:{int(st.st_mtime)}")
    elif os.path.exists(path):
        st = os.stat(path)
        parts.append(f"{os.path.basename(path)}:{st.st_size}:{int(st.st_mtime)}")
    import hashlib

    return hashlib.md5("|".join(parts).encode()).hexdigest()


# ---------------------------------------------------------------------------
# Snapshot evolution (Iceberg operation semantics) — VERDICT r4 #5.
#
# `snapshot_from_path` fingerprints FILES (mtime+size), so a compaction —
# a rewrite of the same rows into fewer files — flips every rewritten
# partition's token and forces spurious re-validation. That is sound
# (never skips changed data) but wasteful: Iceberg distinguishes the two
# cases in snapshot metadata (`operation: append/replace/overwrite`), and
# a `replace` (compaction) preserves DATA identity. These helpers model
# that: a production integration would map Iceberg's snapshot log onto
# them 1:1; path-based deployments can either accept the re-validation
# cost or verify data identity exactly with `content_lineage` (one narrow
# scan, layout-invariant).
# ---------------------------------------------------------------------------


def _snapshot_id(partition_lineage: dict[str, str]) -> str:
    import hashlib

    return hashlib.md5(
        "|".join(f"{p}={t}" for p, t in sorted(partition_lineage.items())).encode()
    ).hexdigest()


def snapshot_append(parent: Snapshot, partition: str, files_token: str) -> Snapshot:
    """Iceberg `append` to one partition: its lineage token evolves as a
    hash chain over (old token, appended-files token) — the partition
    re-validates; every other partition's token (and skip) is untouched."""
    import hashlib

    lineage = dict(parent.partition_lineage)
    old = lineage.get(partition, "")
    lineage[partition] = hashlib.md5(f"{old}+{files_token}".encode()).hexdigest()
    return Snapshot(snapshot_id=_snapshot_id(lineage), partition_lineage=lineage)


def snapshot_compact(parent: Snapshot, partitions: list[str] | None = None) -> Snapshot:
    """Iceberg `replace` (compaction): files are rewritten, DATA identity
    is unchanged — per-partition lineage tokens carry over verbatim, so a
    resumed run still skips every previously-validated partition. The
    snapshot_id is content-addressed over the (unchanged) tokens and
    therefore also unchanged: two table states with identical data
    identity are the same snapshot for validation purposes. `partitions`
    is accepted for API symmetry/documentation; compaction never touches
    lineage regardless."""
    _ = partitions
    lineage = dict(parent.partition_lineage)
    return Snapshot(snapshot_id=_snapshot_id(lineage), partition_lineage=lineage)


def snapshot_overwrite(parent: Snapshot, partition: str, files_token: str) -> Snapshot:
    """Iceberg `overwrite` of one partition: data identity is replaced —
    a fresh token derived from the new files only (NOT chained from the
    old token), so the partition re-validates."""
    import hashlib

    lineage = dict(parent.partition_lineage)
    lineage[partition] = hashlib.md5(f"overwrite:{files_token}".encode()).hexdigest()
    return Snapshot(snapshot_id=_snapshot_id(lineage), partition_lineage=lineage)


def content_lineage(df, cols: list[str] | None = None) -> str:
    """EXACT layout-invariant data-identity token: one aggregate over the
    frame — SUM(xxhash64(row) :: decimal(38,0)) plus the row count. The
    decimal sum is order-independent and multiset-correct (duplicate rows
    count; xor would cancel pairs) and cannot overflow under ANSI
    (gotcha 2): 10^14 rows x 2^63 ≈ 9.2e32 « 1e38. A compaction (same
    rows, different files) produces the identical token; any row change
    flips it. Cost: one narrow scan — the exact-verification fallback
    when no table format attests data identity; Iceberg deployments get
    the same answer for free from snapshot metadata (snapshot_compact)."""
    from pyspark.sql import functions as F

    use = cols if cols is not None else df.columns
    agg = df.select(
        F.xxhash64(*[F.col(c) for c in use]).cast("decimal(38,0)").alias("__h")
    ).agg(
        F.coalesce(F.sum("__h"), F.lit(0).cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    row = agg.collect()[0]
    import hashlib

    return hashlib.md5(f"{row['s']}:{row['n']}".encode()).hexdigest()
