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
    fingerprint under the "" partition."""
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
