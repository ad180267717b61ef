#!/usr/bin/env python
"""Deterministic generator for MEASUREMENT-ONLY scale-factor data.

The driver deletes its generated sf1.0 tree at round end; this script
rebuilds a statistically equivalent one (same row counts, schemas,
value distributions, single-row-group parquet layout) so per-entry
optimization A/Bs can run at the driver's measurement scale. It is NOT
the driver's data (different RNG stream) and is never used for
correctness/oracle work — parity runs on the real sf0.01 testdata.

Statistics replicated from /root/testdata/sf0.1 (measured):
- documents: 30-word uniform vocabulary + rare 'dup' token, doc length
  uniform 10..100 words (mean 54), lang {en:41%, zh/fr/es/de ~15%},
  20 uniform sources, ~0.3% exact-duplicate docs.
- embeddings: 64-dim unit-normalized gaussians (same-label cosine
  ~0.03 — no real cluster structure), labels uniform 0..9.
- lineitem: TPC-H-ish distributions (distinct counts at sf0.1:
  orderkey ~n/4, partkey 20k, suppkey 1k, linenumber 1..7,
  quantity 1..50, extendedprice ~583k values 2dp, discount 0..0.10,
  tax 0..0.08, returnflag {N,A,R}, linestatus {O,F},
  shipdate ~2500 distinct days).

Usage: python BENCH/gen_measure_sf.py <sf> <outdir>
  e.g. python BENCH/gen_measure_sf.py 1.0 /root/sfbench/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "group", "sort", "fast", "slow", "hash",
    "query", "scan", "batch", "line", "part", "order", "filter", "key",
    "join", "agg", "big", "the", "a", "customer", "sequence",
]

ONE_RG = 1 << 30  # single row group, matching the driver's file layout


def gen_documents(sf: float, out: str, rng: np.random.Generator) -> None:
    n = int(50_000 * sf)
    lens = rng.integers(10, 101, size=n)
    total = int(lens.sum())
    words = np.array(VOCAB)[rng.integers(0, len(VOCAB), size=total)]
    # sprinkle the rare 'dup' marker token at ~1/1000 word rate
    dup_pos = rng.random(total) < 0.001
    words[dup_pos] = "dup"
    texts = []
    off = 0
    for ln in lens:
        texts.append(" ".join(words[off : off + ln]))
        off += ln
    # ~0.3% exact duplicate docs (copy an earlier doc's text)
    n_dup = max(1, int(0.003 * n))
    src_idx = rng.integers(0, n, size=n_dup)
    dst_idx = rng.integers(0, n, size=n_dup)
    for s, d in zip(src_idx, dst_idx):
        texts[d] = texts[s]
    langs = rng.choice(
        np.array(["en", "zh", "fr", "es", "de"]),
        size=n,
        p=[0.41, 0.1525, 0.1475, 0.1475, 0.1425],
    )
    sources = np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, size=n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"), row_group_size=ONE_RG)


def gen_embeddings(sf: float, out: str, rng: np.random.Generator) -> None:
    n = int(20_000 * sf)
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"), row_group_size=ONE_RG)


def gen_lineitem(sf: float, out: str, rng: np.random.Generator) -> None:
    n = int(6_000_000 * sf)
    shipdate = np.datetime64("1992-01-01") + rng.integers(0, 3650, size=n).astype(
        "timedelta64[D]"
    )
    tbl = pa.table(
        {
            "l_orderkey": pa.array(rng.integers(1, n // 4 + 1, size=n).astype(np.int64)),
            "l_partkey": pa.array(
                rng.integers(1, int(200_000 * sf) + 1, size=n).astype(np.int64)
            ),
            "l_suppkey": pa.array(
                rng.integers(1, int(10_000 * sf) + 1, size=n).astype(np.int64)
            ),
            "l_linenumber": pa.array(rng.integers(1, 8, size=n).astype(np.int32)),
            "l_quantity": pa.array(rng.integers(1, 51, size=n).astype(np.float64)),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900.0, 105_000.0, size=n), 2)
            ),
            "l_discount": pa.array(np.round(rng.integers(0, 11, size=n) / 100.0, 2)),
            "l_tax": pa.array(np.round(rng.integers(0, 9, size=n) / 100.0, 2)),
            "l_returnflag": pa.array(
                np.array(["N", "A", "R"])[rng.integers(0, 3, size=n)]
            ),
            "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, size=n)]),
            "l_shipdate": pa.array(shipdate.astype("datetime64[us]")),
        }
    )
    pq.write_table(tbl, os.path.join(out, "lineitem.parquet"), row_group_size=ONE_RG)


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260822)
    gen_documents(sf, out, rng)
    gen_embeddings(sf, out, rng)
    gen_lineitem(sf, out, rng)
    print(f"wrote sf={sf} measurement tables to {out}")


if __name__ == "__main__":
    main()
