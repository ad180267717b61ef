#!/usr/bin/env python
"""Controlled 4M-row scale A/B for DSIR selection and token-budget
selection (VERDICT r4 next #7): deterministic synthetic corpora, fresh
plan per timed run (gotcha 10), full-size untimed JIT warm (gotcha 31),
min-of-K, calibration kernel sampled in the SAME window (gotcha 32).

Run once per parallelism level:
  SPARK_GRAFT_CPUS=8  python BENCH/bench_selection_4m.py
  SPARK_GRAFT_CPUS=32 python BENCH/bench_selection_4m.py
Prints one JSON line per run; pair the two lines from the same host
window in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataprofiler_spark import get_spark  # noqa: E402
from dataprofiler_spark.operators.sampling import (  # noqa: E402
    dsir_log_ratios,
    dsir_resample,
    dsir_score,
    select_token_budget,
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROWS = int(os.environ.get("BENCH_SELECT_ROWS", "4000000"))
REPEAT = int(os.environ.get("BENCH_REPEAT", "2"))


def synth_docs(spark, rows: int):
    """12-word docs over a 50k vocabulary, fully deterministic — the
    DSIR feature pipeline (tokenize → hash → bucket) sees realistic
    word-frequency spread; the raw/target slices differ by construction
    (target words draw from a shifted vocab window)."""
    words_expr = (
        "concat_ws(' ', transform(sequence(1, 12), "
        "i -> concat('w', pmod(xxhash64(id * 13 + i), "
        "CASE WHEN id % 7 = 0 THEN 30000 ELSE 50000 END))))"
    )
    return spark.range(rows).select(
        F.col("id").alias("doc_id"), F.expr(words_expr).alias("text")
    )


def main() -> None:
    spark = get_spark(
        app_name="bench-selection-4m",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _kernel(off: int) -> float:
        t0 = time.time()
        spark.range(off, off + 40_000_000, 1, 128).select(
            F.md5(F.col("id").cast("string")).alias("h")
        ).agg(F.max("h"), F.count("h")).collect()
        return time.time() - t0

    _kernel(1)  # codegen warm

    def dsir_run(rows: int, salt: str) -> int:
        docs = synth_docs(spark, rows)
        target = docs.filter(F.col("doc_id") % 7 == 0)
        raw = docs.filter(F.col("doc_id") % 7 != 0)
        model = dsir_log_ratios(target, raw, n_buckets=1 << 16)
        return dsir_resample(dsir_score(raw, model), 100_000, salt=salt).count()

    def budget_run(rows: int, shift: int) -> int:
        staged = spark.range(rows).select(
            (F.col("id") + shift).alias("doc_id"),
            (F.pmod(F.col("id") * 37, F.lit(101)) / 101.0).alias("score"),
            (F.lit(100) + F.pmod(F.col("id"), F.lit(200))).alias("n_tok"),
        )
        budget = rows * 50  # ~25% of total token mass selected
        return (
            select_token_budget(staged, "score", "n_tok", budget)
            .filter(F.col("selected"))
            .count()
        )

    # full-size untimed warm per plan shape (gotcha 31)
    dsir_run(ROWS, "warm")
    budget_run(ROWS, 0)

    kern_pre = min(_kernel(100 + i) for i in range(2))
    out: dict[str, object] = {
        "rows": ROWS,
        "cpus": CPUS,
        "kernel_pre_sec": round(kern_pre, 3),
    }
    for name, fn in (
        ("dsir_select_4m", lambda i: dsir_run(ROWS, f"r{i}")),
        ("token_budget_4m", lambda i: budget_run(ROWS, i)),
    ):
        runs = []
        for i in range(REPEAT):
            t0 = time.time()
            n = fn(i + 1)  # fresh plan each run (salt/shift varies)
            runs.append(round(time.time() - t0, 3))
        out[name] = min(runs)
        out[f"{name}_runs"] = runs
        out[f"{name}_selected"] = n
    out["kernel_post_sec"] = round(min(_kernel(200 + i) for i in range(2)), 3)
    out["docs_per_sec_dsir"] = round(ROWS / out["dsir_select_4m"], 1)
    out["rows_per_sec_budget"] = round(ROWS / out["token_budget_4m"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
