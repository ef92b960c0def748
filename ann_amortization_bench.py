"""Batch-ANN amortization curve (VERDICT r9 #6): put a number on
`ann_batch_topk`'s 100 TB claim that ONE pass over the LSH bucket index
amortizes over N probes.

Method: for panel sizes N in PANEL_SIZES, run the registered batch plan
(`lsh_batch_topk` — bucket both sides, (table, bucket) equi-join,
per-probe window) over the first N usable probe vectors and record the
wall. The comparison line is N × the measured single-probe wall (the
cost of running the registered single-probe plan N times, i.e. what a
driver-loop serving design would pay — the pre-r9 referee shape).
`amortization = n_x_single_sec / sec`: how many times cheaper the one
batch plan is than N independent plans.

Each timing materializes the full result via a noop-format write (no
driver collect, no result-size bias). One warmup run precedes the sweep
so JVM/codegen warmup is not attributed to the smallest panel.

Run:  python ann_amortization_bench.py [--sf-dir=DIR] [--repeats=K]
Prints one JSON line; the round artifact is ANN_AMORT_r{N}.json
(sf0.1 + sf1 runs). Not part of the driver bench contract (bench.py is).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from data_pipelines_course_spark.datasets import load
from data_pipelines_course_spark.operators.similarity import (
    finite_norm, lsh_batch_topk,
)
from data_pipelines_course_spark.session import get_spark

PANEL_SIZES = [12, 50, 100, 250, 500, 1000]


def _panel(emb, n: int):
    """First n usable probes by vec_id — deterministic, same usability
    rule as the registered panel (positive finite norm)."""
    return (emb.filter(finite_norm("embedding"))
            .orderBy("vec_id").limit(n)
            .select(F.col("vec_id").alias("probe_id"),
                    F.col("embedding").alias("pv")))


def _timed(df, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    repeats = 2
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
    spark = get_spark(app_name="ann-amortization-bench")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, sf_dir, "embeddings")
    corpus_n = emb.count()
    # Panels are cached tiny frames; caching keeps the panel build out
    # of the timed plan (it is broadcast state, not the serving scan).
    sizes = [n for n in PANEL_SIZES if n <= corpus_n]

    # Warmup: full plan once at the largest panel (codegen + shuffle
    # machinery), then time the single-probe baseline.
    lsh_batch_topk(emb, _panel(emb, sizes[-1]).cache()) \
        .write.format("noop").mode("overwrite").save()
    single_panel = _panel(emb, 1).cache()
    single_panel.count()  # materialize OUTSIDE the timing (ADVICE r10:
    # an unmaterialized cached panel charges its build to the first
    # repeat, inflating t_single — and every ratio — at repeats=1)
    t_single = _timed(lsh_batch_topk(emb, single_panel), repeats)

    curve = []
    for n in sizes:
        p = _panel(emb, n).cache()
        n_actual = p.count()  # materialize the panel outside the timing
        sec = _timed(lsh_batch_topk(emb, p), repeats)
        nx = round(n_actual * t_single, 3)
        curve.append({"n_probes": n_actual, "sec": sec,
                      "n_x_single_sec": nx,
                      "amortization": round(nx / sec, 1) if sec else None})
    print(json.dumps({"sf_dir": sf_dir, "corpus_vectors": corpus_n,
                      "single_probe_sec": t_single, "repeats": repeats,
                      "curve": curve}))


if __name__ == "__main__":
    main()
