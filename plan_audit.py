"""Registry-wide physical-plan audit — the 100 TB design review as code.

Sweeps every registered query, summarizes the physical plan (exchanges,
scan column pruning, join strategies, Python execution nodes, codegen
stages), and prints a markdown table. The per-round snapshot is committed
as PLAN_AUDIT_r{N}.md so plan regressions (a new exchange, a lost
broadcast, Python leaking into a hot path) show up in review diffs, not
just in wall-clock drift.

Usage: python plan_audit.py [sf_dir] > PLAN_AUDIT_rNN.md
       python plan_audit.py --staging=none [sf_dir]
           # audit the PRE-staging plan shapes: the digest families'
           # full lineage (tokenize/signature scans included) instead of
           # the post-localCheckpoint stub — VERDICT r5 #5. `--staging=`
           # accepts any staging.stage() mode (checkpoint|persist|none).
"""

from __future__ import annotations

import os
import sys

from data_pipelines_course_spark.plans import analysis as pa
from data_pipelines_course_spark.queries import all_oracles, all_queries
from data_pipelines_course_spark.session import get_spark


def main() -> None:
    args = list(sys.argv[1:])
    only: set[str] | None = None
    for a in list(args):
        if a.startswith("--staging="):
            # Must be set BEFORE query construction: stage() reads the
            # env at call time, so 'none' rebuilds every digest family
            # query with its full recomputable lineage in the main plan.
            os.environ["SPARK_GRAFT_STAGING"] = a.split("=", 1)[1]
            args.remove(a)
        elif a.startswith("--queries="):
            # Subset audit — e.g. the bench HEADLINE set at a scale tier
            # whose full-registry construction cost (eager driver-loop
            # queries) would dominate (VERDICT r7 #4: sf1 headline).
            only = set(a.split("=", 1)[1].split(","))
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = all_queries(), all_oracles()
    if only is not None:
        unknown = only - set(queries)
        if unknown:
            raise SystemExit(f"--queries names not registered: {unknown}")
        queries = {n: q for n, q in queries.items() if n in only}

    print(f"# Plan audit — {len(queries)} registered queries, {sf_dir}\n")
    print("Legend: exch = shuffle Exchange count; scan-cols = columns "
          "actually read from parquet (pruning); joins = physical join "
          "strategies; py = Python execution nodes (Arrow-batched only; "
          "BatchEvalPython is test-banned); oracle = has DuckDB oracle.\n")
    print("NOTE: the driver-loop queries execute EAGERLY at construction "
          "— `dedup_clusters` / `dedup_keep_best` (label-propagation "
          "rounds: per-round localCheckpoint + count) and "
          "`embedding_kmeans` / `semdedup_candidates` (Lloyd iterations: "
          "per-round K-row collect) — so their rows below describe only "
          "the final plan over the trained/converged state; the "
          "iterative work happens during construction and is invisible "
          "to this static audit. The same applies to `price_quantiles` "
          "(two-pass rank lookup: the range shuffle + rank window run at "
          "construction, the returned frame is the 1-row result) and the "
          "three `*_stream_convergence` hooks (they drive a maintenance "
          "sink over micro-batches plus a replay, then return the "
          "collected summary/serving table) — their 0-exchange rows are "
          "the nature of an eager result, not a free plan. Additionally (r5), the LSH/Jaccard family stages its digest tables through the env-gated staging.stage() gate (default: lazy localCheckpoint — signature/shingle/chunk pipelines materialized once instead of once per join side), so under the default their rows describe the plan DOWNSTREAM of the checkpoint: the tokenize/signature scans live in the checkpoint lineage, executed on first action but invisible to this static audit — a low exch/scan-cols row there is shared materialization, not a free query. Re-run `python plan_audit.py --staging=none` to regenerate the PRE-staging shapes (full digest lineage in the main plan) on demand — r6, replacing the one-shot PLAN_AUDIT_r04 reference.\n")
    mode = os.environ.get("SPARK_GRAFT_STAGING", "checkpoint")
    print(f"Staging mode for this audit: `{mode}`"
          + (" (pre-staging full-lineage shapes)" if mode == "none" else "")
          + "\n")
    print("| query | exch | scan-cols | joins | py | oracle |")
    print("|---|---|---|---|---|---|")
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            r = pa.plan_report(df)
            joins = ",".join(sorted({j.replace("Exec", "")
                                     for j in r["join_strategies"]})) or "-"
            py = ",".join(sorted(set(r["python_eval_nodes"]))) or "-"
            cols = len(r["read_schema_columns"])
            print(f"| {name} | {r['exchange_count']} | {cols} | {joins} "
                  f"| {py} | {'y' if name in oracles else 'rows-only'} |")
        except Exception as ex:  # noqa: BLE001 — audit must cover the rest
            print(f"| {name} | ERR | - | - | - | {str(ex)[:40]} |")
    spark.stop()


if __name__ == "__main__":
    main()
