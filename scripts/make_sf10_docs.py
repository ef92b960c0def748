"""Documents-only sf10 tier — the jaccard crossover bracket (VERDICT r6 #5).

TWIN_BENCH_r06 located the ngram-jaccard ground-truth/twin crossover
"between sf1 and sf10" by extrapolation (GT per-decade slope
accelerating 1.25x -> 12.5x vs the AllPairs prefix twin's 2.4x -> 4.4x).
Bracketing it needs one more decade of DOCUMENTS only — the jaccard
pair, the LSH family, and the vocab queries read no other table, so the
full 10-table referential-integrity shift is unnecessary.

Derivation: make_sf1's `documents()` applied a second time — sf1's 50k
docs (which are 10 near-dup copies of sf0.1's 5k) each get 10 copies
again (copy 0 verbatim, copies 1-9 word-perturbed from the corpus
vocabulary, seeded) -> 500k docs. Second-generation perturbations
compound: a cluster is now ~100 descendants of one sf0.1 original, of
which the tight J>=0.6 core is the ~10 first-generation copies plus
their verbatim re-copies — cluster cores grow with the decade exactly
as a crawl corpus's boilerplate families do. doc_id stride widens to
10^7 so ids stay collision-free (max sf1 id < 10^7).

Requires the sf1 tier (runs make_sf1 first if absent). Output
/tmp/spark_graft_sf10_docs (env SPARK_GRAFT_SF10_DOCS_DIR). Runtime
~4 min, ~400 MB. Usage: python scripts/make_sf10_docs.py
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import make_sf1  # noqa: E402

OUT = os.environ.get("SPARK_GRAFT_SF10_DOCS_DIR", "/tmp/spark_graft_sf10_docs")


def main() -> None:
    sf1_dir = make_sf1.OUT
    if not os.path.exists(f"{sf1_dir}/documents.parquet"):
        print(f"sf1 tier missing at {sf1_dir}; deriving it first",
              file=sys.stderr)
        subprocess.run([sys.executable, os.path.join(HERE, "make_sf1.py")],
                       check=True)
    os.makedirs(OUT, exist_ok=True)
    make_sf1.documents(src=sf1_dir, out_dir=OUT, id_stride=10_000_000)
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()[0]
    print(f"documents: {n} rows", file=sys.stderr)
    print(OUT)


if __name__ == "__main__":
    main()
