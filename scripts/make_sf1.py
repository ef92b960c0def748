"""Deterministic sf1-scale data derivation for the twin-crossover bench.

The driver ships sf0.001/0.01/0.1 only; the scale-twin superiority
argument (VERDICT r5 #6) needs one decade more. This derives an sf1
tier (~10x sf0.1: lineitem 6M, events 1M, documents 50k, embeddings
20k) OUTSIDE the read-only testdata tree, from sf0.1 itself, so
distributions match the driver generator's by construction:

- lineitem: 10 key-shifted copies (l_orderkey + i*10^7). Quantile /
  group-by timing sees 10x rows with identical value distributions.
- events: 10 copies with user_id + i*10^7 and event_id + i*10^8 —
  10x distinct users, each preserving a real user's event-history
  shape (what per-user cogroup/sessionize cost actually scales in).
- documents: 10 copies; copy 0 verbatim, copies 1-9 word-perturbed
  (every 7th+i-th word replaced from the corpus vocabulary, seeded
  RNG) — dup clusters of ~10 near-copies per original, the shape a
  crawl corpus presents to threshold dedup, without the degenerate
  exact-copy explosion 10 verbatim copies would create.
- embeddings: 10 copies with deterministic per-copy noise (scaled by
  copy index) — near-neighbor structure preserved, no exact ties.

Everything is seeded; rerunning yields byte-identical values. Output
dir default /tmp/spark_graft_sf1 (env SPARK_GRAFT_SF1_DIR). Runtime
~30 s. Usage: python scripts/make_sf1.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
COPIES = 10
SEED = 420


def lineitem(con: duckdb.DuckDBPyConnection) -> None:
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/lineitem.parquet'").fetchall()]
    rest = ", ".join(c for c in cols if c != "l_orderkey")
    con.sql(f"""
        COPY (SELECT l_orderkey + i * 10000000 AS l_orderkey, {rest}
              FROM '{SRC}/lineitem.parquet', range({COPIES}) t(i)
              ORDER BY i, l_orderkey, l_linenumber)
        TO '{OUT}/lineitem.parquet' (FORMAT parquet)
    """)


def orders(con: duckdb.DuckDBPyConnection) -> None:
    """o_orderkey shifted IDENTICALLY to lineitem's l_orderkey so every
    order/lineitem join at sf1 preserves referential integrity; o_custkey
    stays unshifted (each customer simply owns 10x orders — the realistic
    scale-up direction, and the dimension tables stay verbatim)."""
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/orders.parquet'").fetchall()]
    rest = ", ".join(c for c in cols if c != "o_orderkey")
    con.sql(f"""
        COPY (SELECT o_orderkey + i * 10000000 AS o_orderkey, {rest}
              FROM '{SRC}/orders.parquet', range({COPIES}) t(i)
              ORDER BY i, o_orderkey)
        TO '{OUT}/orders.parquet' (FORMAT parquet)
    """)


def dims_verbatim(con: duckdb.DuckDBPyConnection) -> None:
    """region/nation/customer/supplier/part copy unchanged: lineitem's
    l_partkey/l_suppkey and orders' o_custkey are unshifted, so the
    verbatim dimensions keep every FK resolvable (fact tables grow 10x,
    dimensions don't — exactly how a real decade of scale arrives)."""
    for t in ("region", "nation", "customer", "supplier", "part"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT parquet)")


def events(con: duckdb.DuckDBPyConnection) -> None:
    con.sql(f"""
        COPY (SELECT event_id + i * 100000000 AS event_id, ts,
                     user_id + i * 10000000 AS user_id,
                     event_type, value, props
              FROM '{SRC}/events.parquet', range({COPIES}) t(i)
              ORDER BY i, event_id)
        TO '{OUT}/events.parquet' (FORMAT parquet)
    """)


def documents(src: str = None, out_dir: str = None,
              id_stride: int = 1_000_000) -> None:
    """10 near-dup copies of `src`'s documents into `out_dir` (defaults:
    the module-level sf0.1 -> sf1 derivation). Parameterized so
    make_sf10_docs.py can apply the SAME derivation one decade further
    (sf1 -> sf10-docs) with a wider doc_id stride."""
    src = src or SRC
    out_dir = out_dir or OUT
    base = pq.read_table(f"{src}/documents.parquet").to_pydict()
    n = len(base["doc_id"])
    vocab = sorted({w for t in base["text"] for w in t.split()})
    rng = np.random.default_rng(SEED)
    out = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    for i in range(COPIES):
        for j in range(n):
            if i == 0:
                # Copy 0 is byte-verbatim (ADVICE r6): round-tripping
                # through split/join would collapse any non-single-space
                # whitespace and recompute n_chars, silently diverging
                # sf1 copy-0 docs from their sf0.1 originals.
                text = base["text"][j]
                n_chars = base["n_chars"][j]
            else:
                words = base["text"][j].split()
                # Perturb a sliding subset of positions per copy: same
                # doc, different copies share most 3-gram shingles ->
                # genuine near-dup clusters for the threshold family.
                for p in range(i % 7, len(words), 7):
                    words[p] = vocab[int(rng.integers(0, len(vocab)))]
                text = " ".join(words)
                n_chars = len(text)
            out["doc_id"].append(base["doc_id"][j] + i * id_stride)
            out["text"].append(text)
            out["lang"].append(base["lang"][j])
            out["source"].append(base["source"][j])
            out["n_chars"].append(n_chars)
    pq.write_table(pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "source": pa.array(out["source"], pa.string()),
        "n_chars": pa.array(out["n_chars"], pa.int64()),
    }), f"{out_dir}/documents.parquet")


def embeddings() -> None:
    base = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.array(base.column("vec_id").to_pylist(), dtype=np.int64)
    labels = np.array(base.column("label").to_pylist(), dtype=np.int32)
    rng = np.random.default_rng(SEED)
    all_ids, all_vecs, all_labels = [], [], []
    for i in range(COPIES):
        noise = (rng.standard_normal(vecs.shape).astype(np.float32)
                 * 0.001 * i)
        all_ids.append(ids + i * 1_000_000)
        all_vecs.append(vecs + noise)
        all_labels.append(labels)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.concatenate(all_ids), pa.int64()),
        "embedding": pa.array(
            [v.tolist() for v in np.concatenate(all_vecs)],
            pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(all_labels), pa.int32()),
    }), f"{OUT}/embeddings.parquet")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    lineitem(con)
    orders(con)
    dims_verbatim(con)
    events(con)
    documents()
    embeddings()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        n = duckdb.sql(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows", file=sys.stderr)
    print(OUT)


if __name__ == "__main__":
    main()
