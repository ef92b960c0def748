"""Python UDTF exemplar (Spark 4 user-defined TABLE functions) — the
1→N row-generating UDF kind from SURVEY §2.10 as a registered SQL
citizen, not just an `explode` composition.

Placement policy: the relational registry stays JVM-only (row-wise
Python is test-banned there; `explode`/`transform` cover the hot-path
1→N cases). A UDTF is the escape hatch for generators whose logic
genuinely needs Python — it runs Arrow-batched when
`spark.sql.execution.pythonUDTF.arrow.enabled` is on, and its
`analyze()`-free static schema keeps planning cheap. This module ships
one: `sentence_chunks`, the fixed-size token-window chunker every
context-length-bounded training pipeline needs (doc → overlapping
chunks), registered as a SQL table function usable in a LATERAL
position::

    spark.udtf.register("sentence_chunks", SentenceChunks)
    spark.sql("SELECT c.* FROM docs, LATERAL sentence_chunks(text, 128, 16) c")
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

# UDTF classes ship to executors whose workers may not have this repo on
# sys.path — pickle the module by value so no executor-side import runs.
try:  # pragma: no cover - no-op on old cloudpickle
    from pyspark import cloudpickle as _cp
    import sys as _sys

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass


@udtf(returnType="chunk_id: int, n_tokens: int, chunk: string")
class SentenceChunks:
    """Split whitespace-tokenized text into windows of `size` tokens
    with `overlap` tokens shared between consecutive chunks (the
    sliding-context chunking used to pack long documents into bounded
    training examples). Emits (chunk_id, n_tokens, chunk_text); short
    texts yield one chunk; None yields nothing."""

    def eval(self, text: str, size: int = 128, overlap: int = 0):
        if text is None or size <= 0 or not (0 <= overlap < size):
            return
        toks = text.split()
        if not toks:
            return
        step = size - overlap
        cid = 0
        for start in range(0, len(toks), step):
            window = toks[start:start + size]
            yield cid, len(window), " ".join(window)
            cid += 1
            if start + size >= len(toks):
                break


def register(spark) -> None:
    spark.udtf.register("sentence_chunks", SentenceChunks)
