"""BPE trainer parity: the DataFrame-loop trainer must reproduce the
canonical pure-Python BPE (Sennrich et al. 2016) merge sequence on the
same vocabulary — the rows-only analog of a DuckDB oracle for an
iterative algorithm (same pattern as the k-means objective test)."""

from __future__ import annotations

import collections
import re

from data_pipelines_course_spark.datasets import load
from data_pipelines_course_spark.operators.textprep import bpe_train

SF_DIR = "/root/testdata/sf0.001"
N_MERGES = 12


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference implementation, straight from the paper's pseudocode."""
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # max by count, ties lexicographic — same rule as the engine
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_merges_match_python_reference(spark):
    rows = load(spark, SF_DIR, "documents").select("text").collect()
    freqs = collections.Counter()
    for r in rows:
        for w in re.split(r"\s+", r["text"].strip().lower()):
            freqs[w] += 1
    expect = _py_bpe(dict(freqs), N_MERGES)
    got = bpe_train(spark, SF_DIR, n_merges=N_MERGES)
    assert got == expect, (got, expect)


def test_bpe_segmentation_matches_python_replay(spark):
    """Inference parity: segmenting words with bpe_segment_expr must
    equal replaying the trained merges in order in pure Python."""
    from pyspark.sql import functions as F
    from data_pipelines_course_spark.operators.textprep import (
        bpe_segment_expr, bpe_train)

    merges = bpe_train(spark, SF_DIR, n_merges=N_MERGES)
    words = ["table", "tablet", "a", "scan", "zzq"]

    def py_seg(word):
        syms = list(word) + ["</w>"]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: list(r["seg"]) for r in
           df.select("word", F.expr(bpe_segment_expr("word", merges))
                     .alias("seg")).collect()}
    assert got == {w: py_seg(w) for w in words}


def test_bpe_segment_expr_survives_backslash_symbols(spark):
    """A merged symbol containing a backslash (possible after whitespace
    split on real corpora, e.g. latex or windows paths) must interpolate
    into the fold expression without corrupting it. ADVICE r3 (low)."""
    from pyspark.sql import functions as F
    from data_pipelines_course_spark.operators.textprep import (
        bpe_segment_expr)

    # Simulate merges learned from a corpus of '\n'-ish tokens: first
    # merge ('\\', 'n'), then ('\\n', "'") — backslash AND quote.
    merges = [("\\", "n"), ("\\n", "'")]
    df = spark.createDataFrame([("\\n'x",), ("ab",)], "word string")
    got = {r["word"]: list(r["seg"]) for r in
           df.select("word", F.expr(bpe_segment_expr("word", merges))
                     .alias("seg")).collect()}
    assert got["\\n'x"] == ["\\n'", "x", "</w>"]
    assert got["ab"] == ["a", "b", "</w>"]
