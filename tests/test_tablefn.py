"""Python UDTF exemplar tests (functions/tablefn.py)."""

from __future__ import annotations

from data_pipelines_course_spark.functions import tablefn


def test_chunking_via_lateral_sql(spark):
    tablefn.register(spark)
    spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, None)],
        "doc_id int, text string",
    ).createOrReplaceTempView("chunk_docs")
    rows = spark.sql("""
        SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk
        FROM chunk_docs d, LATERAL sentence_chunks(d.text, 4, 1) c
        ORDER BY d.doc_id, c.chunk_id
    """).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 tokens, size 4, step 3 -> windows at 0, 3, 6 (the window
    # at 6 reaches the end, so no trailing 1-token fragment is emitted)
    assert [r["n_tokens"] for r in by_doc[1]] == [4, 4, 4]
    # overlap: last token of chunk k = first token of chunk k+1
    assert by_doc[1][0]["chunk"].split()[-1] == \
        by_doc[1][1]["chunk"].split()[0]
    # full coverage: concatenating chunks minus overlaps restores the doc
    restored = by_doc[1][0]["chunk"].split()
    for r in by_doc[1][1:]:
        restored += r["chunk"].split()[1:]
    assert restored == [f"t{i}" for i in range(10)]
    assert [r["n_tokens"] for r in by_doc[2]] == [2]
    assert 3 not in by_doc  # None text yields nothing


def test_short_and_exact_boundary(spark):
    tablefn.register(spark)
    rows = spark.sql(
        "SELECT * FROM sentence_chunks('a b c d', 4, 0)").collect()
    assert len(rows) == 1 and rows[0]["chunk"] == "a b c d"
    rows = spark.sql(
        "SELECT * FROM sentence_chunks('a b c d e', 2, 0)").collect()
    assert [r["chunk"] for r in rows] == ["a b", "c d", "e"]
