"""ANN quality tests: both approximate paths (LSH buckets, IVF cells)
measured against the exact brute-force ranking — the check the rows-only
driver gate can't do."""

from __future__ import annotations

from data_pipelines_course_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.01"


def _topk_ids(spark, name):
    return [r["vec_id"] for r in all_queries()[name](spark, SF_DIR).collect()]


def test_ivf_recall_vs_brute_force(spark):
    brute = set(_topk_ids(spark, "knn_brute_force"))
    ivf = set(_topk_ids(spark, "ivf_topk"))
    assert len(ivf & brute) / len(brute) >= 0.8


def test_lsh_recall_vs_brute_force(spark):
    brute = set(_topk_ids(spark, "knn_brute_force"))
    lsh = set(_topk_ids(spark, "ann_lsh_topk"))
    # single-table LSH probes one bucket; recall floor is looser than IVF
    assert len(lsh & brute) / len(brute) >= 0.5


def test_ivf_scores_are_exact_cosines(spark):
    """IVF re-ranks with EXACT cosine — every returned score must equal
    the brute-force score for the same vec_id."""
    brute = {r["vec_id"]: r["cos_sim"]
             for r in all_queries()["knn_brute_force"](spark, SF_DIR).collect()}
    for r in all_queries()["ivf_topk"](spark, SF_DIR).collect():
        if r["vec_id"] in brute:
            assert abs(r["cos_sim"] - brute[r["vec_id"]]) < 1e-9
