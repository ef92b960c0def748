"""ANN quality tests: every approximate path (LSH buckets, IVF cells,
k-means/SemDeDup, PQ/ADC, composed IVF-PQ) measured against the exact
brute-force ranking — the check the rows-only driver gate can't do."""

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


# ---------------------------------------------------------------------------
# Spherical k-means trainer + SemDeDup scale path (similarity.py)
# ---------------------------------------------------------------------------

def test_kmeans_objective_monotone(spark):
    """Lloyd's guarantee: the spherical objective (mean cos to assigned
    centroid, measured at each assignment step) never decreases."""
    from data_pipelines_course_spark.operators.similarity import kmeans_train

    cents, hist = kmeans_train(spark, SF_DIR)
    assert len(hist) >= 2
    assert all(b >= a - 1e-9 for a, b in zip(hist, hist[1:]))
    # centroids live on the unit sphere
    assert all(abs(sum(x * x for x in c) - 1.0) < 1e-9 for c in cents)


def test_kmeans_cells_partition_corpus(spark):
    from data_pipelines_course_spark.operators.similarity import KMEANS_K

    rows = all_queries()["embedding_kmeans"](spark, SF_DIR).collect()
    assert sum(r["n_vecs"] for r in rows) == 500
    assert all(0 <= r["cell"] < KMEANS_K for r in rows)
    assert all(r["min_cos"] <= r["avg_cos"] for r in rows)


def test_semdedup_recall_vs_exact(spark):
    """Within-cell (soft top-2) candidates vs the exact O(n²) twin.
    Measured 13/20 on this isotropic corpus whose top 'pairs' sit at
    cos≈0.45-0.51 — not duplicates, the hardest case for partitioned
    search (see semdedup_candidates docstring). Floor 0.5."""
    exact_rows = all_queries()["embedding_neardup_topk"](spark, SF_DIR).collect()
    exact = {(r["id1"], r["id2"]): r["cos_sim"] for r in exact_rows}
    found_rows = all_queries()["semdedup_candidates"](spark, SF_DIR).collect()
    assert all(r["id1"] < r["id2"] for r in found_rows)
    found = {(r["id1"], r["id2"]): r["cos_sim"] for r in found_rows}
    hits = exact.keys() & found.keys()
    assert len(hits) / len(exact) >= 0.5
    # candidates are exact-cosine scored: every shared pair agrees
    for k in hits:
        assert abs(exact[k] - found[k]) < 2e-6


def test_pq_recall_vs_brute_force(spark):
    """PQ/ADC with 4-bit codes per subspace and 16x refine (r11: 8x
    widened, monotone-nondecreasing — see PQ_REFINE): measured
    recall@10 >= 0.8 on this isotropic corpus (neighbors at cos~0.5 —
    the hardest regime for any quantizer); floor at 0.6 for machine
    drift. Clustered real-embedding corpora sit far higher."""
    brute = set(_topk_ids(spark, "knn_brute_force"))
    pq = set(_topk_ids(spark, "pq_topk"))
    assert len(pq & brute) / len(brute) >= 0.6


def test_pq_scores_are_exact_cosines(spark):
    """PQ re-ranks with EXACT cosine — ADC only picks candidates, so
    every returned score must match brute force for the same vec_id."""
    brute = {r["vec_id"]: r["cos_sim"]
             for r in all_queries()["knn_brute_force"](spark, SF_DIR).collect()}
    for r in all_queries()["pq_topk"](spark, SF_DIR).collect():
        if r["vec_id"] in brute:
            assert abs(r["cos_sim"] - brute[r["vec_id"]]) < 1e-9


def test_ivf_cells_as_partition_column_prune_probe_reads(spark, tmp_path):
    """Substantiates ivf_topk's scale claim ('the cell id is a
    write-time partition column; a probe reads IVF_NPROBE partitions'):
    write embeddings partitioned by their IVF cell, probe with a cell
    filter, and assert (a) partition filters fire in the plan and
    (b) the scan touches only the probed cells' files."""
    from pyspark.sql import functions as F
    from data_pipelines_course_spark import datasets
    from data_pipelines_course_spark.operators import similarity as sim
    from data_pipelines_course_spark.plans import analysis as pa

    emb = datasets.load(spark, SF_DIR, "embeddings")
    cent_rows = (emb.filter(F.col("vec_id") < sim.IVF_K)
                 .select("vec_id", "embedding").collect())
    cents = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
             for r in cent_rows}
    scores = F.array(*[
        F.struct(sim.cosine("embedding", sim._arr_sql(cents[c])).alias("s"),
                 F.lit(c).alias("c")) for c in sorted(cents)])
    best = F.element_at(F.sort_array(scores, asc=False), 1)["c"]
    path = str(tmp_path / "ivf_layout")
    (emb.withColumn("cell", best)
     .write.partitionBy("cell").parquet(path))

    probe_cells = [0, 3, 7, 11]
    probed = (spark.read.parquet(path)
              .filter(F.col("cell").isin(probe_cells)))
    # PartitionFilters on the scan = static partition pruning fires
    # (the same proof shape as test_partition_pruning_fires; a file-level
    # count isn't plan-visible pre-execution — inputFiles() lists the
    # unpruned relation).
    parts = pa.partition_filters(probed)
    assert any("cell" in p for p in parts), parts
    # and the probed read is row-identical to the unpartitioned filter
    n_src = (emb.withColumn("cell", best)
             .filter(F.col("cell").isin(probe_cells)).count())
    assert probed.count() == n_src


def test_ivf_pq_recall_and_exact_rerank(spark):
    """The composed IVF-PQ path: measured recall@10 = 1.0 on this
    corpus (floor 0.6 — bounded above by the IVF routing recall), and
    every returned score must be the exact brute-force cosine."""
    brute = {r["vec_id"]: r["cos_sim"]
             for r in all_queries()["knn_brute_force"](spark, SF_DIR).collect()}
    got = all_queries()["ivf_pq_topk"](spark, SF_DIR).collect()
    assert len(set(r["vec_id"] for r in got) & set(brute)) / len(brute) >= 0.6
    for r in got:
        if r["vec_id"] in brute:
            assert abs(r["cos_sim"] - brute[r["vec_id"]]) < 1e-9


def test_py_cos_zero_norm_sorts_below_every_real_centroid():
    """ADVICE r10/r11: a trained centroid CAN be the exact zero vector
    when a cell's member mean cancels (adversarial v/-v corpora — _unit
    returns zero vectors unchanged). The original fix returned 0.0,
    which still let the direction-less centroid outrank a NEGATIVELY
    correlated real cell and consume an IVF_NPROBE slot (ADVICE r11);
    -inf ranks it below every real centroid, matching the column-side
    NULL-last semantics (NULL sorts below -1 under the desc sort)."""
    from data_pipelines_course_spark.operators.similarity import _py_cos

    assert _py_cos([1.0, 0.0], [0.0, 0.0]) == float("-inf")
    assert _py_cos([0.0, 0.0], [1.0, 0.0]) == float("-inf")
    assert _py_cos([0.0, 0.0], [0.0, 0.0]) == float("-inf")
    # real vectors unaffected
    assert abs(_py_cos([1.0, 0.0], [1.0, 0.0]) - 1.0) < 1e-12
    assert abs(_py_cos([1.0, 0.0], [0.0, 1.0])) < 1e-12
    # routing sort order: zero-norm centroid loses to any positive-cos one
    cents = [[0.0, 0.0], [0.6, 0.8]]
    ranked = sorted(range(2), key=lambda c: -_py_cos([1.0, 0.0], cents[c]))
    assert ranked[0] == 1
    # ...and to a NEGATIVELY-correlated real one (the r11 finding: 0.0
    # put the zero centroid ahead of cos=-0.8 and stole its nprobe slot)
    cents = [[0.0, 0.0], [-0.6, -0.8]]
    ranked = sorted(range(2), key=lambda c: -_py_cos([1.0, 0.0], cents[c]))
    assert ranked[0] == 1
