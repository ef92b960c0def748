"""Adversarial coverage for the ROWS-ONLY approximate family (VERDICT
r4 #3): minhash/simhash LSH, the four ANN serving paths, k-means and
SemDeDup. These have no SQL oracle, so the adversarial corpora check
CONTRACTS instead of parity: crash-free on NULL text / zero vectors /
zero rows / unicode, invariant outputs (orientation, ranges, no self
pairs), the skew guard actually guarding, and degenerate inputs (a
single vector) converging.

The clean-corpus recall numbers live in tests/test_similarity.py and
tests/test_dedup_recall.py; this file is about the inputs a 100 TB
crawl WILL contain and the driver's clean testdata never shows.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

# Reusing the committed corpus builders (module-scoped fixtures import
# cleanly because tests/ is a package).
from tests.test_adversarial import adv_dir, empty_dir, uni_dir  # noqa: F401

ANN_QUERIES = ["ann_lsh_topk", "ivf_topk", "pq_topk", "ivf_pq_topk"]
PAIR_QUERIES = ["minhash_lsh_pairs", "simhash_pairs"]
APPROX_ALL = ANN_QUERIES + PAIR_QUERIES + [
    "embedding_kmeans", "semdedup_candidates"]


def _queries():
    from data_pipelines_course_spark.queries import all_queries

    return all_queries()


# ---------------------------------------------------------------------------
# NULL/zero-value corpus (adv_dir: NULL text, empty strings, a zero
# embedding vector, exact + near duplicate docs)
# ---------------------------------------------------------------------------


def test_minhash_finds_exact_dup_and_keeps_invariants(spark, adv_dir):
    """Docs 9 and 10 are byte-identical: identical shingle sets give
    identical signatures, so LSH MUST pair them at est_jaccard = 1.0.
    NULL text / empty / single-word docs flow through without crashing
    and never appear in pairs (no shingles -> no signature)."""
    df = _queries()["minhash_lsh_pairs"](spark, adv_dir).toPandas()
    assert ((df["doc1"] == 9) & (df["doc2"] == 10)).any()
    exact = df[(df["doc1"] == 9) & (df["doc2"] == 10)]
    assert (exact["est_jaccard"] == 1.0).all()
    assert (df["doc1"] < df["doc2"]).all()          # orientation
    assert (df["est_jaccard"] >= 0.5).all()
    assert (df["est_jaccard"] <= 1.0).all()
    assert not df[["doc1", "doc2"]].duplicated().any()


def test_simhash_finds_exact_dup_and_keeps_invariants(spark, adv_dir):
    df = _queries()["simhash_pairs"](spark, adv_dir).toPandas()
    exact = df[(df["doc1"] == 9) & (df["doc2"] == 10)]
    assert len(exact) == 1 and (exact["hamming"] == 0).all()
    assert (df["doc1"] < df["doc2"]).all()
    assert (df["hamming"] >= 0).all() and (df["hamming"] <= 3).all()
    assert not df[["doc1", "doc2"]].duplicated().any()


@pytest.mark.parametrize("name", ANN_QUERIES)
def test_ann_paths_survive_zero_vector_corpus(spark, adv_dir, name):
    """The adv embeddings are 8-dim (not the production 64) and include
    an all-zeros vector INSIDE the coarse-quantizer id range — every
    serving path must stay crash-free (no ANSI divide-by-zero, no
    Python ZeroDivisionError in probe routing), exclude the probe and
    the direction-less zero vector from results, and emit cosines in
    [-1, 1]."""
    from data_pipelines_course_spark.operators.similarity import (
        QUERY_VEC_ID)

    df = _queries()[name](spark, adv_dir).toPandas()
    assert len(df) <= 10
    assert QUERY_VEC_ID not in set(df["vec_id"])
    assert 12 not in set(df["vec_id"])              # the zero vector
    assert df["cos_sim"].notna().all()
    assert ((df["cos_sim"] >= -1.0 - 1e-9)
            & (df["cos_sim"] <= 1.0 + 1e-9)).all()


def test_kmeans_survives_zero_vector_and_stays_monotone(spark, adv_dir):
    from data_pipelines_course_spark.operators.similarity import (
        kmeans_train)

    cells = _queries()["embedding_kmeans"](spark, adv_dir).toPandas()
    # 13 vectors minus the direction-less zero vector
    assert cells["n_vecs"].sum() == 12
    assert cells["avg_cos"].between(-1.0, 1.0 + 1e-9).all()
    _, history = kmeans_train(spark, adv_dir)
    assert history == sorted(history)               # Lloyd monotonicity


def test_semdedup_survives_zero_vector_corpus(spark, adv_dir):
    df = _queries()["semdedup_candidates"](spark, adv_dir).toPandas()
    assert (df["id1"] < df["id2"]).all()
    assert 12 not in set(df["id1"]) | set(df["id2"])
    assert df["cos_sim"].notna().all()
    assert ((df["cos_sim"] >= -1.0 - 1e-9)
            & (df["cos_sim"] <= 1.0 + 1e-9)).all()
    assert not df[["id1", "id2"]].duplicated().any()


# ---------------------------------------------------------------------------
# Zero-row corpus (an incremental pipeline's very first run)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", APPROX_ALL)
def test_approx_family_empty_corpus(spark, empty_dir, name):
    """Every approximate path must return an EMPTY result on a zero-row
    corpus — not crash on a missing probe vector, an empty training
    sample, or a head() that returned None."""
    df = _queries()[name](spark, empty_dir).toPandas()
    assert len(df) == 0


# ---------------------------------------------------------------------------
# Unicode corpus (CJK without spaces, emoji, combining marks)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", PAIR_QUERIES)
def test_pair_queries_unicode_corpus(spark, uni_dir, name):
    """Multibyte tokens flow through signature hashing with the same
    invariants — and a spaceless CJK doc (ONE giant token) must not
    crash signature building."""
    df = _queries()[name](spark, uni_dir).toPandas()
    assert (df["doc1"] < df["doc2"]).all()
    assert not df[["doc1", "doc2"]].duplicated().any()


# ---------------------------------------------------------------------------
# Skew: one hot LSH bucket above MAX_BUCKET
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hotbucket_dir(tmp_path_factory):
    """300 byte-identical docs (> MAX_BUCKET = 256, all landing in the
    same band buckets) plus one moderate near-dup pair and filler."""
    import random
    import shutil

    rng = random.Random(7)
    out = tmp_path_factory.mktemp("sfhot")
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = []

    def add(text, source="srcA"):
        docs.append((len(docs), text, "en", source, len(text)))

    hot = " ".join(rng.choices(vocab, k=40))
    for _ in range(300):
        add(hot, source="bot")
    pair = " ".join(rng.choices(vocab, k=60))
    add(pair)
    add(pair)                                       # the recoverable dup
    for _ in range(20):
        add(" ".join(rng.choices(vocab, k=rng.randint(15, 50))))
    pd.DataFrame(docs,
                 columns=["doc_id", "text", "lang", "source", "n_chars"]) \
        .to_parquet(out / "documents.parquet", index=False)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    out / f"{t}.parquet")
    return str(out)


def test_minhash_hot_bucket_guard(spark, hotbucket_dir):
    """A 300-doc identical cluster exceeds MAX_BUCKET: its buckets are
    EXCLUDED (the documented guard tradeoff — 300²/2 candidate pairs
    would otherwise dominate the join), while the moderate dup pair
    outside the hot bucket is still found. This is the guard actually
    guarding, not just existing."""
    from data_pipelines_course_spark.operators.dedup import MAX_BUCKET

    assert MAX_BUCKET < 300                         # premise of the test
    df = _queries()["minhash_lsh_pairs"](spark, hotbucket_dir).toPandas()
    hot_ids = set(range(300))
    in_hot = df[df["doc1"].isin(hot_ids) & df["doc2"].isin(hot_ids)]
    assert len(in_hot) == 0                         # guard dropped them
    assert ((df["doc1"] == 300) & (df["doc2"] == 301)).any()  # dup kept


# ---------------------------------------------------------------------------
# Degenerate training inputs
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def onevec_dir(tmp_path_factory):
    import shutil

    import numpy as np

    out = tmp_path_factory.mktemp("sfonevec")
    pd.DataFrame(
        [(0, np.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 2.0],
                      dtype=np.float32), 0)],
        columns=["vec_id", "embedding", "label"]) \
        .to_parquet(out / "embeddings.parquet", index=False)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    out / f"{t}.parquet")
    return str(out)


def test_kmeans_single_point_converges(spark, onevec_dir):
    """k-means on ONE vector: a single centroid (= the normalized
    point), one member at cosine 1.0, and a monotone one-step history —
    not a crash on k > n."""
    from data_pipelines_course_spark.operators.similarity import (
        kmeans_train)

    cells = _queries()["embedding_kmeans"](spark, onevec_dir).toPandas()
    assert len(cells) == 1
    assert int(cells["n_vecs"].iloc[0]) == 1
    assert math.isclose(float(cells["avg_cos"].iloc[0]), 1.0,
                        abs_tol=1e-4)
    cents, history = kmeans_train(spark, onevec_dir)
    assert len(cents) >= 1 and len(history) >= 1
    assert history == sorted(history)


def test_ann_single_point_corpus(spark, onevec_dir):
    """The probe IS the whole corpus: every serving path must return
    zero neighbors (the probe never matches itself), not crash."""
    for name in ANN_QUERIES:
        df = _queries()[name](spark, onevec_dir).toPandas()
        assert len(df) == 0, name


def test_simhash_hot_bucket_guard(spark, hotbucket_dir):
    """simhash's chunk buckets get the same MAX_BUCKET guard as minhash
    (closed r5): the 300-doc identical cluster shares ALL four 16-bit
    chunks, so without the guard one boilerplate mega-cluster costs
    4 * 300^2/2 candidate rows. The guard drops those buckets while the
    moderate dup pair outside them still surfaces at hamming 0."""
    from data_pipelines_course_spark.operators.dedup import MAX_BUCKET

    assert MAX_BUCKET < 300
    df = _queries()["simhash_pairs"](spark, hotbucket_dir).toPandas()
    hot_ids = set(range(300))
    in_hot = df[df["doc1"].isin(hot_ids) & df["doc2"].isin(hot_ids)]
    assert len(in_hot) == 0
    kept = df[(df["doc1"] == 300) & (df["doc2"] == 301)]
    assert len(kept) == 1 and (kept["hamming"] == 0).all()


# ---------------------------------------------------------------------------
# Numeric-extremes corpus (extremes_dir: NaN/Inf-component vectors, a
# 1e200-magnitude vector whose norm overflows to Inf, a 1e-200 vector
# whose squared norm underflows to 0). Round-5 finds pinned here: a NaN
# centroid component used to be interpolated into SQL text and parsed
# as an unresolvable COLUMN NAME (UNRESOLVED_COLUMN kill), and NaN
# vectors passed the `norm > 0` trainer gate because Spark ranks NaN
# largest in comparisons.
# ---------------------------------------------------------------------------

from tests.test_adversarial import extremes_dir  # noqa: F401


def test_kmeans_trains_finite_centroids_on_extremes(spark, extremes_dir):
    """Non-finite vectors are excluded from training (finite_norm gate):
    every centroid component of the trained quantizer is finite, and
    the objective history stays monotone non-decreasing."""
    from data_pipelines_course_spark.operators.similarity import (
        kmeans_train)

    cents, history = kmeans_train(spark, extremes_dir)
    assert cents and history
    assert all(math.isfinite(x) for c in cents for x in c)
    assert all(b >= a - 1e-9 for a, b in zip(history, history[1:]))


@pytest.mark.parametrize("name", ANN_QUERIES + ["embedding_kmeans",
                                                "semdedup_candidates"])
def test_embedding_paths_survive_extremes(spark, extremes_dir, name):
    """Every embedding path runs crash-free over NaN/Inf/overflow/
    underflow vectors, keeps its schema, and never emits a non-finite
    or out-of-range cosine."""
    df = _queries()[name](spark, extremes_dir)
    pdf = df.toPandas()
    assert list(df.columns)
    if "cos_sim" in pdf.columns and len(pdf):
        vals = pdf["cos_sim"].dropna()
        assert ((vals >= -1.0 - 1e-6) & (vals <= 1.0 + 1e-6)).all()
        assert vals.map(math.isfinite).all()
