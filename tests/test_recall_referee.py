"""Pins for the sampled-ground-truth LSH recall referee (VERDICT r7 #1).

recall_referee.py measures minhash/simhash recall at the shingle-
saturated sf10-docs tier, where the exact-Jaccard GT is budget-dead and
only a SAMPLED exact GT is tractable. These tests pin the referee's two
load-bearing properties at sf0.01, where everything is cheap:

1. The sampler is deterministic AND oracle-checkable: the md5-bucket
   membership is recomputed by DuckDB (an independent engine) and must
   match row-for-row — so the sf10 sample is a pure function of doc_id,
   not of partitioning, ordering, or Spark version.
2. Restriction validity: exact-Jaccard pairs computed WITHIN the sample
   equal the full-corpus exact pairs restricted to sampled endpoints.
   Jaccard is a pairwise function of the two documents alone, so the
   sampled GT is exact, not an estimate — this is the whole argument
   for why sampled recall measures true recall.
3. Plumbing identity: with mod=1 (sample = corpus) the referee's recall
   equals the direct full-GT recall of tests/test_dedup_recall.py.
"""

from __future__ import annotations

import pytest

# Referee suite: long-tail tier (VERDICT r12 #2) — deselected from the
# default fast tier; runs builder-side with -m "slow or not slow".
pytestmark = pytest.mark.slow


import duckdb

from recall_referee import (
    diagnose_missed, exact_pairs_within, measure, restrict_to_sample,
    sample_documents,
)
from data_pipelines_course_spark.datasets import load
from data_pipelines_course_spark.operators.sampling import _bucket_sql
from data_pipelines_course_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.01"
MOD = 4


def test_sampler_deterministic_and_oracle_checkable(spark):
    docs = load(spark, SF_DIR, "documents")
    ids1 = sorted(r["doc_id"] for r in
                  sample_documents(docs, MOD).select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in
                  sample_documents(docs, MOD).select("doc_id").collect())
    assert ids1 == ids2 and ids1, "sampler not deterministic (or empty)"
    duck_ids = sorted(r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' "
        f"WHERE {_bucket_sql('doc_id', MOD)} = 0").fetchall())
    assert ids1 == duck_ids, "md5-bucket sample diverges from DuckDB"


def test_sample_gt_is_restriction_of_full_gt(spark):
    docs = load(spark, SF_DIR, "documents")
    sample = sample_documents(docs, MOD)
    ids = {r["doc_id"] for r in sample.select("doc_id").collect()}
    sample_gt = exact_pairs_within(sample)
    q = all_queries()
    full_gt = {(r["doc1"], r["doc2"]): r["jaccard"]
               for r in q["ngram_jaccard_threshold"](spark, SF_DIR).collect()}
    restricted = {p: j for p, j in full_gt.items()
                  if p[0] in ids and p[1] in ids}
    assert set(sample_gt) == set(restricted)
    for p, j in restricted.items():
        assert abs(sample_gt[p] - j) < 1e-6


def test_restrict_to_sample_keeps_only_sampled_endpoints(spark):
    docs = load(spark, SF_DIR, "documents")
    sample = sample_documents(docs, MOD)
    ids = {r["doc_id"] for r in sample.select("doc_id").collect()}
    q = all_queries()
    pairs = q["minhash_lsh_pairs"](spark, SF_DIR)
    within = {(r["doc1"], r["doc2"])
              for r in restrict_to_sample(pairs, sample).collect()}
    full = {(r["doc1"], r["doc2"]) for r in pairs.collect()}
    assert within == {p for p in full if p[0] in ids and p[1] in ids}


def test_diagnose_missed_attribution(spark):
    """The miss-attribution replays the registered pipeline's drop
    points: a near-identical pair must show all bands agreeing and
    est~1 (so if it were missed, the verdict would be the
    investigate-me one), while a dissimilar pair is a banding miss."""
    from data_pipelines_course_spark.operators.dedup import _pair_jaccard

    q = all_queries()
    top = q["ngram_jaccard_topk"](spark, SF_DIR).collect()
    near = (top[0]["doc1"], top[0]["doc2"])          # jaccard ~1
    assert top[0]["jaccard"] >= 0.9
    # A pair sharing ZERO shingles (absent from the shared-shingle join
    # output): a banding miss with certainty — any band agreement would
    # need 4 simultaneous minhash collisions on disjoint sets.
    docs = load(spark, SF_DIR, "documents")
    sharing = {(r["doc1"], r["doc2"])
               for r in _pair_jaccard(docs).select("doc1", "doc2").collect()}
    far = next((near[0], b) for b in range(near[0] + 1, near[0] + 50)
               if b != near[1] and (near[0], b) not in sharing
               and (b, near[0]) not in sharing)
    near_r, far_r = diagnose_missed(spark, SF_DIR, [near, far])
    assert near_r["agreeing_bands"] == 8 and near_r["est_jaccard"] >= 0.9
    assert near_r["cause"] == "skew_guard_or_bug"    # found-pair replay
    assert far_r["cause"] == "banding" and far_r["agreeing_bands"] == 0


def test_referee_equals_direct_when_sample_is_all(spark):
    out = measure(spark, SF_DIR, mod=1)
    assert out["n_sample"] == out["n_docs"] == 500
    q = all_queries()
    truth = {(r["doc1"], r["doc2"])
             for r in q["ngram_jaccard_threshold"](spark, SF_DIR).collect()}
    found = {(r["doc1"], r["doc2"])
             for r in q["minhash_lsh_pairs"](spark, SF_DIR).collect()}
    direct = round(len(truth & found) / len(truth), 4)
    assert out["lsh"]["minhash_lsh_pairs"]["recall"] == direct
    assert out["lsh"]["minhash_lsh_pairs"]["truth_pairs"] == len(truth)


def test_wilson_ci_known_values():
    """Wilson 95% intervals against hand-computed references, including
    the ADVICE r8 #1 case: sf10 [0.7,0.8) measured 12/16 = 0.75 vs
    banding theory 0.9334 — the CI [0.5050, 0.8982] does NOT cover
    theory, and the honest reading is est-cutoff loss (unmodeled below
    J~0.8) plus noise, not a banding bug. The referee must report that
    via theory_in_ci rather than a prose 'at-or-above' claim."""
    from recall_referee import wilson_ci
    lo, hi = wilson_ci(12, 16)
    assert (lo, hi) == (0.505, 0.8982)
    assert not (lo <= 0.9334 <= hi)
    # degenerate and boundary cases
    assert wilson_ci(0, 0) == (0.0, 1.0)
    lo0, hi0 = wilson_ci(0, 10)
    assert lo0 == 0.0 and 0.25 < hi0 < 0.35      # 0/10 -> [0, 0.2775]
    lo1, hi1 = wilson_ci(10, 10)
    assert hi1 == 1.0 and 0.65 < lo1 < 0.75      # 10/10 -> [0.7225, 1]
    # CI always brackets the point estimate
    for h, n in ((1, 3), (5, 7), (88, 88), (224, 294)):
        lo, hi = wilson_ci(h, n)
        assert lo <= h / n <= hi


def test_recall_cells_carry_ci_and_theory_flags(spark):
    """Every per-band cell in the referee output carries the Wilson CI,
    and minhash cells carry theory_in_ci / at_or_above_theory — the
    machine-checkable form of the (restated) recall contract."""
    out = measure(spark, SF_DIR, mod=1)
    bands = out["lsh"]["minhash_lsh_pairs"]["by_band"]
    assert bands, "no J-bands at sf0.01?"
    for cell in bands.values():
        lo, hi = cell["ci95"]
        assert 0.0 <= lo <= cell["recall"] <= hi <= 1.0
        assert isinstance(cell["theory_in_ci"], bool)
        assert cell["at_or_above_theory"] == (
            cell["recall"] >= cell["theory_mean"])
    for cell in out["lsh"]["simhash_pairs"]["by_band"].values():
        assert "ci95" in cell and "theory_mean" not in cell


def test_full_model_vs_banding_only():
    """The r11 full pipeline model (banding AND est-cutoff,
    _full_model_p): always <= the banding-only s-curve (the cutoff can
    only remove emissions), materially below it only in the weak-J
    regime, coinciding above J~0.7 (so a [0.7,0.8) shortfall cannot be
    blamed on the cutoff under ideal minhash — the r11 triage's
    premise), monotone in J, and exactly the banding curve at J=1."""
    from recall_referee import _banding_p, _full_model_p

    prev = 0.0
    for j in [i / 20 for i in range(1, 21)]:
        full, band = _full_model_p(j), _banding_p(j)
        assert full <= band + 1e-12
        assert full >= prev - 1e-12  # monotone
        prev = full
    # cutoff term material at J=0.6, gone by J=0.75 (3 dp)
    assert _banding_p(0.6) - _full_model_p(0.6) > 0.01
    assert abs(_banding_p(0.75) - _full_model_p(0.75)) < 1e-3
    assert abs(_full_model_p(1.0) - 1.0) < 1e-12


def test_recall_cells_carry_banding_mean(spark):
    """r11: minhash cells carry BOTH curves — theory_mean (full model,
    the judged one) and banding_mean (classic s-curve, cross-round
    comparability), with full <= banding per cell."""
    out = measure(spark, SF_DIR, mod=1)
    for cell in out["lsh"]["minhash_lsh_pairs"]["by_band"].values():
        assert cell["theory_mean"] <= cell["banding_mean"] + 1e-9
