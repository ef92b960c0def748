"""Sampled-ground-truth LSH recall referee (VERDICT r7 #1).

TWIN_BENCH_r07 proved the LSH family (minhash/simhash) is the only
viable near-dup path at the shingle-saturated sf10-docs tier — but its
RECALL there was unmeasured: the >=0.9 contract is tested only where the
exact-Jaccard ground truth is tractable (tests/test_dedup_recall.py),
and at 500k docs the exact GT is budget-dead (>300 s), which is
precisely the regime that motivates LSH.

This referee closes the gap with a sampled exact GT:

1. Draw a deterministic md5-bucket sample of the corpus (the engine's
   own oracle-checkable sampling primitive, operators/sampling.py —
   DuckDB computes identical buckets, so the sample itself is pinned by
   tests/test_recall_referee.py against an independent engine).
2. Compute exact-Jaccard pairs WITHIN the sample via the registered
   `_pair_jaccard` plan at registered JACCARD_T. Validity: Jaccard is a
   pairwise function of the two documents alone, so the sample's exact
   pair set IS the full corpus's exact pair set restricted to sampled
   endpoints — no estimation, no approximation (property pinned at
   sf0.01 by test_sample_gt_is_restriction_of_full_gt).
3. Run the REGISTERED full-corpus LSH queries (`minhash_lsh_pairs`,
   `simhash_pairs`) at full-corpus signature/banding/skew-guard
   parameters, restrict their output to within-sample pairs, and score
   recall = |found ∩ sample_GT| / |sample_GT|.

Because minhash signatures are per-document, banding recall for a pair
does not depend on the rest of the corpus EXCEPT through the
MAX_BUCKET skew guard and est-Jaccard cutoff — which is exactly why the
measurement must run the registered full-corpus query, not an LSH rerun
on the sample: the guard and the bucket sizes must be the 500k-doc ones.

simhash recall vs the Jaccard-threshold GT is reported as MEASURED
context, not a contract: simhash bounds Hamming distance on a 64-bit
profile (cosine-like on shingle frequency space), a different similarity
notion than set Jaccard, so its number documents the regime rather than
gating it.

Sample-size math: a pair survives uniform doc sampling only if BOTH
endpoints survive, so truth pairs shrink by mod^2, not mod — at sf1,
mod=10 keeps just 7 of 635 truth pairs (measured). The sf10 default is
therefore mod=8 (~62.5k docs, truth/64 expected pairs): dense enough
for per-band statistics, while the sample GT's candidate space
(~12.3B/64 ≈ 192M shared-shingle pairs) stays inside the budget the
full-corpus GT (12.3B) blows.

Usage:
    python recall_referee.py                       # sf10-docs, mod=8
    python recall_referee.py --sf-dir=/tmp/spark_graft_sf1 \
        --mod=10 --full-gt                         # + direct full-GT
                                                   #   recall (referee
                                                   #   validation tier)
Prints one JSON line per invocation; round artifact = RECALL_r08.json.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipelines_course_spark.datasets import load
from data_pipelines_course_spark.operators.dedup import (
    BANDS, JACCARD_T, NUM_PERM, ROWS_PER_BAND, _pair_jaccard,
    minhash_signatures,
)
from data_pipelines_course_spark.operators.sampling import hash_bucket
from data_pipelines_course_spark.queries import all_queries
from data_pipelines_course_spark.session import get_spark


def sample_documents(docs: DataFrame, mod: int, bucket: int = 0) -> DataFrame:
    """Deterministic ~1/mod sample: md5-bucket on doc_id (the engine's
    oracle-checkable sampling primitive). mod=1 is the full corpus."""
    if mod <= 1:
        return docs
    return docs.filter(hash_bucket(F.col("doc_id"), mod) == bucket)


def exact_pairs_within(sample: DataFrame) -> dict[tuple[int, int], float]:
    """(doc1, doc2) -> exact jaccard for all within-sample pairs at the
    registered threshold, via the registered exact plan."""
    rows = (_pair_jaccard(sample)
            .filter(F.col("_jac") >= JACCARD_T)
            .collect())
    return {(r["doc1"], r["doc2"]): r["_jac"] for r in rows}


def restrict_to_sample(pairs: DataFrame, sample: DataFrame) -> DataFrame:
    """Keep pairs whose BOTH endpoints were sampled (broadcast semi-joins
    against the K-row id frame — the pair frame never collects)."""
    ids = F.broadcast(sample.select("doc_id").distinct())
    return (pairs
            .join(ids.withColumnRenamed("doc_id", "doc1"), "doc1", "semi")
            .join(ids.withColumnRenamed("doc_id", "doc2"), "doc2", "semi"))


def _banding_p(j: float, bands: int = BANDS,
               rows: int = ROWS_PER_BAND) -> float:
    """P(a J-similar pair co-buckets in >=1 band) under the given
    banding (default: the REGISTERED 8x4): 1-(1-J^r)^b. This is the
    s-curve every LSH paper tunes against (Leskovec/Rajaraman/Ullman,
    MMDS ch.3) — 0.67 at J=0.6, 0.985 at J=0.8 for 8x4. The
    high-recall twin's 16x2 moves the midpoint to 0.25 (r12)."""
    return 1.0 - (1.0 - j ** rows) ** bands


def _full_model_p(j: float, bands: int = BANDS,
                  rows: int = ROWS_PER_BAND) -> float:
    """P(the registered pipeline EMITS a J-similar pair) under the full
    model the pipeline implements: >=1 agreeing band AND the NUM_PERM-
    sample estimated Jaccard >= 0.5 (VERDICT r10 obs. #1: the banding
    s-curve alone omits the est-cutoff term and so OVERSTATES expected
    recall in sub-0.8 bands; judging theory_in_ci against the full
    model makes it a two-sided gate). Exact DP over the joint event
    with the NUM_PERM per-permutation agreements i.i.d. Bernoulli(J)
    (the min-wise-independence idealization): track (total agreements,
    any-band-complete) across the BANDS bands of ROWS_PER_BAND rows;
    emit-probability = P(any_full AND total >= NUM_PERM/2). Numerically
    the cutoff term is material only below J~0.7 (J=0.6: 0.649 vs
    0.671 banding-only); above it the two curves coincide to 3 dp —
    which is itself diagnostic: a band measured BELOW the full model's
    CI cannot be blamed on the cutoff under ideal minhash (see the
    RECALL_r11 sf10-docs [0.7,0.8) triage in `_recall`'s comment below
    and NOTES_r12.md — the r11 triage notes; VERDICT r11 #2 flagged the
    original citation of a NOTES_r11 that was never written)."""
    from math import comb

    pmf = [comb(rows, k) * j ** k * (1 - j) ** (rows - k)
           for k in range(rows + 1)]
    dp = {(0, False): 1.0}
    for _ in range(bands):
        nxt: dict = {}
        for (s, f), p in dp.items():
            for k in range(rows + 1):
                key = (s + k, f or k == rows)
                nxt[key] = nxt.get(key, 0.0) + p * pmf[k]
        dp = nxt
    return sum(p for (s, f), p in dp.items() if f and s >= NUM_PERM // 2)


def wilson_ci(hit: int, n: int, z: float = 1.96) -> tuple[float, float]:
    """95% Wilson score interval for a binomial proportion — the
    small-n-safe interval (Wilson 1927; Brown/Cai/DasGupta 2001 rate it
    over Wald for n < 40, exactly the referee's band sizes)."""
    if n == 0:
        return (0.0, 1.0)
    p = hit / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5) / denom
    return (round(max(0.0, center - half), 4),
            round(min(1.0, center + half), 4))


def _recall(found: set, truth: dict, theory: bool = True,
            bands: int = BANDS, rows: int = ROWS_PER_BAND) -> dict:
    hit = [p for p in truth if p in found]
    missed = sorted((p for p in truth if p not in found),
                    key=lambda p: truth[p])
    # Stratify by TRUE Jaccard: aggregate recall is a property of the
    # corpus's J-distribution; the implementation contract is per-band
    # recall vs the FULL pipeline model (theory_mean = _full_model_p:
    # banding AND est-cutoff, r11 — VERDICT r10 #3; banding_mean keeps
    # the classic s-curve), judged through a Wilson 95% CI (ADVICE r8
    # #1: band n is 2-300, so point estimates over- and under-shoot
    # theory by binomial noise alone). With the full model, theory_in_ci
    # is a two-sided gate; a band below even the full model's CI is a
    # REAL shortfall to triage — the r11 triage of sf10 [0.7,0.8)
    # (0.75 obs vs 0.932 full-model) found per-perm agreement unbiased
    # (fresh-512-perm probe ~= J) and attributed the gap to the SHARED
    # fixed permutation draw: band agreements are correlated across
    # structurally-similar near-dup pairs, so per-pair ~5% banding-tail
    # events cluster instead of averaging out. Knob answer, measured on
    # the same signatures at sf10-docs: a 16x2 band/row split lifts
    # [0.7,0.8) 0.75 -> 1.0 and [0.6,0.7) 0.85 -> 0.94 at a 63x
    # candidate-volume cost (474k -> 29.8M pairs at 500k docs) — a
    # user-facing precision/cost knob, not a default change; the
    # registered J >= 0.8 contract holds at 1.0 throughout. Measured
    # BELOW the CI of theory in a J >= 0.8 band = implementation bug.
    by_band = {}
    for lo, hi in ((0.6, 0.7), (0.7, 0.8), (0.8, 0.9), (0.9, 1.01)):
        band = [p for p, j in truth.items() if lo <= j < hi]
        if not band:
            continue
        n_hit = sum(p in found for p in band)
        ci_lo, ci_hi = wilson_ci(n_hit, len(band))
        cell = {
            "n": len(band), "hit": n_hit,
            "recall": round(n_hit / len(band), 4),
            "ci95": [ci_lo, ci_hi],
        }
        if theory:
            # Minhash only: the curves are the minhash pipeline's, not a
            # prediction for the Hamming-threshold simhash detector.
            # theory_mean is the FULL model (banding AND est-cutoff,
            # _full_model_p — r11, VERDICT r10 #3); banding_mean keeps
            # the classic s-curve for cross-round comparability.
            tm = round(
                sum(_full_model_p(truth[p], bands, rows)
                    for p in band) / len(band), 4)
            cell["theory_mean"] = tm
            cell["banding_mean"] = round(
                sum(_banding_p(truth[p], bands, rows)
                    for p in band) / len(band), 4)
            cell["theory_in_ci"] = bool(ci_lo <= tm <= ci_hi)
            cell["at_or_above_theory"] = bool(cell["recall"] >= tm)
        by_band[f"[{lo},{hi if hi <= 1 else 1.0})"] = cell
    return {
        "truth_pairs": len(truth),
        "found_in_truth": len(hit),
        "recall": round(len(hit) / len(truth), 4) if truth else None,
        "by_band": by_band,
        # The missed tail, nearest-threshold first: banding theory says
        # misses concentrate just above t.
        "missed_jaccard_head": [round(truth[p], 4) for p in missed[:10]],
    }


def diagnose_missed(spark: SparkSession, sf_dir: str,
                    missed: list[tuple[int, int]],
                    bands: int = BANDS,
                    rows: int = ROWS_PER_BAND) -> list[dict]:
    """Attribute each missed minhash pair to its mechanism, by recomputing
    the two documents' signatures and replaying the registered pipeline's
    three drop points in order:

      banding     — no band's 4-row slice agrees (the s-curve's designed
                    loss; the only loss theory predicts),
      est_cutoff  — a band agrees but the 32-perm estimated Jaccard lands
                    below the query's 0.5 output floor,
      skew_guard_or_bug — a band agrees AND est >= 0.5: the only
                    registered-path explanation left is MAX_BUCKET
                    exclusion (never engaged at any measured tier —
                    max bucket 56 at 500k docs, TWIN_BENCH_r07), so this
                    verdict demands investigation, not a shrug.
    """
    ids = sorted({d for p in missed for d in p})
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id").isin(ids))
    sigs = {r["doc_id"]: list(r["sig"])
            for r in minhash_signatures(docs).collect()}
    out = []
    for d1, d2 in missed:
        s1, s2 = sigs[d1], sigs[d2]
        agree = sum(
            1 for b in range(bands)
            if s1[b * rows:(b + 1) * rows]
            == s2[b * rows:(b + 1) * rows])
        est = sum(x == y for x, y in zip(s1, s2)) / NUM_PERM
        cause = ("banding" if agree == 0
                 else "est_cutoff" if est < 0.5
                 else "skew_guard_or_bug")
        out.append({"doc1": d1, "doc2": d2, "agreeing_bands": agree,
                    "est_jaccard": round(est, 4), "cause": cause})
    return out


def measure(spark: SparkSession, sf_dir: str, mod: int, bucket: int = 0,
            full_gt: bool = False) -> dict:
    docs = load(spark, sf_dir, "documents")
    sample = sample_documents(docs, mod, bucket).transform(
        lambda d: d.persist())
    n_docs = docs.count()
    n_sample = sample.count()

    t0 = time.perf_counter()
    truth = exact_pairs_within(sample)
    gt_sec = time.perf_counter() - t0

    from data_pipelines_course_spark.operators.dedup import (
        HR_BANDS, HR_ROWS_PER_BAND,
    )

    q = all_queries()
    # name -> (bands, rows) for the minhash theory curves; the
    # high-recall twin (VERDICT r11 #5, registered r12) is judged
    # against ITS OWN 16x2 banding+est-cutoff model so its panel sits
    # next to the default's every round.
    band_cfg = {"minhash_lsh_pairs": (BANDS, ROWS_PER_BAND),
                "minhash_lsh_pairs_highrecall": (HR_BANDS,
                                                 HR_ROWS_PER_BAND)}
    out = {"sf_dir": sf_dir, "n_docs": n_docs, "mod": mod, "bucket": bucket,
           "n_sample": n_sample, "jaccard_t": JACCARD_T,
           "sample_gt_sec": round(gt_sec, 1), "lsh": {}}
    for name in ("minhash_lsh_pairs", "simhash_pairs",
                 "minhash_lsh_pairs_highrecall"):
        t0 = time.perf_counter()
        pairs = q[name](spark, sf_dir)
        within = {(r["doc1"], r["doc2"])
                  for r in restrict_to_sample(pairs, sample).collect()}
        bands_n, rows_n = band_cfg.get(name, (BANDS, ROWS_PER_BAND))
        out["lsh"][name] = dict(
            _recall(within, truth, theory=name.startswith("minhash"),
                    bands=bands_n, rows=rows_n),
            sec=round(time.perf_counter() - t0, 1))
        if name.startswith("minhash"):
            missed = [p for p in truth if p not in within][:40]
            if missed:
                out["lsh"][name]["missed_diagnosis"] = diagnose_missed(
                    spark, sf_dir, missed, bands_n, rows_n)
    if full_gt:
        # Referee-validation mode (tractable tiers only): direct recall
        # against the FULL exact GT, to show sampled recall estimates it.
        t0 = time.perf_counter()
        full_truth = {(r["doc1"], r["doc2"]): r["jaccard"] for r in
                      q["ngram_jaccard_threshold"](spark, sf_dir).collect()}
        out["full_gt_sec"] = round(time.perf_counter() - t0, 1)
        out["full_gt"] = {}
        for name in ("minhash_lsh_pairs", "simhash_pairs",
                     "minhash_lsh_pairs_highrecall"):
            found = {(r["doc1"], r["doc2"])
                     for r in q[name](spark, sf_dir).collect()}
            bands_n, rows_n = band_cfg.get(name, (BANDS, ROWS_PER_BAND))
            out["full_gt"][name] = _recall(
                found, full_truth, theory=name.startswith("minhash"),
                bands=bands_n, rows=rows_n)
    sample.unpersist()
    return out


def main() -> None:
    sf_dir = "/tmp/spark_graft_sf10_docs"
    mod, bucket, full_gt = 8, 0, False
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--mod="):
            mod = int(a.split("=", 1)[1])
        elif a.startswith("--bucket="):
            bucket = int(a.split("=", 1)[1])
        elif a == "--full-gt":
            full_gt = True
    spark = get_spark(app_name="recall-referee")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(measure(spark, sf_dir, mod, bucket, full_gt)),
          flush=True)


if __name__ == "__main__":
    main()
