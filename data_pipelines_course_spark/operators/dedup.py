"""Deduplication operators over the documents table: exact, n-gram
Jaccard, MinHash+LSH, SimHash.

Engine-surface additions for large-scale training-data pipelines (build
brief): none exist in the reference, but they generalize its tokenizer
surface (A6/F1-F2) to the dedup shapes a 100 TB corpus needs.

Scale design:
- Exact dedup: one hash-aggregate on md5(text) — a single shuffle keyed by
  a uniformly distributed 128-bit hash; no skew.
- n-gram Jaccard: exact pairwise similarity restricted to pairs sharing at
  least one shingle (the shingle self-join IS the candidate filter).
  Quadratic in the worst case — used as the small-scale oracle-checked
  ground truth for the LSH paths.
- MinHash+LSH: shingle → 32 min-hashes → 8 bands × 4 rows → band-bucket
  self-join. Cost is O(n · bands) plus the bucket joins: only documents
  agreeing on a full band ever meet, so at 100 TB nothing quadratic
  happens. All hashing is xxhash64 + affine permutations in int64 range
  (a < 2^31, h masked to 32 bits ⇒ a*h+b < 2^63, no overflow).
- SimHash: 64-bit signature from per-token hash sign sums; near-dup =
  Hamming ≤ 3 found by pigeonhole banding on 4×16-bit chunks.

No SQL oracle for the LSH/SimHash paths (hash-permutation semantics are
not expressible in DuckDB's function set); they get rows-only driver
checks plus pytest ground-truth tests against planted duplicates.

DIGEST STAGING / cluster resilience (VERDICT r5 #3): every multiply-
consumed digest table in this module (shingle hashes, signatures,
simhash chunks — 9 sites) is materialized through ``staging.stage()``,
because exchange reuse does not fire across a BroadcastExchange
boundary and each consumer would otherwise re-run the digest pipeline.
The default strategy is ``localCheckpoint(eager=False)`` — fastest, but
it stores blocks on executors WITHOUT lineage fallback: on a real
cluster, losing ONE executor (spot kill, dynamic-allocation idle reap)
makes the checkpointed partitions unrecoverable and fails the job. Set
``SPARK_GRAFT_STAGING=persist`` on preemptible/dynamic clusters —
MEMORY_AND_DISK keeps lineage, so lost blocks recompute instead of
failing; values are identical in every mode (full-registry driver_sim
sweep under persist, NOTES_r06). See ``staging.py`` for the full
trade-off matrix, including ``none`` for plan audits.

PRECONDITION (whole module, and the similarity/kNN family): doc_id is a
unique document identity. Digests (shingle sets, signatures, span
hashes) are computed PER ROW, so a duplicated doc_id carrying two
different texts makes every doc_id-keyed result ambiguous. Violations
are an upstream data fault — detect with audit.key_uniqueness_report
(registered as the `key_uniqueness_report` query, which runs this gate
over lineitem's composite PK — the one the driver generator violates) or
heal with dedup_exact/keep-first BEFORE these operators (PK-violation
axis, tests/test_adversarial.py axis 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..datasets import load, shuffle_width
from ..functions.scalar import fround
from ..queries import query
from ..staging import stage


def _fanout(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition by join key with an EXPLICIT partition count.

    The similarity self-joins below expand a few MB of (doc_id, key) rows
    into millions of candidate pairs — tiny shuffle bytes, heavy CPU. AQE
    sizes partitions by shuffle bytes, so it coalesces these stages down
    to ONE partition and serializes the whole pair-expansion (measured:
    36.8 s → single task at sf0.1). An explicit numPartitions repartition
    (REPARTITION_BY_NUM) is exempt from AQE coalescing, pins the join
    stage's parallelism, and — being keyed on the join columns — lets
    Catalyst reuse a single exchange for both sides of the self-join, so
    shingling/banding is computed once, not twice."""
    n = shuffle_width(df.sparkSession)
    return df.repartition(n, *[F.col(c) for c in cols])


def _widen(df: DataFrame) -> DataFrame:
    """Ensure the expensive shingle/token map stage runs wide.

    At 100 TB the parquet scan is split into ~128 MB tasks and this is a
    no-op. On a small input (one file ⇒ one partition — exactly the local
    bench) the whole interpreted-HOF shingle stage would otherwise run in
    a single task; pay one linear row-shuffle to spread it. Keyed by
    doc_id (not round-robin) so the output partitioning is deterministic.

    Streaming frames pass through untouched: `.rdd` is illegal on them,
    and a micro-batch's parallelism is the source's concern (e.g.
    maxFilesPerTrigger), not a repartition's.

    The width probe is `inputFiles()` — pure metadata, no RDD
    conversion (the r2 `df.rdd.getNumPartitions()` probe forced a plan
    analysis + Py4J round-trip per call). One file can split into many
    tasks but never the reverse, so `files >= n` proves the scan is
    already wide; fewer files (or a non-file frame, which reports [])
    pays the one linear row-shuffle."""
    if df.isStreaming:
        return df
    n = shuffle_width(df.sparkSession)
    try:
        if len(df.inputFiles()) >= n:
            return df
    except Exception:
        pass
    return df.repartition(n, F.col("doc_id"))

# --------------------------------------------------------------------------
# Exact dedup (hash-groupBy).
# --------------------------------------------------------------------------

@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id,
           count(*) AS dup_count
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (docs.groupBy(F.md5("text").alias("fp"))
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count(F.lit(1)).alias("dup_count")))


# --------------------------------------------------------------------------
# Shingling shared by the similarity-dedup family: lowercase whitespace
# words → 3-gram shingles, distinct per document. Pure HOF expressions.
# --------------------------------------------------------------------------

_WORDS = "split(lower(trim(text)), '\\\\s+')"
# Shingles over a STAGED words column `w` — never inline _WORDS into the
# lambda body: the lambda re-evaluates the split per element, turning the
# per-doc cost O(tokens²) (measured 16× on repetition_ratio's identical
# shape). The staging projections below survive CollapseProject because
# each alias is non-cheap and referenced more than once.
_SHINGLES_OF_W = (
    "array_distinct(transform(sequence(1, size(w) - 2),"
    " i -> concat_ws(' ', element_at(w, i),"
    " element_at(w, i + 1), element_at(w, i + 2))))"
)


def _shingle_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, sh_arr): distinct 3-gram shingle array per document;
    documents with <3 words dropped. split() runs once per row."""
    return (_widen(docs)
            .select("doc_id", F.expr(_WORDS).alias("w"))
            .filter(F.size("w") >= 3)
            .select("doc_id", F.expr(_SHINGLES_OF_W).alias("sh_arr")))


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct pairs; documents with <3 words dropped."""
    return (_shingle_arrays(docs)
            .select("doc_id", F.explode("sh_arr").alias("shingle")))


def sized_shingle_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, n, h): per-doc distinct-shingle count carried inline with
    each 64-bit shingle hash.

    Two deliberate scale moves: (a) the set size n is computed from the
    shingle ARRAY before exploding, so no separate sizes aggregation (and
    no extra shuffle) is ever needed downstream; (b) the join key is
    xxhash64(shingle), 8 bytes, instead of the ~25-byte shingle string —
    at 100 TB the shingle self-join's shuffle volume drops ~3× for a
    collision risk of ~(distinct shingles)²/2⁶⁴, which is negligible
    against the LSH paths' intrinsic approximation."""
    return (_shingle_arrays(docs)
            .select("doc_id", F.size("sh_arr").alias("n"),
                    F.explode("sh_arr").alias("shingle"))
            .select("doc_id", "n", F.xxhash64("shingle").alias("h")))


_DUCK_WORDS = "string_split_regex(lower(trim(text)), '\\s+')"
# DuckDB 3-gram shingles via list lambda over start positions.
_DUCK_SHINGLES = (
    f"list_distinct(list_transform(range(1, len({_DUCK_WORDS}) - 1),"
    f" i -> {_DUCK_WORDS}[i] || ' ' || {_DUCK_WORDS}[i+1]"
    f" || ' ' || {_DUCK_WORDS}[i+2]))"
)


# --------------------------------------------------------------------------
# Exact n-gram Jaccard similarity — top-20 most similar pairs. The shingle
# self-join restricts to pairs with ≥1 shared shingle; |A∩B| is the join
# match count and |A∪B| = |A|+|B|−|A∩B|. Integer counts → the jaccard
# double is bit-identical on both engines.
# --------------------------------------------------------------------------

def _pair_jaccard(docs: DataFrame) -> DataFrame:
    """(doc1, doc2, jaccard) for every pair sharing ≥1 shingle.

    One self-join on the 8-byte shingle hash with set sizes carried
    inline (see sized_shingle_hashes) — |A∩B| is the per-pair match count
    and |A∪B| = n1 + n2 − |A∩B|, so the whole computation is join → agg,
    with no sizes re-join. Integer counts → the jaccard double is
    bit-identical on both engines.

    The hashed-shingle table is materialized once (lazy checkpoint of
    (doc_id, n, h) digests): the self-join's broadcast build side
    otherwise re-runs the whole tokenize+shingle pipeline — exchange
    reuse does not fire across a BroadcastExchange boundary. Measured
    1.41 s -> 0.90 s warm at sf0.1 (rebuilt-frame protocol); values
    unchanged (the checkpoint is pure materialization)."""
    sh = _fanout(sized_shingle_hashes(docs), "h").transform(stage)
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.h") == F.col("b.h"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc1"),
                     F.col("b.doc_id").alias("doc2"),
                     F.col("a.n").alias("n1"), F.col("b.n").alias("n2"))
             .groupBy("doc1", "doc2")
             .agg(F.count(F.lit(1)).alias("inter_cnt"),
                  F.max("n1").alias("n1"), F.max("n2").alias("n2")))
    return inter.select(
        "doc1", "doc2",
        (F.col("inter_cnt").cast("double")
         / (F.col("n1") + F.col("n2") - F.col("inter_cnt"))).alias("_jac"))


@query(
    "ngram_jaccard_topk",
    scale_twin="ngram_jaccard_threshold_prefix",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_DUCK_SHINGLES}) AS shingle
        FROM documents WHERE len({_DUCK_WORDS}) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter_cnt
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.doc1, i.doc2,
           floor((CAST(i.inter_cnt AS DOUBLE)
                 / (s1.n + s2.n - i.inter_cnt)) * 1000000 + 0.5) / 1000000 AS jaccard
    FROM inter i
    JOIN sizes s1 ON i.doc1 = s1.doc_id
    JOIN sizes s2 ON i.doc2 = s2.doc_id
    ORDER BY jaccard DESC, doc1, doc2 LIMIT 20
    """,
)
def ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _pair_jaccard(load(spark, sf_dir, "documents"))
    return (pairs
            .select("doc1", "doc2", fround(F.col("_jac"), 6).alias("jaccard"))
            .orderBy(F.desc("jaccard"), "doc1", "doc2")
            .limit(20))


# --------------------------------------------------------------------------
# MinHash + LSH near-dup candidate pairs.
# --------------------------------------------------------------------------

NUM_PERM = 32
BANDS = 8
ROWS_PER_BAND = NUM_PERM // BANDS
_MERSENNE_P = 4294967311  # smallest prime > 2^32
_MASK32 = 0xFFFFFFFF


def _perm_params(n: int = NUM_PERM) -> list[tuple[int, int]]:
    """Deterministic affine permutation params via a fixed LCG (no runtime
    randomness — signatures are stable across runs and engines)."""
    params, state = [], 88172645463325252
    for _ in range(n):
        pair = []
        for _ in range(2):
            # xorshift64 — deterministic, well-mixed
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            pair.append(state % (2**31 - 1) + 1)
        params.append((pair[0], pair[1]))
    return params


PERMS = _perm_params()


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig: array<bigint>[NUM_PERM]) minhash signature table.

    One shuffle: groupBy(doc_id) with NUM_PERM min() partial aggregates —
    Catalyst's map-side partials keep the shuffle narrow at scale.
    """
    sh = shingle_sets(docs)
    # Mask xxhash64 to 32 bits so a*h+b stays within int64.
    hashed = sh.select(
        "doc_id",
        (F.xxhash64("shingle").bitwiseAND(F.lit(_MASK32))).alias("h"),
    )
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_MERSENNE_P))
        .alias(f"s{i}")
        for i, (a, b) in enumerate(PERMS)
    ]
    agg = hashed.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id",
        F.array(*[F.col(f"s{i}") for i in range(NUM_PERM)]).alias("sig"))


# LSH skew guard: a bucket of m docs yields m(m-1)/2 candidate pairs, so
# one adversarial bucket (boilerplate/templated text all agreeing on a
# band) turns the linear banding plan quadratic. Buckets above this
# ceiling are dropped before the self-join — the standard LSH guard.
# Recall impact: only pairs whose EVERY agreeing band is oversized are
# lost; members of such mega-clusters are near-identical and already
# collapsed by dedup_exact / represented via dedup_clusters. The current
# corpus' largest bucket is 4 docs (measured, sf0.1), so at test SF the
# guard changes nothing (asserted by the recall-floor test).
MAX_BUCKET = 256


@query("minhash_lsh_pairs")  # rows-only: hash permutations not SQL-oracle-able
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs with signature-estimated Jaccard.

    LSH banding: docs land in a bucket per (band, hash of 4 signature
    rows); only same-bucket docs are joined. est_jaccard = fraction of
    agreeing signature components; pairs below 0.5 are dropped.

    Recall contract (measured r8/r9, RECALL_r09.json): 8 bands x 4 rows
    puts the banding s-curve's midpoint at (1/b)^(1/r) = 0.595 ~=
    JACCARD_T — the textbook operating point for t=0.6 (MMDS ch.3),
    which means recall at exactly J=t is definitionally ~0.67 for ANY
    correctly tuned banding, rising to 0.985 at J=0.8 and ~1 at
    J>=0.9. The HARD contract is the J>=0.8 bands: measured recall 1.0
    at every tier (sf1 27/27 + 271/271; sf10-docs 2/2 + 86/86), suite
    floor >= 0.9. Below J=0.8 the s-curve is not an expected LOWER
    bound (ADVICE r8 #1): the est-Jaccard >= 0.5 output cutoff drops
    co-bucketed pairs whose 32-sample estimate reads under 0.5 — a
    loss the banding model omits — so measured sits near theory within
    binomial noise, judged by per-band Wilson 95% CIs in the referee
    (r8 spread: sf10 [0.6,0.7) 0.857 ABOVE theory 0.740, sf10
    [0.7,0.8) 0.75 on n=16 vs theory 0.933 — CI [0.51,0.90], the
    cutoff + noise, not a banding bug; sf1 aggregate 0.88 because 46%
    of truth pairs sit in [0.6,0.7) where the s-curve pays its
    designed ~0.75). Aggregate recall is therefore a corpus-
    distribution fact; the implementation gate is the J>=0.8 floor
    plus CI-consistency below it (recall_referee.py).

    Skew guard: buckets larger than MAX_BUCKET are excluded via a window
    count over (band, band_hash) — the window's hash partitioning is the
    self-join's key, so the guard reuses the `_fanout` exchange and adds
    zero extra shuffles.
    """
    return _lsh_banding_pairs(spark, sf_dir, BANDS, ROWS_PER_BAND)


# The measured high-recall banding split (r11 triage, RECALL_r11 +
# recall_referee.py): 16 bands x 2 rows over the SAME 32-perm signatures.
HR_BANDS = 16
HR_ROWS_PER_BAND = NUM_PERM // HR_BANDS


@query("minhash_lsh_pairs_highrecall")  # rows-only: same reason as above
def minhash_lsh_pairs_highrecall(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """`minhash_lsh_pairs` at the measured HIGH-RECALL banding knob:
    16 bands x 2 rows over the same NUM_PERM=32 signatures (same
    shingles, same permutations, same est-Jaccard >= 0.5 output cutoff
    — only the band/row split changes).

    Why it exists as registered product surface (VERDICT r11 #5): the
    r11 [0.7,0.8)-band triage measured, on the same signatures at
    sf10-docs (500k docs), that the 16x2 split lifts band recall
    0.75 -> 1.0 in [0.7,0.8) and 0.85 -> 0.94 in [0.6,0.7), at a 63x
    candidate-volume cost (474k -> 29.8M candidate pairs). That is
    exactly the recall-vs-compute decision a 100 TB dedup run makes —
    the s-curve midpoint (1/b)^(1/r) drops from 0.595 to 0.25, so far
    more sub-threshold pairs co-bucket and the est-cutoff does the
    precision work. Keeping it registered (instead of a docstring
    constant) makes the knob driver-checked every round and lets the
    recall referee publish its per-band panel next to the default's
    (recall_referee.py measures BOTH against the same sampled GT).

    Scale shape is identical to the default: bucketed banding, MAX_BUCKET
    skew guard, digest-only shuffles — the 63x is candidate volume, not
    a plan change."""
    return _lsh_banding_pairs(spark, sf_dir, HR_BANDS, HR_ROWS_PER_BAND)


def _lsh_banding_pairs(spark: SparkSession, sf_dir: str,
                       bands_n: int, rows_per_band: int) -> DataFrame:
    """Shared LSH banding pipeline, parameterized by the band/row split
    (the only degree of freedom between the registered default and the
    high-recall twin). See `minhash_lsh_pairs` for the plan notes."""
    docs = load(spark, sf_dir, "documents")
    # Materialize the signature table ONCE (lazy checkpoint): three
    # branches consume it (the band table + both per-pair re-attach
    # joins), and exchange reuse does not fire across the self-join's
    # BroadcastExchange boundary, so without the checkpoint the full
    # tokenize+minhash pipeline ran up to twice more. (doc_id, sig) is
    # ~260 B/doc of digests — the digest-checkpoint idiom. Measured
    # 1.46 s -> 0.93 s warm at sf0.1 (rebuilt-frame protocol).
    sigs = minhash_signatures(docs).transform(stage)
    # Slim band table: doc_id + band key ONLY. Carrying the 32-long sig
    # through the 8× band explosion and the candidate join would multiply
    # shuffle volume by ~2 KB/doc; instead signatures are re-attached per
    # candidate pair below off the shared checkpoint.
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.expr(
            f"transform(sequence(0, {bands_n - 1}),"
            f" b -> hash(slice(sig, b * {rows_per_band} + 1,"
            f" {rows_per_band})))"))
        .alias("band", "band_hash"),
    )
    bands = _fanout(bands, "band", "band_hash")
    bucket_w = Window.partitionBy("band", "band_hash")
    bands = (bands
             .withColumn("bucket_n", F.count(F.lit(1)).over(bucket_w))
             .filter(F.col("bucket_n") <= MAX_BUCKET)
             .drop("bucket_n"))
    # r12 optimization: stage the guarded band table. The self-join's
    # small side goes through a BroadcastExchange, and exchange reuse
    # does NOT fire across a broadcast boundary (the same reason the
    # signature table above is staged), so _fanout's shared-exchange
    # intent was defeated: the plan ran Generate→Exchange→Sort→Window
    # TWICE, once per join side (plans/r12/minhash_lsh_pairs_before.txt,
    # branches 1-7 vs 8-14). Staging materializes the banding + skew
    # guard once; both sides scan the checkpoint. Measured 0.721 s ->
    # 0.384 s warm at sf0.1 (min-of-7, interleaved); rows identical.
    # Same digest-size argument as the signature checkpoint: (doc_id,
    # band, band_hash) ≈ 20 B/row × bands_n — write-time layout at scale.
    bands = stage(bands)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2"))
            .dropDuplicates(["doc1", "doc2"]))
    # Attach via join CONDITIONS on alias-qualified columns rather than
    # pre-renamed projections: both attach joins then share a canonically
    # identical `sigs` subtree, so the broadcast exchange is built once
    # and reused (pre-renaming made the subtrees differ and re-computed
    # the whole signature pipeline per side — measured 4.7 s of the
    # query's 6 s at sf0.1).
    s1 = sigs.alias("s1")
    s2 = sigs.alias("s2")
    matches = F.size(F.filter(
        F.zip_with(F.col("s1.sig"), F.col("s2.sig"), lambda x, y: x == y),
        lambda v: v))
    est = matches / F.lit(NUM_PERM).cast("double")
    return (cand.join(s1, F.col("doc1") == F.col("s1.doc_id"))
            .join(s2, F.col("doc2") == F.col("s2.doc_id"))
            .select("doc1", "doc2", fround(est, 4).alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= 0.5))


# --------------------------------------------------------------------------
# SimHash near-dup: 64-bit signature; Hamming ≤ HAM_T via pigeonhole
# banding on 4 × 16-bit chunks.
# --------------------------------------------------------------------------

SIMHASH_BITS = 64
HAM_T = 3


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash bigint). Per-token xxhash64; bit i of the signature
    is the sign of Σ_tokens (±count) for that bit. 64 conditional-sum
    aggregates in one hash-aggregate pass."""
    tokens = (_widen(docs)
              .select("doc_id",
                      F.explode(F.split(F.lower(F.trim("text")), r"\s+"))
                      .alias("tok"))
              .filter(F.col("tok") != "")
              .groupBy("doc_id", "tok")
              .agg(F.count(F.lit(1)).alias("cnt"))
              .select("doc_id", "cnt", F.xxhash64("tok").alias("h")))
    bit_sums = [
        F.sum(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1,
                     F.col("cnt")).otherwise(-F.col("cnt"))).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = tokens.groupBy("doc_id").agg(*bit_sums)
    # Assemble signature bitwise-OR of (b_i > 0) << i; shiftleft runs
    # JVM-side so bit 63 never materializes as an (overflowing) literal.
    sig = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0,
                      F.shiftleft(F.lit(1).cast("long"), i)
                      ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select("doc_id", sig.alias("simhash"))


@query("simhash_pairs")  # rows-only: bit-level hashing not SQL-oracle-able
def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with Hamming(simhash1, simhash2) ≤ HAM_T. By pigeonhole, any
    such pair agrees exactly on at least one of 4 16-bit chunks — the
    chunk-equality join is the candidate filter (no quadratic scan).

    Semantics note (measured r8, RECALL_r08.json): Hamming ≤ 3 on a
    64-bit profile is a NEAR-EXACT duplicate detector (Charikar'02 /
    Manku et al. WWW'07 use it for crawl near-dups), not a
    Jaccard-threshold scan — vs the exact J≥0.6 truth set it recovers
    ~0.67 of J≥0.9 pairs and almost nothing below 0.8 at sf1/sf10-docs.
    For threshold-Jaccard dedup use minhash_lsh_pairs; simhash's niche
    is boilerplate/template pages with tiny edits, at about half
    minhash's cost (8.1 s vs 14.0 s at 500k docs, TWIN_BENCH_r07)."""
    docs = load(spark, sf_dir, "documents")
    sigs = simhash_signatures(docs)
    chunks = sigs.select(
        "doc_id", "simhash",
        F.posexplode(F.expr(
            "transform(sequence(0, 3),"
            " c -> (simhash >> (c * 16)) & 65535)")).alias("chunk", "ckey"),
    )
    chunks = _fanout(chunks, "chunk", "ckey")
    # Same skew guard as minhash_lsh_pairs (closed r5 — this path had
    # none): m identical docs share ALL four chunks, so one boilerplate
    # mega-cluster costs 4·m(m-1)/2 candidate rows. The window count
    # partitions on the join key, so the guard reuses the _fanout
    # exchange — zero extra shuffles. Recall impact mirrors minhash's:
    # only pairs whose EVERY agreeing chunk bucket is oversized are
    # lost, and such mega-clusters are dedup_exact/dedup_clusters'
    # job, not a pairwise scan's.
    bucket_w = Window.partitionBy("chunk", "ckey")
    chunks = (chunks
              .withColumn("bucket_n", F.count(F.lit(1)).over(bucket_w))
              .filter(F.col("bucket_n") <= MAX_BUCKET)
              .drop("bucket_n"))
    # Materialize the guarded chunk table ONCE (lazy checkpoint): the
    # self-join's broadcast build side otherwise recomputes the whole
    # signature pipeline (two full tokenize+64-bitsum passes — exchange
    # reuse does not fire across the BroadcastExchange boundary).
    # The table is 4 rows/doc x ~24 B of (doc_id, simhash, chunk, ckey)
    # digests — the attrition-report digest-checkpoint idiom. Measured
    # 1.44 s -> 0.68 s warm at sf0.1.
    chunks = chunks.transform(stage)
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.ckey") == F.col("b.ckey"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2"),
                    F.col("a.simhash").alias("h1"),
                    F.col("b.simhash").alias("h2"))
            .dropDuplicates(["doc1", "doc2"]))
    hamming = F.expr("bit_count(h1 ^ h2)")
    return (cand.select("doc1", "doc2", hamming.alias("hamming"))
            .filter(F.col("hamming") <= HAM_T))


# --------------------------------------------------------------------------
# Exact threshold Jaccard via prefix filtering (AllPairs/PPJoin-style,
# Bayardo et al. WWW'07 / Xiao et al. WWW'08 — the scale path for EXACT
# similarity dedup, complementing the approximate LSH paths).
# --------------------------------------------------------------------------

JACCARD_T = 0.6


@query(
    "ngram_jaccard_threshold",
    scale_twin="ngram_jaccard_threshold_prefix",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_DUCK_SHINGLES}) AS shingle
        FROM documents WHERE len({_DUCK_WORDS}) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter_cnt
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.doc1, i.doc2,
           floor((CAST(i.inter_cnt AS DOUBLE)
                 / (s1.n + s2.n - i.inter_cnt)) * 1000000 + 0.5) / 1000000
               AS jaccard
    FROM inter i
    JOIN sizes s1 ON i.doc1 = s1.doc_id
    JOIN sizes s2 ON i.doc2 = s2.doc_id
    WHERE CAST(i.inter_cnt AS DOUBLE) / (s1.n + s2.n - i.inter_cnt)
          >= {JACCARD_T}
    """,
)
def ngram_jaccard_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with exact Jaccard ≥ JACCARD_T — shared-shingle join plan.

    Same join→agg pipeline as the top-k query with a threshold filter
    instead of a sort. Chosen over the prefix-filtered plan (next query)
    for the bench corpus: in a template-heavy/duplicate-heavy corpus
    nearly every candidate a prefix filter admits ALSO shares dozens of
    shingles, so prefix pruning removes little while paying a frequency
    pass and a verification join — measured 1.5 s vs 4.5 s at sf0.1.
    See ngram_jaccard_threshold_prefix for when that tradeoff flips.
    """
    pairs = _pair_jaccard(load(spark, sf_dir, "documents"))
    return (pairs.filter(F.col("_jac") >= JACCARD_T)
            .select("doc1", "doc2", fround(F.col("_jac"), 6).alias("jaccard")))


@query(
    "ngram_jaccard_threshold_prefix",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_DUCK_SHINGLES}) AS shingle
        FROM documents WHERE len({_DUCK_WORDS}) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter_cnt
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.doc1, i.doc2,
           floor((CAST(i.inter_cnt AS DOUBLE)
                 / (s1.n + s2.n - i.inter_cnt)) * 1000000 + 0.5) / 1000000
               AS jaccard
    FROM inter i
    JOIN sizes s1 ON i.doc1 = s1.doc_id
    JOIN sizes s2 ON i.doc2 = s2.doc_id
    WHERE CAST(i.inter_cnt AS DOUBLE) / (s1.n + s2.n - i.inter_cnt)
          >= {JACCARD_T}
    """,
)
def ngram_jaccard_threshold_prefix(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Same answer via AllPairs/PPJoin-style prefix filtering (Bayardo
    et al. WWW'07; Xiao et al. WWW'08) — the scale path for DIVERSE
    corpora, where pairs sharing ≥1 shingle vastly outnumber pairs with
    J ≥ t and the full shared-shingle join is quadratic-ish.

    Regime boundary (measured r7, TWIN_BENCH_r07.json): prefix
    filtering's pruning power comes from the RARE end of the shingle
    frequency spectrum. On a shingle-SATURATED corpus — distinct
    shingles stop growing while the corpus grows, so every shingle's
    frequency scales with N (the sf10-docs tier: ~30k distinct shingles
    at 5k/50k/500k docs; naive candidate pairs 1.3M → 127M → 12.3B) —
    the prefix buckets are as hot as everything else and this twin is
    candidate-bound like the ground truth (both >300 s at 500k docs,
    parity ~20 s at 50k). Past that boundary the registered path is
    sketch-based LSH (`minhash_lsh_pairs`: 23 s at 500k docs), whose
    cost scales with docs × bands, not shingle-frequency squared.
    Boilerplate-heavy crawl corpora at 100 TB sit in exactly that
    regime for their hot families.

    Prefix filtering: order every doc's shingles by one consistent
    global order — here ascending global frequency (rarest first), the
    strongest pruning order — then if J(A,B) ≥ t, A and B must collide
    within their first |x| − ⌈t·|x|⌉ + 1 shingles. Only those prefixes
    are self-joined, so candidate generation touches the rare end of the
    frequency spectrum where buckets are small.

    Plan shape (all barriers deliberate):
    1. one exchange of the hashed-shingle relation keyed on h, reused by
       the frequency aggregation AND the freq re-join (ReusedExchange);
    2. groupBy(doc_id): per-doc sorted (freq, h) arrays — an in-memory
       sort_array per doc replaces a global window sort; the SAME pass
       emits the sorted full hash array used for verification;
    3. prefix explode + self-join on h (small);
    4. verification joins candidates back to the per-doc sorted arrays
       and computes |A∩B| via array_intersect — JVM-side, no explode,
       no re-aggregation; AQE demotes both joins to broadcast since
       candidates ≪ corpus.
    """
    docs = load(spark, sf_dir, "documents")
    # Digest checkpoints (r5, same rationale as _pair_jaccard): `sh`
    # feeds the frequency aggregate AND the freq re-join; `docsets`
    # feeds the prefix explode AND both verification attach joins —
    # without materialization the shingle pipeline re-ran per consumer
    # (broadcast boundaries defeat exchange reuse). Measured
    # 3.85 s -> 2.33 s warm at sf0.1, values unchanged.
    sh = _fanout(sized_shingle_hashes(docs), "h").transform(stage)
    freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("freq"))
    plen = (F.col("n") - F.ceil(F.lit(JACCARD_T) * F.col("n"))
            + F.lit(1)).cast("int")
    docsets = (sh.join(freq, "h")
               .groupBy("doc_id")
               .agg(F.first("n").alias("n"),
                    F.sort_array(F.collect_list(F.struct("freq", "h")))
                    .alias("by_freq"))
               .select(
                   "doc_id", "n",
                   F.sort_array(F.transform("by_freq", lambda x: x["h"]))
                   .alias("arr"),
                   F.transform(F.slice("by_freq", F.lit(1), plen),
                               lambda x: x["h"]).alias("pref"))
               .transform(stage))
    # r12: carry n through the prefix explode and apply the AllPairs
    # LENGTH filter inside the candidate join (guide §3.2 "reduce before
    # you shuffle/verify"): J(A,B) = |∩|/|∪| <= min(n1,n2)/max(n1,n2),
    # so J >= t requires t*n1 <= n2 AND t*n2 <= n1 — pairs of very
    # different sizes are pruned BEFORE the dedup aggregate and the two
    # verification joins, for one extra int per prefix row. Candidates
    # 299,377 -> 193,148 at sf0.1; rows verified identical (256 pairs);
    # 2.42 s -> 1.56 s warm (min-of-7, interleaved).
    #
    # r13: PPJoin's POSITIONAL filter on top (guide §3.2 again — same
    # principle, sharper bound). A collision at 1-based prefix positions
    # (p1, p2) bounds the overlap: every common token sits at position
    # >= p1 in doc1's frequency-sorted set and >= p2 in doc2's, so
    # |∩| <= 1 + min(n1-p1, n2-p2); and J >= t forces
    # |∩| >= ceil(t*(n1+n2)/(1+t)). Lossless: a true pair's FIRST
    # common token always satisfies the bound, so at least one of its
    # collision rows survives, and verification recomputes exact
    # Jaccard from the full sets anyway. One more int per prefix row;
    # candidates 193,148 -> 68,594 at sf0.1 (2.8x less dedup/verify
    # volume); rows identical (256 pairs); 0.785 -> 0.748 s warm
    # (min-of-7, interleaved, 6/7 paired reps below).
    prefix = _fanout(
        docsets.select("doc_id", "n",
                       F.posexplode("pref").alias("p0", "h"))
        .select("doc_id", "n", (F.col("p0") + 1).alias("p"), "h"), "h")
    a, b = prefix.alias("a"), prefix.alias("b")
    t = F.lit(JACCARD_T)
    alpha = F.ceil(t / (1 + JACCARD_T) * (F.col("a.n") + F.col("b.n")))
    cand = (a.join(b, (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.doc_id") < F.col("b.doc_id"))
                   & (t * F.col("a.n") <= F.col("b.n"))
                   & (t * F.col("b.n") <= F.col("a.n"))
                   & (1 + F.least(F.col("a.n") - F.col("a.p"),
                                  F.col("b.n") - F.col("b.p")) >= alpha))
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2"))
            .dropDuplicates(["doc1", "doc2"]))
    # r12 (guide §2.5, the ann_batch_topk coalesce fix): AQE coalesces
    # the few-MB deduped candidate set to ONE partition, so ~193k
    # array_intersect verifications ran serially behind it. Repartition
    # the 16 B/row (doc1, doc2) pairs to the configured width before the
    # verification joins — at scale this narrow exchange stands exactly
    # where the attach join's own doc1 shuffle would be (and is reused
    # by it). Measured 1.593 s -> 0.821 s warm at sf0.1 (min-of-7,
    # interleaved); 256 rows identical; hash_match at 3 SFs.
    cand = cand.repartition(shuffle_width(docs.sparkSession),
                            F.col("doc1"))
    s1, s2 = docsets.alias("s1"), docsets.alias("s2")
    inter = (cand
             .join(s1, F.col("doc1") == F.col("s1.doc_id"))
             .join(s2, F.col("doc2") == F.col("s2.doc_id"))
             .select("doc1", "doc2",
                     F.size(F.array_intersect(F.col("s1.arr"),
                                              F.col("s2.arr")))
                     .alias("inter_cnt"),
                     F.col("s1.n").alias("n1"), F.col("s2.n").alias("n2")))
    jac = (F.col("inter_cnt").cast("double")
           / (F.col("n1") + F.col("n2") - F.col("inter_cnt")))
    return (inter.filter(jac >= JACCARD_T)
            .select("doc1", "doc2", fround(jac, 6).alias("jaccard")))


# --------------------------------------------------------------------------
# Decontamination — cross-SET near-dup detection: find training documents
# that are near-duplicates of a held-out/benchmark set. The defining LLM
# training-data hygiene operation (remove eval contamination from the
# training corpus). Unlike the self-join dedups above, the two sides are
# different (and wildly different-sized) relations: at 100 TB the
# benchmark side is typically 10^4-10^6 docs vs 10^9+ train docs, so the
# benchmark's shingle/signature table broadcasts and the train side never
# shuffles at all — detection is a map-side join over the train scan.
# --------------------------------------------------------------------------

def cross_set_jaccard(train: DataFrame, bench: DataFrame,
                      threshold: float = JACCARD_T) -> DataFrame:
    """(train doc_id, bench doc_id, exact jaccard) for every cross pair
    with J >= threshold — shared-shingle equi-join between two genuinely
    distinct document tables (no a<b constraint needed: the sets are
    disjoint by construction)."""
    a = _fanout(sized_shingle_hashes(train), "h").select(
        F.col("doc_id").alias("train_id"), F.col("n").alias("n1"), "h")
    b = _fanout(sized_shingle_hashes(bench), "h").select(
        F.col("doc_id").alias("bench_id"), F.col("n").alias("n2"), "h")
    return _cross_jaccard_from_sides(a, b, threshold)


def _cross_jaccard_from_sides(a: DataFrame, b: DataFrame,
                              threshold: float) -> DataFrame:
    inter = (a.join(b, "h")
             .groupBy("train_id", "bench_id", "n1", "n2")
             .agg(F.count(F.lit(1)).alias("inter_cnt")))
    jac = (F.col("inter_cnt").cast("double")
           / (F.col("n1") + F.col("n2") - F.col("inter_cnt")))
    return (inter.filter(jac >= threshold)
            .select("train_id", "bench_id", fround(jac, 6).alias("jaccard")))


def cross_set_jaccard_split(docs: DataFrame, bench_pred,
                            threshold: float = JACCARD_T) -> DataFrame:
    """Same answer when both sets are a PREDICATE split of ONE corpus:
    run the (already-tuned) SELF-join once and post-filter to cross-set
    pairs, orienting columns so the train doc is always `train_id`.

    Why not filter the two sides before a cross join? Catalyst pushes the
    split predicates below the shingle transform (plus an inferred
    isnotnull(shingles) that re-evaluates the whole HOF array in the
    filter), so the corpus gets shingled once per side from the raw scan
    — measured 10.0 s at sf0.1 vs 2.3 s for this plan, which shingles and
    shuffles once and pays only the (small at J≥t) extra self-pairs that
    the post-filter discards."""
    pairs = _pair_jaccard(docs).filter(F.col("_jac") >= threshold)
    # bench_pred is a function doc_id_col -> BooleanColumn so the split
    # rule is evaluated on both pair columns without re-joining docs.
    is_b1, is_b2 = bench_pred(F.col("doc1")), bench_pred(F.col("doc2"))
    return (pairs.filter(is_b1 != is_b2)
            .select(F.when(is_b1, F.col("doc2")).otherwise(F.col("doc1"))
                    .alias("train_id"),
                    F.when(is_b1, F.col("doc1")).otherwise(F.col("doc2"))
                    .alias("bench_id"),
                    fround(F.col("_jac"), 6).alias("jaccard")))


def _split_docs(docs: DataFrame):
    """Deterministic stand-in split for the registered query: every 10th
    doc_id plays the benchmark set, the rest are the training corpus."""
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return train, bench


@query(
    "decontaminate_exact",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_DUCK_SHINGLES}) AS shingle
        FROM documents WHERE len({_DUCK_WORDS}) >= 3
    ),
    sized AS (
        SELECT doc_id, shingle,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM sh
    ),
    inter AS (
        SELECT a.doc_id AS train_id, b.doc_id AS bench_id,
               max(a.n) AS n1, max(b.n) AS n2, count(*) AS inter_cnt
        FROM sized a JOIN sized b ON a.shingle = b.shingle
        WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
        GROUP BY 1, 2
    )
    SELECT train_id, bench_id,
           floor((CAST(inter_cnt AS DOUBLE) / (n1 + n2 - inter_cnt))
                 * 1000000 + 0.5) / 1000000 AS jaccard
    FROM inter
    WHERE CAST(inter_cnt AS DOUBLE) / (n1 + n2 - inter_cnt) >= {JACCARD_T}
    """,
)
def decontaminate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs that near-duplicate a benchmark doc (exact Jaccard
    >= 0.6) — the oracle ground truth for the LSH decontamination path.
    Uses the self-join + post-filter plan (one shingle pass, one
    exchange) since both sets live in one table."""
    docs = load(spark, sf_dir, "documents")
    return cross_set_jaccard_split(docs, lambda c: c % 10 == 0)


@query("decontaminate_lsh")  # rows-only: banded MinHash not SQL-expressible
def decontaminate_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: band the benchmark set's MinHash signatures and join
    train bands against them. Bench bands/signatures are tiny →
    broadcast; the train side is bounded by its own banding fan-out (8
    rows/doc), never a cross product. Returns candidate (train_id,
    bench_id, est_jaccard >= 0.5) pairs; recall vs the exact path is
    asserted in tests/test_dedup_recall.py.

    Deliberately NO MAX_BUCKET guard here (unlike the self-join paths):
    a hot band costs |train_bucket| x |bench_bucket| rows — bounded by
    the small bench side, so it degrades linearly, and dropping hot
    bands would lose recall on exactly the most-contaminated material,
    the opposite of what decontamination is for."""
    train, bench = _split_docs(load(spark, sf_dir, "documents"))

    def bands_of(sigs: DataFrame, id_alias: str) -> DataFrame:
        return sigs.select(
            F.col("doc_id").alias(id_alias),
            F.posexplode(F.expr(
                f"transform(sequence(0, {BANDS - 1}),"
                f" b -> hash(slice(sig, b * {ROWS_PER_BAND} + 1,"
                f" {ROWS_PER_BAND})))"))
            .alias("band", "band_hash"))

    # Each signature table feeds its band explode AND a per-pair
    # re-attach join — checkpoint once, same rationale (and measured
    # shape) as minhash_lsh_pairs.
    tsig = minhash_signatures(train).transform(stage)
    bsig = minhash_signatures(bench).transform(stage)
    # Stage the BENCH-side band table too (r13, VERDICT r12 #4 — the
    # broadcast-boundary defect's fifth sighting): the band explode over
    # bsig sits behind a BroadcastExchange, so exchange reuse never
    # fires and every execution re-ran the banding from the staged
    # signatures. The digest is benchmark-bounded (|bench| x BANDS
    # rows of 16 B), exactly the write-time layout the minhash staging
    # promises. The TRAIN side stays live: its banding is map-side work
    # feeding _fanout's shuffle and never re-executes within a run.
    # Interleaved A/B at sf0.1: 0.447 -> 0.430 s warm (min-of-7, staged
    # below current in 6/7 paired reps); rows identical (47 pairs).
    cand = (_fanout(bands_of(tsig, "train_id"), "band", "band_hash")
            .join(F.broadcast(stage(bands_of(bsig, "bench_id"))),
                  ["band", "band_hash"])
            .select("train_id", "bench_id")
            .dropDuplicates(["train_id", "bench_id"]))
    s1, s2 = tsig.alias("s1"), bsig.alias("s2")
    matches = F.size(F.filter(
        F.zip_with(F.col("s1.sig"), F.col("s2.sig"), lambda x, y: x == y),
        lambda v: v))
    est = matches / F.lit(NUM_PERM).cast("double")
    return (cand.join(s1, F.col("train_id") == F.col("s1.doc_id"))
            .join(F.broadcast(s2), F.col("bench_id") == F.col("s2.doc_id"))
            .select("train_id", "bench_id", fround(est, 4).alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= 0.5))


def rowwise_minhash_sig(docs: DataFrame) -> DataFrame:
    """(doc_id, sig) via per-ROW array HOFs — no explode, no groupBy.

    Bit-identical to minhash_signatures (same shingles, same 32-bit mask,
    same affine permutations, asserted by test), but expressed as
    array_min over a transform per permutation, so it is STATELESS: legal
    on a streaming DataFrame ahead of a join, and shuffle-free in batch.
    The batch path keeps the groupBy form because partial-aggregate min()
    is codegen while HOF lambdas are interpreted; the shingle and hash
    arrays are staged through projections so each is computed once per
    row (the r2 shape inlined them per permutation — 16 recomputes of
    the shingle hash array per doc on top of the per-element split)."""
    sig = F.array(*[
        F.expr(f"array_min(transform(harr,"
               f" h -> ({a}L * h + {b}L) % {_MERSENNE_P}L))")
        for a, b in PERMS
    ])
    return (_shingle_arrays(docs)
            .select("doc_id",
                    F.expr(f"transform(sh_arr,"
                           f" s -> xxhash64(s) & {_MASK32}L)").alias("harr"))
            .select("doc_id", sig.alias("sig")))


# --------------------------------------------------------------------------
# N-gram-overlap decontamination (the GPT-3 appendix-C style): a training
# document is contaminated if it shares ANY word n-gram with the benchmark
# set — no similarity threshold, the strictest leakage rule. Complements
# decontaminate_exact/lsh (whole-doc Jaccard): n-gram hits catch a
# benchmark QUOTED INSIDE an otherwise-different train doc, which
# document-level Jaccard misses.
# --------------------------------------------------------------------------

_NGRAM_N = 5  # GPT-3 used 13-grams; the synthetic docs are short

_GRAMS5_OF_W = (
    "array_distinct(transform(sequence(1, size(w) - 4),"
    " i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),"
    " element_at(w, i + 2), element_at(w, i + 3), element_at(w, i + 4))))"
)

_DUCK_GRAMS5 = (
    f"list_distinct(list_transform(range(1, len({_DUCK_WORDS}) - 3),"
    f" i -> {_DUCK_WORDS}[i] || ' ' || {_DUCK_WORDS}[i+1]"
    f" || ' ' || {_DUCK_WORDS}[i+2] || ' ' || {_DUCK_WORDS}[i+3]"
    f" || ' ' || {_DUCK_WORDS}[i+4]))"
)


@query(
    "decontaminate_ngram_hit",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, unnest({_DUCK_GRAMS5}) AS gram
        FROM documents WHERE len({_DUCK_WORDS}) >= {_NGRAM_N}
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0)
    SELECT g.doc_id AS train_id, count(DISTINCT g.gram) AS hit_ngrams
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 10 <> 0
    GROUP BY 1
    """,
)
def decontaminate_ngram_hit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(train_id, hit_ngrams): every training doc sharing >= 1 distinct
    5-gram with the benchmark split (doc_id % 10 == 0), with how many of
    its distinct 5-grams are contaminated.

    Scale design mirrors decontaminate_lsh's asymmetry: the benchmark's
    distinct-gram table is bounded by the benchmark corpus (10^4-10^6
    docs), hashed to 8-byte keys and BROADCAST — the train side is a
    map-side hash probe over the scan, never shuffled for the join; the
    only exchange is the per-doc count of the (tiny) hit set. Gram
    staging runs once per branch off a shared exchange (the doc_id%10
    split predicates push to the two scans). At 100 TB the bench gram
    set outgrowing the broadcast ceiling is the signal to switch to a
    bloom-filter pre-probe + shuffled semi-join — same answer, one more
    exchange."""
    docs = load(spark, sf_dir, "documents")
    # Digest checkpoint (r5): bench and train are disjoint filters of
    # one 5-gram explode — materialize its (doc_id, hash) digests once
    # instead of exploding the corpus per branch (the attrition idiom).
    gh = (_widen(docs)
          .select("doc_id", F.expr(_WORDS).alias("w"))
          .filter(F.size("w") >= _NGRAM_N)
          .select("doc_id", F.explode(F.expr(_GRAMS5_OF_W)).alias("gram"))
          .select("doc_id", F.xxhash64("gram").alias("gh"))
          .transform(stage))
    bench = gh.filter(F.col("doc_id") % 10 == 0).select("gh").distinct()
    train = gh.filter(F.col("doc_id") % 10 != 0)
    return (train.join(F.broadcast(bench), "gh")
            .groupBy(F.col("doc_id").alias("train_id"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("hit_ngrams")))


# --------------------------------------------------------------------------
# Exact duplicated-SPAN detection (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): document-level dedup
# misses the common case of long passages copied between otherwise
# distinct documents (licenses, boilerplate, quoted text). The suffix-
# array formulation is replaced by its standard distributed
# approximation: fixed-width token windows (W=10, stride 1) — a
# duplicated substring of length >= W is detected exactly, shorter ones
# are ignored by design.
# --------------------------------------------------------------------------

_SPAN_W = 10
# Windows over a STAGED words column `w` (same staging rule as
# _SHINGLES_OF_W): (pos, md5-of-window) structs. md5, not xxhash64, so
# the DuckDB oracle computes identical keys; the 100 TB swap is
# xxhash64 (8-byte shuffle keys, ~4x smaller than the hex digest) once
# cross-engine parity is no longer the contract.
_SPAN_WINS_OF_W = (
    f"transform(sequence(1, size(w) - {_SPAN_W - 1}),"
    f" i -> struct(i AS pos,"
    f" md5(concat_ws(' ', slice(w, i, {_SPAN_W}))) AS wh))"
)


_DUCK_SPAN_CTES = f"""
    WITH w AS (
        SELECT doc_id, {_DUCK_WORDS} AS ws FROM documents),
    wins AS (
        SELECT doc_id, i AS pos,
               md5(array_to_string(
                   list_slice(ws, i, i + {_SPAN_W - 1}), ' ')) AS wh
        FROM w, unnest(generate_series(1, len(ws) - {_SPAN_W - 1})) AS t(i)
        WHERE len(ws) >= {_SPAN_W})"""


def _span_frames(docs: DataFrame):
    """(base, wins) for the duplicated-span family: base stages the words
    array once; wins explodes the stride-1 window hashes off it. The ONE
    copy both dup_span_report and dup_span_trim build on (Spark side of
    _DUCK_SPAN_CTES).

    base is a LAZY checkpoint: trim consumes it three times (window
    hashes, token explode, per-doc word counts) and report twice, so
    the split otherwise re-tokenizes the corpus per consumer. Unlike
    the digest checkpoints elsewhere in this module this materializes
    the TOKENIZED CORPUS (~text-sized on executor storage, not a
    digest) — the standard tokenized-intermediate tradeoff: storage
    ~doubles during the query, each downstream pass saves a scan+split.
    Measured 1.33 -> 1.06 s warm for trim at sf0.1."""
    base = (_widen(docs)
            .select("doc_id", F.expr(_WORDS).alias("w"))
            .transform(stage))
    wins = (base.filter(F.size("w") >= _SPAN_W)
            .select("doc_id", F.explode(F.expr(_SPAN_WINS_OF_W)).alias("x"))
            .select("doc_id", F.col("x.pos").alias("pos"),
                    F.col("x.wh").alias("wh")))
    return base, wins


@query(
    "dup_span_report",
    oracle=_DUCK_SPAN_CTES + f""",
    dup AS (SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2),
    marked AS (
        SELECT doc_id, pos, pos + {_SPAN_W - 1} AS e,
               max(pos + {_SPAN_W - 1}) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_e
        FROM wins JOIN dup USING (wh)),
    per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
               CAST(sum(greatest(0,
                   e - greatest(pos - 1, coalesce(prev_e, 0))))
                   AS BIGINT) AS dup_tokens
        FROM marked GROUP BY doc_id)
    SELECT d.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
           coalesce(p.n_dup_windows, 0) AS n_dup_windows,
           coalesce(p.dup_tokens, 0) AS dup_tokens
    FROM documents d
    JOIN w USING (doc_id)
    LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """,
)
def dup_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-PASSAGE report: how many stride-1 10-word
    windows occur at >= 2 positions corpus-wide, and how many token
    positions those windows cover (exact interval union, so overlapping
    windows of one long copied passage count each token once). The doc-
    level twin is `duplicate_ratio_report`; this is the sub-document
    granularity that catches shared boilerplate between non-duplicate
    documents.

    Plan: the windows pass stages the words array once, explodes the
    stride-1 windows (O(tokens x W) pure codegen, no Python), and takes
    the duplicate decision as `count() over (partition by wh)` — the
    WINDOW form, not aggregate-then-join, for exactly
    ngram_novelty_report's reason: window hashes are near-unique (flat
    keys, no skew) and their "count table" is nearly instance-sized, so
    at scale the join form shuffles both sides on wh anyway AND
    re-evaluates the explode subtree (its plan shows TWO Generate nodes
    over two scans; no exchange reuse). Measured honestly at sf0.1 the
    two forms are within noise (join 1.8 s vs window 2.0 s warm) — but
    only because AQE broadcasts the local dup table, a crutch that
    vanishes when the duplicated-window set outgrows the broadcast
    ceiling; the window form's single explode + single wh exchange is
    the shape that survives. Marked windows then shuffle once on doc_id
    for the interval-union sweep, whose per-row state is one running
    max (gaps-and-islands, never a per-doc array). A second light scan
    (doc_id + text) supplies the full doc list so every doc keeps a row
    (zeros when clean) — the report is a complete audit table."""
    base, wins = _span_frames(load(spark, sf_dir, "documents"))
    wh_w = Window.partitionBy("wh")
    end = F.col("pos") + F.lit(_SPAN_W - 1)
    prev_w = (Window.partitionBy("doc_id").orderBy("pos")
              .rowsBetween(Window.unboundedPreceding, -1))
    marked = (wins.withColumn("cnt", F.count(F.lit(1)).over(wh_w))
              .filter(F.col("cnt") >= 2)
              .select("doc_id", "pos", end.alias("e"))
              .withColumn("prev_e", F.max("e").over(prev_w)))
    new_cov = F.greatest(
        F.lit(0),
        F.col("e") - F.greatest(F.col("pos") - 1,
                                F.coalesce("prev_e", F.lit(0))))
    per_doc = (marked.groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_windows"),
                    F.sum(new_cov).cast("bigint").alias("dup_tokens")))
    return (base.select("doc_id", F.size("w").cast("bigint").alias("n_words"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id", "n_words",
                    F.coalesce("n_dup_windows", F.lit(0)).cast("bigint")
                    .alias("n_dup_windows"),
                    F.coalesce("dup_tokens", F.lit(0)).cast("bigint")
                    .alias("dup_tokens")))


@query(
    "dup_span_trim",
    oracle=_DUCK_SPAN_CTES + f""",
    dup AS (
        SELECT wh, min(doc_id * 4294967296 + pos) AS canon
        FROM wins GROUP BY wh HAVING count(*) >= 2),
    noncanon AS (
        SELECT v.doc_id, v.pos
        FROM wins v JOIN dup d USING (wh)
        WHERE v.doc_id * 4294967296 + v.pos <> d.canon),
    cut AS (
        SELECT DISTINCT doc_id, p
        FROM noncanon,
             unnest(generate_series(pos, pos + {_SPAN_W - 1})) AS t(p)),
    toks AS (
        SELECT doc_id, i, ws[i] AS tok
        FROM w, unnest(generate_series(1, len(ws))) AS t(i)),
    cleaned AS (
        SELECT t.doc_id,
               string_agg(t.tok, ' ' ORDER BY t.i)
                   FILTER (WHERE c.p IS NULL) AS clean_text,
               CAST(count(*) FILTER (WHERE c.p IS NOT NULL) AS BIGINT)
                   AS n_removed
        FROM toks t
        LEFT JOIN cut c ON t.doc_id = c.doc_id AND t.i = c.p
        GROUP BY t.doc_id)
    -- LEFT JOIN from w, not FROM cleaned: a NULL-text document has no
    -- token rows, but the audit contract is one row per document
    -- (clean_text '', nothing removed)
    SELECT w.doc_id, coalesce(c.clean_text, '') AS clean_text,
           coalesce(c.n_removed, 0) AS n_removed
    FROM w LEFT JOIN cleaned c ON w.doc_id = c.doc_id
    """,
)
def dup_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION to dup_span_report's audit — Lee et al. (2022) exact
    substring dedup applied: every duplicated 10-word window keeps its
    FIRST occurrence (minimum (doc_id, pos) corpus-wide) and every
    other occurrence's tokens are cut from their documents; the cleaned
    text is reassembled in token order. Keep-first (not drop-all)
    preserves one copy of legitimately repeated passages — the
    dedup_keep_best decision at sub-document granularity.

    Plan (r12 rewrite, guide §8 "decide with small rows, move big rows
    once"): windows explode once (window-form count + min over the SAME
    wh partition — one shuffle+sort serves both the duplicate decision
    and the canonical choice); non-canonical windows expand to their
    covered token positions (bounded x{_SPAN_W} fanout of the
    DUPLICATED subset only) and aggregate to ONE cut-position ARRAY per
    affected doc — pure int metadata, bounded by the doc's own length.
    The rebuild then joins that tiny table back to the staged words
    array and drops cut positions with an indexed array `filter` HOF:
    the corpus tokens never explode and never shuffle (the pre-r12
    shape posexploded every token, anti-joined on (doc_id, pos), and
    re-assembled docs through a collect_list aggregate — shuffling the
    token payload to decide with int positions). AQE broadcasts the cut
    table (no hint: if the duplicated set ever outgrows the broadcast
    ceiling the join degrades to ONE corpus-array shuffle, still
    strictly less than the old explode+rebuild). Measured 0.890 s ->
    0.623 s warm at sf0.1 (min-of-7, interleaved); rows verified
    identical and hash_match at 3 SFs. Canonical key packs
    (doc_id, pos) as doc_id*2^32+pos — exact while docs stay under
    4.3e9 tokens, which the Gopher-style length gates upstream
    guarantee."""
    base, wins = _span_frames(load(spark, sf_dir, "documents"))
    key = F.col("doc_id") * F.lit(4294967296) + F.col("pos")
    wh_w = Window.partitionBy("wh")
    noncanon = (wins
                .withColumn("cnt", F.count(F.lit(1)).over(wh_w))
                .withColumn("canon", F.min(key).over(wh_w))
                .filter((F.col("cnt") >= 2) & (key != F.col("canon")))
                .select("doc_id", "pos"))
    cuts = (noncanon
            .select("doc_id",
                    F.explode(F.sequence(
                        F.col("pos"),
                        F.col("pos") + F.lit(_SPAN_W - 1))).alias("p"))
            .groupBy("doc_id")
            .agg(F.collect_set("p").alias("cut")))
    joined = (base.join(cuts, "doc_id", "left")
              .select("doc_id", "w",
                      F.coalesce("cut", F.array()).alias("cut")))
    # 1-based positions (i is 0-based in the HOF); NULL-text docs have
    # w NULL -> kept NULL -> coalesce to the ('', 0) audit row.
    kept = F.expr("filter(w, (x, i) -> NOT array_contains(cut, i + 1))")
    return (joined.select(
                "doc_id",
                F.coalesce(F.concat_ws(" ", kept), F.lit(""))
                .alias("clean_text"),
                (F.coalesce(F.size("w").cast("bigint"), F.lit(0))
                 - F.coalesce(F.size(kept).cast("bigint"), F.lit(0)))
                .cast("bigint").alias("n_removed")))
