"""Similarity search over the embeddings table (array<float>[64]).

Engine-surface additions for training-data pipelines (build brief):
- brute-force top-k cosine (the exactness baseline, oracle-checked),
- all-pairs near-duplicate cosine (oracle-checked ground truth),
- random-hyperplane LSH ANN (training-free bucketed search),
- IVF cells (routing; cells double as write-time partitions),
- spherical k-means (the trained coarse quantizer) + SemDeDup
  within-cell near-dup candidates,
- PQ/ADC (32x memory compression) and the composed IVF-PQ serving
  path (routing x compression x exact re-rank).
Every approximate path's recall is MEASURED against the exact twin in
tests/test_similarity.py, never asserted blind.

All vector math is JVM-side higher-order functions (zip_with + aggregate);
elements are upcast to double *before* summation and summed sequentially
per-array, which makes the result bit-identical to the DuckDB oracle's
list_transform/list_sum pipeline.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..datasets import load, shuffle_width, widen_scan
from ..staging import stage
from ..functions.scalar import fround
from ..queries import query
from ..memo import evict_stale

QUERY_VEC_ID = 0  # fixed probe vector for the deterministic top-k queries
TOP_K = 10


def dot(a: str, b: str) -> Column:
    """Sequential double-precision dot product of two float-array columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)")


def norm(a: str) -> Column:
    return F.sqrt(dot(a, a))


def finite_norm(a: str) -> Column:
    """The vector is usable as a DIRECTION: norm positive AND finite.
    A bare `norm > 0` does not exclude NaN — Spark ranks NaN largest in
    comparisons, so a NaN-component vector passes it and then poisons
    any centroid mean or unit-normalization built from it (numeric-
    extremes axis, r5). Inf norms normalize to all-zero/NaN the same
    way. Serving-path FILTERS that only rank candidates keep the
    cheaper `norm > 0` (both engines agree on NaN cosines there); this
    guard is for anything that becomes driver-side state."""
    n = norm(a)
    return (n > 0) & ~F.isnan(n) & (n < F.lit(float("inf")))


def _usable_probe(qv) -> bool:
    """Driver-side probe check: non-zero AND all-finite (a NaN/Inf probe
    has no meaningful neighbors and its components would otherwise be
    broadcast as literals into every score expression)."""
    import math

    vs = [float(x) for x in qv]
    return any(v != 0.0 for v in vs) and all(math.isfinite(v) for v in vs)


def _empty_topk(spark: SparkSession) -> DataFrame:
    """The empty result every ANN serving path degrades to when the
    probe vector is absent (zero-row corpus — an incremental pipeline's
    first run) or direction-less (zero norm). Shared so all four paths
    keep an identical schema (matches knn_brute_force's guard)."""
    return spark.createDataFrame(
        [], "vec_id bigint, label int, cos_sim double")


def cosine(a: str, b: str) -> Column:
    """NULL (not an ANSI divide-by-zero error) when either operand has
    zero norm — a zero embedding has no direction, and real corpora
    contain them (adversarial-corpus find). Queries that rank by
    similarity additionally FILTER zero-norm rows so cross-engine NULL
    ordering never enters the comparison.

    nullif, NOT when(den > 0, dot/den): the WHEN form evaluates the
    denominator twice (condition + value — two extra array dot
    products per row, measured ~3x on the brute-force scan), while
    nullif keeps the original 3-dot cost and division by NULL is NULL
    under ANSI."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


# DuckDB equivalents, kept structurally identical (sequential double sums).
def _duck_dot(a: str, b: str) -> str:
    return (f"list_sum(list_transform(list_zip({a}, {b}),"
            f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))")


def _duck_cos(a: str, b: str) -> str:
    return (f"({_duck_dot(a, b)} / (sqrt({_duck_dot(a, a)})"
            f" * sqrt({_duck_dot(b, b)})))")


# --------------------------------------------------------------------------
# Brute-force top-k cosine to a fixed query vector. The probe embedding is
# fetched driver-side (single-row lookup) and inlined as a literal array —
# on a cluster this is a broadcast of 64 floats, the scan stays one pass.
# --------------------------------------------------------------------------

@query(
    "knn_brute_force",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings
               WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           floor(({_duck_cos('e.embedding', 'q.qv')}) * 1000000 + 0.5) / 1000000 + 0.0 AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> {QUERY_VEC_ID}
      AND {_duck_dot('e.embedding', 'e.embedding')} > 0
    ORDER BY cos_sim DESC, e.vec_id LIMIT {TOP_K}
    """,
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qrow = (emb.filter(F.col("vec_id") == QUERY_VEC_ID)
            .select("embedding").head())
    if qrow is None:  # probe vector absent: no neighbors, like the oracle
        return spark.createDataFrame(
            [], "vec_id bigint, label int, cos_sim double")
    qvec = qrow[0]
    q = F.array(*[F.lit(float(v)).cast("float") for v in qvec])
    scored = (emb.filter(F.col("vec_id") != QUERY_VEC_ID)
              .filter(norm("embedding") > 0)  # zero vectors: no direction
              .withColumn("qv", q)
              .select("vec_id", "label",
                      (fround(cosine("embedding", "qv"), 6) + F.lit(0.0)).alias("cos_sim")))
    return scored.orderBy(F.desc("cos_sim"), "vec_id").limit(TOP_K)


# --------------------------------------------------------------------------
# All-pairs near-duplicate cosine, top-20 pairs. Quadratic — this is the
# small-scale oracle-checked ground truth the LSH path is measured
# against; at 100 TB only the LSH variant runs.
# --------------------------------------------------------------------------

@query(
    "embedding_neardup_topk",
    scale_twin="semdedup_candidates",
    oracle=f"""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           floor(({_duck_cos('a.embedding', 'b.embedding')}) * 1000000 + 0.5) / 1000000 + 0.0 AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_duck_dot('a.embedding', 'a.embedding')} > 0
      AND {_duck_dot('b.embedding', 'b.embedding')} > 0
    ORDER BY cos_sim DESC, id1, id2 LIMIT 20
    """,
)
def embedding_neardup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (load(spark, sf_dir, "embeddings")
           .filter(norm("embedding") > 0))  # zero vectors: no direction
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = (a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("id1"),
                     F.col("b.vec_id").alias("id2"),
                     F.col("a.embedding").alias("e1"),
                     F.col("b.embedding").alias("e2")))
    return (pairs.select("id1", "id2",
                         (fround(cosine("e1", "e2"), 6) + F.lit(0.0)).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "id1", "id2")
            .limit(20))


# --------------------------------------------------------------------------
# LSH-bucketed approximate nearest neighbors (random hyperplanes).
# --------------------------------------------------------------------------

N_TABLES = 16         # independent hash tables (OR-amplification)
PLANES_PER_TABLE = 4  # sign bits per table (AND-amplification)
EMB_DIM = 64


def _hyperplanes(n_tables: int = N_TABLES,
                 planes_per_table: int = PLANES_PER_TABLE
                 ) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed xorshift stream →
    uniform in [-1, 1)); stable across runs, no runtime randomness.
    Defaults are the registered parameters; the args exist for the
    referee's parameter sweep (ann_recall_referee.py) — a different
    (L, p) draws a different prefix of the same fixed stream."""
    planes, state = [], 2463534242
    for _ in range(n_tables * planes_per_table):
        row = []
        for _ in range(EMB_DIM):
            state ^= (state << 13) & 0xFFFFFFFF
            state ^= state >> 17
            state ^= (state << 5) & 0xFFFFFFFF
            row.append(state / 2**31 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_cols(n_tables: int = N_TABLES,
                    planes_per_table: int = PLANES_PER_TABLE
                    ) -> list[Column]:
    """One bucket id per hash table: the sign-bit signature of the
    embedding against that table's PLANES_PER_TABLE fixed hyperplanes;
    pure JVM expressions over the array column.

    Multi-table (L × p) design: for a neighbor at angular similarity s,
    single-table collision is s^p but union-over-L recall is
    1 − (1 − s^p)^L. Parameters are calibrated to the corpus's similarity
    regime: the testdata probe's true top-10 sit at cos≈0.28-0.37
    (s≈0.6), where one 12-plane table recalls ~0.05 of true neighbors;
    16 tables × 4 planes lift that to ~0.91 theoretical / ≥0.6 asserted
    (tests/test_similarity.py). In a strong-similarity regime (near-dup
    mining, cos≥0.9) raise PLANES_PER_TABLE to sharpen buckets —
    measured (r8 (L, p) sweep, ANN_RECALL_r08.json): on the
    near-dup-rich sf1 corpus 16×8 holds recall 0.909 touching only
    7.4% of the corpus (12× better than random) and 8×6 gets 0.937 at
    12.6%, while on the weak-similarity sf0.1 corpus every
    configuration pays near-linear recall-vs-touch (16×8: 0.287 at
    7.4%) — the registered 16×4 is the right point for THAT regime.

    100-probe panel measurement (r8, ann_recall_referee.py /
    ANN_RECALL_r08.json — supersedes this docstring's earlier
    single-probe claim that IVF routes better here): LSH is the ROBUST
    path across regimes — mean recall@10 0.881 / 0.921 / 0.998 at
    sf0.01/sf0.1/sf1 — while cell routing collapses to ~0.48 in the
    weak-similarity regime (see ivf_topk). The honest physics: at
    cos≈0.3 every sublinear method pays near-linear recall-vs-touch
    (LSH touches ~63% here for its 0.92), and ANN's sublinearity is
    earned only where the corpus has real similarity structure (the
    near-dup-rich sf1 tier: 0.998 recall at the same 63% touch, IVF
    0.962 at 25%)."""
    planes = _hyperplanes(n_tables, planes_per_table)
    cols = []
    for t in range(n_tables):
        bucket = None
        for j in range(planes_per_table):
            plane = planes[t * planes_per_table + j]
            arr = "array(" + ", ".join(f"cast({v!r} as double)" for v in plane) + ")"
            d = F.expr(
                f"aggregate(zip_with(embedding, {arr},"
                f" (x, y) -> cast(x as double) * y),"
                f" cast(0.0 as double), (acc, v) -> acc + v)")
            bit = (F.when(d > 0, F.lit(1 << j).cast("long"))
                   .otherwise(F.lit(0).cast("long")))
            bucket = bit if bucket is None else bucket + bit
        cols.append(bucket)
    return cols


# Session-scoped LSH bucket-index memo (r13, VERDICT r12 #3): both
# ann_lsh_topk and ann_batch_topk serve from the SAME (vec_id, label,
# embedding, buckets) table built with the registered LSH parameters,
# but each constructed its own staged copy — two identical checkpoint
# builds per session in the bench's cold pass (and one more per extra
# construction). One memoized build per (session, sf_dir) is the
# write-time index layout the docstrings promise; the _INDEX_MEMO /
# _CLUSTER_MEMO pattern, stale sessions swept via evict_stale.
_BUCKET_MEMO: dict[tuple, DataFrame] = {}


def _bucket_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staged registered-parameter LSH bucket index, one build per
    session. Referee knob sweeps (non-registered n_tables/planes) keep
    building theirs inline via lsh_batch_topk."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BUCKET_MEMO.get(key)
    if hit is not None:
        return hit
    evict_stale(_BUCKET_MEMO, key[0])
    idx = stage(widen_scan(load(spark, sf_dir, "embeddings"), "vec_id")
                .withColumn("buckets", F.array(*lsh_bucket_cols())))
    _BUCKET_MEMO[key] = idx
    return idx


@query("ann_lsh_topk")  # rows-only: hyperplane hashing not SQL-oracle-able
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k for the fixed probe: candidates are the union of
    the probe's buckets across N_TABLES hash tables; exact cosine
    re-ranks the candidates. At scale: the bucket-array column is
    precomputed at write time; a probe turns into N_TABLES bucket
    lookups instead of a corpus scan.

    r12: the bucket table is widened (the 64 hyperplane HOF dots per row
    ran serially in the one-row-group scan task) and staged through the
    digest gate — the write-time bucket column this docstring promises,
    built once in the cold pass instead of recomputed per probe serve.
    Measured 0.709 s -> 0.153 s warm at sf0.1 (quiet machine, min-of-5);
    rows identical. Same staging precedent as the minhash/jaccard digest
    family (r5); `SPARK_GRAFT_STAGING=none` re-derives from raw lineage.
    r13: the build is shared with ann_batch_topk via _bucket_index."""
    emb = _bucket_index(spark, sf_dir)
    probe = emb.filter(F.col("vec_id") == QUERY_VEC_ID).head()
    if probe is None:  # probe absent (zero-row corpus): no neighbors
        return _empty_topk(spark)
    qvec, qbuckets = probe["embedding"], probe["buckets"]
    if not _usable_probe(qvec):  # direction-less or non-finite probe
        return _empty_topk(spark)
    q = F.array(*[F.lit(float(v)).cast("float") for v in qvec])
    collide = None
    for t, qb in enumerate(qbuckets):
        c = F.col("buckets")[t] == F.lit(int(qb))
        collide = c if collide is None else (collide | c)
    cands = (emb.filter(collide & (F.col("vec_id") != QUERY_VEC_ID)
                        & (norm("embedding") > 0))  # zero vecs: no direction
             .withColumn("qv", q))
    return (cands.select("vec_id", "label",
                         (fround(cosine("embedding", "qv"), 6) + F.lit(0.0)).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(TOP_K))


# --------------------------------------------------------------------------
# Batch ANN serving — the 100 TB query shape (registered r9, VERDICT r8
# #1 sanction). A probe PANEL replaces the single fixed probe: the
# per-probe OR-over-tables bucket filter becomes one (table, bucket)
# equi-join against the bucket index, and ranking is ONE window over
# (probe_id), not a driver loop over probes. Measured by
# ann_recall_referee.py at three tiers (panel recall@10 0.881 / 0.921 /
# 0.998 at sf0.01/0.1/1, ANN_RECALL_r08.json) and pinned equal to the
# registered single-probe `ann_lsh_topk` when the panel is restricted
# to QUERY_VEC_ID (tests/test_ann_recall_referee.py).
# --------------------------------------------------------------------------

PROBE_MOD = 50  # registered panel rule: vec_id % PROBE_MOD == 0


def ann_probe_panel(emb: DataFrame, mod: int = PROBE_MOD) -> DataFrame:
    """Deterministic probe panel: every vec_id divisible by ``mod`` that
    is usable as a direction (positive finite norm — the registered
    single-probe rule). Columns: (probe_id, pv)."""
    return (emb.filter((F.col("vec_id") % mod == 0)
                       & finite_norm("embedding"))
            .select(F.col("vec_id").alias("probe_id"),
                    F.col("embedding").alias("pv")))


def batch_score(df: DataFrame) -> DataFrame:
    """The registered scoring expression, batch form: fround(cos, 6)+0.0
    over (embedding, pv) — bit-identical to the single-probe queries."""
    return df.select(
        "probe_id", "vec_id",
        (fround(cosine("embedding", "pv"), 6) + F.lit(0.0))
        .alias("cos_sim"))


def batch_ranked_topk(scored: DataFrame, k: int = TOP_K,
                      score: str = "cos_sim") -> DataFrame:
    """Top-k per probe under the registered tie rule (score desc, then
    vec_id asc) — one window partitioned by probe_id; the batch
    equivalent of orderBy(...).limit(k)."""
    from pyspark.sql.window import Window
    w = Window.partitionBy("probe_id").orderBy(
        F.desc(score), F.asc("vec_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def lsh_batch_topk(emb: DataFrame, probes: DataFrame,
                   n_tables: int | None = None,
                   planes_per_table: int | None = None,
                   emb_b: DataFrame | None = None) -> DataFrame:
    """`ann_lsh_topk` semantics over a probe panel: bucket both sides
    with identical `lsh_bucket_cols()` signatures, equi-join on
    (table, bucket), dedup candidates, exact-cosine re-rank per probe.
    Either LSH parameter may be overridden alone — the other defaults
    to the registered value (ADVICE r8 #3: the old referee signature
    raised TypeError on n_tables-without-planes). ``emb_b`` lets the
    caller supply a pre-built (…, buckets) index table — the registered
    query passes the staged write-time index (see ann_batch_topk);
    referee knob sweeps keep building theirs inline.

    At 100 TB: `buckets` is a write-time index column, the panel is
    broadcast (panels are small by construction), and the only wide
    exchange is the per-probe window — partitioned by probe_id, so it
    scales with panel size, not corpus size.

    r12 (guide §2.5): the deduped candidate set is hash-repartitioned on
    vec_id BEFORE the corpus join-back, so the exact-cosine scoring
    stage runs at the configured width — AQE coalesced the few-MB
    distinct output to ONE partition locally, serializing ~51k
    interpreted 64-dim cosines behind it (measured 2.18 s -> 0.74 s
    warm at sf0.1). The exchange carries 16 B/row (probe_id, vec_id) —
    narrower than both the scored rows and the index rows — and at
    scale it stands where the join-back's own vec_id shuffle would be;
    the per-probe window exchange still carries scored rows only."""
    if emb_b is not None and not (n_tables is None
                                  and planes_per_table is None):
        # ADVICE r12: a prebuilt index carries its own LSH parameters —
        # silently computing-and-ignoring an override here would serve
        # buckets built with the index's original params.
        raise ValueError(
            "emb_b is prebuilt; n_tables/planes_per_table overrides "
            "would be ignored — pass one or the other")
    L = N_TABLES if n_tables is None else n_tables
    p = PLANES_PER_TABLE if planes_per_table is None else planes_per_table
    if emb_b is None:
        emb_b = emb.withColumn("buckets",
                               F.array(*lsh_bucket_cols(L, p)))
    probe_b = (emb_b.join(F.broadcast(probes),
                          emb_b.vec_id == probes.probe_id)
               .select("probe_id",
                       F.posexplode("buckets").alias("t", "qb")))
    corp_b = emb_b.select(
        "vec_id", F.posexplode("buckets").alias("t", "b"))
    cand_ids = (corp_b.join(F.broadcast(probe_b),
                            (corp_b.t == probe_b.t)
                            & (corp_b.b == F.col("qb")))
                .select("probe_id", "vec_id").distinct())
    n = shuffle_width(emb.sparkSession)
    cands = (cand_ids.repartition(n, F.col("vec_id"))
             .join(emb_b.drop("buckets").filter(norm("embedding") > 0),
                   "vec_id")
             .join(F.broadcast(probes), "probe_id")
             .filter(F.col("vec_id") != F.col("probe_id")))
    return batch_ranked_topk(batch_score(cands))


@query("ann_batch_topk")  # rows-only: hyperplane hashing not SQL-oracle-able
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN top-k: LSH-bucketed approximate top-10 for EVERY panel
    probe (vec_id % PROBE_MOD == 0) in one plan. This is the serving
    shape a 100 TB similarity deployment actually runs — N probes
    amortize one pass over the bucket index — whereas `ann_lsh_topk`
    is its single-probe restriction (pinned equal on probe 0).
    Columns: (probe_id, vec_id, cos_sim), top-10 per probe.
    Recall measured per round by ann_recall_referee.py.

    r12: the bucket index table is widened and staged (the ann_lsh_topk
    treatment, same digest-gate precedent) — both join branches, the
    norm-filtered corpus side and the probe panel previously recomputed
    the 16-table hyperplane signatures per execution, serially in the
    one-row-group scan task. Together with the candidate repartition in
    lsh_batch_topk: 3.186 s -> 0.735 s warm at sf0.1 (min-of-7,
    interleaved); 400 result rows collect-identical;
    `SPARK_GRAFT_STAGING=none` re-derives full lineage.
    r13 (VERDICT r12 #3): the staged table is the SAME _bucket_index
    build ann_lsh_topk serves from — one checkpoint per session, not
    one per query family, halving the ANN-LSH share of the cold pass."""
    emb = load(spark, sf_dir, "embeddings")
    emb_b = _bucket_index(spark, sf_dir)
    return lsh_batch_topk(emb, ann_probe_panel(emb_b), emb_b=emb_b)


# --------------------------------------------------------------------------
# Centroid per label — grouped vector aggregation (the "IVF coarse
# quantizer" building block: at scale, probes search nearest centroids'
# inverted lists first). Element-wise mean via posexplode + regroup.
# --------------------------------------------------------------------------

@query(
    "label_centroid_norms",
    oracle="""
    WITH comp AS (
        SELECT label, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    cent AS (
        SELECT label, i, avg(v) AS c FROM comp GROUP BY label, i
    )
    SELECT label, floor((sqrt(sum(c * c))) * 1000000 + 0.5) / 1000000 AS centroid_norm,
           count(*) AS dim
    FROM cent GROUP BY label
    """,
)
def label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("i0", "v_raw"),
    ).select("label", (F.col("i0") + 1).alias("i"),
             F.col("v_raw").cast("double").alias("v"))
    cent = comp.groupBy("label", "i").agg(F.avg("v").alias("c"))
    return (cent.groupBy("label")
            .agg(fround(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6)
                 .alias("centroid_norm"),
                 F.count(F.lit(1)).alias("dim")))


@query(
    "embedding_norm_stats",
    oracle=f"""
    WITH norms AS (
        SELECT label,
               floor(sqrt({_duck_dot('embedding', 'embedding')}) * 1000000
                     + 0.5) / 1000000 AS nrm
        FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           min(nrm) AS min_norm,
           max(nrm) AS max_norm,
           floor(avg(nrm) * 10000 + 0.5) / 10000 AS avg_norm
    FROM norms GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding L2-norm stats — the first health check on an
    embedding column (un-normalized or collapsed vectors show up here
    before any similarity search is worth running). Per-row norms are
    sequential double sums (bit-identical across engines, rounded 1e-6);
    min/max commute with rounding, the group avg re-rounds at 1e-4. One
    scan + one tiny exchange on label."""
    emb = load(spark, sf_dir, "embeddings")
    norms = emb.select("label", fround(norm("embedding"), 6).alias("nrm"))
    return (norms.groupBy("label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
                 F.min("nrm").alias("min_norm"),
                 F.max("nrm").alias("max_norm"),
                 fround(F.avg("nrm"), 4).alias("avg_norm")))


# --------------------------------------------------------------------------
# IVF-bucketed approximate nearest neighbors (the second ANN scale path,
# complementing the LSH variant: IVF wins on clustered corpora, LSH needs
# no training data at all).
# --------------------------------------------------------------------------

IVF_K = 16       # coarse-quantizer cells
IVF_NPROBE = 4   # cells searched per probe


def _dlit(v: float) -> str:
    """A double literal that parses for EVERY double: repr(nan)/repr(inf)
    are bare words ('nan') that Spark's SQL parser resolves as column
    names — one NaN centroid component then kills the whole query with
    UNRESOLVED_COLUMN (numeric-extremes axis, r5)."""
    if v != v:
        return "cast('NaN' as double)"
    if v == float("inf"):
        return "cast('Infinity' as double)"
    if v == float("-inf"):
        return "cast('-Infinity' as double)"
    return f"cast({v!r} as double)"


def _arr_sql(vs: list[float]) -> str:
    return "array(" + ", ".join(_dlit(v) for v in vs) + ")"


def _py_cos(a: list[float], b: list[float]) -> float:
    import math

    # -inf (not a ZeroDivisionError) when either operand has zero norm:
    # a trained centroid CAN be the zero vector when a cell's member
    # mean cancels exactly (adversarial v/-v corpora — _unit returns
    # zero vectors unchanged), and routing must rank such a
    # direction-less centroid below EVERY real one — including real
    # centroids with negative cosine to the probe. 0.0 (ADVICE r10's
    # first cut) let a zero centroid outrank a negatively-correlated
    # real cell and consume an IVF_NPROBE slot (ADVICE r11); -inf
    # matches the column-side NULL-last semantics exactly (NULL sorts
    # below -1 under the desc sort).
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    if na == 0.0 or nb == 0.0:
        return float("-inf")
    return sum(x * y for x, y in zip(a, b)) / (na * nb)


@query("ivf_topk")  # rows-only: argmax-over-centroids is not oracle SQL
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest of
    IVF_K fixed coarse centroids, then search only the probe's IVF_NPROBE
    nearest cells, exact-cosine re-ranked.

    The coarse quantizer is the first IVF_K corpus vectors (deterministic;
    a production build would k-means them — the plan shape is identical).
    Centroids are driver-collected once (IVF_K·64 floats) and inlined as
    literals, so cell assignment is a pure JVM projection over the scan —
    no join, no shuffle. Recall@10 = 1.0 for the registered probe at
    sf0.01 (tests/test_similarity.py) — but the r8 100-probe panel
    (ann_recall_referee.py / ANN_RECALL_r08.json) shows that number is
    probe-specific, not the router's: panel mean 0.488/0.482 at
    sf0.01/sf0.1 (weak-similarity regime, true neighbors at cos≈0.3),
    0.962 at the near-dup-rich sf1 tier. The nprobe sweep (same
    artifact) maps the knob at sf0.1 — nprobe 2/4/8/16 → recall
    0.30/0.48/0.76/1.00, i.e. near-linear recall-vs-touch: routing
    carries little signal at cos≈0.3 (a kmeans-trained router lifts
    the panel to 0.558-0.592 at the same 25% touch, see
    ann_recall_referee.batch_ivf_kmeans). Regime rule: prefer LSH on
    weak-similarity corpora; IVF's 4×-fewer-touched-rows wins where
    similarity structure is real (sf1-like near-dup corpora).

    At 100 TB: the cell id is a write-time partition column; a probe
    reads IVF_NPROBE partitions (partition pruning) instead of the
    corpus — the classic IVF index expressed as Spark table layout.
    """
    emb = load(spark, sf_dir, "embeddings")
    # Zero-norm vectors cannot serve as centroids (no direction — the
    # driver-side routing cosine would divide by zero; adversarial find
    # r5) and a missing/zero-norm probe has no neighbors by definition.
    cent_rows = (emb.filter((F.col("vec_id") < IVF_K)
                            & finite_norm("embedding"))
                 .select("vec_id", "embedding").collect())
    cents = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
             for r in cent_rows}
    qrow = emb.filter(F.col("vec_id") == QUERY_VEC_ID).head()
    if qrow is None or not cents:
        return _empty_topk(spark)
    qv = [float(x) for x in qrow["embedding"]]
    if not _usable_probe(qv):
        return _empty_topk(spark)
    scores = F.array(*[
        F.struct(cosine("embedding", _arr_sql(cents[c])).alias("s"),
                 F.lit(c).alias("c")) for c in sorted(cents)])
    best = F.element_at(F.sort_array(scores, asc=False), 1)["c"]
    probe_cells = sorted(sorted(cents),
                         key=lambda c: -_py_cos(qv, cents[c]))[:IVF_NPROBE]
    # r12: the cell-assignment column (IVF_K HOF cosines per row, serial
    # in the one-row-group scan task) is widened and staged — the
    # write-time partition column this docstring promises, built once in
    # the cold pass. Measured 0.625 s -> 0.137 s warm at sf0.1 (quiet
    # machine, min-of-5); rows identical. Staging precedent r5;
    # `SPARK_GRAFT_STAGING=none` re-derives from raw lineage.
    celled = stage(widen_scan(emb, "vec_id").withColumn("_cell", best))
    return (celled
            .filter(F.col("_cell").isin(probe_cells)
                    & (F.col("vec_id") != QUERY_VEC_ID)
                    & (norm("embedding") > 0))  # zero vectors: no direction
            .select("vec_id", "label",
                    (fround(cosine("embedding", _arr_sql(qv)), 6)
                     + F.lit(0.0)).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(TOP_K))


# --------------------------------------------------------------------------
# Spherical k-means trainer — the coarse quantizer ivf_topk promises
# ("a production build would k-means them"). Driver-loop Lloyd iterations,
# the MLlib KMeans shape re-expressed on the DataFrame API:
#   broadcast K·dim centroid literals -> one scan assigns cells (pure JVM
#   projection, no join) -> one map-side-combinable aggregate produces
#   K×(dim avgs) rows -> driver normalizes and re-broadcasts.
# Per iteration exactly one shuffle of K rows; the input is persisted once
# across iterations (the only multi-pass operator in the registry, which
# is what Lloyd's algorithm *is* — each pass is a new plan, so this is a
# driver loop by nature, not an accident).
# --------------------------------------------------------------------------

KMEANS_K = IVF_K
KMEANS_MAX_ITER = 8
KMEANS_TOL = 1e-7  # max centroid movement (1 - cos(old, new)) to stop


def _unit(v: list[float]) -> list[float]:
    import math

    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v] if n > 0.0 else list(v)


def _normalized(emb: DataFrame) -> DataFrame:
    """Stage unit-norm double vectors as a real column (computed once per
    row, reused by every centroid dot product in the same projection)."""
    # Zero-norm vectors are dropped: they cannot be unit-normalized and
    # carry no direction for any cosine-based assignment.
    return (emb.withColumn("_nrm", norm("embedding"))
            # finite AND positive: NaN passes a bare `> 0` (Spark ranks
            # NaN largest) and an Inf norm normalizes to zeros/NaN —
            # either way one hostile vector would poison every centroid
            # trained from this frame (numeric-extremes axis, r5).
            .filter((F.col("_nrm") > 0) & ~F.isnan("_nrm")
                    & (F.col("_nrm") < F.lit(float("inf"))))
            .withColumn("nv", F.transform(
                "embedding", lambda x: x.cast("double") / F.col("_nrm")))
            .drop("_nrm"))


def _best_cell(cents: list[list[float]]) -> Column:
    """struct(s=cos to nearest centroid, c=its index) — argmax over the
    broadcast centroid literals, ties to the higher index (deterministic)."""
    scores = F.array(*[
        F.struct(dot("nv", _arr_sql(c)).alias("s"), F.lit(i).alias("c"))
        for i, c in enumerate(cents)])
    return F.element_at(F.sort_array(scores, asc=False), 1)


# Session-scoped training memos (deterministic, KB-sized driver
# objects; stale-session entries swept on miss via memo.evict_stale —
# see memo.py). Unlocked BY CHOICE: a first-construction race between
# threads double-computes the same deterministic result and the last
# write wins — tolerated because every value is pure-function-of-inputs
# (result equality under a real race is pinned by
# tests/test_concurrency.py); a lock would serialize all first calls
# behind a multi-second training job.
_TRAIN_MEMO: dict[tuple, tuple] = {}


def kmeans_train(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    max_iter: int = KMEANS_MAX_ITER,
) -> tuple[list[list[float]], list[float]]:
    """Train unit-sphere centroids; returns (centroids, per-iteration mean
    cosine history). Init is the first k vectors by vec_id (deterministic,
    same seed rule as ivf_topk's untrained quantizer). Empty cells keep
    their previous centroid. The history is the spherical-k-means objective
    measured at each assignment step — monotone non-decreasing by Lloyd's
    argument, asserted in tests/test_similarity.py.

    Memoized per (application, sf_dir, k, max_iter): training is
    deterministic and its result is a KB-sized driver object, so the
    two registered consumers (embedding_kmeans, semdedup_candidates —
    and any interactive reuse) share ONE training run per session
    instead of re-running the Lloyd loop each call (same pattern as
    datasets.py's scan cache; appId key evicts naturally on session
    restart)."""
    memo_key = (spark.sparkContext.applicationId, sf_dir, k, max_iter)
    hit = _TRAIN_MEMO.get(memo_key)
    if hit is not None:
        return hit
    evict_stale(_TRAIN_MEMO, memo_key[0])
    # widen_scan (r12): each Lloyd iteration evaluates K HOF dots per row
    # over this persisted frame; on the one-row-group local file all
    # iterations ran in a single task. No-op at 100 TB (see widen_scan).
    base = _normalized(widen_scan(load(spark, sf_dir, "embeddings"),
                                  "vec_id")).select("vec_id", "nv")
    base = base.persist()
    try:
        first = base.head()
        if first is None:  # no trainable vectors (zero-row / all-zero)
            _TRAIN_MEMO[memo_key] = ([], [])
            return [], []
        dim = len(first["nv"])
        init = {int(r["vec_id"]): [float(x) for x in r["nv"]]
                for r in base.filter(F.col("vec_id") < k).collect()}
        cents = [init[i] for i in sorted(init)]
        history: list[float] = []
        for _ in range(max_iter):
            best = _best_cell(cents)
            agg = (base.withColumn("_b", best)
                   .select(F.col("_b")["c"].alias("cell"),
                           F.col("_b")["s"].alias("sc"), "nv")
                   .groupBy("cell")
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.sum("sc").alias("sum_cos"),
                        *[F.avg(F.col("nv")[i]).alias(f"d{i}")
                          for i in range(dim)]))
            rows = agg.collect()
            new_cents = [list(c) for c in cents]
            tot_n, tot_cos = 0, 0.0
            for r in rows:
                c, n = int(r["cell"]), int(r["n"])
                new_cents[c] = _unit([float(r[f"d{i}"]) for i in range(dim)])
                tot_n += n
                tot_cos += float(r["sum_cos"])
            history.append(tot_cos / tot_n)
            shift = max(1.0 - sum(a * b for a, b in zip(o, w))
                        for o, w in zip(cents, new_cents))
            cents = new_cents
            if shift < KMEANS_TOL:
                break
        _TRAIN_MEMO[memo_key] = (cents, history)
        return cents, history
    finally:
        base.unpersist()


@query("ivf_kmeans_topk")  # rows-only: trained routing is not oracle SQL
def ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the TRAINED coarse quantizer (registered r9,
    VERDICT r8 #6 sanction): identical serving plan to `ivf_topk` —
    assign cells as a pure JVM projection over broadcast centroid
    literals, search the probe's IVF_NPROBE nearest cells, exact-cosine
    re-rank — but the centroids are `kmeans_train`'s spherical-k-means
    output instead of the first-IVF_K-vectors stand-in.

    Why it exists: the r8 100-probe referee panel measured the trained
    router at 0.558-0.592 recall@10 vs 0.482 for the untrained one at
    IDENTICAL 25% corpus touch (ANN_RECALL_r08.json) — training the
    router is free recall at serving time. Training cost is paid once
    per session (kmeans_train memo; same policy as embedding_kmeans /
    semdedup_candidates — and like those, this query is excluded from
    bench EXTRA because construction-time training would be
    mis-attributed to the serving plan).

    At 100 TB: the trained cell id is a write-time partition column
    exactly as in ivf_topk; a probe reads IVF_NPROBE partitions.
    Probe-0 parity with the referee's batch twin is pinned in
    tests/test_ann_recall_referee.py."""
    emb = load(spark, sf_dir, "embeddings")
    cents, _ = kmeans_train(spark, sf_dir)
    qrow = emb.filter(F.col("vec_id") == QUERY_VEC_ID).head()
    if qrow is None or not cents:
        return _empty_topk(spark)
    qv = [float(x) for x in qrow["embedding"]]
    if not _usable_probe(qv):
        return _empty_topk(spark)
    # Route to the IVF_NPROBE nearest trained cells (stable sort: ties
    # to the lower cell index — the referee twin's exact rule).
    probe_cells = sorted(range(len(cents)),
                         key=lambda c: -_py_cos(qv, cents[c]))[:IVF_NPROBE]
    # r12: the trained-cell column comes from the staged probe-independent
    # serving index (write-time partition column; zero-norm rows already
    # dropped by its _normalized stage). Values identical.
    return (_serving_index(spark, sf_dir, None, cents)
            .filter(F.col("_cell").isin(probe_cells)
                    & (F.col("vec_id") != QUERY_VEC_ID))
            .select("vec_id", "label",
                    (fround(cosine("embedding", _arr_sql(qv)), 6)
                     + F.lit(0.0)).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(TOP_K))


@query("embedding_kmeans")  # rows-only: iterative training is not oracle SQL
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell summary of the trained spherical-k-means quantizer: size,
    mean and min cosine of members to their centroid. This is the training
    half of the IVF index (ivf_topk documents the serving half); the same
    cells double as SemDeDup-style partitions for within-cell near-dup
    search. Final assignment is one scan; training cost is
    KMEANS_MAX_ITER scans of a persisted (vec_id, nv) projection.

    At 100 TB: identical loop — centroid literals are KB-sized broadcasts,
    the per-iteration aggregate returns K rows regardless of corpus size,
    and the persisted projection is the only thing that scales.

    r12: the summary reads the shared staged serving index
    (`_serving_index` — the same (nv, _cell) table ivf_kmeans_topk
    serves from, one build per session) instead of re-running the
    KMEANS_K-dot argmax per row per execution, and recomputes only the
    SELECTED cell's dot: dot(nv, cents[_cell]) is the argmax's own
    score, same zip_with/aggregate fold over the same literals, so the
    value is bit-identical to _best_cell's "s". Measured 0.921 s ->
    0.218 s warm at sf0.1 (min-of-7, interleaved); 16 rows
    collect-identical; `SPARK_GRAFT_STAGING=none` re-derives lineage."""
    cents, _ = kmeans_train(spark, sf_dir)
    if not cents:  # nothing trainable: no cells
        return spark.createDataFrame(
            [], "cell int, n_vecs bigint, avg_cos double, min_cos double")
    idx = _serving_index(spark, sf_dir, None, cents)
    cent_arr = "array(" + ", ".join(_arr_sql(c) for c in cents) + ")"
    sc = dot("nv", f"element_at({cent_arr}, _cell + 1)")
    return (idx.select(F.col("_cell").alias("cell"), sc.alias("sc"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
                 fround(F.avg("sc"), 4).alias("avg_cos"),
                 fround(F.min("sc"), 4).alias("min_cos"))
            .orderBy("cell"))


# --------------------------------------------------------------------------
# SemDeDup-style within-cell near-duplicate candidates — the scale path
# for embedding-cosine dedup (embedding_neardup_topk is the O(n²) exact
# twin). Abbas et al., "SemDeDup" (arXiv:2303.09540): k-means the corpus,
# search pairs only inside each cluster. Soft top-2 assignment halves the
# miss rate at the cluster boundary for 2× candidate rows.
# --------------------------------------------------------------------------

SEMDEDUP_SOFT = 2       # each vector joins its top-N cells
SEMDEDUP_CELL_CAP = 4096  # skew guard: cells above this are sub-split


@query("semdedup_candidates")  # rows-only: k-means cells are not oracle SQL
def semdedup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 near-dup pairs found WITHIN trained k-means cells (soft
    top-2 assignment), exact-cosine scored — same output shape as the
    exact twin embedding_neardup_topk, so recall is directly measurable:
    tests/test_similarity.py records 13/20 on this isotropic corpus whose
    'top pairs' sit at cos≈0.45-0.51 (the hardest case for any
    partition-based method — these are not duplicates, just the least
    dissimilar random pairs). For actual duplicates (cos→1) both members'
    argmax centroid coincides and co-location probability →1, which is
    the regime SemDeDup targets.

    At 100 TB: the quadratic stage is bounded per cell (skew guard
    sub-splits cells over SEMDEDUP_CELL_CAP rows by a hash of vec_id —
    recall within the split is sacrificed, the standard cap tradeoff);
    one shuffle by cell id; centroids stay a KB broadcast."""
    cents, _ = kmeans_train(spark, sf_dir)
    if not cents:  # nothing trainable: no candidate pairs
        return spark.createDataFrame(
            [], "id1 bigint, id2 bigint, cos_sim double")
    # r12: widen the assignment stage and STAGE the finished (cell,
    # vec_id, nv) side table (guide §2.4/§2.5) — the self-join consumed
    # the whole assignment pipeline TWICE (exchange reuse cannot cross
    # the counts broadcast boundary: K·SOFT dots, sort_array, explode,
    # skew-split re-key per side per execution, with the lazy `nv`
    # alias additionally collapsing into each centroid lambda — the
    # _serving_index hazard). Staged, both sides scan one materialized
    # table; at 100 TB that table IS the write-time cell layout the
    # docstring promises. Measured 6.081 s -> 0.510 s warm at sf0.1
    # (min-of-7, interleaved); 20 rows collect-identical;
    # `SPARK_GRAFT_STAGING=none` re-derives full lineage.
    emb = _normalized(widen_scan(load(spark, sf_dir, "embeddings"),
                                 "vec_id"))
    scores = F.array(*[
        F.struct(dot("nv", _arr_sql(c)).alias("s"), F.lit(i).alias("c"))
        for i, c in enumerate(cents)])
    cells = F.slice(F.sort_array(scores, asc=False), 1, SEMDEDUP_SOFT)
    assigned = emb.select(
        "vec_id", "nv",
        F.explode(F.transform(cells, lambda x: x["c"])).alias("cell"))
    # Skew guard: sub-split any cell above the cap into ceil(n/cap)
    # hash sub-buckets (pairs straddling sub-buckets are sacrificed —
    # the documented cap tradeoff; inert on this corpus, every cell
    # far below the cap). The per-cell count table is K·SOFT rows —
    # a broadcast, never a shuffle of the corpus side.
    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("_n"))
    side = stage(assigned
                 .join(F.broadcast(counts), on="cell")
                 .withColumn("_splits",
                             F.ceil(F.col("_n") / SEMDEDUP_CELL_CAP))
                 .withColumn("cell", F.concat_ws(
                     "#", F.col("cell"),
                     F.pmod(F.xxhash64("vec_id"),
                            F.col("_splits")).cast("int")))
                 .drop("_n", "_splits"))
    a = side.select(F.col("cell"), F.col("vec_id").alias("id1"),
                    F.col("nv").alias("nv1"))
    b = side.select(F.col("cell"), F.col("vec_id").alias("id2"),
                    F.col("nv").alias("nv2"))
    pairs = (a.join(b, on="cell")
             .filter(F.col("id1") < F.col("id2"))
             .select("id1", "id2",
                     fround(dot("nv1", "nv2"), 6).alias("cos_sim"))
             .groupBy("id1", "id2")
             .agg(F.first("cos_sim").alias("cos_sim")))
    return pairs.orderBy(F.desc("cos_sim"), "id1", "id2").limit(20)


# --------------------------------------------------------------------------
# Product-quantization ANN (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011) — the MEMORY scale path: a
# 64-dim float vector (256 B) compresses to PQ_M codebook indices
# (8 B at 16 codes/subspace), so the candidate scan reads byte codes,
# not floats — the 32× that makes billion-vector serving fit a cluster.
# Complements the two routing paths (LSH needs no training; IVF routes
# to cells): PQ compresses WITHIN whatever cells routing picked.
# --------------------------------------------------------------------------

PQ_M = 8          # subspaces (64-dim -> 8 x 8-dim)
PQ_KSUB = 16      # sub-centroids per subspace (4-bit codes)
PQ_TRAIN_N = 256  # training sample: vec_id < N (deterministic)
PQ_REFINE = 16    # ADC candidates = PQ_REFINE * TOP_K, exact re-ranked
# (8 -> 16 in r11: the one ADC-quality knob that is monotone-
# nondecreasing at every tier — see ivf_pq_topk's docstring for the
# measured knob curve and the rejected residual/codebook alternatives)


def _pq_sample(spark: SparkSession, sf_dir: str):
    """(x, qv): the deterministic PQ training sample — vec_id <
    PQ_TRAIN_N of the unit-normalized corpus as an ndarray sorted by
    vec_id — plus the unit probe vector, which rides along from the
    same collect (QUERY_VEC_ID < PQ_TRAIN_N), saving a second Spark job
    at construction. Memoized and shared by raw (`_pq_codebooks`) and
    residual (`_pq_residual_codebooks`) training. (None, None) when the
    probe is absent (zero-row corpus) or direction-less (zero norm,
    dropped by _normalized): nothing to train toward, no neighbors."""
    memo_key = (spark.sparkContext.applicationId, sf_dir, "pq_sample")
    hit = _TRAIN_MEMO.get(memo_key)
    if hit is not None:
        return hit
    evict_stale(_TRAIN_MEMO, memo_key[0])
    import numpy as np

    emb = _normalized(load(spark, sf_dir, "embeddings"))
    rows = (emb.filter(F.col("vec_id") < PQ_TRAIN_N)
            .select("vec_id", "nv").collect())
    by_id = {int(r["vec_id"]): [float(v) for v in r["nv"]] for r in rows}
    if QUERY_VEC_ID not in by_id:
        _TRAIN_MEMO[memo_key] = (None, None)
        return None, None
    x = np.array([by_id[i] for i in sorted(by_id)])
    qv = by_id[QUERY_VEC_ID]
    _TRAIN_MEMO[memo_key] = (x, qv)
    return x, qv


def _lloyd_books(x) -> list[list[list[float]]]:
    """Per-subspace codebooks via driver-side Lloyd over the sample
    matrix (raw vectors for `pq_topk`, residuals for `ivf_pq_topk`).
    numpy, fixed init (first PQ_KSUB sample rows), 10 iterations,
    empty cells keep their previous centroid: deterministic across
    runs. Output is PQ_M * PQ_KSUB * (dim/PQ_M) floats — KB-sized, a
    driver/broadcast object by design (same rule as the k-means
    centroid literals)."""
    dim = x.shape[1]
    dsub = dim // PQ_M
    books: list[list[list[float]]] = []
    for m in range(PQ_M):
        sub = x[:, m * dsub:(m + 1) * dsub]
        cents = sub[:PQ_KSUB].copy()
        for _ in range(10):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(PQ_KSUB):
                mask = assign == j
                if mask.any():
                    cents[j] = sub[mask].mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def _pq_codebooks(spark: SparkSession, sf_dir: str
                  ) -> tuple[list[list[list[float]]], list[float]]:
    """(codebooks, query_vector): raw-vector per-subspace codebooks
    (see _pq_sample / _lloyd_books). Memoized per (application, sf_dir)
    like kmeans_train."""
    memo_key = (spark.sparkContext.applicationId, sf_dir, "pq")
    hit = _TRAIN_MEMO.get(memo_key)
    if hit is not None:
        return hit
    evict_stale(_TRAIN_MEMO, memo_key[0])
    x, qv = _pq_sample(spark, sf_dir)
    if x is None:
        _TRAIN_MEMO[memo_key] = (None, None)
        return None, None
    books = _lloyd_books(x)
    _TRAIN_MEMO[memo_key] = (books, qv)
    return books, qv


def _pq_residual_codebooks(spark: SparkSession, sf_dir: str):
    """(codebooks, query_vector, coarse_centroids): RESIDUAL-encoded PQ
    training — the FAISS IVFADC design (Jégou et al., TPAMI 2011 §IV:
    quantize the residual r = x − c(x) of each vector from its assigned
    coarse centroid, not the raw vector). Residuals concentrate near
    the origin with far smaller variance than raw vectors, so the same
    PQ_KSUB sub-centroids spend their resolution on a tighter
    distribution — this is what closes the ADC-error gap the raw-PQ
    sf0.1 panel exposed (recall 0.500 at 100% touch, ANN_RECALL_r10:
    true neighbors barely above background cos drown in quantization
    noise; VERDICT r10 #2 sanction).

    Training: assign each sample vector to its nearest trained coarse
    centroid (kmeans_train — the same quantizer that routes at serving
    time; dot on unit vectors, ties to the higher index, matching
    _best_cell's sort_array rule), subtract, Lloyd the residuals
    per-subspace. Memoized like the raw books; returns (None, None,
    None) when the corpus is untrainable or the probe absent."""
    memo_key = (spark.sparkContext.applicationId, sf_dir, "pq_res")
    hit = _TRAIN_MEMO.get(memo_key)
    if hit is not None:
        return hit
    evict_stale(_TRAIN_MEMO, memo_key[0])
    import numpy as np

    cents, _ = kmeans_train(spark, sf_dir)
    x, qv = _pq_sample(spark, sf_dir)
    if not cents or x is None:
        _TRAIN_MEMO[memo_key] = (None, None, None)
        return None, None, None
    C = np.array(cents)
    d = x @ C.T
    # argmax with ties to the HIGHER index (_best_cell's rule: struct
    # sort descends on (score, cell), so equal scores pick the larger c)
    assign = (d.shape[1] - 1) - np.argmax(d[:, ::-1], axis=1)
    books = _lloyd_books(x - C[assign])
    _TRAIN_MEMO[memo_key] = (books, qv, cents)
    return books, qv, cents


def _sql_arr(vs: list[float]) -> str:
    # _dlit, not bare {v!r}D: a NaN/Inf lookup-table entry must stay a
    # literal, not an unresolvable identifier (see _dlit).
    return "array(" + ",".join(_dlit(v) for v in vs) + ")"


def _pq_encode_sql(books: list[list[list[float]]], dsub: int,
                   vec: str = "nv") -> str:
    """codes: array<int> of length PQ_M — per subspace, the index of the
    nearest sub-centroid (squared-L2 over a slice of the `vec` column:
    the unit vector `nv` for raw PQ, the residual `rv` for IVFADC), as
    an argmin via array_sort over (distance, index) structs.

    Emitted as ONE UNROLLED SQL string so construction is a single
    parse on the JVM: building the same 8x16 tree through Column
    operators cost ~5 s of py4j round-trips per construction (measured;
    execution was fine). The tempting alternative — nested
    transform()s over a literal 3-D codebook array — parses fast but
    REBUILDS the 1024-literal array per lambda element at runtime
    (CreateArray under a lambda escapes constant folding): measured
    3x slower execution. Unrolled text keeps each candidate's codebook
    row a small foldable literal. Still zero UDF, still codegen."""
    subs = []
    for m, book in enumerate(books):
        sub = f"slice({vec}, {m * dsub + 1}, {dsub})"
        cands = ",".join(
            f"struct(aggregate(zip_with({sub}, {_sql_arr(c)}, "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (a, v) -> a + v) AS d, "
            f"{j} AS j)"
            for j, c in enumerate(book))
        subs.append(f"element_at(array_sort(array({cands})), 1).j")
    return "array(" + ",".join(subs) + ")"


def _residual_sql(cents: list[list[float]]) -> str:
    """rv: the vector's residual from its assigned coarse centroid,
    nv − cents[_cell] — the quantity IVFADC's codebooks encode. A CASE
    over _cell (not element_at into a 2-D literal array): CASE
    evaluates only the matched branch's 64-literal centroid per row,
    where a literal array-of-arrays would rebuild all K·dim literals
    per row (the same constant-folding escape _pq_encode_sql documents
    for nested codebook literals)."""
    branches = " ".join(
        f"WHEN {i} THEN zip_with(nv, {_sql_arr(c)}, (x, y) -> x - y)"
        for i, c in enumerate(cents))
    return f"CASE _cell {branches} END"


# Session-scoped serving-index memo (checkpoint-backed DataFrame handle,
# the graph._CLUSTER_MEMO pattern; stale sessions swept via evict_stale).
# r12 optimization: the PQ/IVF serving queries recomputed their
# probe-INDEPENDENT index columns — unit-norm `nv`, trained-cell `_cell`,
# PQ `codes` — on every execution, serially in the one-row-group scan
# task; worse, the lazy `nv` alias collapses into each consumer lambda so
# the norm aggregate re-evaluated per element per centroid/codeword
# (the dedup.py `_SHINGLES_OF_W` hazard, here at 64 els × 16 cells × 8
# subspaces). At 100 TB these columns are WRITE-TIME table layout (the
# pq_topk/ivf_pq_topk docstrings' stated design: cells are the partition
# column, codes a stored column); locally the staged digest is that
# layout, built once per session in the cold pass. Measured (quiet
# machine, min-of-5, sf0.1): ivf_pq_topk 13.38 s -> see
# OPTIMIZATION_r12.md; ivf_kmeans_topk 12.76 s -> same table. Values
# identical (staging is pure materialization; `SPARK_GRAFT_STAGING=none`
# re-derives from raw lineage).
_INDEX_MEMO: dict[tuple, DataFrame] = {}


def _serving_index(spark: SparkSession, sf_dir: str,
                   books, cents) -> DataFrame:
    """The staged (vec_id, label, embedding, nv[, _cell][, codes])
    serving-index table — probe-independent columns only, so every probe
    query over the same trained state shares one build. ``books`` /
    ``cents`` are the memoized deterministic training outputs (or
    None/[] when a consumer does not need that column)."""
    # Digest the trained VALUES, not only their shapes (ADVICE r12): an
    # interactive caller retraining with different hyperparameters (same
    # k) in one session must not be served a stale _cell/codes column.
    # repr() of Python floats round-trips exactly, so equal training
    # outputs key identically and any value drift forces a fresh build.
    digest = hashlib.md5(repr((books, cents)).encode()).hexdigest()
    memo_key = (spark.sparkContext.applicationId, sf_dir,
                books is not None, len(cents) if cents else 0, digest)
    hit = _INDEX_MEMO.get(memo_key)
    if hit is not None:
        return hit
    evict_stale(_INDEX_MEMO, memo_key[0])
    idx = widen_scan(load(spark, sf_dir, "embeddings"), "vec_id")
    idx = _normalized(idx)
    if cents:
        idx = idx.withColumn("_cell", _best_cell(cents)["c"].cast("int"))
    if books is not None:
        dsub = len(books[0][0])  # sub-vector width
        idx = idx.withColumn("codes", F.expr(_pq_encode_sql(books, dsub)))
    idx = stage(idx)
    _INDEX_MEMO[memo_key] = idx
    return idx


@query("pq_topk")  # rows-only: trained codebooks are not oracle SQL
def pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k: encode the corpus to PQ_M 4-bit codes, score by
    asymmetric distance (query-side lookup tables, one add per
    subspace), exact-cosine re-rank the top PQ_REFINE*TOP_K.

    Plan: encoding is a scan-side projection (argmin over literal
    codebooks); the ADC score is PQ_M element_at() lookups into literal
    LUT arrays + adds — no join, no shuffle until the final top-k
    (TakeOrderedAndProject). Exact re-rank touches only the surviving
    candidates' float vectors. At 100 TB the codes are a WRITE-TIME
    column (8 B/vector beside the 256 B vector): the serving scan reads
    (vec_id, codes) only — 32× less I/O — and composes with IVF cell
    partitioning (route, then ADC-scan the routed partitions).
    Recall@10 vs knn_brute_force is measured in
    tests/test_similarity.py (registered probe) and across 100-probe
    panels in ANN_RECALL_r08.json: mean 0.785/0.500/0.912 at
    sf0.01/sf0.1/sf1 — the sf0.1 dip is the ADC-error regime (when
    true neighbors sit barely above the background cos, impostors
    within quantization error crowd the PQ_REFINE window; the sf1
    near-dup corpus restores 0.91 because the neighbor gap dwarfs the
    quantization noise)."""
    books, qv = _pq_codebooks(spark, sf_dir)
    if books is None:  # untrainable corpus / absent probe
        return _empty_topk(spark)
    dim = len(books[0][0]) * PQ_M
    dsub = dim // PQ_M

    # query-side LUT: lut[m][j] = q_m . c_mj  (dot on unit-normalized
    # vectors ~ cosine, reconstructed additively across subspaces)
    luts = []
    for m, book in enumerate(books):
        qm = qv[m * dsub:(m + 1) * dsub]
        luts.append([sum(a * b for a, b in zip(qm, c)) for c in book])
    adc_sql = " + ".join(
        f"element_at({_sql_arr(luts[m])}, element_at(codes, {m + 1}) + 1)"
        for m in range(PQ_M))

    # r12: codes come from the staged probe-independent serving index
    # (write-time column — see _serving_index); per-row values identical
    # to the former per-execution projection.
    coded = _serving_index(spark, sf_dir, books, [])
    cands = (coded.filter(F.col("vec_id") != QUERY_VEC_ID)
             .select("vec_id", "label", "nv",
                     F.expr(adc_sql).alias("adc_score"))
             .orderBy(F.desc("adc_score"), "vec_id")
             .limit(PQ_REFINE * TOP_K))
    return (cands
            .select("vec_id", "label",
                    (fround(dot("nv", _arr_sql(qv)), 6) + F.lit(0.0))
                    .alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(TOP_K))


@query("ivf_pq_topk")  # rows-only: trained quantizers are not oracle SQL
def ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the FAISS billion-scale serving architecture composed
    from this module's pieces: IVF cells ROUTE the probe to IVF_NPROBE
    cells (partition pruning at scale), PQ codes SCORE the routed
    candidates by ADC (8 B/vector instead of 256 B), and exact cosine
    re-ranks the survivors. Memory × routing compose multiplicatively:
    the probe touches nprobe/K of the corpus AND reads 32× fewer bytes
    per touched vector.

    Plan: one scan; cell assignment and PQ codes are both scan-side
    projections (literal centroids / codebooks, unrolled-SQL form —
    see _pq_encode_sql for why); the cell filter cuts the scan output
    before ADC ranks it; TakeOrderedAndProject twice (ADC candidates,
    then exact top-k). Zero exchanges, zero Python. At 100 TB: cells
    are the partition column, codes a stored column — the serving scan
    reads (vec_id, codes) from nprobe partitions only. Recall vs brute
    force measured in tests/test_similarity.py (routing recall bounds
    it above by the routing path's).

    The coarse quantizer is TRAINED since r10 (VERDICT r9 #3 sanction):
    routing reuses `kmeans_train`'s spherical-k-means centroids exactly
    as `ivf_kmeans_topk` does, because the untrained first-IVF_K-vectors
    router was the weakest registered ANN path (panel recall 0.369 at
    sf0.1 vs 0.558 for the trained router at identical nprobe/K touch,
    ANN_RECALL_r09.json) and FAISS-style IVF-PQ is precisely where a
    trained coarse quantizer pays most: the PQ_REFINE window can only
    rescue candidates the router actually routed to.

    The r11 ADC-quality round (VERDICT r10 #2 sanctioned residual
    encoding — FAISS's IVFADC) was MEASURED AND REJECTED: with
    IVF_K=16 cells on the weak-similarity sf0.1 corpus, residuals are
    a 16-mode mixture that quantizes WORSE than raw unit vectors
    (referee panel 0.371 vs 0.405 raw at sf0.1; pooled-residual,
    per-cell-residual, and 32-code/1024-sample variants all lose at
    one tier or another — per-cell 0.50/refine=8, ksub=32 0.9175 vs
    0.960 at sf1, numpy sim over the exact pipeline). Residuals
    concentrate only when nlist is large; at nlist=16 the coarse
    quantizer explains too little variance. The machinery stays
    (`_pq_residual_codebooks`, `_residual_sql`) and the referee
    publishes the residual panel every round as the measured negative
    (ANN_RECALL_r11 `ivf_pq_residual`). What DID close the gap, and is
    provably monotone-nondecreasing at every tier (a superset of ADC
    candidates exact-reranked can only raise recall@10): widening the
    refine window — PQ_REFINE 8 -> 16 lifts the sf0.1 panel 0.405 ->
    ~0.54 against a 0.59 routing ceiling (knob curve: 8/16/32 ->
    0.445/0.5375/0.5775 sim, ceiling 0.59). Training is memoized per
    session (kmeans_train / _pq_codebooks memos); the serving plan
    shape is unchanged — one scan, literal centroids/codebooks/LUTs,
    zero exchanges, zero Python."""
    books, qv = _pq_codebooks(spark, sf_dir)
    if books is None:  # untrainable corpus / absent probe
        return _empty_topk(spark)
    dim = len(books[0][0]) * PQ_M
    dsub = dim // PQ_M

    # trained coarse quantizer (unit-norm centroids; qv from
    # _pq_sample is the unit-normalized probe, so routing cosine is
    # a plain dot); zero-norm vectors were already dropped by
    # _normalized — they can't route (no direction, adversarial find r5)
    cents, _ = kmeans_train(spark, sf_dir)
    if not cents:
        return _empty_topk(spark)
    probe_cells = sorted(range(len(cents)),
                         key=lambda c: -_py_cos(qv, cents[c]))[:IVF_NPROBE]

    luts = []
    for m, book in enumerate(books):
        qm = qv[m * dsub:(m + 1) * dsub]
        luts.append([sum(a * b for a, b in zip(qm, c)) for c in book])
    adc_sql = " + ".join(
        f"element_at({_sql_arr(luts[m])}, element_at(codes, {m + 1}) + 1)"
        for m in range(PQ_M))

    # r12: _cell and codes come from the staged probe-independent serving
    # index (write-time partition column + stored codes column — the
    # docstring's 100 TB layout, materialized once per session). Codes
    # are now computed for every row at index-build instead of only the
    # routed rows per probe — per-row values identical, and the build is
    # shared with pq_topk/ivf_kmeans_topk consumers of the same state.
    routed = (_serving_index(spark, sf_dir, books, cents)
              .filter(F.col("_cell").isin(probe_cells)
                      & (F.col("vec_id") != QUERY_VEC_ID)))
    cands = (routed
             .select("vec_id", "label", "nv",
                     F.expr(adc_sql).alias("adc_score"))
             .orderBy(F.desc("adc_score"), "vec_id")
             .limit(PQ_REFINE * TOP_K))
    return (cands
            .select("vec_id", "label",
                    (fround(dot("nv", _arr_sql(qv)), 6) + F.lit(0.0))
                    .alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(TOP_K))
