"""Similarity search over the embeddings table (array<float>[64]).

Engine-surface additions for training-data pipelines (build brief):
- brute-force top-k cosine (the exactness baseline, oracle-checked),
- all-pairs near-duplicate cosine (oracle-checked ground truth),
- random-hyperplane LSH ANN (the 100 TB path: bucketed search, no
  quadratic stage; recall measured against brute force in tests).

All vector math is JVM-side higher-order functions (zip_with + aggregate);
elements are upcast to double *before* summation and summed sequentially
per-array, which makes the result bit-identical to the DuckDB oracle's
list_transform/list_sum pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..datasets import load
from ..functions.scalar import fround
from ..queries import query

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


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


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
    ORDER BY cos_sim DESC, e.vec_id LIMIT {TOP_K}
    """,
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qvec = (emb.filter(F.col("vec_id") == QUERY_VEC_ID)
            .select("embedding").head()[0])
    q = F.array(*[F.lit(float(v)).cast("float") for v in qvec])
    scored = (emb.filter(F.col("vec_id") != QUERY_VEC_ID)
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
    oracle=f"""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           floor(({_duck_cos('a.embedding', 'b.embedding')}) * 1000000 + 0.5) / 1000000 + 0.0 AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ORDER BY cos_sim DESC, id1, id2 LIMIT 20
    """,
)
def embedding_neardup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
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


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed xorshift stream →
    uniform in [-1, 1)); stable across runs, no runtime randomness."""
    planes, state = [], 2463534242
    for _ in range(N_TABLES * PLANES_PER_TABLE):
        row = []
        for _ in range(EMB_DIM):
            state ^= (state << 13) & 0xFFFFFFFF
            state ^= state >> 17
            state ^= (state << 5) & 0xFFFFFFFF
            row.append(state / 2**31 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_cols() -> list[Column]:
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
    mining, cos≥0.9) raise PLANES_PER_TABLE to sharpen buckets. For
    weakly-clustered corpora like this one, IVF (ivf_topk below) is the
    better scale path — recall 1.0 touching 24% of the corpus."""
    planes = _hyperplanes()
    cols = []
    for t in range(N_TABLES):
        bucket = None
        for j in range(PLANES_PER_TABLE):
            plane = planes[t * PLANES_PER_TABLE + j]
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


@query("ann_lsh_topk")  # rows-only: hyperplane hashing not SQL-oracle-able
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k for the fixed probe: candidates are the union of
    the probe's buckets across N_TABLES hash tables; exact cosine
    re-ranks the candidates. At scale: the bucket-array column is
    precomputed at write time; a probe turns into N_TABLES bucket
    lookups instead of a corpus scan."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "buckets", F.array(*lsh_bucket_cols()))
    probe = emb.filter(F.col("vec_id") == QUERY_VEC_ID).head()
    qvec, qbuckets = probe["embedding"], probe["buckets"]
    q = F.array(*[F.lit(float(v)).cast("float") for v in qvec])
    collide = None
    for t, qb in enumerate(qbuckets):
        c = F.col("buckets")[t] == F.lit(int(qb))
        collide = c if collide is None else (collide | c)
    cands = (emb.filter(collide & (F.col("vec_id") != QUERY_VEC_ID))
             .withColumn("qv", q))
    return (cands.select("vec_id", "label",
                         (fround(cosine("embedding", "qv"), 6) + F.lit(0.0)).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(TOP_K))


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


def _arr_sql(vs: list[float]) -> str:
    return "array(" + ", ".join(f"cast({v!r} as double)" for v in vs) + ")"


def _py_cos(a: list[float], b: list[float]) -> float:
    import math

    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b)))


@query("ivf_topk")  # rows-only: argmax-over-centroids is not oracle SQL
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest of
    IVF_K fixed coarse centroids, then search only the probe's IVF_NPROBE
    nearest cells, exact-cosine re-ranked.

    The coarse quantizer is the first IVF_K corpus vectors (deterministic;
    a production build would k-means them — the plan shape is identical).
    Centroids are driver-collected once (IVF_K·64 floats) and inlined as
    literals, so cell assignment is a pure JVM projection over the scan —
    no join, no shuffle. Measured on the sf0.01 clustered corpus:
    recall@10 = 1.0 touching 122/499 vectors (see tests/test_similarity.py).

    At 100 TB: the cell id is a write-time partition column; a probe
    reads IVF_NPROBE partitions (partition pruning) instead of the
    corpus — the classic IVF index expressed as Spark table layout.
    """
    emb = load(spark, sf_dir, "embeddings")
    cent_rows = (emb.filter(F.col("vec_id") < IVF_K)
                 .select("vec_id", "embedding").collect())
    cents = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
             for r in cent_rows}
    scores = F.array(*[
        F.struct(cosine("embedding", _arr_sql(cents[c])).alias("s"),
                 F.lit(c).alias("c")) for c in sorted(cents)])
    best = F.element_at(F.sort_array(scores, asc=False), 1)["c"]
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == QUERY_VEC_ID).head()["embedding"]]
    probe_cells = sorted(sorted(cents),
                         key=lambda c: -_py_cos(qv, cents[c]))[:IVF_NPROBE]
    return (emb.withColumn("_cell", best)
            .filter(F.col("_cell").isin(probe_cells)
                    & (F.col("vec_id") != QUERY_VEC_ID))
            .select("vec_id", "label",
                    (fround(cosine("embedding", _arr_sql(qv)), 6)
                     + F.lit(0.0)).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(TOP_K))
