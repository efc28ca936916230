"""Similarity search over an embedding column (array<float>).

North-star operator (BASELINE.json): brute-force cosine top-k as the
exact baseline, plus an LSH-bucketed variant as the 100 TB scale path.

Scale design:
  - The query set is broadcast; candidates stream through ONE scan with
    the dot product evaluated JVM-side (``F.aggregate``/``F.zip_with`` —
    no Python in the loop). Brute force is O(|Q|·N) but shuffle-free
    until the final per-query top-k (a tiny aggregate).
  - The LSH variant prunes candidates to matching sign-signature buckets:
    the candidate side is hash-partitioned by bucket, so each query only
    meets ~N/2^K candidates. Hyperplanes are deterministic constants so
    results are reproducible (and oracle-checkable).

Exactness: both engines fold the dot product left-to-right in double
precision → bit-identical scores (verified empirically), so ranking and
hashes match without rounding.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

N_QUERIES = 8  # vec_id < N_QUERIES form the query set in the demo queries
TOP_K = 10
LSH_K = 6  # hyperplanes → 2^6 buckets
DIM = 64
NEARDUP_THRESHOLD = 0.35


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — identical constants
    are embedded in the oracle SQL, so no RNG/library dependency."""
    planes = []
    for i in range(LSH_K):
        row = []
        for j in range(DIM):
            h = int(hashlib.md5(f"plane_{i}_{j}".encode()).hexdigest()[:15], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


HYPERPLANES = _hyperplanes()


def dot(a: Column, b: Column) -> Column:
    """Sequential double fold — JVM codegen, deterministic order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def with_norm(df: DataFrame, vec: str = "v") -> DataFrame:
    return df.withColumn("nrm", F.sqrt(dot(F.col(vec), F.col(vec))))


def lsh_bucket(vec: Column) -> Column:
    """Sign-signature bucket id in [0, 2^K): bit i = 1 iff dot(v, plane_i) >= 0."""
    bucket = F.lit(0)
    for i, plane in enumerate(HYPERPLANES):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vec, plane_col) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def knn_bruteforce(queries: DataFrame, candidates: DataFrame, k: int) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    ``queries``/``candidates``: (id, v[double]) — queries must be small
    enough to broadcast (the exact-path contract; large query sets go
    through :func:`knn_lsh`).
    """
    q = with_norm(queries).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = with_norm(candidates).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


# ---------------------------------------------------------------- SQL helpers

def _sql_plane_array(i: int) -> str:
    return "[" + ", ".join(repr(x) for x in HYPERPLANES[i]) + "]"


def _sql_bucket(vec_expr: str) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, {_sql_plane_array(i)}::DOUBLE[]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(LSH_K)
    ]
    return "(" + " + ".join(terms) + ")"


_COSINE_SQL = (
    "list_dot_product(q.v, c.v) / "
    "(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))"
)


@register(
    "knn_bruteforce_cosine",
    oracle=f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        )
        SELECT query_id, neighbor_id, score, rk FROM (
          SELECT
            q.vec_id AS query_id,
            c.vec_id AS neighbor_id,
            {_COSINE_SQL} AS score,
            ROW_NUMBER() OVER (
              PARTITION BY q.vec_id
              ORDER BY {_COSINE_SQL} DESC, c.vec_id
            ) AS rk
          FROM e q CROSS JOIN e c
          WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
        )
        WHERE rk <= {TOP_K}
    """,
    doc="Exact ANN baseline: brute-force cosine top-k, broadcast query set.",
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v")
    )
    out = knn_bruteforce(
        emb.filter(F.col("id") < N_QUERIES),
        emb.filter(F.col("id") >= N_QUERIES),
        TOP_K,
    )
    return out.select("query_id", "neighbor_id", "score", "rk")


@register(
    "knn_lsh_bucketed",
    oracle=f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v, {_sql_bucket('embedding::DOUBLE[]')} AS bucket
          FROM embeddings
        )
        SELECT query_id, neighbor_id, bucket, score, rk FROM (
          SELECT
            q.vec_id AS query_id,
            c.vec_id AS neighbor_id,
            q.bucket AS bucket,
            {_COSINE_SQL} AS score,
            ROW_NUMBER() OVER (
              PARTITION BY q.vec_id
              ORDER BY {_COSINE_SQL} DESC, c.vec_id
            ) AS rk
          FROM e q JOIN e c ON q.bucket = c.bucket
          WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
        )
        WHERE rk <= {TOP_K}
    """,
    doc=(
        "ANN scale path: sign-LSH bucket equi-join prunes candidates ~2^K× "
        "before exact rescoring — the join shuffles on bucket, never O(N·Q)."
    ),
)
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    emb = with_norm(emb).withColumn("bucket", lsh_bucket(F.col("v")))
    q = emb.filter(F.col("id") < N_QUERIES).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "bucket",
    )
    c = emb.filter(F.col("id") >= N_QUERIES).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), F.col("bucket").alias("cbucket"),
    )
    scored = q.join(c, q.bucket == c.cbucket).select(
        "query_id",
        "neighbor_id",
        "bucket",
        cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "bucket", "score", "rk")
    )


@register(
    "embedding_neardup_pairs",
    oracle=f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        )
        SELECT q.vec_id AS id_a, c.vec_id AS id_b, {_COSINE_SQL} AS score
        FROM e q JOIN e c ON q.vec_id < c.vec_id
        WHERE {_COSINE_SQL} > {NEARDUP_THRESHOLD}
    """,
    doc=(
        "Embedding-cosine near-dup pairs (dedup north star). Demo runs the "
        "exact all-pairs form; at scale the LSH bucket join above is the "
        "blocking step (same rescoring expression)."
    ),
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_norm(
        load_table(spark, "embeddings", sf_dir).select(
            F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v")
        )
    )
    a = emb.select(F.col("id").alias("id_a"), F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    b = emb.select(F.col("id").alias("id_b"), F.col("v").alias("cv"), F.col("nrm").alias("cn"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("score"),
        )
        .filter(F.col("score") > NEARDUP_THRESHOLD)
    )
