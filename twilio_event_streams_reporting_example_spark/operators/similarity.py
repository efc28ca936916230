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
precision → bit-identical scores (verified empirically). As a defense
against a future DuckDB reordering/FMA change, every exposed score is
additionally rounded to 9 decimals identically on both sides (SCORE_DP);
ranking happens on the rounded score with an id tie-break, so a sub-1e-9
drift cannot flip results.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register, track
from ..session import scale_input_partitions
from ..sources.tables import load_table
from .vectorized import NORMS_ORACLE as _NORMS_ORACLE

N_QUERIES = 8  # vec_id < N_QUERIES form the query set in the demo queries
TOP_K = 10
LSH_K = 6  # hyperplanes → 2^6 buckets
DIM = 64
NEARDUP_THRESHOLD = 0.35
SCORE_DP = 9  # decimals kept on every exposed cosine score (both engines)
# Near-dup banded LSH: a pair is a candidate iff ALL planes of SOME band
# agree. More bands → higher recall; more planes/band → fewer candidates.
# For true near-dups (cosine >= 0.9, plane-agreement p ~ 0.856) recall is
# 1-(1-p^3)^5 ~ 0.99; candidate volume per band is ~n²/2^3 per bucket set.
NEARDUP_BANDS = 5
NEARDUP_BAND_PLANES = 3


def _planes(prefix: str, n: int, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — identical constants
    are embedded in the oracle SQL, so no RNG/library dependency."""
    planes = []
    for i in range(n):
        row = []
        for j in range(dim):
            h = int(hashlib.md5(f"{prefix}_{i}_{j}".encode()).hexdigest()[:15], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


HYPERPLANES = _planes("plane", LSH_K)
# Independent plane set for the near-dup bands (band b uses planes
# [b*BAND_PLANES, (b+1)*BAND_PLANES)).
NEARDUP_PLANES = _planes("ndplane", NEARDUP_BANDS * NEARDUP_BAND_PLANES)


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


def band_bucket(vec: Column, band: int) -> Column:
    """Near-dup band signature: bucket id over this band's plane set."""
    bucket = F.lit(0)
    for j in range(NEARDUP_BAND_PLANES):
        plane = NEARDUP_PLANES[band * NEARDUP_BAND_PLANES + j]
        plane_col = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vec, plane_col) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def rounded(score: Column) -> Column:
    """Cross-engine score stabilization: round to SCORE_DP decimals."""
    return F.round(score, SCORE_DP)


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
        rounded(cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


# ---------------------------------------------------------------- SQL helpers

def _sql_plane_array(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def _sql_bucket(vec_expr: str) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, {_sql_plane_array(HYPERPLANES[i])}::DOUBLE[]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(LSH_K)
    ]
    return "(" + " + ".join(terms) + ")"


def _sql_band_bucket(vec_expr: str, band: int) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, "
        f"{_sql_plane_array(NEARDUP_PLANES[band * NEARDUP_BAND_PLANES + j])}::DOUBLE[]) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(NEARDUP_BAND_PLANES)
    ]
    return "(" + " + ".join(terms) + ")"


_COSINE_SQL = (
    f"round(list_dot_product(q.v, c.v) / "
    f"(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), {SCORE_DP})"
)


_KNN_EXACT_ORACLE = f"""
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
"""


def knn_bruteforce_cosine(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-k, broadcast query set."""
    if emb is None:
        emb = _emb_raw(spark, sf_dir)
    out = knn_bruteforce(
        emb.filter(F.col("id") < N_QUERIES),
        emb.filter(F.col("id") >= N_QUERIES),
        TOP_K,
    )
    return out.select("query_id", "neighbor_id", "score", "rk")


def _local_topk_fn(k: int):
    """mapInPandas factory: per-PARTITION top-k per query, accumulated
    across Arrow batches. Emits ≤ |Q|·k rows per partition — the shuffle
    after this carries partitions·|Q|·k rows instead of |Q|·N."""
    import pandas as pd

    def fn(batches):
        acc = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat((acc, pdf), ignore_index=True)
            # keep the running set bounded: same tie rule as the final
            # window (score desc, neighbor_id asc)
            acc = (
                acc.sort_values(
                    ["query_id", "score", "neighbor_id"],
                    ascending=[True, False, True],
                )
                .groupby("query_id", sort=False)
                .head(k)
                .reset_index(drop=True)
            )
        if acc is not None and len(acc):
            yield acc

    return fn


def knn_topk_partial(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """Scale-correct exact top-k: map-side partial top-k per partition
    (mapInPandas, bounded accumulator) then a final window over the
    reduced candidate set — the shuffle carries partitions×Q×k rows,
    not Q×N. Results identical to knn_bruteforce_cosine."""
    if emb is None:
        emb = _emb_raw(spark, sf_dir)
    q = with_norm(emb.filter(F.col("id") < N_QUERIES)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = with_norm(emb.filter(F.col("id") >= N_QUERIES)).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        rounded(cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))).alias("score"),
    )
    reduced = scored.mapInPandas(
        _local_topk_fn(TOP_K), "query_id long, neighbor_id long, score double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        reduced.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "score", "rk")
    )


_KNN_LSH_ORACLE = f"""
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
"""


def knn_lsh_bucketed(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """ANN scale path: sign-LSH bucket equi-join prunes candidates ~2^K×
    before exact rescoring — the join shuffles on bucket, never O(N·Q)."""
    if emb is None:
        emb = _emb_raw(spark, sf_dir)
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
        rounded(cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "bucket", "score", "rk")
    )


_ND_BANDS_SQL = " UNION ALL ".join(
    f"SELECT vec_id, {b} AS band, {_sql_band_bucket('v', b)} AS bkt FROM e"
    for b in range(NEARDUP_BANDS)
)


def _emb_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, v) — the shared raw embeddings load. knn_methods caches ONE
    instance and passes it to every ANN section (r15 optimization,
    guide §6: the six methods + certification sections otherwise put 41
    separate scans of the embeddings table in one plan; at 100 TB each
    scan is a full-table read). with_norm over the cached spine is a
    cheap projection, so sections still norm/bucket independently."""
    return load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )


def _emb_normed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, v, nrm) — the shared embeddings load used by the near-dup
    family; callers cache it once and pass it down."""
    return with_norm(_emb_raw(spark, sf_dir))


def _plane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-signature bucket id over an arbitrary plane list (bit j = 1
    iff dot(v, planes[j]) >= 0). band_bucket is the NEARDUP_PLANES
    3-plane instance; the synthetic-scale section widens to 16 planes so
    the bucket space grows with N (2^planes buckets — the knob that keeps
    banded LSH subquadratic as the corpus grows)."""
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vec, plane_col) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _plane_bucket_arrow(planes: list[list[float]]):
    """Arrow-vectorized sign-signature bucket: one numpy matmul per
    batch ((rows x dim) @ (dim x n_planes) -> sign bits -> packed int)
    instead of n_planes interpreted higher-order-function folds per row.
    ~2x the 16-plane expression path at 65k rows, and the gap widens
    with plane count. Float caveat: numpy's SIMD/pairwise dot can differ
    from the sequential fold in the last ulp, so a dot EXACTLY at 0.0
    could bucket differently — use only where the downstream contract is
    sign-jitter-immune (the planted scale corpus: identical vectors move
    buckets together, cross-group candidates are rescored away)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def fn(vecs: pd.Series) -> pd.Series:
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack(vecs.to_numpy())  # rows x dim
        p = np.asarray(planes, dtype=np.float64).T  # dim x n_planes
        bits = (m @ p) >= 0.0
        weights = np.array([1 << j for j in range(p.shape[1])], dtype=np.int64)
        return pd.Series(bits @ weights)

    return fn


def _plane_multibucket_arrow(plane_sets: list[list[list[float]]]):
    """ALL bands' sign-signature buckets in one Arrow pass: a single
    (rows x dim) @ (dim x total_planes) matmul, then per-band bit
    packing, returning array<long> of per-band buckets. vs one
    _plane_bucket_arrow per band this ships the vector column over
    Arrow ONCE instead of n_bands times and fuses the matmuls — the
    bucket-signature projection is the scale section's hottest
    pre-join stage. Same sign-jitter caveat as _plane_bucket_arrow."""
    from pyspark.sql.functions import pandas_udf

    sizes = [len(planes) for planes in plane_sets]
    flat = [p for planes in plane_sets for p in planes]

    @pandas_udf("array<long>")
    def fn(vecs: pd.Series) -> pd.Series:
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        m = np.stack(vecs.to_numpy())  # rows x dim
        p = np.asarray(flat, dtype=np.float64).T  # dim x total_planes
        bits = (m @ p) >= 0.0
        out = np.empty((len(vecs), len(sizes)), dtype=np.int64)
        off = 0
        for b, n in enumerate(sizes):
            weights = np.array([1 << j for j in range(n)], dtype=np.int64)
            out[:, b] = bits[:, off : off + n] @ weights
            off += n
        return pd.Series(list(out))

    return fn


def banded_lsh_pairs(
    emb: DataFrame,
    plane_sets: list[list[list[float]]],
    threshold: float,
    arrow_buckets: bool = False,
) -> DataFrame:
    """(id_a, id_b, score): the banded-LSH near-dup pair plan over
    ``emb`` (id, v, nrm — caller caches): per-band sign buckets →
    bucket equi-join candidates (dedup'd across bands) → exact cosine
    rescore, keep score > threshold. The SAME physical shape at every
    parameterization — the registered corpus query pins (5 bands x 3
    planes, tau=0.35); the scale section runs (2 x 16, tau=0.8) with
    ``arrow_buckets=True`` (numpy-matmul signatures; see
    :func:`_plane_bucket_arrow` for when that is admissible)."""
    # ONE projection computes every band's bucket (array<long>), then
    # posexplode fans out to (band, bkt) rows — vs a per-band union of
    # selects this scans emb once and (on the Arrow path) ships the
    # vector column across Arrow once for all bands' matmuls fused.
    if arrow_buckets:
        sig = _plane_multibucket_arrow(plane_sets)(F.col("v"))
    else:
        sig = F.array(
            *[_plane_bucket(F.col("v"), planes) for planes in plane_sets]
        )
    # cached: BOTH self-join sides read it, and the bucket signature
    # (bands x planes dot products per row) is the expensive projection —
    # without the cache each side re-derives it from emb.
    bands = track(
        emb.select(
            "id", F.posexplode(sig).alias("band", "bkt")
        ).cache()
    )
    a = bands.select(F.col("id").alias("id_a"), "band", "bkt")
    b_ = bands.select(F.col("id").alias("id_b"), "band", "bkt")
    cand = (
        a.join(b_, ["band", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    qa = emb.select(F.col("id").alias("id_a"), F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    cb = emb.select(F.col("id").alias("id_b"), F.col("v").alias("cv"), F.col("nrm").alias("cn"))
    return (
        cand.join(qa, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            rounded(cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))).alias("score"),
        )
        .filter(F.col("score") > threshold)
    )


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str, emb: DataFrame | None = None) -> DataFrame:
    if emb is None:
        emb = track(_emb_normed(spark, sf_dir).cache())
    plane_sets = [
        NEARDUP_PLANES[b * NEARDUP_BAND_PLANES : (b + 1) * NEARDUP_BAND_PLANES]
        for b in range(NEARDUP_BANDS)
    ]
    return banded_lsh_pairs(emb, plane_sets, NEARDUP_THRESHOLD)


# ------------------------------------- synthetic-scale section (planted)

# Planted-cluster corpus: SCALE_DUP_GROUPS directions, each duplicated
# exactly SCALE_DUP_COPIES times (vec ids g*C .. g*C+C-1). Directions are
# Reed-Muller RM(2,5) codeword sign vectors in {-1,+1}^32: group g with
# linear bits a = g & 31 and quadratic bits b = g >> 5 has
#   v[x] = 1 - 2 * parity(bit_count(a & x) + bit_count(b & quadmask(x)))
# RM(2,5) is a [32, 16, 8] linear code, so ANY two distinct codewords
# differ in >= 8 of 32 coordinates -> cross-group cosine <= 1 - 2*8/32
# = 0.5 (and >= -0.5: the all-ones complement needs the constant bit,
# outside the 15 bits used). With SCALE_ND_THRESHOLD = 0.8 the closed
# form is therefore GUARANTEED by coding theory, not sampled: every
# within-group pair scores exactly 1.0 (identical vectors — same bucket
# in every band, so banded LSH recall is exactly 1), every cross-group
# candidate rescores <= 0.5 and is filtered. 32 dims (vs the fixture's
# 64) keeps the 65k-row section inside the default 1g heap of a vanilla
# driver session — the operators under test are dimension-agnostic, so
# nothing about the plan shape changes. Verified independently by
# tests/test_scale_synthetic.py (numpy re-derivation of the code's
# minimum weight and the expected summary literals).
SCALE_DIM = 32
_SCALE_RM_M = 5  # RM(2,m): 2^m coords, m linear + C(m,2) quadratic bits
SCALE_DUP_GROUPS = 16384  # needs 14 message bits <= 5 + 10 available
SCALE_DUP_COPIES = 4
SCALE_DUP_N = SCALE_DUP_GROUPS * SCALE_DUP_COPIES  # 65,536 = 131x sf0.01 fixture
SCALE_ND_BANDS = 2
SCALE_ND_BAND_PLANES = 16  # 2^16 buckets/band: the knob that grows with N
SCALE_ND_THRESHOLD = 0.8
SCALE_ND_PLANES = _planes(
    "ndscale", SCALE_ND_BANDS * SCALE_ND_BAND_PLANES, dim=SCALE_DIM
)

_SCALE_PAIRS = SCALE_DUP_GROUPS * (SCALE_DUP_COPIES * (SCALE_DUP_COPIES - 1) // 2)
_SCALE_KEEPER_SUM = SCALE_DUP_COPIES * SCALE_DUP_GROUPS * (SCALE_DUP_GROUPS - 1) // 2


def _rm2_quad_mask(x: int, m: int = _SCALE_RM_M) -> int:
    """C(m,2)-bit mask of x_i*x_j for coordinate pairs i<j of the m-bit
    point x."""
    mask, k = 0, 0
    for i in range(m):
        for j in range(i + 1, m):
            if (x >> i) & 1 and (x >> j) & 1:
                mask |= 1 << k
            k += 1
    return mask


def scale_corpus(spark: SparkSession) -> DataFrame:
    """(id, v): the planted-duplicate synthetic corpus, generated in
    parallel from range() — per-slot exprs are pure integer bit math
    (bit_count of literal masks), nothing collected or broadcast."""
    g = F.shiftright(F.col("id"), 2)  # id // SCALE_DUP_COPIES
    glin = g.bitwiseAND(F.lit(SCALE_DIM - 1))
    gquad = F.shiftright(g, _SCALE_RM_M)
    slots = []
    for x in range(SCALE_DIM):
        parity = (
            F.bit_count(glin.bitwiseAND(F.lit(x)))
            + F.bit_count(gquad.bitwiseAND(F.lit(_rm2_quad_mask(x))))
        ) % 2
        slots.append((F.lit(1.0) - F.lit(2.0) * parity.cast("double")))
    return spark.range(
        0, SCALE_DUP_N, 1, numPartitions=scale_input_partitions(spark)
    ).select("id", F.array(*slots).alias("v"))


def _neardup_scale_summary(spark: SparkSession) -> DataFrame:
    """Run the SAME banded-LSH pair + connected-components operators over
    the planted corpus and reduce to summary rows with a closed-form
    oracle: n_pairs = G * C(C,2), zero cross-group pairs, exactly G
    clusters of size C with keeper (min id) g*C. The in-gate proof the
    near-dup plan (bucket equi-join -> rescore -> CC) survives a 65k-
    vector corpus, in the style of dedup_exact_documents.scale_synthetic.
    Wider bands (16 planes -> 65,536 buckets) stand in for how the
    operator is parameterized as N grows; identical duplicates make LSH
    recall exactly 1, so the reduction is deterministic."""
    from ..registry import scoped_releases
    from .graph import connected_components

    with scoped_releases():
        return _neardup_scale_summary_body(spark, connected_components)


def _neardup_scale_summary_body(spark: SparkSession, connected_components) -> DataFrame:
    emb = track(with_norm(scale_corpus(spark)).cache())
    plane_sets = [
        SCALE_ND_PLANES[b * SCALE_ND_BAND_PLANES : (b + 1) * SCALE_ND_BAND_PLANES]
        for b in range(SCALE_ND_BANDS)
    ]
    pairs = track(
        banded_lsh_pairs(
            emb, plane_sets, SCALE_ND_THRESHOLD, arrow_buckets=True
        ).cache()
    )
    # Sequencing note (OOM guard for 1g vanilla sessions): the summary's
    # pair/cluster/vector aggregate subtrees are INDEPENDENT, so a single
    # fused final action would run their stages concurrently — corpus
    # generation, bucket self-join, and rescore shuffles all in flight at
    # once. The FIRST eager action here is the CC edge checkpoint below,
    # which reads `pairs` and therefore fills the pair cache while
    # sequencing the heavy stages — the round-13 standalone
    # ``pairs.count()`` pre-fill did the same job as one EXTRA full job
    # wave and was removed in the r15 optimization pass (guide §2.4:
    # same materialization, one fewer pass; measured job count 62 → 57
    # for the registered query with byte-identical results).
    cc = connected_components(pairs.select("id_a", "id_b"), src="id_a", dst="id_b")
    ga = F.shiftright(F.col("id_a"), 2)
    gb = F.shiftright(F.col("id_b"), 2)
    pstats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("score"), SCORE_DP).alias("score_sum"),
        F.sum((ga != gb).cast("long")).alias("n_cross_pairs"),
    )
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    cstats = sizes.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.min("sz").alias("min_sz"),
        F.max("sz").alias("max_sz"),
        F.sum("cluster_id").alias("keeper_id_sum"),
    )
    vstats = emb.agg(F.count(F.lit(1)).alias("n_vectors"))
    s = pstats.crossJoin(cstats).crossJoin(vstats)  # 1-row x 1-row x 1-row
    nulll = F.lit(None).cast("long")
    nulld = F.lit(None).cast("double")

    # ONE evaluation of the aggregate row, exploded into the 8 metric
    # rows — a per-metric union of selects over `s` would re-run every
    # aggregate (including the CC fixpoint's final join) once per branch.
    def entry(metric, m1=None, score=None):
        return F.struct(
            F.lit(f"scale:{metric}").alias("section"),
            (score if score is not None else nulld).cast("double").alias("score"),
            (m1 if m1 is not None else nulll).cast("long").alias("m1"),
        )

    out = s.select(
        F.explode(
            F.array(
                entry("n_vectors", m1=F.col("n_vectors")),
                entry("n_pairs", m1=F.col("n_pairs")),
                entry("score_sum", score=F.col("score_sum")),
                entry("n_cross_pairs", m1=F.col("n_cross_pairs")),
                entry("n_clusters", m1=F.col("n_clusters")),
                entry("min_cluster_size", m1=F.col("min_sz")),
                entry("max_cluster_size", m1=F.col("max_sz")),
                entry("keeper_id_sum", m1=F.col("keeper_id_sum")),
            )
        ).alias("r")
    ).select(
        F.col("r.section").alias("section"),
        nulll.alias("id_a"),
        nulll.alias("id_b"),
        F.col("r.score").alias("score"),
        F.col("r.m1").alias("m1"),
        nulll.alias("m2"),
    )
    # Materialize the EIGHT summary rows now (the same driver-sync class
    # as the CC fixpoint counts — O(1) rows, the distributed work already
    # ran above); every block the section created — corpus/band/pair
    # caches AND the CC checkpoint RDDs — is dropped by the enclosing
    # scoped_releases() the moment this returns (exact handles captured
    # thread-locally, so the section stays footprint-free for the rest of
    # a 50-query single-JVM gate run AND safe next to a concurrently
    # materializing sibling section). The returned literal-backed plan
    # keeps the schema byte-identical for the union with the fixture
    # sections.
    rows = out.collect()
    return spark.createDataFrame(rows, schema=out.schema)


_SCALE_ORACLE_VALUES = f"""
        SELECT section,
               CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
               CAST(score AS DOUBLE) AS score,
               CAST(m1 AS BIGINT) AS m1, CAST(NULL AS BIGINT) AS m2
        FROM (VALUES
          ('scale:n_vectors',        NULL,      {SCALE_DUP_N}),
          ('scale:n_pairs',          NULL,      {_SCALE_PAIRS}),
          ('scale:score_sum',        {float(_SCALE_PAIRS)}, NULL),
          ('scale:n_cross_pairs',    NULL,      0),
          ('scale:n_clusters',       NULL,      {SCALE_DUP_GROUPS}),
          ('scale:min_cluster_size', NULL,      {SCALE_DUP_COPIES}),
          ('scale:max_cluster_size', NULL,      {SCALE_DUP_COPIES}),
          ('scale:keeper_id_sum',    NULL,      {_SCALE_KEEPER_SUM})
        ) AS t(section, score, m1)
"""


_ND_PAIRS_SQL = f"""
        e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        bands AS ({_ND_BANDS_SQL}),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.bkt = b.bkt
          WHERE a.vec_id < b.vec_id
        ),
        pairs AS (
          SELECT cand.id_a, cand.id_b, {_COSINE_SQL} AS score
          FROM cand
          JOIN e q ON q.vec_id = cand.id_a
          JOIN e c ON c.vec_id = cand.id_b
          WHERE {_COSINE_SQL} > {NEARDUP_THRESHOLD}
        )
"""


# ------------------------------------------------------------- SemDeDup

SEMDEDUP_TAU = 0.35  # within-cell cosine at/above which the higher id drops
SEMDEDUP_CELLS = 16  # seed rule shared with IVF: vec_id < K are cell seeds
SEMDEDUP_TARGET_CELL = 64  # default target cell size when deriving K from N


def semdedup_n_cells(n_vectors: int, target_cell_size: int = SEMDEDUP_TARGET_CELL) -> int:
    """K ~ N / target_cell_size, the SemDeDup scaling rule: cell count
    grows linearly with corpus size so the per-cell exact-quadratic block
    stays O(target_cell_size^2) regardless of N. This is the API form of
    the 100 TB claim — callers sizing a real corpus pass the derived K to
    :func:`semantic_dedup` (the registered fixture query stays pinned at
    SEMDEDUP_CELLS=16 for oracle stability)."""
    return max(1, -(-n_vectors // max(1, target_cell_size)))


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    emb: DataFrame | None = None,
    n_cells: int = SEMDEDUP_CELLS,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """Semantic dedup, SemDeDup-style (Abbas et al. 2023): assign every
    vector to its nearest of ``n_cells`` seed centroids (broadcast — no
    corpus shuffle), then compute EXACT pairwise cosine only WITHIN each
    cell and drop a vector iff a lower-id cellmate sits at cosine >=
    ``tau`` (deterministic keep-lowest-id; SemDeDup's keep rule is a
    free parameter — this keeps the LOWEST id, so a chain of near-dups
    can drop transitively relative to a keep-one-representative rule;
    documented deviation, oracle-consistent).

    Contrast with the banded-LSH near-dup path: LSH bounds candidates
    probabilistically across the whole corpus; SemDeDup bounds them
    structurally by clustering, then pays exact quadratic cost per cell.
    Scale: within-cell pairwise is O(sum cell_size^2) BY DESIGN — at
    100 TB the cell count K grows with N (K ~ N / target_cell_size, the
    paper's regime; :func:`semdedup_n_cells` is that rule) so cell sizes
    stay bounded; the self-join is a hash shuffle on cell_id and each
    cell's quadratic block is one task.
    Output: (vec_id, cell_id, best_lower_cos, kept, cell_size).
    """
    if emb is None:
        emb = track(_emb_normed(spark, sf_dir).cache())
    cent = emb.filter(F.col("id") < n_cells).select(
        F.col("id").alias("centroid_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    # (cell_id, id, v, nrm) — the per-row array argmax keeps v/nrm on the
    # assignment row (no groupBy(id), no join-back; guide §2.4).
    # Persisted: read by both self-join sides AND the final spine;
    # without it the broadcast-assign pass runs 3x.
    mem = track(
        _cell_scored_arr(emb, cent)
        .select(_nearest_cell_col().alias("cell_id"), "id", "v", "nrm")
        .persist()
    )
    a = mem.select(
        "cell_id", F.col("id").alias("vid"), F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    b = mem.select(
        "cell_id", F.col("id").alias("oid"), F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    mates = (
        a.join(b, "cell_id")
        .filter(F.col("oid") < F.col("vid"))
        .select(
            "vid",
            rounded(
                cosine(F.col("av"), F.col("bv"), F.col("an"), F.col("bn"))
            ).alias("cos"),
        )
    )
    dup = mates.groupBy("vid").agg(F.max("cos").alias("best_lower_cos"))
    w = W.partitionBy("cell_id")
    return (
        mem.join(dup, mem.id == dup.vid, "left")
        .select(
            F.col("id").alias("vec_id"),
            "cell_id",
            "best_lower_cos",
            F.when(F.col("best_lower_cos") >= tau, F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("kept"),
        )
        .withColumn("cell_size", F.count(F.lit(1)).over(w))
    )


def semantic_dedup_representative(
    spark: SparkSession,
    sf_dir: str,
    emb: DataFrame | None = None,
    n_cells: int = SEMDEDUP_CELLS,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """SemDeDup with KEPT-REPRESENTATIVE semantics: within each cell,
    scanning ids ascending, a vector is dropped iff some already-KEPT
    lower-id cellmate sits at cosine >= ``tau`` — so a chain
    v0~v1~v2 with cos(v0,v2) < tau keeps v0 AND v2 (the transitive rule
    in :func:`semantic_dedup` would drop both v1 and v2). This is the
    greedy maximal-independent-set selection some SemDeDup deployments
    use; which rule a corpus wants is a policy choice, so both are API.

    The keep decision for id i depends on the keep decisions of all
    lower ids in the cell — an inherently sequential per-cell recurrence
    no built-in aggregate expresses — so the per-cell scan runs as an
    Arrow-batched ``applyInPandas`` kernel (numpy dot against the kept
    set, O(cell_size^2) worst case). Cells are bounded by construction
    (K ~ N / target_cell_size, :func:`semdedup_n_cells`), so per-group
    work stays O(target^2) at any corpus size and the only shuffle is
    the hash partition on cell_id — the same scale shape as the
    transitive rule. Output schema matches :func:`semantic_dedup`;
    ``best_lower_cos`` is the best cosine to a KEPT lower-id mate.
    """
    import pandas as pd

    if emb is None:
        emb = track(_emb_normed(spark, sf_dir).cache())
    cent = emb.filter(F.col("id") < n_cells).select(
        F.col("id").alias("centroid_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    mem = _cell_scored_arr(emb, cent).select(
        _nearest_cell_col().alias("cell_id"), "id", "v", "nrm"
    )

    def select_reps(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values("id").reset_index(drop=True)
        n = len(pdf)
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = pdf["nrm"].to_numpy().astype(np.float64)
        kept = np.zeros(n, dtype=np.int64)
        best = np.full(n, np.nan)
        kept_rows: list[int] = []
        for i in range(n):
            if kept_rows:
                cos = (V[kept_rows] @ V[i]) / (nrm[kept_rows] * nrm[i])
                b = float(np.round(cos.max(), SCORE_DP))
                best[i] = b
                if b >= tau:
                    continue
            kept[i] = 1
            kept_rows.append(i)
        return pd.DataFrame(
            {
                "vec_id": pdf["id"],
                "cell_id": pdf["cell_id"],
                "best_lower_cos": best,
                "kept": kept,
                "cell_size": np.int64(n),
            }
        )

    out_schema = (
        "vec_id long, cell_id long, best_lower_cos double, "
        "kept long, cell_size long"
    )
    return mem.groupBy("cell_id").applyInPandas(select_reps, schema=out_schema)


_SEMDEDUP_SQL_CTES = f"""
        sd_cent AS (
          SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < {SEMDEDUP_CELLS}
        ),
        sd_scored AS (
          SELECT e.vec_id, c.centroid_id,
                 round(list_dot_product(e.v, c.cv) /
                       (sqrt(list_dot_product(e.v, e.v)) *
                        sqrt(list_dot_product(c.cv, c.cv))), {SCORE_DP}) AS cs
          FROM e CROSS JOIN sd_cent c
        ),
        sd_assign AS (
          SELECT vec_id, centroid_id AS cell_id FROM (
            SELECT vec_id, centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cs DESC, centroid_id) AS rn
            FROM sd_scored) WHERE rn = 1
        ),
        sd_mates AS (
          SELECT a.vec_id AS vid,
                 round(list_dot_product(ea.v, eb.v) /
                       (sqrt(list_dot_product(ea.v, ea.v)) *
                        sqrt(list_dot_product(eb.v, eb.v))), {SCORE_DP}) AS cos
          FROM sd_assign a
          JOIN sd_assign b ON a.cell_id = b.cell_id AND b.vec_id < a.vec_id
          JOIN e ea ON ea.vec_id = a.vec_id
          JOIN e eb ON eb.vec_id = b.vec_id
        ),
        sd_dup AS (
          SELECT vid, MAX(cos) AS best_lower_cos FROM sd_mates GROUP BY vid
        ),
        sd AS (
          SELECT a.vec_id, a.cell_id, d.best_lower_cos,
                 CASE WHEN d.best_lower_cos >= {SEMDEDUP_TAU} THEN 0 ELSE 1 END AS kept,
                 COUNT(*) OVER (PARTITION BY a.cell_id) AS cell_size
          FROM sd_assign a LEFT JOIN sd_dup d ON a.vec_id = d.vid
        )
"""


@register(
    "embedding_neardup",
    oracle=f"""
        WITH RECURSIVE {_ND_PAIRS_SQL},
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach(node, lab) AS (
          SELECT src, src FROM edges
          UNION
          SELECT ed.dst, r.lab FROM reach r JOIN edges ed ON ed.src = r.node
        ),
        cc AS (SELECT node AS vec_id, MIN(lab) AS cluster_id FROM reach GROUP BY node),
        {_SEMDEDUP_SQL_CTES}
        SELECT 'pair' AS section, id_a, id_b, score,
               CAST(NULL AS BIGINT) AS m1, CAST(NULL AS BIGINT) AS m2
        FROM pairs
        UNION ALL
        SELECT 'cluster' AS section, vec_id AS id_a, cluster_id AS id_b,
               CAST(NULL AS DOUBLE) AS score,
               CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS m1,
               CAST(CASE WHEN vec_id = cluster_id THEN 1 ELSE 0 END AS BIGINT) AS m2
        FROM cc
        UNION ALL
        SELECT 'semdedup' AS section, vec_id AS id_a, cell_id AS id_b,
               best_lower_cos AS score,
               CAST(kept AS BIGINT) AS m1, CAST(cell_size AS BIGINT) AS m2
        FROM sd
        UNION ALL
        {_SCALE_ORACLE_VALUES}
    """,
    doc=(
        "Embedding-cosine near-dup, THREE strategies in one union-tagged "
        "result. `pair` (id_a, id_b, score): banded-LSH blocked — a pair "
        "is rescored only if all planes of some band agree (candidate "
        "volume bounded by bucket sizes, never all-pairs; bucket "
        "equi-joins, no BroadcastNestedLoopJoin; recall ~0.99 for "
        "cos>=0.9 at 5 bands x 3 planes). `cluster` (id_a=vec_id, "
        "id_b=cluster_id, m1=members, m2=is_keeper): the SAME connected-"
        "components operator (operators/graph.py) over those pairs — the "
        "cluster builder is pair-source-agnostic (MinHash text pairs "
        "compose identically). `semdedup` (id_a=vec_id, id_b=cell_id, "
        "score=best cosine to a lower-id cellmate, m1=kept, "
        "m2=cell_size): SemDeDup (Abbas et al. 2023) — nearest-centroid "
        "cell assignment (broadcast, no corpus shuffle) then EXACT "
        "pairwise cosine within each cell only; at 100 TB the cell count "
        "scales with N so the per-cell quadratic block stays bounded. "
        "The LSH pair stage is computed ONCE and cached; pair+cluster "
        "read it. Oracle: independent recursive-CTE closure plus an "
        "independent within-cell EXISTS derivation. `scale:*` summary "
        "rows: the SAME banded-LSH + CC operators over a generated "
        "planted-cluster corpus 131x the sf0.01 fixture (65,536 vectors "
        "= 16,384 Reed-Muller RM(2,5) sign directions x 4 exact copies; "
        "min code distance 8/32 bounds cross-group cosine at 0.5, so the "
        "0.8-threshold closed form — G clusters of size C, keeper sums, "
        "zero cross pairs — is guaranteed by coding theory) reduced to "
        "literal-checked summary rows: the in-gate proof the near-dup "
        "plan survives a 6-figure-vector corpus with bands widened to "
        "2^16 buckets, not just the 500-vector fixture."
    ),
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    from .graph import connected_components

    # The synthetic-scale section and the fixture sections are fully
    # independent chains, and BOTH run eager work while the query is
    # built (cache fills, CC fixpoint actions, the scale collect).
    # Submitting the scale chain from a second driver thread lets its
    # stages back-fill the cores the fixture chain's small stage waves
    # leave idle (optimization guide §2.6 — overlap independent jobs);
    # results are byte-identical, only the wall-clock build changes
    # (measured 11.7 s → ~8 s warm at sf0.1/local[32]). Safe since the
    # r15 exact-id cache bookkeeping: the scale section's releases are
    # captured thread-locally (scoped_releases), so neither chain can
    # drop the other's blocks.
    with ThreadPoolExecutor(max_workers=1) as pool:
        scale_fut = pool.submit(
            inheritable_thread_target(lambda: _neardup_scale_summary(spark))
        )
        emb = track(_emb_normed(spark, sf_dir).cache())  # ONE load for all sections
        pairs = track(embedding_neardup_pairs(spark, sf_dir, emb=emb).cache())
        cc = connected_components(pairs.select("id_a", "id_b"), src="id_a", dst="id_b")
        scale_rows = scale_fut.result()
    w = W.partitionBy("cluster_id")
    nulld = F.lit(None).cast("double")
    nulll = F.lit(None).cast("long")
    pair_rows = pairs.select(
        F.lit("pair").alias("section"),
        "id_a",
        "id_b",
        "score",
        nulll.alias("m1"),
        nulll.alias("m2"),
    )
    cluster_rows = cc.select(
        F.lit("cluster").alias("section"),
        F.col("node").alias("id_a"),
        F.col("cluster_id").alias("id_b"),
        nulld.alias("score"),
        F.count(F.lit(1)).over(w).alias("m1"),
        (F.col("node") == F.col("cluster_id")).cast("long").alias("m2"),
    )
    sd_rows = semantic_dedup(spark, sf_dir, emb=emb).select(
        F.lit("semdedup").alias("section"),
        F.col("vec_id").alias("id_a"),
        F.col("cell_id").alias("id_b"),
        F.col("best_lower_cos").alias("score"),
        F.col("kept").alias("m1"),
        F.col("cell_size").cast("long").alias("m2"),
    )
    return (
        pair_rows.unionByName(cluster_rows)
        .unionByName(sd_rows)
        .unionByName(scale_rows)
    )


def embedding_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone cluster form (kept composable; registered via the
    `cluster` section of embedding_neardup)."""
    from .graph import connected_components

    pairs = embedding_neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    cc = connected_components(pairs, src="id_a", dst="id_b")
    w = W.partitionBy("cluster_id")
    return cc.select(
        F.col("node").alias("vec_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("n_members"),
        (F.col("node") == F.col("cluster_id")).cast("long").alias("is_keeper"),
    )




# ------------------------------------------------------------- IVF kNN

IVF_CENTROIDS = 16  # vectors with vec_id < IVF_CENTROIDS act as centroids
IVF_NPROBE = 2  # probe the 2 nearest centroid cells per query

_IVF_ASSIGN_SQL = f"""
        cent AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
          FROM embeddings WHERE vec_id < {IVF_CENTROIDS}
        ),
        scored_cells AS (
          SELECT e.vec_id, c.centroid_id,
                 round(list_dot_product(e.v, c.cv) /
                       (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))),
                       {SCORE_DP}) AS cscore
          FROM e CROSS JOIN cent c
        )
"""


_KNN_IVF_ORACLE = f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        {_IVF_ASSIGN_SQL},
        assign AS (
          SELECT vec_id, centroid_id FROM (
            SELECT vec_id, centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cscore DESC, centroid_id) AS rn
            FROM scored_cells WHERE vec_id >= {N_QUERIES}
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS query_id, centroid_id FROM (
            SELECT vec_id, centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cscore DESC, centroid_id) AS pr
            FROM scored_cells WHERE vec_id < {N_QUERIES}
          ) WHERE pr <= {IVF_NPROBE}
        )
        SELECT query_id, neighbor_id, score, rk FROM (
          SELECT p.query_id,
                 a.vec_id AS neighbor_id,
                 {_COSINE_SQL} AS score,
                 ROW_NUMBER() OVER (PARTITION BY p.query_id
                                    ORDER BY {_COSINE_SQL} DESC, a.vec_id) AS rk
          FROM probes p
          JOIN assign a ON a.centroid_id = p.centroid_id
          JOIN e q ON q.vec_id = p.query_id
          JOIN e c ON c.vec_id = a.vec_id
        ) WHERE rk <= {TOP_K}
"""


def _cell_scored_arr(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """(id, v, nrm, cscores): per-vector centroid scores as ONE sorted
    array column — cscores[0] is the nearest cell, slice(1, nprobe) the
    probe cells.

    The centroid set is collected into a single array row and broadcast;
    scoring + argmax/arg-top-nprobe are then per-row array expressions.
    The r1-r14 formulation exploded emb x cent to n_cells rows per
    vector and took the argmax back with a groupBy(id) — a corpus-wide
    hash exchange — whose consumers then RE-JOINED v/nrm by id, a second
    corpus exchange (and the nprobe side paid a row_number window over
    the same exploded rows). Removing both is optimization guide §2.4
    (remove shuffles outright): at 100 TB the assignment becomes pure
    map-side work riding the scan.

    Determinism: identical expressions (rounded cosine) and identical
    tie rule — the array is sorted by (cscore, -centroid_id) ascending
    then reversed, i.e. (cscore DESC, centroid_id ASC), exactly the old
    max_by(centroid_id, struct(cscore, -centroid_id)) argmax and the old
    probes window ORDER BY cscore DESC, centroid_id."""
    arr = cent.agg(
        F.array_sort(F.collect_list(F.struct("centroid_id", "cv", "cnrm"))).alias(
            "cents"
        )
    )
    scored = F.reverse(
        F.array_sort(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    rounded(
                        cosine(F.col("v"), c["cv"], F.col("nrm"), c["cnrm"])
                    ).alias("cscore"),
                    (-c["centroid_id"]).alias("ncid"),
                    c["centroid_id"].alias("centroid_id"),
                ),
            )
        )
    )
    return emb.crossJoin(F.broadcast(arr)).select(
        "id", "v", "nrm", scored.alias("cscores")
    )


def _nearest_cell_col() -> Column:
    """centroid_id of the nearest cell from a ``cscores`` array column."""
    return F.col("cscores")[0]["centroid_id"]


def knn_ivf(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """IVF-style ANN: candidates are pre-assigned to their nearest
    centroid cell (deterministic centroids = the first IVF_CENTROIDS
    vectors), queries probe their nprobe nearest cells, exact rescoring
    only within probed cells. Assignment and probe selection are
    per-row array expressions over one broadcast centroid array
    (:func:`_cell_scored_arr`) — the only wide exchange is the cell
    equi-join, pruning ~centroids/nprobe of the corpus per query.
    Complements the sign-LSH path: IVF adapts to the data distribution,
    LSH needs no training data."""
    if emb is None:
        emb = _emb_raw(spark, sf_dir)
    emb = with_norm(emb)
    cent = emb.filter(F.col("id") < IVF_CENTROIDS).select(
        F.col("id").alias("centroid_id"), F.col("v").alias("cv"), F.col("nrm").alias("cnrm")
    )
    scored_cells = _cell_scored_arr(emb, cent)

    # candidates: hard assignment to the single nearest cell — a per-row
    # projection (v/nrm stay on the row; no groupBy, no join-back)
    cand = scored_cells.filter(F.col("id") >= N_QUERIES).select(
        F.col("id").alias("neighbor_id"),
        _nearest_cell_col().alias("centroid_id"),
        F.col("v").alias("cv2"),
        F.col("nrm").alias("cn2"),
    )

    # queries: probe the nprobe nearest cells (array slice, no window)
    probes = (
        scored_cells.filter(F.col("id") < N_QUERIES)
        .select(
            F.col("id").alias("query_id"),
            F.explode(F.slice("cscores", 1, IVF_NPROBE)).alias("probe"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        .select("query_id", F.col("probe")["centroid_id"].alias("centroid_id"), "qv", "qn")
    )

    rescored = probes.join(cand, "centroid_id").select(
        "query_id",
        "neighbor_id",
        rounded(cosine(F.col("qv"), F.col("cv2"), F.col("qn"), F.col("cn2"))).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "score", "rk")
    )


# ------------------------------------------------- IVF + k-means refinement

IVF_KMEANS_ITERS = 2  # Lloyd rounds refining the deterministic init


def kmeans_refine(emb: DataFrame, cent: DataFrame, iters: int) -> DataFrame:
    """Lloyd's algorithm as DataFrame ops: assign → per-dimension mean →
    re-assemble, ``iters`` times. Assignment is a per-row array argmax
    over one broadcast centroid array (:func:`_cell_scored_arr` — the
    r1-r14 groupBy(id) argmax + join-back cost TWO corpus exchanges per
    Lloyd round; guide §2.4), so every iteration's only wide exchange is
    the partial-aggregated groupBy on (cell, dimension) — DIM rows per
    cell out — the canonical scalable k-means shape.

    Determinism: assignment argmax breaks ties on the rounded score then
    lowest centroid_id; per-dimension means are rounded to SCORE_DP so
    both engines quantize identically. Cells that lose every member keep
    their previous centroid (standard empty-cell handling).
    """
    train = emb.filter(F.col("id") >= N_QUERIES)  # queries never train the index
    for _ in range(iters):
        assigned = _cell_scored_arr(train, cent).select(
            _nearest_cell_col().alias("centroid_id"), "v"
        )
        means = (
            assigned.select("centroid_id", F.posexplode("v").alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.avg("val"), SCORE_DP).alias("mval"))
        )
        refit = (
            means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("s"))
            .select(
                "centroid_id",
                F.transform("s", lambda x: x["mval"]).alias("ncv"),
            )
        )
        cent = (
            cent.join(refit, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce("ncv", "cv").alias("cv"),
            )
            .withColumn("cnrm", F.sqrt(dot(F.col("cv"), F.col("cv"))))
        )
    return cent


def _kmeans_sql_ctes(iters: int) -> str:
    """DuckDB CTE chain unrolling ``iters`` Lloyd rounds from cent0 to
    cent{iters}; expects an ``e(vec_id, v)`` CTE upstream."""
    parts = [
        f"""cent0 AS (
          SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < {IVF_CENTROIDS}
        )"""
    ]
    for i in range(iters):
        parts.append(f"""sc{i} AS (
          SELECT e.vec_id, c.centroid_id,
                 round(list_dot_product(e.v, c.cv) /
                       (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))),
                       {SCORE_DP}) AS cscore
          FROM e CROSS JOIN cent{i} c
          WHERE e.vec_id >= {N_QUERIES}
        ),
        a{i} AS (
          SELECT vec_id, centroid_id FROM (
            SELECT vec_id, centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cscore DESC, centroid_id) AS rn
            FROM sc{i}
          ) WHERE rn = 1
        ),
        m{i} AS (
          SELECT a.centroid_id, r.range AS pos,
                 round(avg(e.v[r.range + 1]), {SCORE_DP}) AS mval
          FROM a{i} a JOIN e ON e.vec_id = a.vec_id CROSS JOIN range({DIM}) r
          GROUP BY a.centroid_id, r.range
        ),
        refit{i} AS (
          SELECT centroid_id, list(mval ORDER BY pos) AS cv FROM m{i} GROUP BY centroid_id
        ),
        cent{i + 1} AS (
          SELECT c.centroid_id, COALESCE(n.cv, c.cv) AS cv
          FROM cent{i} c LEFT JOIN refit{i} n USING (centroid_id)
        )""")
    return ",\n        ".join(parts)


_KM = f"cent{IVF_KMEANS_ITERS}"


_KNN_IVF_KMEANS_ORACLE = f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        {_kmeans_sql_ctes(IVF_KMEANS_ITERS)},
        fsc AS (
          SELECT e.vec_id, c.centroid_id,
                 round(list_dot_product(e.v, c.cv) /
                       (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))),
                       {SCORE_DP}) AS cscore
          FROM e CROSS JOIN {_KM} c
        ),
        assign AS (
          SELECT vec_id, centroid_id FROM (
            SELECT vec_id, centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cscore DESC, centroid_id) AS rn
            FROM fsc WHERE vec_id >= {N_QUERIES}
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS query_id, centroid_id FROM (
            SELECT vec_id, centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cscore DESC, centroid_id) AS pr
            FROM fsc WHERE vec_id < {N_QUERIES}
          ) WHERE pr <= {IVF_NPROBE}
        )
        SELECT query_id, neighbor_id, score, rk FROM (
          SELECT p.query_id,
                 a.vec_id AS neighbor_id,
                 {_COSINE_SQL} AS score,
                 ROW_NUMBER() OVER (PARTITION BY p.query_id
                                    ORDER BY {_COSINE_SQL} DESC, a.vec_id) AS rk
          FROM probes p
          JOIN assign a ON a.centroid_id = p.centroid_id
          JOIN e q ON q.vec_id = p.query_id
          JOIN e c ON c.vec_id = a.vec_id
        ) WHERE rk <= {TOP_K}
"""


def knn_ivf_kmeans(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """IVF with a TRAINED index: the deterministic seed centroids are
    refined by IVF_KMEANS_ITERS Lloyd iterations (assign to nearest
    cell → per-dimension mean → refit) before the nprobe search — the
    standard IVF training step (Lloyd 1982; IVF-flat as in FAISS).
    Every iteration is a per-row broadcast-array argmax plus one
    (cell × dimension)-keyed partial aggregation — at 100 TB the shuffle
    carries only n_cells × dim rows per round, never the corpus. The
    oracle unrolls the identical iterations as DuckDB CTEs; means and
    scores quantize to 9dp on both engines, so assignment flips cannot
    drift."""
    if emb is None:
        emb = _emb_raw(spark, sf_dir)
    emb = with_norm(emb)
    cent0 = emb.filter(F.col("id") < IVF_CENTROIDS).select(
        F.col("id").alias("centroid_id"), F.col("v").alias("cv"), F.col("nrm").alias("cnrm")
    )
    cent = kmeans_refine(emb, cent0, IVF_KMEANS_ITERS)
    scored_cells = _cell_scored_arr(emb, cent)

    cand = scored_cells.filter(F.col("id") >= N_QUERIES).select(
        F.col("id").alias("neighbor_id"),
        _nearest_cell_col().alias("centroid_id"),
        F.col("v").alias("cv2"),
        F.col("nrm").alias("cn2"),
    )

    probes = (
        scored_cells.filter(F.col("id") < N_QUERIES)
        .select(
            F.col("id").alias("query_id"),
            F.explode(F.slice("cscores", 1, IVF_NPROBE)).alias("probe"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        .select(
            "query_id", F.col("probe")["centroid_id"].alias("centroid_id"), "qv", "qn"
        )
    )

    rescored = probes.join(cand, "centroid_id").select(
        "query_id",
        "neighbor_id",
        rounded(cosine(F.col("qv"), F.col("cv2"), F.col("qn"), F.col("cn2"))).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "score", "rk")
    )


# ------------------------------------------- product quantization (PQ/ADC)

PQ_M = 8  # subspaces
PQ_SUBDIM = DIM // PQ_M
PQ_CODEBOOK = 16  # codewords per subspace (seed rule: vec_id < 16)
_PQ_DEC = "decimal(28,12)"  # exact order-free accumulator for 9dp terms


def _subspace_slices(vcol: str):
    """array<array<double>>: the M contiguous subvectors of ``vcol`` —
    static slices, so posexplode yields (j, subvector) with j in [0,M)."""
    return F.array(
        *[
            F.expr(f"slice({vcol}, {j * PQ_SUBDIM + 1}, {PQ_SUBDIM})")
            for j in range(PQ_M)
        ]
    )


def knn_pq_adc(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """Product-quantization kNN with asymmetric distance computation
    (Jegou, Douze, Schmid 2011, "Product Quantization for Nearest
    Neighbor Search"): each candidate is compressed to PQ_M codebook
    ids (argmin-L2 per subspace against PQ_CODEBOOK deterministic seed
    codewords); queries score candidates from the CODES ONLY —
    approx_dot = sum_j <q_j, codeword(code_j)> — normalized by the
    reconstructed candidate norm, i.e. exact cosine against the
    DEcompressed vector.

    Why this is the 100 TB ANN memory path: the candidate corpus is
    M * log2(K) = 32 bits/vector instead of 64 float64s — the index
    fits in RAM at ~64x compression and the raw vectors are never
    touched after encoding. Plan shape (r15, guide §2.3/§2.4): encoding
    is one broadcast join (PQ_M codeword-array rows) + a PER-ROW
    array_min argmin — the r1-r14 groupBy(cand, j) argmin exchanged 16x
    the coded rows; the only corpus-wide exchange left is the
    groupBy(cand) that assembles each candidate's PQ_M (j, code) int
    pairs, i.e. ~the 32-bit codes themselves, never codeword vectors.
    The ADC scan is the paper's production form: ONE broadcast row
    carrying the per-query 8x16 term lookup tables (round(<q_j, cw>))
    plus the codeword-norm table, so scoring is table-lookup folds over
    the code array. The final top-k can further compose with the
    bounded-accumulator form (knn_topk_partial) so that shuffle carries
    partitions*Q*k rows — noted, not needed at this Q.

    Cross-engine exactness: every dot product is the proven
    bit-identical sequential fold; distances/terms are rounded to
    SCORE_DP and accumulated in DECIMAL (order-free); argmins tie-break
    on lowest codeword id; ranks tie-break on neighbor_id."""
    if emb is None:
        # standalone use: persist locally — three subtrees read `sub`
        emb = track(_emb_raw(spark, sf_dir).persist())
    sub = emb.select("id", F.posexplode(_subspace_slices("v")).alias("j", "sv"))
    seeds_sub = sub.filter(F.col("id") < PQ_CODEBOOK).select(
        F.col("id").alias("seed_id"),
        "j",
        F.col("sv").alias("cw"),
        rounded(dot(F.col("sv"), F.col("sv"))).alias("cwn2"),
    )
    cand_sub = sub.filter(F.col("id") >= N_QUERIES).select(
        F.col("id").alias("cand_id"), "j", F.col("sv").alias("vj")
    )
    # per-subspace codeword ARRAYS (PQ_M tiny rows, PQ_CODEBOOK structs
    # each, seed ids 0..PQ_CODEBOOK-1 contiguous so code == array index)
    seeds_arr = seeds_sub.groupBy("j").agg(
        F.array_sort(F.collect_list(F.struct("seed_id", "cwn2", "cw"))).alias("cws")
    )
    # encode: nearest codeword per (candidate, subspace) — ||v||^2 - 2<v,c>
    # + ||c||^2 in a FIXED expression order on both engines; the argmin
    # (tie → lowest seed_id) is a per-row array_min over (dist, seed_id)
    # structs. r1-r14 exploded cand x 16 codewords and took the argmin
    # back with a groupBy(cand, j) — a corpus-wide exchange of 16x the
    # coded rows (guide §2.4: removed outright).
    best = F.array_min(
        F.transform(
            F.col("cws"),
            lambda c: F.struct(
                rounded(
                    dot(F.col("vj"), F.col("vj"))
                    - 2 * dot(F.col("vj"), c["cw"])
                    + dot(c["cw"], c["cw"])
                ).alias("dist"),
                c["seed_id"].alias("code"),
            ),
        )
    )
    codes = cand_sub.join(F.broadcast(seeds_arr), "j").select(
        "cand_id", "j", best["code"].alias("code")
    )
    # THE compressed index: PQ_M (j, code) int pairs per candidate — the
    # only corpus-wide exchange of the method now carries ~the 32-bit
    # codes the docstring promises, never codeword vectors or raw floats.
    codes_per_cand = codes.groupBy("cand_id").agg(
        F.array_sort(F.collect_list(F.struct("j", "code"))).alias("cs")
    )
    # ONE broadcast row with the classic ADC lookup tables (production
    # form per Jegou et al.): cn2s[j][code] = ||codeword||^2 (rounded),
    # and per query luts[j][code] = round(<q_j, codeword>, SCORE_DP) —
    # 8 queries x 8 subspaces x 16 codewords of precomputed terms, so
    # the scan is table-lookup-only. Values are the IDENTICAL rounded
    # dot products the r14 per-pair join computed; the decimal fold
    # accumulates them in the same exact arithmetic (sums fit
    # decimal(28,12) with orders of magnitude to spare, so the per-step
    # cast is lossless and order-free like the old SUM).
    seeds_by_j = seeds_arr.agg(
        F.array_sort(F.collect_list(F.struct("j", "cws"))).alias("sj")
    ).select(F.transform("sj", lambda s: s["cws"]).alias("sj"))
    qarr = (
        with_norm(emb.filter(F.col("id") < N_QUERIES))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("id").alias("query_id"),
                        F.col("nrm").alias("qn"),
                        _subspace_slices("v").alias("qsubs"),
                    )
                )
            ).alias("qs")
        )
    )
    lut = qarr.crossJoin(F.broadcast(seeds_by_j)).select(
        F.transform(
            F.col("sj"), lambda cws: F.transform(cws, lambda c: c["cwn2"])
        ).alias("cn2s"),
        F.transform(
            F.col("qs"),
            lambda q: F.struct(
                q["query_id"].alias("query_id"),
                q["qn"].alias("qn"),
                F.transform(
                    F.col("sj"),
                    lambda cws, j: F.transform(
                        cws,
                        lambda c: rounded(
                            dot(F.element_at(q["qsubs"], j + 1), c["cw"])
                        ),
                    ),
                ).alias("terms"),
            ),
        ).alias("qs"),
    )
    zero = F.lit(0).cast(_PQ_DEC)

    def _lookup_sum(table) -> Column:
        # sum over the candidate's 8 (j, code) pairs of table[j][code],
        # accumulated in DECIMAL exactly like the old SUM(... :: DEC)
        return F.aggregate(
            F.col("cs"),
            zero,
            lambda a, c: (
                a
                + F.element_at(
                    F.element_at(table, c["j"].cast("int") + 1), c["code"].cast("int") + 1
                ).cast(_PQ_DEC)
            ).cast(_PQ_DEC),
        ).cast("double")

    scored = (
        codes_per_cand.crossJoin(F.broadcast(lut))
        .select(
            F.col("cand_id").alias("neighbor_id"),
            F.sqrt(_lookup_sum(F.col("cn2s"))).alias("cnrm"),
            "cs",
            "qs",
        )
        .select(
            "neighbor_id",
            F.explode(
                F.transform(
                    F.col("qs"),
                    lambda q: F.struct(
                        q["query_id"].alias("query_id"),
                        rounded(
                            _lookup_sum(q["terms"]) / (q["qn"] * F.col("cnrm"))
                        ).alias("score"),
                    ),
                )
            ).alias("qsc"),
        )
        .select(
            F.col("qsc")["query_id"].alias("query_id"),
            "neighbor_id",
            F.col("qsc")["score"].alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "score", "rk")
    )


_KNN_PQ_ORACLE = f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        sub AS (
          SELECT vec_id, j,
                 v[j*{PQ_SUBDIM}+1 : j*{PQ_SUBDIM}+{PQ_SUBDIM}] AS sv
          FROM e, UNNEST(generate_series(0, {PQ_M - 1})) AS t(j)
        ),
        pq_seeds AS (
          SELECT vec_id AS seed_id, j, sv AS cw,
                 round(list_dot_product(sv, sv), {SCORE_DP}) AS cwn2
          FROM sub WHERE vec_id < {PQ_CODEBOOK}
        ),
        pq_cand AS (
          SELECT vec_id AS cand_id, j, sv AS vj FROM sub WHERE vec_id >= {N_QUERIES}
        ),
        pq_dists AS (
          SELECT c.cand_id, c.j, s.seed_id, s.cwn2, s.cw,
                 round(list_dot_product(c.vj, c.vj)
                       - 2 * list_dot_product(c.vj, s.cw)
                       + list_dot_product(s.cw, s.cw), {SCORE_DP}) AS dist
          FROM pq_cand c JOIN pq_seeds s ON c.j = s.j
        ),
        pq_codes AS (
          SELECT cand_id, j, seed_id AS code, cwn2, cw FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY cand_id, j
                                         ORDER BY dist, seed_id) AS rn
            FROM pq_dists) WHERE rn = 1
        ),
        pq_cnorm AS (
          SELECT cand_id,
                 sqrt(CAST(SUM(CAST(cwn2 AS DECIMAL(28,12))) AS DOUBLE)) AS cnrm
          FROM pq_codes GROUP BY cand_id
        ),
        pq_qsub AS (
          SELECT vec_id AS query_id, j, sv AS qj FROM sub WHERE vec_id < {N_QUERIES}
        ),
        pq_qn AS (
          SELECT vec_id AS query_id, sqrt(list_dot_product(v, v)) AS qn
          FROM e WHERE vec_id < {N_QUERIES}
        ),
        pq_terms AS (
          SELECT q.query_id, c.cand_id,
                 round(list_dot_product(q.qj, c.cw), {SCORE_DP}) AS term
          FROM pq_codes c JOIN pq_qsub q ON c.j = q.j
        ),
        pq_adc AS (
          SELECT query_id, cand_id,
                 CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE) AS dot_hat
          FROM pq_terms GROUP BY query_id, cand_id
        )
        SELECT query_id, neighbor_id, score, rk FROM (
          SELECT a.query_id, a.cand_id AS neighbor_id,
                 round(a.dot_hat / (qn.qn * cn.cnrm), {SCORE_DP}) AS score,
                 ROW_NUMBER() OVER (
                   PARTITION BY a.query_id
                   ORDER BY round(a.dot_hat / (qn.qn * cn.cnrm), {SCORE_DP}) DESC,
                            a.cand_id) AS rk
          FROM pq_adc a
          JOIN pq_qn qn ON a.query_id = qn.query_id
          JOIN pq_cnorm cn ON a.cand_id = cn.cand_id
        ) WHERE rk <= {TOP_K}
"""


# ------------------------------------------------- folded kNN registration

@register(
    "knn_methods",
    oracle=f"""
        SELECT 'bruteforce' AS method, * FROM ({_KNN_EXACT_ORACLE})
        UNION ALL
        SELECT 'topk_partial' AS method, * FROM ({_KNN_EXACT_ORACLE})
        UNION ALL
        SELECT 'lsh' AS method, query_id, neighbor_id, score, rk
        FROM ({_KNN_LSH_ORACLE})
        UNION ALL
        SELECT 'ivf' AS method, * FROM ({_KNN_IVF_ORACLE})
        UNION ALL
        SELECT 'ivf_kmeans' AS method, * FROM ({_KNN_IVF_KMEANS_ORACLE})
        UNION ALL
        SELECT 'pq_adc' AS method, * FROM ({_KNN_PQ_ORACLE})
        UNION ALL
        SELECT 'arrow_l2norm' AS method, vec_id AS query_id,
               CAST(NULL AS BIGINT) AS neighbor_id, l2_norm AS score,
               CAST(NULL AS INTEGER) AS rk
        FROM ({_NORMS_ORACLE})
    """,
    doc=(
        "Top-k cosine neighbor search in SIX physical strategies, "
        "union-tagged by `method`: the exact broadcast brute force, the "
        "scale-correct map-side partial top-k (identical oracle — the two "
        "exact plans must agree), the sign-LSH bucket-pruned path, IVF "
        "with deterministic seed centroids, IVF after Lloyd-refined "
        "k-means training, and `pq_adc` — product quantization with "
        "asymmetric distance computation (Jegou et al. 2011): candidates "
        "compressed to 8 codebook ids, scored from codes only, the ~64x "
        "memory-compression path a 100 TB in-RAM index needs. Each method "
        "keeps its own independent DuckDB oracle derivation, so one "
        "driver row checks every ANN strategy. A further section, "
        "`arrow_l2norm`, certifies the Arrow-batched pandas_udf extension "
        "point (per-vector L2 norms through the vectorized Python kernel "
        "— the deliberate Python op; the production norm stays JVM-side "
        "in with_norm)."
    ),
)
def knn_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE cached load of the embeddings table feeds every section (r15,
    # guide §6): previously each of the six methods re-loaded and
    # re-projected the table independently — 41 scans of `embeddings` in
    # the union's plan, a full-table read each at 100 TB.
    emb = track(_emb_raw(spark, sf_dir).cache())
    parts = [
        ("bruteforce", knn_bruteforce_cosine),
        ("topk_partial", knn_topk_partial),
        (
            "lsh",
            lambda s, d, emb=None: knn_lsh_bucketed(s, d, emb=emb).select(
                "query_id", "neighbor_id", "score", "rk"
            ),
        ),
        ("ivf", knn_ivf),
        ("ivf_kmeans", knn_ivf_kmeans),
        ("pq_adc", knn_pq_adc),
    ]
    dfs = [
        fn(spark, sf_dir, emb=emb).select(F.lit(m).alias("method"), "*")
        for m, fn in parts
    ]
    from .vectorized import embedding_norms_arrow

    dfs.append(
        embedding_norms_arrow(spark, sf_dir).select(
            F.lit("arrow_l2norm").alias("method"),
            F.col("vec_id").alias("query_id"),
            F.lit(None).cast("long").alias("neighbor_id"),
            F.col("l2_norm").alias("score"),
            F.lit(None).cast("int").alias("rk"),
        )
    )
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
