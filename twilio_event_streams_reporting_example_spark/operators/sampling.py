"""Deterministic sampling / dataset-split operators (north star).

A training-data pipeline needs reproducible corpus partitioning:
train/val/test splits and down-samples that (a) never move a document
between splits when the corpus is re-processed, (b) need no coordination
or RNG state, and (c) evaluate map-side at scan speed. The standard
trick is a content-keyed hash bucket: ``md5(doc_id) % 100`` — a pure
per-row expression, so Catalyst pushes it into the scan, nothing
shuffles, and adding/removing documents never reassigns the rest (the
property random split columns lose).

Both engines compute the identical bucket (md5 hex → int), so the
split is oracle-checkable bit-for-bit. At 100 TB swap the 4-hex-digit
prefix for ``xxhash64`` — same plan, cheaper hash (kept md5 here
because DuckDB and Spark share it literally).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

TRAIN_PCT = 80
VAL_PCT = 10  # remainder is test


def split_bucket(key: Column) -> Column:
    """Stable bucket in [0, 100): int(md5(key)[:4], 16) % 100."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("long") % 100
    )


def split_label(bucket: Column) -> Column:
    return (
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .when(bucket < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


_SQL_BUCKET = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS UBIGINT) % 100"
)
_SQL_SPLIT = f"""CASE
      WHEN {_SQL_BUCKET} < {TRAIN_PCT} THEN 'train'
      WHEN {_SQL_BUCKET} < {TRAIN_PCT + VAL_PCT} THEN 'val'
      ELSE 'test' END"""


def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    b = split_bucket(F.col("doc_id"))
    return docs.select(
        "doc_id",
        "lang",
        b.alias("split_bucket"),
        split_label(b).alias("split"),
    )


def dataset_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(
            "lang", "n_chars", split_label(split_bucket(F.col("doc_id"))).alias("split")
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------- stratified downsample

DOWNSAMPLE_K = 40  # keep at most K docs per stratum (lang)
_DS_SALT = ":ds1"  # content-hash salt → order independent of split_bucket


_DOWNSAMPLE_ORACLE = f"""
        SELECT doc_id, lang, CAST(rk AS BIGINT) AS sample_rank
        FROM (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '{_DS_SALT}'), doc_id
                 ) AS rk
          FROM documents
        ) WHERE rk <= {DOWNSAMPLE_K}
"""


def stratified_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsample: keep at most K documents
    per language, chosen by content-hash order (md5(doc_id||salt)) —
    the domain-balancing cap a pretraining mix applies, reproducible
    across runs with no RNG state. The hash order is uniform, so the
    kept set is an unbiased sample; the salt decorrelates it from
    the train/val/test bucketing above. At 100 TB the per-stratum
    window is the skew risk (few strata, one partition each): the
    scale path is the two-phase partial top-K variant below."""
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    hkey = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_DS_SALT)))
    w = W.partitionBy("lang").orderBy(hkey, "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= DOWNSAMPLE_K)
        .select("doc_id", "lang", F.col("sample_rank").cast("long").alias("sample_rank"))
    )


# ------------------------------------------------------ context chunking

CHUNK_TOKENS = 64  # context-window size in tokens


PACK_BUDGET = 4 * CHUNK_TOKENS  # packed context-window budget in tokens


@register(
    "doc_chunking",
    oracle=f"""
        WITH n AS (
          SELECT doc_id,
                 len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 t -> t <> '')) AS n_tokens
          FROM documents
        ),
        chunks AS (
          SELECT doc_id,
                 CAST(unnest(range(0, CAST(ceil(CAST(n_tokens AS DOUBLE)
                                                / {CHUNK_TOKENS}) AS BIGINT))) AS BIGINT)
                   AS chunk_idx,
                 n_tokens
          FROM n WHERE n_tokens > 0
        ),
        sized AS (
          SELECT *,
                 CAST(LEAST({CHUNK_TOKENS}, n_tokens - chunk_idx * {CHUNK_TOKENS})
                      AS BIGINT) AS chunk_tokens
          FROM chunks
        )
        SELECT doc_id, chunk_idx, n_tokens, chunk_tokens,
               CAST((SUM(chunk_tokens) OVER (
                       ORDER BY doc_id, chunk_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) - chunk_tokens) // {PACK_BUDGET} AS BIGINT) AS bin_id
        FROM sized
    """,
    doc=(
        "Context-window chunking + deterministic SEQUENCE PACKING: each "
        "document becomes ceil(n_tokens/{k}) chunk rows, each chunk gets "
        "its token count, and chunks are streamed in (doc_id, chunk_idx) "
        "order into fixed {b}-token bins (bin_id = exclusive-prefix-sum "
        "div budget — the standard streaming pack; a chunk never splits, "
        "a bin may overflow by at most one chunk tail). The prefix sum is "
        "computed in the SCALE-SAFE two-LEVEL form (r15): per-doc running "
        "sums partition by doc_id; doc totals are RANGE-partitioned by "
        "doc_id (order-preserving) for per-partition exclusive sums; and "
        "only ONE ROW PER RANGE PARTITION flows through the remaining "
        "global ordering — neither the chunk rows nor the doc rows ever "
        "pass through a single-partition window. The oracle derives "
        "bin_id with a direct global SQL cumsum — the two formulations "
        "must agree bit-for-bit."
    ).replace("{k}", str(CHUNK_TOKENS)).replace("{b}", str(PACK_BUDGET)),
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from .dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    n_tok = F.size(tokens(F.col("text")))
    n_chunks = F.ceil(n_tok.cast("double") / CHUNK_TOKENS).cast("long")
    chunks = (
        docs.select("doc_id", n_tok.alias("n_tokens"), n_chunks.alias("nc"))
        .filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("nc") - 1)).alias(
                "chunk_idx"
            ),
            "n_tokens",
        )
        .withColumn(
            "chunk_tokens",
            F.least(
                F.lit(CHUNK_TOKENS).cast("long"),
                F.col("n_tokens") - F.col("chunk_idx") * CHUNK_TOKENS,
            ),
        )
    )
    # phase 1: per-doc exclusive running sum — partitioned by doc_id, no
    # global movement of chunk rows
    w_doc = (
        W.partitionBy("doc_id")
        .orderBy("chunk_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    chunks = chunks.withColumn(
        "cum_in_doc", F.sum("chunk_tokens").over(w_doc) - F.col("chunk_tokens")
    )
    # phase 2: doc start offsets via a TWO-LEVEL prefix sum (r15; guide
    # §2.4/§5 — the previous form ran one global orderBy window over the
    # doc-count-sized total table, i.e. a single-partition sort of every
    # document row at 100 TB). Range-partitioning by doc_id is ORDER-
    # PRESERVING across partitions (every doc_id in partition i sorts
    # before every doc_id in partition i+1, whatever bounds the range
    # sampler picks), so a per-partition exclusive running sum plus each
    # partition's exclusive total-offset is exactly the global exclusive
    # prefix sum — bit-identical bin_ids. Only ONE ROW PER RANGE
    # PARTITION (its dt total) crosses the remaining global window,
    # which is bounded by the shuffle-partition count, not the corpus.
    #
    # The range-partitioned table is localCheckpoint'ed (eager, the CC
    # operators' pattern) because BOTH consumers — the intra-partition
    # running sum and the per-partition totals — must observe the SAME
    # partitioner: two independent range exchanges sample their bounds
    # independently (verified: the unpersisted plan carries 2
    # rangepartitioning Exchanges and no ReusedExchange), and divergent
    # bounds would mis-join pid offsets. A plain .persist() is NOT
    # enough — spark_partition_id() is nondeterministic, so the
    # CacheManager's canonicalized-plan lookup matches only one of the
    # two consumers and the other re-plans its own exchange (verified:
    # 2 rangepartitioning with 2 distinct pid exprIds). Checkpointing
    # truncates the lineage to one already-partitioned RDD that both
    # branches scan.
    # Caveats (same register the CC operators keep for their checkpoint
    # use): the EAGER localCheckpoint runs the scan+tokenize+per-doc
    # aggregate at query-BUILD time and truncates lineage, so the
    # partitioned totals are non-recomputable on executor/block loss
    # (a lost block fails the query instead of recomputing — acceptable
    # for a deterministic re-runnable batch job, the standard
    # localCheckpoint trade) and the blocks live until release_caches().
    # numPartitions is passed EXPLICITLY (r16 advisor ask — the bare
    # call inherits spark.sql.shuffle.partitions silently): the value
    # IS the session's shuffle-partition setting, stated in code so the
    # coupling is visible. That is also the right sizing rule: the
    # table is one ~16-byte row per document, so even 10^10 docs /
    # a few hundred partitions is tens of MB per partition, and the
    # prefix-sum result is partition-count-INVARIANT (any split of an
    # order-preserving range partitioning yields the same global
    # exclusive sums), so a deployment can raise the setting freely.
    from ..registry import pin_checkpoint

    n_range_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    doc_tot = chunks.groupBy("doc_id").agg(F.sum("chunk_tokens").alias("dt"))
    parts = (
        doc_tot.repartitionByRange(n_range_parts, "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    pin_checkpoint(parts)
    w_in = (
        W.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    intra = parts.withColumn(
        "off_in", F.coalesce(F.sum("dt").over(w_in), F.lit(0).cast("long"))
    )
    w_p = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    poff = (
        parts.groupBy("pid")
        .agg(F.sum("dt").alias("pt"))
        .select(
            "pid", F.coalesce(F.sum("pt").over(w_p), F.lit(0).cast("long")).alias("poff")
        )
    )
    doc_off = (
        intra.join(F.broadcast(poff), "pid")
        .select("doc_id", (F.col("off_in") + F.col("poff")).alias("doc_off"))
    )
    return (
        chunks.join(doc_off, "doc_id")
        .select(
            "doc_id",
            "chunk_idx",
            "n_tokens",
            "chunk_tokens",
            # integer `div`, not double `/`: offsets at 100 TB exceed
            # 2^53 and double division would mis-assign bins
            F.expr(f"(doc_off + cum_in_doc) div {PACK_BUDGET}").alias("bin_id"),
        )
    )


# ------------------------------------------- train/test contamination


def _contam_oracle() -> str:
    # assembled in a function so the heavyweight CTE import stays local
    from .dedup import _sql_cluster_ctes

    return f"""
        WITH RECURSIVE {_sql_cluster_ctes()},
        splits AS (
          SELECT doc_id, {_SQL_SPLIT} AS split FROM documents
        )
        SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b
        FROM mh_pairs p
        JOIN splits sa ON p.doc_a = sa.doc_id
        JOIN splits sb ON p.doc_b = sb.doc_id
        WHERE sa.split <> sb.split
    """


@register(
    "cross_split_contamination",
    oracle=_contam_oracle(),
    doc=(
        "Train/eval contamination audit: near-duplicate pairs (MinHash/"
        "LSH at >=8/16 matching hashes — the cluster builder's bar) that "
        "CROSS a dataset-split boundary. The leakage check every "
        "pretraining pipeline must run: a test document with a training "
        "near-dup inflates eval. Composes two existing certified pieces "
        "— the deterministic hash split and the LSH candidate generator "
        "— with two broadcast-able split joins on top; the expensive "
        "part (pair generation) is the already-bucketed LSH path."
    ),
)
def cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import CLUSTER_MIN_MATCHES, minhash_candidate_pairs

    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_candidate_pairs(docs).filter(
        F.col("matching_hashes") >= CLUSTER_MIN_MATCHES
    )
    sp = docs.select(
        "doc_id", split_label(split_bucket(F.col("doc_id"))).alias("split")
    )
    sa = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b")
    )


def stratified_downsample_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME per-stratum cap through the two-phase partial top-K
    plan — the 100 TB form: phase 1 ranks within (stratum, input
    partition) so every core keeps at most K candidate rows with NO
    cross-partition movement of the losers; phase 2 runs the
    per-stratum window over only n_partitions*K survivors. The
    hash order is a total order, so the survivor set provably
    contains the global top-K and the result is bit-identical to
    the single-window form. This is the knn_topk_partial shape
    applied to stratified sampling."""
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    hkey = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_DS_SALT)))
    cand = docs.select(
        "doc_id", "lang", hkey.alias("hk"), F.spark_partition_id().alias("pid")
    )
    w1 = W.partitionBy("lang", "pid").orderBy("hk", "doc_id")
    survivors = (
        cand.withColumn("prk", F.row_number().over(w1))
        .filter(F.col("prk") <= DOWNSAMPLE_K)
    )
    w2 = W.partitionBy("lang").orderBy("hk", "doc_id")
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= DOWNSAMPLE_K)
        .select(
            "doc_id", "lang", F.col("sample_rank").cast("long").alias("sample_rank")
        )
    )


def stratified_downsample_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = stratified_downsample(spark, sf_dir).select(F.lit("window").alias("variant"), "*")
    b = stratified_downsample_partial(spark, sf_dir).select(
        F.lit("partial_topk").alias("variant"), "*"
    )
    return a.unionByName(b)


# ------------------------------------------------- domain mixture sampling

# Per-language KEEP RATES (percent): the pretraining-mixture knob — e.g.
# upweight en, downsample the rest. Unlisted languages fall back to the
# default rate. Deterministic per row (content-keyed hash), so re-running
# the pipeline or growing the corpus never flips a kept document.
MIXTURE_KEEP_PCT = {"en": 90, "de": 50, "es": 40, "fr": 40}
MIXTURE_DEFAULT_PCT = 25
_MIX_SALT = ":mix1"  # decorrelate from the split and downsample hashes

_SQL_MIX_BUCKET = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '" + _MIX_SALT + "'), 1, 4)) "
    "AS UBIGINT) % 100"
)
_SQL_MIX_PCT = "CASE " + " ".join(
    f"WHEN lang = '{lg}' THEN {pct}" for lg, pct in sorted(MIXTURE_KEEP_PCT.items())
) + f" ELSE {MIXTURE_DEFAULT_PCT} END"


def mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_MIX_SALT))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    pct = None
    for lg, p in sorted(MIXTURE_KEEP_PCT.items()):
        cond = F.col("lang") == lg
        pct = F.when(cond, p) if pct is None else pct.when(cond, p)
    pct = pct.otherwise(MIXTURE_DEFAULT_PCT)
    return (
        docs.select(
            "doc_id",
            "lang",
            bucket.alias("mix_bucket"),
            pct.cast("long").alias("keep_pct"),
        )
        .filter(F.col("mix_bucket") < F.col("keep_pct"))
    )


# ------------------------------------------------ training-shard manifest

N_SHARDS = 16
_SHARD_SALT = ":shard1"  # decorrelate from split/downsample/mixture hashes

_SQL_SHARD_HASH = (
    "md5(CAST(doc_id AS VARCHAR) || '" + _SHARD_SALT + "')"
)
_SQL_SHARD = (
    f"CAST(('0x' || substring({_SQL_SHARD_HASH}, 1, 4)) AS UBIGINT) % {N_SHARDS}"
)


def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle, sharded for parallel
    writers: each doc hashes (salted) to one of N_SHARDS shards, and gets
    a position within its shard by content-hash order — the 'shuffle the
    corpus before training' step, reproducible with no RNG state and
    stable per document. One hash shuffle on shard + an in-partition
    sort; at 100 TB N_SHARDS scales with writer parallelism and each
    shard sorts externally (no global sort, no single-partition
    bottleneck beyond the per-shard merge a shard writer needs anyway)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    hkey = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SHARD_SALT)))
    shard = (F.conv(F.substring(hkey, 1, 4), 16, 10).cast("long")) % N_SHARDS
    w = W.partitionBy("shard").orderBy("hkey", "doc_id")
    return (
        docs.select("doc_id", "lang", shard.alias("shard"), hkey.alias("hkey"))
        .withColumn("position", F.row_number().over(w).cast("long"))
        .select("doc_id", "lang", "shard", "position")
    )


# --------------------------------------- quality-binned curriculum sampling

QBIN_FRACTIONS = [i / 10 for i in range(1, 10)]  # decile boundaries
QBIN_BASE_PCT = 5  # keep 5% of decile 0, +10/decile -> 95% of decile 9
_QB_SALT = ":qb1"  # decorrelate from split/downsample/mixture/shard hashes

_SQL_QB_BUCKET = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '" + _QB_SALT + "'), 1, 4)) "
    "AS UBIGINT) % 100"
)
_SQL_QB_BOUNDS = ", ".join(
    f"round(quantile_cont(CAST(n_chars AS DOUBLE), {f}), 9) AS b{i}"
    for i, f in enumerate(QBIN_FRACTIONS, 1)
)
_SQL_QB_DECILE = "(" + " + ".join(
    f"CASE WHEN CAST(n_chars AS DOUBLE) > b{i} THEN 1 ELSE 0 END"
    for i in range(1, 10)
) + ")"
_QBIN_ORACLE = f"""
        SELECT doc_id, lang, n_chars, decile,
               CAST({QBIN_BASE_PCT} + 10 * decile AS BIGINT) AS keep_pct
        FROM (
          SELECT doc_id, lang, n_chars, {_SQL_QB_DECILE} AS decile,
                 {_SQL_QB_BUCKET} AS qb_bucket
          FROM documents CROSS JOIN (SELECT {_SQL_QB_BOUNDS} FROM documents) q
        )
        WHERE qb_bucket < {QBIN_BASE_PCT} + 10 * decile
"""


def quality_binned_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-binned curriculum sampling (the DCLM/FineWeb-style 'keep
    more of the better bins' mix): documents are ranked into deciles of
    a quality proxy (n_chars here; any scored column composes), and a
    doc is kept iff its salted hash bucket falls under its decile's keep
    rate — 5% of the worst decile through 95% of the best.

    Scale shape: decile BOUNDARIES come from one aggregation (exact
    ``percentile`` here so the oracle matches bit-for-bit; swap in
    ``approx_percentile`` at 100 TB — same plan), broadcast to every row
    via a 1-row cross join; binning + the keep decision are then pure
    per-row expressions that ride the scan. No global sort, no NTILE
    window over the corpus — the naive NTILE formulation is a single-
    partition total sort at scale and is exactly what this avoids."""
    docs = load_table(spark, "documents", sf_dir)
    bounds = docs.agg(
        *[
            F.round(
                F.percentile(F.col("n_chars").cast("double"), F.lit(f)), 9
            ).alias(f"b{i}")
            for i, f in enumerate(QBIN_FRACTIONS, 1)
        ]
    )
    decile = None
    for i in range(1, 10):
        term = (F.col("n_chars").cast("double") > F.col(f"b{i}")).cast("int")
        decile = term if decile is None else decile + term
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_QB_SALT))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    keep_pct = (F.lit(QBIN_BASE_PCT) + 10 * decile).cast("long")
    return (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            decile.cast("long").alias("decile"),
            bucket.alias("qb_bucket"),
            keep_pct.alias("keep_pct"),
        )
        .filter(F.col("qb_bucket") < F.col("keep_pct"))
        .select("doc_id", "lang", "n_chars", "decile", "keep_pct")
    )


# ------------------------------------------------------- folded sampling suite

_NULL_ID = "CAST(NULL AS BIGINT)"


@register(
    "sampling_suite",
    oracle=f"""
        SELECT 'split_assignment' AS section, doc_id, lang,
               CAST({_SQL_BUCKET} AS BIGINT) AS bucket, {_SQL_SPLIT} AS label,
               {_NULL_ID} AS m1, {_NULL_ID} AS m2
        FROM documents
        UNION ALL
        SELECT 'split_audit' AS section, {_NULL_ID} AS doc_id, lang,
               {_NULL_ID} AS bucket, split AS label,
               COUNT(*) AS m1, CAST(SUM(n_chars) AS BIGINT) AS m2
        FROM (SELECT lang, n_chars, {_SQL_SPLIT} AS split FROM documents)
        GROUP BY lang, split
        UNION ALL
        SELECT 'mixture_kept' AS section, doc_id, lang,
               CAST({_SQL_MIX_BUCKET} AS BIGINT) AS bucket,
               CAST(NULL AS VARCHAR) AS label,
               CAST({_SQL_MIX_PCT} AS BIGINT) AS m1, {_NULL_ID} AS m2
        FROM documents
        WHERE {_SQL_MIX_BUCKET} < {_SQL_MIX_PCT}
        UNION ALL
        SELECT 'downsample_window' AS section, doc_id, lang,
               {_NULL_ID} AS bucket, CAST(NULL AS VARCHAR) AS label,
               sample_rank AS m1, {_NULL_ID} AS m2
        FROM ({_DOWNSAMPLE_ORACLE})
        UNION ALL
        SELECT 'downsample_partial_topk' AS section, doc_id, lang,
               {_NULL_ID} AS bucket, CAST(NULL AS VARCHAR) AS label,
               sample_rank AS m1, {_NULL_ID} AS m2
        FROM ({_DOWNSAMPLE_ORACLE})
        UNION ALL
        SELECT 'shard_manifest' AS section, doc_id, lang,
               CAST({_SQL_SHARD} AS BIGINT) AS bucket,
               CAST(NULL AS VARCHAR) AS label,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY {_SQL_SHARD}
                 ORDER BY {_SQL_SHARD_HASH}, doc_id) AS BIGINT) AS m1,
               {_NULL_ID} AS m2
        FROM documents
        UNION ALL
        SELECT 'quality_bins' AS section, doc_id, lang,
               CAST(decile AS BIGINT) AS bucket,
               CAST(NULL AS VARCHAR) AS label,
               keep_pct AS m1, n_chars AS m2
        FROM ({_QBIN_ORACLE})
    """,
    doc=(
        "The deterministic corpus-sampling toolkit in one union-tagged "
        "result (each section keeps its own independent oracle "
        "derivation). `split_assignment`: content-keyed 80/10/10 "
        "train/val/test hash bucketing — a pure projection (no shuffle, "
        "no RNG; corpus growth never moves an existing doc across "
        "splits). `split_audit`: the per-(lang, split) balance check "
        "(m1=docs, m2=chars), one partial-aggregated shuffle. "
        "`mixture_kept`: domain-mixture sampling — keep a doc iff its "
        "salted hash bucket falls under its language's keep rate; a "
        "per-row filter that rides the scan. `downsample_window` / "
        "`downsample_partial_topk`: keep at most K docs per language by "
        "content-hash order in BOTH physical strategies — the single "
        "per-stratum window, and the two-phase partial top-K plan "
        "(per-core candidate cap, then a window over n_partitions*K "
        "survivors — the 100 TB form); one oracle derivation, the two "
        "plans must be bit-identical. All three hash families are "
        "salt-decorrelated so composed recipes stay unbiased. "
        "`shard_manifest`: the deterministic global training-order "
        "shuffle — each doc hashes (salted) to one of 16 shards "
        "(bucket) with a content-hash-ordered position within its "
        "shard (m1); one hash shuffle + in-partition sort, no global "
        "sort, shard count scales with writer parallelism at 100 TB. "
        "`quality_bins`: quality-binned curriculum sampling — decile "
        "boundaries from ONE exact-percentile aggregation (broadcast; "
        "approx_percentile at 100 TB, same plan), then per-row binning "
        "(bucket=decile) and a salted-hash keep decision at 5%+10/decile "
        "(m1=keep_pct, m2=n_chars) — no NTILE, no global sort."
    ),
)
def sampling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    nid = F.lit(None).cast("long")
    nstr = F.lit(None).cast("string")
    assignment = dataset_split_assignment(spark, sf_dir).select(
        F.lit("split_assignment").alias("section"),
        "doc_id",
        "lang",
        F.col("split_bucket").alias("bucket"),
        F.col("split").alias("label"),
        nid.alias("m1"),
        nid.alias("m2"),
    )
    audit = dataset_split_stratified(spark, sf_dir).select(
        F.lit("split_audit").alias("section"),
        nid.alias("doc_id"),
        "lang",
        nid.alias("bucket"),
        F.col("split").alias("label"),
        F.col("n_docs").alias("m1"),
        F.col("total_chars").alias("m2"),
    )
    mixture = mixture_weighted_sample(spark, sf_dir).select(
        F.lit("mixture_kept").alias("section"),
        "doc_id",
        "lang",
        F.col("mix_bucket").alias("bucket"),
        nstr.alias("label"),
        F.col("keep_pct").alias("m1"),
        nid.alias("m2"),
    )
    def _ds(section: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(section).alias("section"),
            "doc_id",
            "lang",
            nid.alias("bucket"),
            nstr.alias("label"),
            F.col("sample_rank").alias("m1"),
            nid.alias("m2"),
        )

    shards = training_shard_manifest(spark, sf_dir).select(
        F.lit("shard_manifest").alias("section"),
        "doc_id",
        "lang",
        F.col("shard").alias("bucket"),
        nstr.alias("label"),
        F.col("position").alias("m1"),
        nid.alias("m2"),
    )
    qbins = quality_binned_sample(spark, sf_dir).select(
        F.lit("quality_bins").alias("section"),
        "doc_id",
        "lang",
        F.col("decile").alias("bucket"),
        nstr.alias("label"),
        F.col("keep_pct").alias("m1"),
        F.col("n_chars").alias("m2"),
    )
    parts = [
        assignment,
        audit,
        mixture,
        _ds("downsample_window", stratified_downsample(spark, sf_dir)),
        _ds("downsample_partial_topk", stratified_downsample_partial(spark, sf_dir)),
        shards,
        qbins,
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out
