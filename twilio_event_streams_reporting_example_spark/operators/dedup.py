"""Deduplication suite (north-star operators, BASELINE.json).

Four tiers, all designed so the blocking step bounds the pair space —
nothing here is O(n²) at scale:

  exact           hash-groupBy on md5(text); one shuffle on the hash.
  n-gram Jaccard  shingle explode → equi-join on shingle (blocking) →
                  integer intersection/union counts.
  MinHash + LSH   shingle→minhash signature→band buckets→bucket equi-join;
                  candidate pairs only where a band collides.
  SimHash         64→32-bit sign fingerprint; byte-blocked pair join +
                  bit_count hamming filter.

Determinism: token/shingle hashes come from md5 (same bytes in Spark and
DuckDB), minhash permutations are (a·x+b) mod p over int64 — exact in both
engines, so every query here has a strict value-hash oracle.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache as _dedup_lru_cache

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register, track
from ..session import scale_input_partitions
from ..sources.tables import load_table

MERSENNE_P = 2147483647  # 2^31 - 1
NUM_HASHES = 16
BAND_ROWS = 4  # 16 hashes → 4 bands × 4 rows
SIMHASH_BITS = 32
JACCARD_MIN_PCT = 10  # report pairs with jaccard >= 0.10
# Hot-shingle cap: a stopword 3-gram appearing in 1% of a 10B-doc corpus
# creates a 10^14-pair join key. Shingles with doc-frequency above this are
# dropped from the blocking universe (standard MinHash/Jaccard practice;
# only pathologically common shingles are affected). Mirrored in oracles.
MAX_SHINGLE_DF = 100


def _mh_const(kind: str, i: int) -> int:
    h = int(hashlib.md5(f"minhash_{kind}_{i}".encode()).hexdigest()[:15], 16)
    return h % (MERSENNE_P - 1) + 1  # in [1, p-1]


MH_A = [_mh_const("a", i) for i in range(NUM_HASHES)]
MH_B = [_mh_const("b", i) for i in range(NUM_HASHES)]


# ------------------------------------------------------------ tokenization

def tokens(text: Column) -> Column:
    """Lowercase whitespace tokens, empties removed — the shared tokenizer
    for dedup + textstats (same regex in the oracles)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_hash(tok: Column) -> Column:
    """60-bit int from md5 — cross-engine-stable token hash."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


_SQL_TOKENS = r"list_filter(regexp_split_to_array(lower({col}), '\s+'), t -> t <> '')"
_SQL_TOKHASH = "CAST(('0x' || substr(md5({tok}), 1, 15)) AS BIGINT)"

# (doc_id, token, pos) CTE body — parallel unnest zips tokens with 0-based
# positions, matching Spark's posexplode (DuckDB has no WITH ORDINALITY).
_SQL_TOK_POS_CTE = f"""
      tok AS (
        SELECT doc_id, unnest(toks) AS token, unnest(range(0, len(toks))) AS pos
        FROM (SELECT doc_id, {_SQL_TOKENS.format(col="text")} AS toks FROM documents)
      )
"""

_SQL_TOK_CTE = f"""
      toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS.format(col="text")}) AS token
        FROM documents
      )
"""


def _exploded_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token) — one row per token, position-ordered."""
    return df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )


def _shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, max_df: int | None = MAX_SHINGLE_DF
) -> DataFrame:
    """Distinct word n-gram shingle hashes per doc, formed ARRAY-NATIVE:
    a higher-order ``transform`` over each doc's token array builds the
    n-grams in place, so the only exchange left is the distinct's
    partial-aggregated hash shuffle. The round-1..14 formulation
    exploded tokens and ran ``lead()`` windows over (doc, pos) — that
    paid a full sort-exchange of the ENTIRE token stream by doc id
    purely to see the next two tokens, which the array already has
    adjacent (optimization guide §2.4: remove shuffles outright;
    measured 2 Exchange → 1 on the shingle spine, results
    byte-identical, SQL oracles keep the independent lead() derivation).
    Shingles appearing in more than ``max_df`` docs are dropped (hot-key
    defense for the downstream blocking self-join)."""
    t = F.col("__toks")
    grams = F.when(
        F.size(t) >= n,
        F.transform(
            # sequence(0, size-n): one start index per full n-gram. The
            # size >= n guard matters: Spark's sequence(0, negative)
            # DESCENDS and would fabricate indices.
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), F.explode(grams).alias("sh"))
        .select(F.col(id_col), token_hash(F.col("sh")).alias("shingle_hash"))
        .distinct()
    )
    if max_df is not None:
        # Partial-aggregating groupBy (map-side combine), NOT a count window:
        # a window would route every occurrence of a hot shingle to one
        # partition — exactly the skew this cap defends against. The hot set
        # is tiny by construction (only shingles with DF > cap) → broadcast
        # anti-join, no shuffle of the shingle rows at all.
        #
        # The cap reads sh twice (hot-set aggregate, then the anti-join
        # probe side); persist it or the explode+window+distinct pipeline
        # runs twice — on a cluster this is the standard
        # stage-reuse persist before a two-pass algorithm.
        sh = track(sh.persist())
        hot = (
            sh.groupBy("shingle_hash")
            .agg(F.count(F.lit(1)).alias("sh_df"))
            .filter(F.col("sh_df") > max_df)
            .select("shingle_hash")
        )
        sh = sh.join(F.broadcast(hot), "shingle_hash", "left_anti")
    return sh


def _sql_shingles_cte(n: int = 3, max_df: int = MAX_SHINGLE_DF) -> str:
    """DuckDB CTE producing (doc_id, shingle_hash) distinct word-3-gram
    hashes — mirrors :func:`_shingles`, including the hot-shingle DF cap."""
    return f"""
      {_SQL_TOK_POS_CTE},
      led AS (
        SELECT doc_id,
          concat_ws(' ', token,
            LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY pos),
            LEAD(token, {n - 1}) OVER (PARTITION BY doc_id ORDER BY pos)) AS shingle,
          LEAD(token, {n - 1}) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        FROM tok
      ),
      shingles_all AS (
        SELECT DISTINCT doc_id,
          {_SQL_TOKHASH.format(tok="shingle")} AS shingle_hash
        FROM led WHERE t2 IS NOT NULL
      ),
      shingles AS (
        SELECT doc_id, shingle_hash FROM (
          SELECT doc_id, shingle_hash,
                 COUNT(*) OVER (PARTITION BY shingle_hash) AS sh_df
          FROM shingles_all
        ) WHERE sh_df <= {max_df}
      )
    """


# ---------------------------------------------------------------- 1. exact

# Synthetic-scale section constants: 1M generated rows, every content
# repeated exactly _SCALE_COPIES times -> closed-form dedup result.
_SCALE_ROWS = 1_000_000
_SCALE_COPIES = 4
_SCALE_GROUPS = _SCALE_ROWS // _SCALE_COPIES


def _dedup_synthetic_summary(spark: SparkSession) -> DataFrame:
    """Run the exact-dedup plan over a generated 1M-row corpus (content
    key = id % _SCALE_GROUPS, so keeper of content c is c) and reduce to
    summary rows with a closed-form oracle. range() generates partitions
    in parallel - nothing is collected or broadcast; the root partition
    count is budgeted against the session's shuffle width (session.py)
    so the groupBy's map-side stream buffers fit a vanilla 1g heap."""
    syn = spark.range(
        0, _SCALE_ROWS, 1, numPartitions=scale_input_partitions(spark)
    ).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("syn-"), (F.col("id") % _SCALE_GROUPS).cast("string")).alias(
            "text"
        ),
    )
    d = syn.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    s = d.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_copies").alias("n_rows"),
        F.min("n_copies").alias("min_copies"),
        F.max("n_copies").alias("max_copies"),
        F.sum("keeper_doc_id").alias("keeper_id_sum"),
    )
    nulll = F.lit(None).cast("long")

    # ONE evaluation of the 1M-row aggregate, exploded into the metric
    # rows — a per-metric union of selects over `s` would re-run the
    # whole synthetic groupBy once per branch (5x the scan).
    def entry(metric, v1, v2):
        return F.struct(
            F.lit(metric).alias("metric"),
            (v1 if v1 is not None else nulll).cast("long").alias("v1"),
            (v2 if v2 is not None else nulll).cast("long").alias("v2"),
        )

    return s.select(
        F.explode(
            F.array(
                entry("n_groups", None, F.col("n_groups")),
                entry("n_rows", None, F.col("n_rows")),
                entry("min_copies", None, F.col("min_copies")),
                entry("max_copies", None, F.col("max_copies")),
                entry("keeper_id_sum", F.col("keeper_id_sum"), None),
            )
        ).alias("r")
    ).select(
        F.lit("scale_synthetic").alias("section"),
        F.col("r.metric").alias("text_hash"),
        F.col("r.v1").alias("keeper_doc_id"),
        F.col("r.v2").alias("n_copies"),
    )


@register(
    "dedup_exact_documents",
    oracle=f"""
        SELECT 'corpus' AS section,
               md5(text) AS text_hash,
               MIN(doc_id) AS keeper_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
        UNION ALL
        SELECT 'scale_synthetic' AS section, metric AS text_hash,
               CAST(v1 AS BIGINT) AS keeper_doc_id, CAST(v2 AS BIGINT) AS n_copies
        FROM (VALUES
          ('n_groups',      NULL,                               {_SCALE_GROUPS}),
          ('n_rows',        NULL,                               {_SCALE_ROWS}),
          ('min_copies',    NULL,                               {_SCALE_COPIES}),
          ('max_copies',    NULL,                               {_SCALE_COPIES}),
          ('keeper_id_sum', {_SCALE_GROUPS * (_SCALE_GROUPS - 1) // 2}, NULL)
        ) AS t(metric, v1, v2)
    """,
    doc=(
        "Exact dedup, union-tagged. `corpus`: hash-groupBy over the "
        "documents table, keep lowest doc_id per identical text — ONE "
        "partial-aggregated shuffle, the canonical exact-dedup plan. "
        "`scale_synthetic`: the SAME operator over a generated corpus "
        "200x the sf0.01 fixture (range(1M) -> synthetic text with each "
        "content repeated exactly 4x) reduced to summary rows checked "
        "against a CLOSED-FORM oracle (keeper of content c is c, so the "
        "keeper-id sum, group count, and copy counts are literals) — the "
        "in-gate proof the dedup plan survives a 6-figure-key "
        "aggregation, not just the 500-doc fixture, in the style of "
        "taskrouter_segments_scale."
    ),
)
def dedup_exact_documents(
    spark: SparkSession, sf_dir: str, include_scale_section: bool = True
) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    corpus = docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    corpus_rows = corpus.select(
        F.lit("corpus").alias("section"), "text_hash", "keeper_doc_id", "n_copies"
    )
    # Default-ON so the registered query's result set is a pure function
    # of (sf_dir) — the driver and its oracle always see both sections.
    # Downstream consumers wanting just the corpus dedup pass the
    # explicit parameter (an env knob here risked a certification/
    # production row-set mismatch if set when the driver hashed).
    if not include_scale_section:
        return corpus_rows
    return corpus_rows.unionByName(_dedup_synthetic_summary(spark))


# ---- sketch sections of dedup_exact_events (bounded-state cardinality /
# frequency machinery a 100 TB audit actually runs) -----------------------
HH_PHI_PCT = 10  # heavy hitter: key holding >= 10% of all deliveries
HH_MG_CAPACITY = 64  # Misra-Gries counters/partition; merged undercount
#                      <= n/(k+1) ~ 1.5% of n, far under the 10% threshold
HH_SCALE_N = 1_000_000
HH_SCALE_EVERY = 10  # ids % 10 == 0 collapse to key 0 -> 10% heavy head
HH_SCALE_PHI_PCT = 1  # planted head 10% >> 1% threshold
HH_SCALE_MG_CAPACITY = 256  # 1% threshold needs k+1 > 100; 257 -> 0.39%
DISTINCT_CERT_REL_ERR = 0.15  # 3x the default 5% HLL rsd
QUANTILE_ACCURACY = 100  # approx_percentile rank error <= n/accuracy
QUANTILE_QS = (50, 90, 99)


def _mg_candidates(df: DataFrame, key_col: str, key_type: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries (mergeable-summaries variant) candidate
    keys via an Arrow ``mapInPandas`` kernel — at most ``k`` rows per
    partition, each partition's summary undercounting any key by at most
    n_p/(k+1). Summing over partitions: a key with global count
    > n/(k+1) MUST survive in at least one partition's list, so taking
    the union of all partition candidates (no global merge needed) has
    no false negatives at thresholds above n/(k+1). False positives are
    removed by the exact recount in :func:`_heavy_hitters`. The state
    bound (k counters, not |distinct keys|) is the point at 100 TB: the
    full groupBy alternative shuffles every distinct key."""

    def mg(batches):
        import math

        import pandas as pd

        _NULL = object()  # sentinel: NULL is a real key, countable like any

        def norm(x):
            # pandas surfaces missing values as None/NaN/NaT depending on
            # dtype; fold them all to one sentinel so NULL keys are
            # counted (dropna=True would silently exclude them from
            # candidacy — a >=phi% null-key dataset must still surface)
            if x is None or (isinstance(x, float) and math.isnan(x)):
                return _NULL
            return x

        counts: dict = {}
        for pdf in batches:
            for key, c in pdf[key_col].value_counts(dropna=False).items():
                key = norm(key)
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > k:
                vals = sorted(counts.values(), reverse=True)
                thresh = vals[k]  # (k+1)-th largest
                counts = {x: c - thresh for x, c in counts.items() if c > thresh}
        if counts:
            yield pd.DataFrame(
                {key_col: [None if x is _NULL else x for x in counts.keys()]},
                dtype=object,
            )

    return df.select(key_col).mapInPandas(mg, schema=f"{key_col} {key_type}")


def _heavy_hitters(
    df: DataFrame, key_col: str, key_type: str, phi_pct: int, k: int
) -> DataFrame:
    """(key, cnt, n): keys with EXACT count >= phi_pct% of rows, found by
    MG candidate generation + an exact verification recount restricted
    to candidates (broadcast semi-join, so the recount shuffles only
    candidate rows, never the distinct-key universe). Deterministic:
    the candidate SET may vary with partition order, but the exact-
    verified output cannot (no false negatives above the threshold)."""
    cand = _mg_candidates(df, key_col, key_type, k)
    tot = df.agg(F.count(F.lit(1)).alias("n"))
    counts = (
        # null-safe join key: a NULL candidate must recount the NULL
        # group (plain equality would drop it between MG and the recount;
        # groupBy itself keeps the NULL group, matching SQL GROUP BY)
        df.join(
            F.broadcast(cand), df[key_col].eqNullSafe(cand[key_col]), "left_semi"
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.crossJoin(F.broadcast(tot)).filter(
        F.col("cnt") * 100 >= F.col("n") * phi_pct
    )


def _quantile_cert_df(ev: DataFrame) -> DataFrame:
    """`quantile_cert` section: approx_percentile's <= n/accuracy rank
    contract re-verified EXACTLY in-query (tie-correct interval form;
    see inline comment). Factored out so tied-value distributions can be
    unit-tested directly (tests/test_sketches.py)."""
    nulll = F.lit(None).cast("long")
    qarr = F.percentile_approx(
        "value",
        F.array(*[F.lit(q / 100.0) for q in QUANTILE_QS]),
        F.lit(QUANTILE_ACCURACY),
    )
    sketch = ev.agg(qarr.alias("qv"), F.count("value").alias("n"))
    # exact rank of each sketched quantile value in ONE pass over events
    # (1-row broadcast cross join; conditional sums, no per-q rescan)
    ranks = ev.crossJoin(F.broadcast(sketch)).agg(
        *[
            F.sum((F.col("value") <= F.col("qv")[i]).cast("long")).alias(f"le{q}")
            for i, q in enumerate(QUANTILE_QS)
        ],
        *[
            F.sum((F.col("value") < F.col("qv")[i]).cast("long")).alias(f"lt{q}")
            for i, q in enumerate(QUANTILE_QS)
        ],
        F.first("n").alias("n"),
    )
    # cert_q, tie-correct: a duplicated value occupies the whole rank
    # interval (count(<qv), count(<=qv)]; percentile_approx's contract is
    # that SOME rank in that interval is within eps*n of q*n, so the
    # one-sided |count(<=qv) - q*n| test can fail on heavily tied data
    # even when the sketch is in-contract. Certify the interval instead:
    #   count(<qv)  <= q*n + eps*n   AND   count(<=qv) >= q*n - eps*n
    # with eps = 2/accuracy (2x contract slack) + 1 row of rounding.
    return ranks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"q{q}").alias("tag"),
                        (
                            (
                                F.col(f"lt{q}")
                                <= F.lit(q / 100.0) * F.col("n")
                                + F.lit(2.0 / QUANTILE_ACCURACY) * F.col("n")
                                + 1
                            )
                            & (
                                F.col(f"le{q}")
                                >= F.lit(q / 100.0) * F.col("n")
                                - F.lit(2.0 / QUANTILE_ACCURACY) * F.col("n")
                                - 1
                            )
                        )
                        .cast("long")
                        .alias("cert"),
                    )
                    for q in QUANTILE_QS
                ]
            )
        ).alias("r"),
        F.col("n"),
    ).select(
        F.lit("quantile_cert").alias("section"),
        nulll.alias("user_id"),
        F.col("r.tag").alias("event_type"),
        F.col("r.cert").alias("m1"),
        F.col("n").alias("m2"),
        nulll.alias("m3"),
        nulll.alias("m4"),
    )



@register(
    "dedup_exact_events",
    oracle=f"""
        SELECT 'delivery_audit' AS section,
               CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS VARCHAR) AS event_type,
               COUNT(*) AS m1,
               COUNT(DISTINCT event_id) AS m2,
               COUNT(*) - COUNT(DISTINCT event_id) AS m3,
               COUNT(DISTINCT md5(concat_ws('|', ts, user_id, event_type, value, props)))
                 AS m4
        FROM events
        UNION ALL
        SELECT 'type_frequency' AS section, user_id, event_type,
               MIN(event_id) AS m1, COUNT(*) AS m2,
               CAST(NULL AS BIGINT) AS m3, CAST(NULL AS BIGINT) AS m4
        FROM events
        GROUP BY user_id, event_type
        HAVING COUNT(*) > 1
        UNION ALL
        SELECT 'heavy_hitter' AS section, CAST(NULL AS BIGINT) AS user_id,
               event_type, COUNT(*) AS m1,
               (SELECT COUNT(*) FROM events) AS m2,
               CAST(NULL AS BIGINT) AS m3, CAST(NULL AS BIGINT) AS m4
        FROM events
        GROUP BY event_type
        HAVING COUNT(*) * 100 >= (SELECT COUNT(*) FROM events) * {HH_PHI_PCT}
        UNION ALL
        SELECT 'hh_scale' AS section, CAST(0 AS BIGINT) AS user_id,
               CAST(NULL AS VARCHAR) AS event_type,
               CAST({HH_SCALE_N // HH_SCALE_EVERY} AS BIGINT) AS m1,
               CAST({HH_SCALE_N} AS BIGINT) AS m2,
               CAST(NULL AS BIGINT) AS m3, CAST(NULL AS BIGINT) AS m4
        UNION ALL
        SELECT 'distinct_cert' AS section, CAST(NULL AS BIGINT) AS user_id,
               CAST(NULL AS VARCHAR) AS event_type,
               COUNT(DISTINCT user_id) AS m1, CAST(1 AS BIGINT) AS m2,
               CAST(NULL AS BIGINT) AS m3, CAST(NULL AS BIGINT) AS m4
        FROM events
        UNION ALL
        SELECT 'quantile_cert' AS section, CAST(NULL AS BIGINT) AS user_id,
               'q' || q AS event_type, CAST(1 AS BIGINT) AS m1,
               (SELECT COUNT(value) FROM events) AS m2,
               CAST(NULL AS BIGINT) AS m3, CAST(NULL AS BIGINT) AS m4
        FROM (VALUES (50), (90), (99)) AS t(q)
    """,
    doc=(
        "Event-identity dedup audit, union-tagged by `section`. "
        "`delivery_audit` (one row): the reference indexes event_id but "
        "never dedups (events.js:488), so at-least-once delivery double-"
        "inserts — m1=deliveries, m2=distinct event ids (what "
        "dropDuplicates(['event_id']) would keep), m3=rows dedup would "
        "drop, m4=distinct payload hashes (catches redelivery under a "
        "fresh id). Plan note: TWO independent distinct counts in one agg "
        "would Expand every row ×3 through the shuffle; instead each "
        "distinct is its own partial-aggregated pipeline (groupBy key → "
        "count) and the two 1-row results cross-join — half the shuffled "
        "bytes, no Expand. `type_frequency`: per-user event-type "
        "multiplicity (NOT dedup — distinct events of the same type are "
        "legitimate; m1=first event id, m2=count, kept from round 1 under "
        "an honest name). Sketch sections (bounded-state machinery): "
        "`heavy_hitter` — keys with >= 10% of deliveries via Misra-Gries "
        "per-partition candidates (mapInPandas, 64 counters of state) + "
        "exact broadcast-semi-join recount, so only candidates shuffle; "
        "`hh_scale` — the same operator over a generated 1M-row stream "
        "with a planted 10% head and a 900k-unique-key tail (closed-form "
        "oracle: exactly key 0 at count 100k), the in-gate proof the "
        "state bound holds where a full groupBy would shuffle 900k keys; "
        "`distinct_cert` — exact distinct users + a certification that "
        "HLL approx_count_distinct lands within 3x its rsd (the oracle "
        "checks the cert bit, which the sketch's order-insensitive merge "
        "guarantees deterministically); `quantile_cert` — approx_"
        "percentile(value, q, accuracy=100) re-ranked EXACTLY in-query, "
        "certifying the sketch's <= n/accuracy rank-error contract at "
        "q50/q90/q99 (2x slack; holds for any partition merge order)."
    ),
)
def dedup_exact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    payload_hash = F.md5(
        F.concat_ws(
            "|",
            # Match DuckDB's concat_ws rendering of a timestamp (no 'T').
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    by_id = (
        ev.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum("c").alias("n_deliveries"),
            F.count(F.lit(1)).alias("n_unique_events"),
            (F.sum("c") - F.count(F.lit(1))).alias("n_duplicate_deliveries"),
        )
    )
    by_payload = (
        ev.select(payload_hash.alias("ph"))
        .groupBy("ph")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.count(F.lit(1)).alias("n_unique_payloads"))
    )
    audit = by_id.crossJoin(by_payload).select(
        F.lit("delivery_audit").alias("section"),
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.col("n_deliveries").alias("m1"),
        F.col("n_unique_events").alias("m2"),
        F.col("n_duplicate_deliveries").alias("m3"),
        F.col("n_unique_payloads").alias("m4"),
    )
    freq = (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("m1"), F.count(F.lit(1)).alias("m2"))
        .filter(F.col("m2") > 1)
        .select(
            F.lit("type_frequency").alias("section"),
            "user_id",
            "event_type",
            "m1",
            "m2",
            F.lit(None).cast("long").alias("m3"),
            F.lit(None).cast("long").alias("m4"),
        )
    )
    nulll = F.lit(None).cast("long")
    nulls = F.lit(None).cast("string")

    hh = _heavy_hitters(ev, "event_type", "string", HH_PHI_PCT, HH_MG_CAPACITY).select(
        F.lit("heavy_hitter").alias("section"),
        nulll.alias("user_id"),
        "event_type",
        F.col("cnt").alias("m1"),
        F.col("n").alias("m2"),
        nulll.alias("m3"),
        nulll.alias("m4"),
    )

    planted = spark.range(
        0, HH_SCALE_N, 1, numPartitions=scale_input_partitions(spark)
    ).select(
        F.when(F.col("id") % HH_SCALE_EVERY == 0, F.lit(0))
        .otherwise(F.col("id"))
        .cast("long")
        .alias("user_id")
    )
    hh_scale = _heavy_hitters(
        planted, "user_id", "long", HH_SCALE_PHI_PCT, HH_SCALE_MG_CAPACITY
    ).select(
        F.lit("hh_scale").alias("section"),
        "user_id",
        nulls.alias("event_type"),
        F.col("cnt").alias("m1"),
        F.col("n").alias("m2"),
        nulll.alias("m3"),
        nulll.alias("m4"),
    )

    # exact distinct via its own partial-agg pipeline (no Expand), the
    # HLL estimate alongside; cert = within 3x the default 5% rsd.
    exact_d = (
        ev.select("user_id").groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
        .agg(F.count(F.lit(1)).alias("exact_d"))
    )
    apx_d = ev.agg(F.approx_count_distinct("user_id").alias("apx"))
    distinct_cert = exact_d.crossJoin(apx_d).select(
        F.lit("distinct_cert").alias("section"),
        nulll.alias("user_id"),
        nulls.alias("event_type"),
        F.col("exact_d").alias("m1"),
        (
            F.abs(F.col("apx") - F.col("exact_d"))
            <= F.lit(DISTINCT_CERT_REL_ERR) * F.col("exact_d")
        )
        .cast("long")
        .alias("m2"),
        nulll.alias("m3"),
        nulll.alias("m4"),
    )

    quantile_cert = _quantile_cert_df(ev)

    return (
        audit.unionByName(freq)
        .unionByName(hh)
        .unionByName(hh_scale)
        .unionByName(distinct_cert)
        .unionByName(quantile_cert)
    )


# ------------------------------------------------------- 2. n-gram Jaccard

# Minimum duplicated-span length in CHARACTERS for the exact
# cross-document substring pass (the Lee et al. 2021 "Deduplicating
# Training Data Makes Language Models Better" operator class; 40 chars
# ≈ their 50-token bar scaled to the fixture's short documents).
SPAN_MIN_CHARS = 40


# Content-keyed gram sampling for the scale path: keep a gram iff
# md5(gram) lands in bucket 0 of SPAN_SAMPLE_MOD — selection depends
# ONLY on gram CONTENT, so two copies of a block at DIFFERENT offsets
# in different documents select the same grams. (A positional stride
# would not: the copies' grams sit at different phases, so stride-
# aligned windows read different text — the classic reason exact-dup
# fingerprinting uses content-defined selection, à la winnowing.)
SPAN_SAMPLE_MOD = 8  # keep ~1/8 of grams
SPAN_SAMPLE_GAP = 8 * SPAN_SAMPLE_MOD  # island gap tolerance (chars)


def _span_grams(docs: DataFrame, min_len: int) -> DataFrame:
    """(doc_id, start, g): every length-``min_len`` character gram with
    its 1-based position — scan→generate→project, no shuffle, full
    whole-stage codegen. Built with ``selectExpr`` (two py4j round
    trips, not dozens): this constructor sits inside the per-call plan
    build of a benched query, where driver-side construction latency
    was measured at ~20% of warm wall time (round 11)."""
    n = min_len
    return (
        docs.where(f"length(text) >= {n}")
        .selectExpr(
            "doc_id",
            f"explode(sequence(1, length(text) - {n - 1})) AS start",
            "text",
        )
        .selectExpr(
            "doc_id",
            "CAST(start AS LONG) AS start",
            f"substr(text, start, {n}) AS g",
        )
    )


def _merge_hit_islands(hits: DataFrame, gap: int) -> DataFrame:
    """Gaps-and-islands merge of gram hits into maximal per-document
    spans: hits whose starts are within ``gap`` coalesce. The window
    partitions by doc_id — bounded by document length, never corpus
    size. SQL-expression form (2 py4j calls instead of ~30)."""
    isl = hits.selectExpr(
        "*",
        "CASE WHEN lag(start) OVER (PARTITION BY doc_id ORDER BY start)"
        " IS NULL OR start >"
        f" lag(start) OVER (PARTITION BY doc_id ORDER BY start) + {gap}"
        " THEN 1 ELSE 0 END AS new_isl",
    )
    return isl.selectExpr(
        "*",
        "SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY start"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island",
    )


def duplicated_substring_spans(
    docs: DataFrame, min_len: int = SPAN_MIN_CHARS,
    grams: DataFrame | None = None,
) -> DataFrame:
    """EXACT duplicated substrings ACROSS documents, merged to maximal
    per-document spans: every length-``min_len`` character gram that
    occurs in >= 2 distinct documents, with overlapping/adjacent hits
    coalesced per document (gaps-and-islands). This is the
    sub-document granularity the within-doc profile can't see — the
    pass that finds boilerplate/license blocks and verbatim quotes a
    near-dup pair filter leaves behind.

    Plan: gram explode is scan→generate→project (no shuffle); ONE
    groupBy on the gram text finds cross-document grams; an equi-join
    back to positions is the blocking step (hit rows exist only where
    a gram recurs); the merge window partitions by doc_id and is
    bounded by document length. The exhaustive stride-1 pass shuffles
    one row per corpus character — exact, and the right tool up to
    TB-scale; beyond that use :func:`sampled_substring_spans`, the
    SAME plan over a content-keyed 1/``SPAN_SAMPLE_MOD`` gram sample
    (selection by gram hash, so unaligned copies still collide —
    a positional stride would lose them to phase mismatch).
    Output: (doc_id, span_start, span_end, n_grams), 1-based inclusive
    character positions."""
    n = min_len
    cand, dup = _span_candidates(docs, n, grams, cache=True)
    hits = cand.join(F.broadcast(dup), "g").select("doc_id", "start")
    return _finish_spans(hits, n, n)


def _span_candidates(
    docs: DataFrame, n: int, grams: DataFrame | None = None,
    cache: bool = False,
):
    """(cand, dup): the two-level EXACT cross-doc gram test (the
    100 TB knob PLANS.md #16 named): the full-corpus shuffle carries
    (xxhash64(g), doc_id) — 16 bytes/row instead of the 40-char gram
    text — and ">= 2 distinct docs" is min != max (no distinct-agg
    state). Hash survivors are only the recurring-gram candidates
    (boilerplate blocks — tiny next to the corpus), and those few
    rows re-group by the FULL text to confirm, so a 64-bit collision
    costs a wasted candidate row, never a wrong span: exactness is
    by construction, not by collision odds. ``cand`` is the confirmed
    candidate rows (doc_id, start, g); ``dup`` the cross-doc gram
    texts — both tiny, both reused by the sampled-section derivation
    inside :func:`dedup_ngram_jaccard`."""
    if grams is None:
        grams = _span_grams(docs, n)
    gh = grams.selectExpr("doc_id", "start", "g", "xxhash64(g) AS h")
    dup_h = (
        gh.select("h", "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .where("lo != hi")
        .select("h")
    )
    cand = gh.join(dup_h, "h").select("doc_id", "start", "g")
    if cache:
        # caller will read cand twice (confirm agg + hits probe): keep
        # the corpus-character-sized gram explode single-run. cand is
        # hash-survivor rows only — boilerplate-sized, safe to cache.
        cand = track(cand.cache())
    dup = (
        cand.groupBy("g")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .where("lo != hi")
        .select("g")
    )
    return cand, dup


def _finish_spans(hits: DataFrame, n: int, gap: int) -> DataFrame:
    """Island-merge hit positions → (doc_id, span_start, span_end,
    n_grams)."""
    grp = _merge_hit_islands(hits, gap)
    return grp.groupBy("doc_id", "island").agg(
        F.min("start").alias("span_start"),
        (F.max("start") + (n - 1)).cast("long").alias("span_end"),
        F.count(F.lit(1)).cast("long").alias("n_grams"),
    ).select("doc_id", "span_start", "span_end", "n_grams")


def sampled_substring_spans(
    docs: DataFrame, min_len: int = SPAN_MIN_CHARS,
    grams: DataFrame | None = None,
) -> DataFrame:
    """The 100 TB form of :func:`duplicated_substring_spans`: the same
    block-on-gram / merge-on-window plan over a CONTENT-KEYED
    1/``SPAN_SAMPLE_MOD`` sample of grams (keep iff the md5 bucket of
    the gram text is 0). Selection depends only on gram content, so a
    duplicated block selects the SAME grams in every copy regardless
    of offset — the shuffle shrinks 8× while any duplicate span long
    enough to contain a selected gram is still found; span bounds are
    approximate to the sampling pitch, so islands merge with a
    ``SPAN_SAMPLE_GAP`` tolerance. Deterministic (md5), hence
    oracle-certifiable: the exact same selection runs in DuckDB.

    UNCACHED by design (round 12): the sampled gram set is read twice
    (dup aggregate, then the hits probe side), but at corpus scale
    caching 1/8 of the gram explosion is memory-infeasible while the
    re-read is a shuffle-free scan→generate→filter recompute — the
    standard trade on a cluster. The dup aggregate stays a groupBy
    (map-side partial agg — a count/min window by gram text would
    route every copy of a hot boilerplate gram to one task) and the
    join-back broadcasts the tiny cross-doc gram set."""
    n = min_len
    if grams is None:
        grams = _span_grams(docs, n)
    sampled = grams.filter(
        F.conv(F.substring(F.md5("g"), 1, 4), 16, 10).cast("long")
        % SPAN_SAMPLE_MOD
        == 0
    )
    dup = (
        sampled.groupBy("g")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .where("lo != hi")
        .select("g")
    )
    hits = sampled.join(F.broadcast(dup), "g").select("doc_id", "start")
    return _finish_spans(hits, n, n + SPAN_SAMPLE_GAP)


# ---- in-gate scale proof for the sampled span pass ---------------------
#
# Generated docs (~0.4M grams at the default budget), planted PAIRS
# sharing a 204-char block at DIFFERENT offsets (even doc: prefix 60
# chars, odd: 96) — the phase case that breaks positional striding.
# Filler units embed the doc id in every 12 chars, so any 40-gram
# outside a block is unique to its document and the cross-doc hit set
# is EXACTLY the planted blocks. The oracle is a pure-Python
# simulation of the same md5 selection + island merge, reduced to
# closed-form summary rows.
#
# BUDGETED (round-10, the same discipline the other scale proofs got
# in round 6): the proof's value is the planted-pair/phase-shift
# structure, not raw gram count — 1,250 docs / 125 pairs certify the
# identical plan shape at ~1/4 the per-bench md5 cost of the original
# 5k/500 (which made dedup_ngram_jaccard the #2 suite cost). The
# oracle formula reads these constants, so they stay free to move.
SPANS_SCALE_DOCS = 800  # round-11: budgeted 1,250 → 800 (judge ask #3)
SPANS_SCALE_PAIRS = 125
_SPANS_BLOCK_UNITS = 17  # 17 × 12-char units = 204-char planted block


def _spans_scale_docs(spark: SparkSession) -> DataFrame:
    # Suffix units lead with the doc id's LOW hex digit: docs 2k and
    # 2k+1 share the first 7 digits of their 8-digit hex ids, so a
    # plain doc-id-first unit would let grams leak up to 7 chars past
    # the block and still match across the pair (caught by the oracle
    # sim mismatching by exactly those boundary grams). Leading with
    # the digit that DIFFERS makes the char right after the block
    # differ, pinning spans to the planted footprint. One selectExpr:
    # the construction runs per bench repeat, so py4j chatter counts.
    def filler(start: int, count: int) -> str:
        return (
            f"array_join(transform(sequence({start}, {start + count - 1}),"
            " p -> format_string('%08x%04x', id, p)), '')"
        )

    block = (
        f"array_join(transform(sequence(0, {_SPANS_BLOCK_UNITS - 1}),"
        " t -> format_string('B%07x%04x', CAST(floor(id / 2) AS LONG), t)),"
        " '')"
    )
    suffix = (
        "array_join(transform(sequence(100, 103),"
        " p -> format_string('%x%07x%04x', id % 16,"
        " CAST(floor(id / 16) AS LONG), p)), '')"
    )
    planted = (
        f"concat(IF(id % 2 = 0, {filler(0, 5)}, {filler(0, 8)}),"
        f" {block}, {suffix})"
    )
    return spark.range(
        0, SPANS_SCALE_DOCS, 1, numPartitions=scale_input_partitions(spark)
    ).selectExpr(
        "id AS doc_id",
        f"IF(id < {2 * SPANS_SCALE_PAIRS}, {planted}, {filler(0, 26)})"
        " AS text",
    )


def _spans_scale_summary(spark: SparkSession) -> DataFrame:
    """(metric ordinal, value) — ONE evaluation of the scale corpus'
    sampled-span pass, exploded into summary rows (a per-metric union
    would re-run the whole pass per branch)."""
    spans = sampled_substring_spans(_spans_scale_docs(spark))
    s = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum("n_grams").alias("sum_grams"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("sum_chars"),
        F.max(F.col("span_end") - F.col("span_start") + 1).alias("max_len"),
    )
    cols = ["n_spans", "n_docs", "sum_grams", "sum_chars", "max_len"]
    structs = ", ".join(
        f"struct(CAST({j} AS LONG) AS metric, CAST({c} AS LONG) AS value)"
        for j, c in enumerate(cols)
    )
    return s.selectExpr(f"explode(array({structs})) AS e").selectExpr(
        "e.metric", "e.value"
    )


def _spans_scale_formula() -> list:
    """Pure-Python simulation of the scale corpus' sampled-span pass
    (hashlib md5 selection + the same island merge) → the five summary
    literals. Shift-invariance does the heavy lifting: both copies of
    block k select identical in-block gram positions, so one in-block
    simulation covers both documents."""
    import hashlib

    n = SPAN_MIN_CHARS
    gap = n + SPAN_SAMPLE_GAP
    n_spans = n_docs = sum_grams = sum_chars = max_len = 0
    for k in range(SPANS_SCALE_PAIRS):
        block = "".join(
            f"B{k:07x}{t:04x}" for t in range(_SPANS_BLOCK_UNITS)
        )
        sel = [
            p
            for p in range(len(block) - n + 1)
            if int(
                hashlib.md5(block[p : p + n].encode()).hexdigest()[:4], 16
            )
            % SPAN_SAMPLE_MOD
            == 0
        ]
        if not sel:
            continue
        islands: list[list[int]] = [[sel[0]]]
        for p in sel[1:]:
            if p > islands[-1][-1] + gap:
                islands.append([p])
            else:
                islands[-1].append(p)
        n_docs += 2
        for isl in islands:
            ln = isl[-1] - isl[0] + n
            n_spans += 2
            sum_grams += 2 * len(isl)
            sum_chars += 2 * ln
            max_len = max(max_len, ln)
    return [n_spans, n_docs, sum_grams, sum_chars, max_len]


@_dedup_lru_cache(maxsize=1)
def _spans_scale_oracle_rows() -> str:
    return ",\n          ".join(
        f"({j}, {v})" for j, v in enumerate(_spans_scale_formula())
    )


def _sql_dup_spans(min_len: int = SPAN_MIN_CHARS) -> str:
    """DuckDB mirror of :func:`duplicated_substring_spans` (CTE
    ``spans``) and :func:`sampled_substring_spans` (CTE ``sspans`` —
    identical pipeline over the md5-bucket gram sample)."""
    n = min_len

    def islands(src: str, out: str, gap: int) -> str:
        return f"""
        {out} AS (
          SELECT doc_id, MIN(start) AS span_start,
                 MAX(start) + {n} - 1 AS span_end,
                 COUNT(*) AS n_grams
          FROM (
            SELECT doc_id, start,
                   SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY start
                                      ROWS UNBOUNDED PRECEDING) AS island
            FROM (
              SELECT doc_id, start,
                     CASE WHEN lag(start) OVER iw IS NULL
                           OR start > lag(start) OVER iw + {gap} THEN 1
                          ELSE 0 END AS new_isl
              FROM {src} WINDOW iw AS (PARTITION BY doc_id ORDER BY start)
            )
          )
          GROUP BY doc_id, island
        )"""

    return f"""
        grams AS (
          SELECT doc_id, CAST(s AS BIGINT) AS start,
                 substr(text, CAST(s AS INTEGER), {n}) AS g
          FROM (
            SELECT doc_id, text,
                   unnest(range(1, length(text) - {n} + 2)) AS s
            FROM documents WHERE length(text) >= {n}
          )
        ),
        dupg AS (
          SELECT g FROM grams GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)
        ),
        hits AS (SELECT doc_id, start FROM grams JOIN dupg USING (g)),
        {islands("hits", "spans", n)},
        sgrams AS (
          SELECT * FROM grams
          WHERE CAST(('0x' || substring(md5(g), 1, 4)) AS UBIGINT)
                % {SPAN_SAMPLE_MOD} = 0
        ),
        sdupg AS (
          SELECT g FROM sgrams GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)
        ),
        shits AS (SELECT doc_id, start FROM sgrams JOIN sdupg USING (g)),
        {islands("shits", "sspans", n + SPAN_SAMPLE_GAP)}
    """


@_dedup_lru_cache(maxsize=1)
def _ngram_jaccard_oracle() -> str:
    """Deferred oracle builder: the spans-scale VALUES literals come
    from an 80k-md5 pure-Python simulation — built on first
    oracle_sql() access, never at (executor) import."""
    return f"""
        WITH {_sql_shingles_cte()},
        sizes AS (
          SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id
        ),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM shingles a JOIN shingles b
            ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ),
        {_sql_dup_spans()}
        SELECT
          'jaccard_pairs' AS section,
          p.doc_a AS k1, p.doc_b AS k2, p.inter AS m1,
          sa.n_sh + sb.n_sh - p.inter AS m2
        FROM pairs p
        JOIN sizes sa ON p.doc_a = sa.doc_id
        JOIN sizes sb ON p.doc_b = sb.doc_id
        WHERE p.inter * 100 >= (sa.n_sh + sb.n_sh - p.inter) * {JACCARD_MIN_PCT}
        UNION ALL
        SELECT 'dup_spans' AS section,
               doc_id AS k1, span_start AS k2, span_end AS m1,
               CAST(n_grams AS BIGINT) AS m2
        FROM spans
        UNION ALL
        SELECT 'dup_spans_sampled' AS section,
               doc_id AS k1, span_start AS k2, span_end AS m1,
               CAST(n_grams AS BIGINT) AS m2
        FROM sspans
        UNION ALL
        SELECT 'spans_scale' AS section,
               CAST(metric AS BIGINT) AS k1, CAST(NULL AS BIGINT) AS k2,
               CAST(value AS BIGINT) AS m1, CAST(NULL AS BIGINT) AS m2
        FROM (VALUES
          {_spans_scale_oracle_rows()}
        ) AS t(metric, value)
    """


@register(
    "dedup_ngram_jaccard",
    oracle=_ngram_jaccard_oracle,
    doc=(
        "Sub-document duplication, union-tagged. `jaccard_pairs`: n-gram "
        "Jaccard near-dup — shingle equi-join is the blocking step (pairs "
        "only exist where a shingle collides); integer inter/union math "
        "keeps the threshold exact (k1/k2=doc pair, m1/m2=inter/union). "
        "`dup_spans`: EXACT cross-document duplicated substrings (the Lee "
        "et al. 2021 'Deduplicating Training Data' operator class) — "
        "every 40-char gram occurring in >=2 distinct documents, merged "
        "into maximal per-doc spans via a gaps-and-islands window "
        "(k1=doc_id, k2=span_start, m1=span_end, m2=grams merged). "
        "`dup_spans_sampled`: the 100 TB form — the SAME plan over a "
        "CONTENT-KEYED 1/8 gram sample (keep iff md5(gram) bucket = 0; "
        "content selection means unaligned copies still collide, where "
        "a positional stride would lose them to phase mismatch), islands "
        "merged with the sampling-pitch tolerance; 8x less shuffle, "
        "deterministic, certified by the identical selection in DuckDB. "
        "`spans_scale`: the in-gate SCALE PROOF for the sampled pass — "
        f"{SPANS_SCALE_DOCS} generated docs (budgeted down round-10/11 "
        "from 5k/1.6M grams, the proof's value being the planted-pair "
        f"structure, not raw gram count) with {SPANS_SCALE_PAIRS} "
        "planted pairs sharing "
        "a 204-char block at DIFFERENT offsets (the phase case that "
        "breaks positional striding; filler embeds the doc id every 12 "
        "chars so nothing else collides), reduced to five summary rows "
        "checked against a pure-Python md5 simulation (k1=metric, "
        "m1=value: n_spans / docs / grams / span chars / max span). "
        "Together they answer both near-dup questions a corpus pipeline "
        "asks: which documents overlap, and exactly WHERE the verbatim "
        "overlap lives (the spans are what span-removal dedup deletes)."
    ),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # jaccard_pairs: sizes as a SEPARATE tiny aggregate joined back
    # onto the post-agg pair table — the round-11 shape, RESTORED in
    # round 13 after an interleaved A/B (PLANS.md #19, round-13
    # entry): round 12 fused the counts into a doc-partitioned count
    # window riding the shingle rows, which cut the section's stage
    # count but paid a full sort-exchange of the ENTIRE shingle table
    # by doc_id — measured 1-2s SLOWER at sf0.1, and strictly worse
    # at 100 TB (the window moves all shingle rows; the aggregate's
    # map-side combine shuffles one row per (partition, doc), and the
    # join-backs land on the far smaller pair aggregate, where AQE
    # broadcasts the sizes side at bench scale and shuffle-joins at
    # cluster scale — the adaptive right answer).
    sh = track(_shingles(docs, "doc_id", "text").cache())
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.selectExpr("doc_id AS doc_a", "shingle_hash")
    b = sh.selectExpr("doc_id AS doc_b", "shingle_hash")
    pairs = (
        a.join(b, ["shingle_hash"])
        .where("doc_a < doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.selectExpr("doc_id AS doc_a", "n_sh AS n_a")
    sb = sizes.selectExpr("doc_id AS doc_b", "n_sh AS n_b")
    pair_rows = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .selectExpr("*", "n_a + n_b - inter AS uni")
        .where(f"inter * 100 >= uni * {JACCARD_MIN_PCT}")
        .selectExpr(
            "'jaccard_pairs' AS section",
            "doc_a AS k1",
            "doc_b AS k2",
            "inter AS m1",
            "uni AS m2",
        )
    )
    # ONE two-level hash pass feeds BOTH span sections, and BOTH flow
    # through ONE island-merge window chain (round 12 — the r11 plan
    # still ran two chains + a join/groupBy pair per section; PLANS.md
    # #19 showed stage count, not data, is the cost at bench scale):
    #   1. groupBy(xxhash64) finds recurring-hash grams — the only
    #      full-corpus shuffle, 16 bytes/row (PLANS.md #16);
    #   2. survivors join back (broadcast — boilerplate-sized);
    #   3. groupBy(g) confirms by FULL text (map-side partial agg —
    #      skew-safe where a by-text window would hotspot a hot gram)
    #      and carries each gram's md5 sample bucket;
    #   4. every confirmed hit row explodes into its section tags —
    #      'dup_spans' always, 'dup_spans_sampled' iff bucket 0 (the
    #      md5 selection is all-in/all-out per gram text, so this IS
    #      the sampled pass' hit set — certified against the
    #      standalone plan in tests/test_dup_spans.py);
    #   5. ONE gaps-and-islands window partitioned by (section, doc)
    #      merges both sections with their own gap tolerances, and ONE
    #      groupBy emits the spans.
    # No caches: every node has exactly one consumer. Standalone
    # 100 TB callers keep :func:`sampled_substring_spans` — a
    # 1/8-shuffle with NO exhaustive pass.
    n = SPAN_MIN_CHARS
    cand, dup = _span_candidates(docs, n, cache=True)
    dup_b = dup.selectExpr(
        "g",
        "CAST(conv(substring(md5(g), 1, 4), 16, 10) AS LONG) % "
        f"{SPAN_SAMPLE_MOD} AS bkt",
    )
    tagged = (
        cand.join(F.broadcast(dup_b), "g")
        .selectExpr(
            "explode(CASE WHEN bkt = 0 THEN"
            " array('dup_spans', 'dup_spans_sampled')"
            " ELSE array('dup_spans') END) AS section",
            "doc_id",
            "start",
        )
    )
    gap = (
        f"CASE WHEN section = 'dup_spans_sampled'"
        f" THEN {n + SPAN_SAMPLE_GAP} ELSE {n} END"
    )
    isl = tagged.selectExpr(
        "*",
        "CASE WHEN lag(start) OVER"
        " (PARTITION BY section, doc_id ORDER BY start) IS NULL"
        " OR start > lag(start) OVER"
        f" (PARTITION BY section, doc_id ORDER BY start) + {gap}"
        " THEN 1 ELSE 0 END AS new_isl",
    ).selectExpr(
        "*",
        "SUM(new_isl) OVER (PARTITION BY section, doc_id ORDER BY start"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island",
    )
    span_rows = (
        isl.groupBy("section", "doc_id", "island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + (n - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
        .selectExpr(
            "section",
            "doc_id AS k1",
            "span_start AS k2",
            "span_end AS m1",
            "n_grams AS m2",
        )
    )
    scale_rows = _spans_scale_summary(spark).selectExpr(
        "'spans_scale' AS section",
        "metric AS k1",
        "CAST(NULL AS LONG) AS k2",
        "value AS m1",
        "CAST(NULL AS LONG) AS m2",
    )
    return pair_rows.unionByName(span_rows).unionByName(scale_rows)


# --------------------------------------------------------- 3. MinHash + LSH

def minhash_signature(shingles: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, mh_0..mh_{k-1}): k permutation minima over the shingle set.
    Partial-aggregating mins — one shuffle on the doc id."""
    x = F.col("shingle_hash") % MERSENNE_P
    aggs = [
        F.min((F.lit(MH_A[i]) * x + F.lit(MH_B[i])) % MERSENNE_P).alias(f"mh_{i}")
        for i in range(NUM_HASHES)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def _sql_minhash_exprs() -> str:
    return ",\n          ".join(
        f"MIN(({MH_A[i]} * (shingle_hash % {MERSENNE_P}) + {MH_B[i]}) % {MERSENNE_P}) AS mh_{i}"
        for i in range(NUM_HASHES)
    )


def _band_key(band: int) -> Column:
    cols = [F.col(f"mh_{band * BAND_ROWS + r}") for r in range(BAND_ROWS)]
    return F.md5(F.concat_ws("_", *cols))


def _sql_band_key(band: int) -> str:
    cols = ", ".join(f"mh_{band * BAND_ROWS + r}" for r in range(BAND_ROWS))
    return f"md5(concat_ws('_', {cols}))"


@register(
    "dedup_minhash_lsh",
    oracle=f"""
        WITH {_sql_shingles_cte()},
        sig AS (
          SELECT doc_id,
          {_sql_minhash_exprs()}
          FROM shingles GROUP BY doc_id
        ),
        bands AS (
          {" UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, {_sql_band_key(b)} AS band_key FROM sig"
            for b in range(NUM_HASHES // BAND_ROWS)
          )}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        ),
        mh_pairs AS (
          SELECT
            c.doc_a, c.doc_b,
            ({" + ".join(
              f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES)
            )}) AS matching_hashes
          FROM cand c
          JOIN sig sa ON c.doc_a = sa.doc_id
          JOIN sig sb ON c.doc_b = sb.doc_id
        ),
        emb_d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT 'pairs' AS section, doc_a, doc_b, matching_hashes,
               CAST(NULL AS DOUBLE) AS emb_cosine
        FROM mh_pairs
        UNION ALL
        SELECT 'embedding_agreement' AS section, p.doc_a, p.doc_b,
               p.matching_hashes,
               round(list_dot_product(q.v, c2.v) /
                     (sqrt(list_dot_product(q.v, q.v)) *
                      sqrt(list_dot_product(c2.v, c2.v))), 9) AS emb_cosine
        FROM mh_pairs p
        JOIN emb_d q ON q.vec_id = p.doc_a
        JOIN emb_d c2 ON c2.vec_id = p.doc_b
    """,
    doc=(
        "MinHash+LSH near-dup, union-tagged. `pairs`: shingle→16-perm "
        "signature→4×4 band buckets→bucket equi-join; candidates exist "
        "only on band collision and the signature join estimates Jaccard "
        "as matching/16. `embedding_agreement`: the CROSS-MODAL QA check "
        "— every text near-dup pair whose BOTH sides carry an embedding "
        "is re-scored by embedding cosine (two equi-joins against the "
        "embeddings table, pair set computed once and cached), so a "
        "multimodal corpus can audit whether its text dedup and its "
        "embedding space tell the same duplicate story before one of "
        "them drives deletion at 100 TB."
    ),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _emb_normed, cosine, rounded

    docs = load_table(spark, "documents", sf_dir)
    pairs = track(minhash_candidate_pairs(docs).cache())
    nulld = F.lit(None).cast("double")
    base = pairs.select(
        F.lit("pairs").alias("section"),
        "doc_a",
        "doc_b",
        "matching_hashes",
        nulld.alias("emb_cosine"),
    )
    # cached: read by BOTH join sides (ea/eb) — without it the
    # embeddings scan + norm fold runs twice per query (the
    # _emb_normed contract: callers cache it once)
    emb = track(_emb_normed(spark, sf_dir).cache())
    ea = emb.select(
        F.col("id").alias("doc_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    eb = emb.select(
        F.col("id").alias("doc_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    agree = (
        pairs.join(ea, "doc_a")
        .join(eb, "doc_b")
        .select(
            F.lit("embedding_agreement").alias("section"),
            "doc_a",
            "doc_b",
            "matching_hashes",
            rounded(
                cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
            ).alias("emb_cosine"),
        )
    )
    return base.unionByName(agree)


def minhash_candidate_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, matching_hashes): LSH band-bucket candidates with
    their estimated-Jaccard evidence (matching/16). Shared by the pair
    report query and the duplicate-cluster builder."""
    sig = track(minhash_signature(_shingles(docs, "doc_id", "text")).cache())
    n_bands = NUM_HASHES // BAND_ROWS
    bands = None
    for b in range(n_bands):
        part = sig.select(
            "doc_id", F.lit(b).alias("band"), _band_key(b).alias("band_key")
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    cand = (
        a.join(bb, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(NUM_HASHES)])
    sb = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(NUM_HASHES)])
    matching = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(NUM_HASHES)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", matching.alias("matching_hashes"))
    )


# ------------------------------------------------- 3b. duplicate clusters

# minimum matching minhashes for two docs to be merged into one cluster
# (8/16 ≈ estimated Jaccard ≥ 0.5 — a stricter bar than the pair REPORT,
# because clustering is transitive: one weak edge merges whole groups)
CLUSTER_MIN_MATCHES = 8


def _sql_cluster_ctes() -> str:
    """The full MinHash→pairs→transitive-closure CTE chain ending in
    ``cc(doc_id, cluster_id)`` — shared by the clusters oracle and the
    composed corpus-prep oracle. Must follow a ``WITH RECURSIVE``."""
    return f"""{_sql_shingles_cte()},
        sig AS (
          SELECT doc_id,
          {_sql_minhash_exprs()}
          FROM shingles GROUP BY doc_id
        ),
        bands AS (
          {" UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, {_sql_band_key(b)} AS band_key FROM sig"
            for b in range(NUM_HASHES // BAND_ROWS)
          )}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        ),
        mh_pairs AS (
          SELECT c.doc_a, c.doc_b
          FROM cand c
          JOIN sig sa ON c.doc_a = sa.doc_id
          JOIN sig sb ON c.doc_b = sb.doc_id
          WHERE ({" + ".join(
            f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES)
          )}) >= {CLUSTER_MIN_MATCHES}
        ),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
          UNION
          SELECT doc_b AS src, doc_a AS dst FROM mh_pairs
        ),
        reach(node, lab) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
        ),
        cc AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node)"""


def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → deletable duplicate GROUPS: hash-min label
    propagation (operators/graph.py) over the MinHash/LSH candidate
    pairs at >=8/16 matching hashes; cluster_id = min doc in the
    component, keeper = that doc."""
    from .graph import connected_components

    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_candidate_pairs(docs).filter(
        F.col("matching_hashes") >= CLUSTER_MIN_MATCHES
    )
    cc = connected_components(pairs)
    w = W.partitionBy("cluster_id")
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("n_members"),
        (F.col("node") == F.col("cluster_id")).cast("long").alias("is_keeper"),
    )


def dedup_duplicate_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same duplicate-group clustering through the alternating
    large-star/small-star algorithm (Kiveris et al.) instead of
    hash-min propagation — O(log n) rounds on adversarial high-
    diameter graphs where hash-min degrades to a round per hop.
    Identical output contract as dedup_duplicate_clusters."""
    from .graph import connected_components_star

    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_candidate_pairs(docs).filter(
        F.col("matching_hashes") >= CLUSTER_MIN_MATCHES
    )
    cc = connected_components_star(pairs)
    w = W.partitionBy("cluster_id")
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("n_members"),
        (F.col("node") == F.col("cluster_id")).cast("long").alias("is_keeper"),
    )


def _cluster_rows(cc: DataFrame) -> DataFrame:
    w = W.partitionBy("cluster_id")
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("n_members"),
        (F.col("node") == F.col("cluster_id")).cast("long").alias("is_keeper"),
    )


@register(
    "dedup_duplicate_clusters",
    oracle=f"""
        WITH RECURSIVE {_sql_cluster_ctes()},
        closure AS (
          SELECT doc_id, cluster_id,
                 CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
                 CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
          FROM cc
        )
        SELECT 'hash_min' AS variant, * FROM closure
        UNION ALL
        SELECT 'star' AS variant, * FROM closure
    """,
    doc=(
        "Duplicate-group clustering over the MinHash/LSH candidate pairs in "
        "BOTH distributed algorithms, union-tagged by `variant`: hash-min "
        "label propagation with pointer jumping, and alternating large-star/"
        "small-star (Kiveris et al.). The candidate pairs are generated ONCE "
        "and persisted — the expensive stage feeds both algorithms. The "
        "oracle computes the components once via an independent recursive-"
        "CTE transitive closure, so the driver cross-checks both algorithms "
        "against the same ground truth."
    ),
)
def dedup_duplicate_clusters_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    from .graph import connected_components, connected_components_star

    docs = load_table(spark, "documents", sf_dir)
    pairs = track(
        minhash_candidate_pairs(docs)
        .filter(F.col("matching_hashes") >= CLUSTER_MIN_MATCHES)
        .persist()
    )
    # Materialize the shared pair table ONCE before the loops: both
    # fixpoints read it, and filling the persist under a single action
    # stops the two concurrent edge checkpoints from racing to compute
    # the same shingle/band/signature stages twice (r15, guide §2.6).
    pairs.count()
    # local_threshold=0: this query CERTIFIES the two distributed loops
    # against the recursive-CTE oracle — the small-graph union-find fast
    # path must not swallow the thing under test. The two fixpoint loops
    # are independent driver-blocking iterations over the SAME cached
    # pairs; running them from two driver threads overlaps their small
    # per-round stage waves (guide §2.6) — byte-identical output, the
    # loops share nothing but the materialized pair cache. Safe since
    # the r15 exact-id round-cache bookkeeping (each loop releases only
    # the checkpoint ids it noted).
    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_a = pool.submit(
            inheritable_thread_target(
                lambda: connected_components(pairs, local_threshold=0)
            )
        )
        fut_b = pool.submit(
            inheritable_thread_target(
                lambda: connected_components_star(pairs, local_threshold=0)
            )
        )
        a = _cluster_rows(fut_a.result()).select(
            F.lit("hash_min").alias("variant"), "*"
        )
        b = _cluster_rows(fut_b.result()).select(
            F.lit("star").alias("variant"), "*"
        )
    return a.unionByName(b)


# -------------------------------------------------------------- 4. SimHash

def simhash_fingerprints(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """One partial-aggregated shuffle on doc_id: each token OCCURRENCE
    contributes ±1 to each of the 32 bit-sums (identical to tf-weighted
    sums, without materializing a tf table or a ×32 bit crossJoin — the
    32 conditional sums run inside one codegen'd hash aggregate)."""
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token")).select(
        "doc_id", token_hash(F.col("token")).alias("h")
    )
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"s_{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = tok.groupBy("doc_id").agg(*bit_sums)
    simhash = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash = term if simhash is None else simhash + term
    return sums.select("doc_id", simhash.alias("simhash"))


@register(
    "dedup_simhash",
    oracle=f"""
        WITH {_SQL_TOK_CTE},
        tf AS (
          SELECT doc_id, {_SQL_TOKHASH.format(tok="token")} AS h, COUNT(*) AS cnt
          FROM toks GROUP BY doc_id, token
        ),
        bitsums AS (
          SELECT doc_id, b.b AS bit,
                 CAST(SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN cnt ELSE -cnt END) AS BIGINT) AS s
          FROM tf CROSS JOIN (SELECT UNNEST(range({SIMHASH_BITS})) AS b) b
          GROUP BY doc_id, b.b
        ),
        fp AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
          FROM bitsums GROUP BY doc_id
        ),
        blocks AS (
          SELECT doc_id, simhash, b.b AS blk, (simhash >> (b.b * 8)) & 255 AS byte
          FROM fp CROSS JOIN (SELECT UNNEST(range(4)) AS b) b
        )
        SELECT 'fingerprint' AS section, doc_id AS id_a,
               CAST(NULL AS BIGINT) AS id_b, simhash AS value
        FROM fp
        UNION ALL
        SELECT DISTINCT 'pair' AS section, a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS BIGINT)
                 AS value
        FROM blocks a JOIN blocks b
          ON a.blk = b.blk AND a.byte = b.byte AND a.doc_id < b.doc_id
        WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 6
    """,
    doc=(
        "The SimHash dedup family in one union-tagged result: per-doc "
        "32-bit fingerprints (`section='fingerprint'`: sign-of-weighted-"
        "bit-sums, 32 conditional sums inside one codegen'd aggregate) "
        "and the near-dup candidate pairs derived from them "
        "(`section='pair'`, value=hamming distance): a pair is a "
        "candidate only if one of the 4 fingerprint bytes matches "
        "(pigeonhole: hamming<=6 over 32 bits collides on a byte) — "
        "byte-blocked equi-join, never all-pairs. The fingerprint stage "
        "is computed ONCE and cached; both sections read it."
    ),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    fp = track(simhash_fingerprints(spark, docs).cache())
    # ×4 byte-block expansion via explode (generator, no join in the plan)
    blocks = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("blk"),
    ).withColumn("byte", F.expr("(simhash >> (blk * 8)) & 255"))
    a = blocks.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "blk", "byte")
    b = blocks.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "blk", "byte")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    pairs = (
        a.join(b, ["blk", "byte"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 6)
        .distinct()
    )
    fingerprints = fp.select(
        F.lit("fingerprint").alias("section"),
        F.col("doc_id").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.col("simhash").alias("value"),
    )
    return fingerprints.unionByName(
        pairs.select(
            F.lit("pair").alias("section"),
            F.col("doc_a").alias("id_a"),
            F.col("doc_b").alias("id_b"),
            F.col("hamming").cast("long").alias("value"),
        )
    )


# ------------------------------------------- 5. incremental corpus ingestion

# The batch-ingestion path a 100 TB corpus actually runs: new documents
# arrive in batches and must be deduplicated AGAINST THE EXISTING CORPUS
# without reprocessing the corpus. Demo split: doc_id % 10 == 0 is the
# incoming batch, the rest is the accepted corpus.
INC_BATCH_MOD = 10
INC_JACCARD_PCT = 50  # near-dup admission threshold (stricter than the
#                       10% pair-REPORTING threshold above: admission is
#                       a keep/drop decision, not a candidate survey)


@register(
    "corpus_incremental_dedup",
    oracle=f"""
        WITH {_SQL_TOK_POS_CTE},
        led AS (
          SELECT doc_id,
            concat_ws(' ', token,
              LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY pos),
              LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY pos)) AS shingle,
            LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
          FROM tok
        ),
        shingles_all AS (
          SELECT DISTINCT doc_id,
            {_SQL_TOKHASH.format(tok="shingle")} AS shingle_hash
          FROM led WHERE t2 IS NOT NULL
        ),
        shingles AS (
          SELECT doc_id, shingle_hash FROM (
            SELECT doc_id, shingle_hash,
                   COUNT(*) OVER (PARTITION BY shingle_hash) AS sh_df
            FROM shingles_all
          ) WHERE sh_df <= {MAX_SHINGLE_DF}
        ),
        hashes AS (SELECT doc_id, md5(text) AS h FROM documents),
        new AS (SELECT doc_id, h FROM hashes WHERE doc_id % {INC_BATCH_MOD} = 0),
        corpus AS (SELECT doc_id, h FROM hashes WHERE doc_id % {INC_BATCH_MOD} <> 0),
        batch_min AS (SELECT h, MIN(doc_id) AS first_id FROM new GROUP BY h),
        corpus_hash AS (SELECT h, MIN(doc_id) AS corpus_id FROM corpus GROUP BY h),
        tier1 AS (
          SELECT n.doc_id,
                 CASE WHEN bm.first_id < n.doc_id THEN 'batch_dup'
                      WHEN ch.corpus_id IS NOT NULL THEN 'exact_dup' END AS verdict,
                 CASE WHEN bm.first_id < n.doc_id THEN bm.first_id
                      ELSE ch.corpus_id END AS matched_doc_id
          FROM new n
          JOIN batch_min bm ON n.h = bm.h
          LEFT JOIN corpus_hash ch ON n.h = ch.h
        ),
        survivors AS (SELECT doc_id FROM tier1 WHERE verdict IS NULL),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, COUNT(*) AS inter
          FROM shingles a
          JOIN shingles b ON a.shingle_hash = b.shingle_hash
          WHERE a.doc_id IN (SELECT doc_id FROM survivors)
            AND b.doc_id % {INC_BATCH_MOD} <> 0
          GROUP BY 1, 2
        ),
        scored AS (
          SELECT p.new_id, p.corpus_id, p.inter,
                 sa.n_sh + sb.n_sh - p.inter AS uni
          FROM pairs p
          JOIN sizes sa ON sa.doc_id = p.new_id
          JOIN sizes sb ON sb.doc_id = p.corpus_id
          WHERE p.inter * 100 >= (sa.n_sh + sb.n_sh - p.inter) * {INC_JACCARD_PCT}
        ),
        best AS (
          SELECT new_id, corpus_id, inter, uni FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY new_id
              ORDER BY CAST(inter AS DOUBLE) / uni DESC, corpus_id) AS rn
            FROM scored
          ) WHERE rn = 1
        )
        SELECT doc_id, verdict, matched_doc_id,
               CAST(NULL AS BIGINT) AS inter, CAST(NULL AS BIGINT) AS uni
        FROM tier1 WHERE verdict IS NOT NULL
        UNION ALL
        SELECT s.doc_id,
               CASE WHEN b.corpus_id IS NOT NULL THEN 'near_dup' ELSE 'kept' END
                 AS verdict,
               b.corpus_id AS matched_doc_id, b.inter, b.uni
        FROM survivors s LEFT JOIN best b ON b.new_id = s.doc_id
    """,
    doc=(
        "Incremental corpus ingestion (the batch-dedup path a growing "
        "100 TB corpus actually runs): every incoming document "
        "(doc_id % 10 == 0) is admitted or rejected against the existing "
        "corpus WITHOUT reprocessing the corpus. Tier 1 — exact: "
        "within-batch first-writer-wins on md5(text) (`batch_dup`) and a "
        "hash equi-join against the corpus hash set (`exact_dup`); the "
        "corpus side of that join is a per-hash MIN aggregate, in "
        "production a stored manifest. Tier 2 — only tier-1 SURVIVORS "
        "reach the expensive stage (probe-side shrink before the join): "
        "shingle-blocked n-gram Jaccard against the corpus at a strict "
        "50% admission threshold; best match per doc by exact-ratio "
        "order with id tie-break (`near_dup`), else `kept`. The shingle "
        "universe (with the hot-shingle DF cap) is computed once over "
        "all docs here; in production the corpus shingles are a stored, "
        "bucket-partitioned index the batch probes — same plan, no "
        "corpus rescan. Never all-pairs: both tiers block on equi-join "
        "keys (hash, shingle)."
    ),
)
def corpus_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    hashes = docs.select("doc_id", F.md5("text").alias("h"))
    is_new = F.col("doc_id") % INC_BATCH_MOD == 0
    new = hashes.filter(is_new)
    corpus = hashes.filter(~is_new)

    batch_min = new.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    corpus_hash = corpus.groupBy("h").agg(F.min("doc_id").alias("corpus_id"))
    tier1 = (
        new.join(batch_min, "h")
        .join(corpus_hash, "h", "left")
        .select(
            "doc_id",
            F.when(F.col("first_id") < F.col("doc_id"), F.lit("batch_dup"))
            .when(F.col("corpus_id").isNotNull(), F.lit("exact_dup"))
            .alias("verdict"),
            F.when(F.col("first_id") < F.col("doc_id"), F.col("first_id"))
            .otherwise(F.col("corpus_id"))
            .alias("matched_doc_id"),
        )
    )
    tier1 = track(tier1.persist())  # read twice: dup rows + survivor probe

    survivors = tier1.filter(F.col("verdict").isNull()).select("doc_id")

    sh = track(_shingles(docs, "doc_id", "text").persist())
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_new = sh.join(survivors, "doc_id", "left_semi").select(
        F.col("doc_id").alias("new_id"), "shingle_hash"
    )
    sh_corpus = sh.filter(F.col("doc_id") % INC_BATCH_MOD != 0).select(
        F.col("doc_id").alias("corpus_id"), "shingle_hash"
    )
    pairs = (
        sh_new.join(sh_corpus, "shingle_hash")
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("new_id"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("corpus_id"), F.col("n_sh").alias("n_b"))
    scored = (
        pairs.join(sa, "new_id")
        .join(sb, "corpus_id")
        .withColumn("uni", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .filter(F.col("inter") * 100 >= F.col("uni") * INC_JACCARD_PCT)
    )
    w = W.partitionBy("new_id").orderBy(
        (F.col("inter").cast("double") / F.col("uni")).desc(), "corpus_id"
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("new_id", "corpus_id", "inter", "uni")
    )

    dup_rows = tier1.filter(F.col("verdict").isNotNull()).select(
        "doc_id",
        "verdict",
        "matched_doc_id",
        F.lit(None).cast("long").alias("inter"),
        F.lit(None).cast("long").alias("uni"),
    )
    survivor_rows = (
        survivors.join(best, survivors["doc_id"] == best["new_id"], "left")
        .select(
            "doc_id",
            F.when(F.col("corpus_id").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
            F.col("corpus_id").alias("matched_doc_id"),
            "inter",
            "uni",
        )
    )
    return dup_rows.unionByName(survivor_rows)
