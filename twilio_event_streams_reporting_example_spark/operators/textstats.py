"""Text analysis operators (north star): token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built-in expression work — split/explode/agg — so the whole
module rides whole-stage codegen; no Python UDFs. Counts and flags are
integers/booleans, fingerprints are modular int64 math: every query here
has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table
from .dedup import (
    _SQL_TOK_CTE,
    _SQL_TOK_POS_CTE,
    _SQL_TOKENS,
    _SQL_TOKHASH,
    _sql_cluster_ctes,
    token_hash,
    tokens,
)

# Marker stopword sets for the language-ID heuristic (n-gram/stopword
# scoring). On real corpora these separate languages; on the synthetic
# word-soup fixture the result is deterministic either way.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "y", "es"],
    "fr": ["le", "la", "de", "et", "est"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

FP_P = 2147483647  # fingerprint modulus (2^31-1)
FP_POWS = [pow(31, k, FP_P) for k in range(16)]  # rolling-hash power table


_TOKSTATS_ORACLE = f"""
        WITH {_SQL_TOK_CTE}
        SELECT
          d.doc_id,
          d.n_chars,
          COALESCE(t.n_tokens, 0) AS n_tokens,
          COALESCE(t.n_distinct_tokens, 0) AS n_distinct_tokens,
          COALESCE(t.total_token_chars, 0) AS total_token_chars,
          CAST(t.total_token_chars AS DOUBLE) / t.n_tokens AS avg_token_len
        FROM documents d
        LEFT JOIN (
          SELECT doc_id, COUNT(*) AS n_tokens,
                 COUNT(DISTINCT token) AS n_distinct_tokens,
                 CAST(SUM(length(token)) AS BIGINT) AS total_token_chars
          FROM toks GROUP BY doc_id
        ) t ON d.doc_id = t.doc_id
"""


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokenizer + per-doc counts/lengths."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    stats = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct_tokens"),
        F.sum(F.length("token")).alias("total_token_chars"),
    )
    return (
        docs.select("doc_id", "n_chars")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_distinct_tokens", F.lit(0)).alias("n_distinct_tokens"),
            F.coalesce("total_token_chars", F.lit(0)).alias("total_token_chars"),
            (F.col("total_token_chars").cast("double") / F.col("n_tokens")).alias("avg_token_len"),
        )
    )


_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)


_QUALITY_ORACLE = f"""
        WITH {_SQL_TOK_CTE},
        s AS (
          SELECT doc_id,
                 COUNT(*) AS n_tokens,
                 COUNT(DISTINCT token) AS n_distinct,
                 CAST(SUM(length(token)) AS BIGINT) AS tok_chars,
                 CAST(SUM(CASE WHEN token IN ({_STOP_IN}) THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
          FROM toks GROUP BY doc_id
        )
        SELECT
          doc_id,
          n_tokens,
          stop_hits,
          (n_tokens BETWEEN 20 AND 100000) AS len_ok,
          (tok_chars * 10 BETWEEN n_tokens * 20 AND n_tokens * 120) AS word_len_ok,
          (n_distinct * 10 >= n_tokens) AS diversity_ok,
          (stop_hits * 100 >= n_tokens) AS stopword_ok,
          (CASE WHEN n_tokens BETWEEN 20 AND 100000 THEN 1 ELSE 0 END
           + CASE WHEN tok_chars * 10 BETWEEN n_tokens * 20 AND n_tokens * 120 THEN 1 ELSE 0 END
           + CASE WHEN n_distinct * 10 >= n_tokens THEN 1 ELSE 0 END
           + CASE WHEN stop_hits * 100 >= n_tokens THEN 1 ELSE 0 END) AS quality_score
        FROM s
"""


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / mean-word-length / lexical-diversity /
    stopword-ratio gates, integer-ratio math (Gopher-style rules)."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    s = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
        F.sum(F.length("token")).alias("tok_chars"),
        F.sum(F.when(F.col("token").isin(STOPWORDS), 1).otherwise(0)).alias("stop_hits"),
    )
    len_ok = F.col("n_tokens").between(20, 100000)
    word_len_ok = (F.col("tok_chars") * 10 >= F.col("n_tokens") * 20) & (
        F.col("tok_chars") * 10 <= F.col("n_tokens") * 120
    )
    diversity_ok = F.col("n_distinct") * 10 >= F.col("n_tokens")
    stopword_ok = F.col("stop_hits") * 100 >= F.col("n_tokens")
    score = (
        len_ok.cast("int") + word_len_ok.cast("int")
        + diversity_ok.cast("int") + stopword_ok.cast("int")
    )
    return s.select(
        "doc_id",
        "n_tokens",
        "stop_hits",
        len_ok.alias("len_ok"),
        word_len_ok.alias("word_len_ok"),
        diversity_ok.alias("diversity_ok"),
        stopword_ok.alias("stopword_ok"),
        score.alias("quality_score"),
    )


def _sql_lang_score(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"CAST(SUM(CASE WHEN token IN ({markers}) THEN 1 ELSE 0 END) AS BIGINT)"


_LANGID_ORACLE = f"""
        WITH {_SQL_TOK_CTE},
        scores AS (
          SELECT doc_id,
            {", ".join(f"{_sql_lang_score(lg)} AS score_{lg}" for lg in sorted(LANG_MARKERS))}
          FROM toks GROUP BY doc_id
        )
        SELECT doc_id, {", ".join(f"score_{lg}" for lg in sorted(LANG_MARKERS))},
          CASE
            {" ".join(
              f"WHEN score_{lg} = greatest({', '.join('score_' + l2 for l2 in sorted(LANG_MARKERS))}) THEN '{lg}'"
              for lg in sorted(LANG_MARKERS)
            )}
          END AS predicted_lang
        FROM scores
"""


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-stopword hit counts per language,
    argmax with alphabetical tie-break (first WHEN wins)."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    langs = sorted(LANG_MARKERS)
    scores = tok.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("token").isin(LANG_MARKERS[lg]), 1).otherwise(0)).alias(f"score_{lg}")
            for lg in langs
        ]
    )
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    expr = None
    for lg in langs:
        cond = F.col(f"score_{lg}") == best
        expr = F.when(cond, F.lit(lg)) if expr is None else expr.when(cond, F.lit(lg))
    return scores.select(
        "doc_id", *[f"score_{lg}" for lg in langs], expr.alias("predicted_lang")
    )


_FPRINT_ORACLE = f"""
        WITH {_SQL_TOK_POS_CTE}
        SELECT doc_id,
          CAST(SUM((({_SQL_TOKHASH.format(tok="token")} % {FP_P})
               * ([{", ".join(str(p) for p in FP_POWS)}][(pos % 16) + 1])) % {FP_P}) % {FP_P} AS BIGINT)
            AS fingerprint,
          COUNT(*) AS n_tokens
        FROM tok GROUP BY doc_id
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: positional polynomial rolling hash over token
    hashes mod 2^31-1 — order-sensitive (unlike minhash), exact int math."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token"))
    pow_table = F.array(*[F.lit(p) for p in FP_POWS])
    term = (
        (token_hash(F.col("token")) % FP_P)
        * F.element_at(pow_table, (F.col("pos") % 16) + 1).cast("long")
    ) % FP_P
    return tok.groupBy("doc_id").agg(
        (F.sum(term) % FP_P).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


# --------------------------------------------------- composed corpus prep

_SQL_LANG_SCORES = ", ".join(
    "CAST(SUM(CASE WHEN token IN ({m}) THEN 1 ELSE 0 END) AS BIGINT) AS score_{lg}".format(
        m=", ".join(f"'{w}'" for w in LANG_MARKERS[lg]), lg=lg
    )
    for lg in sorted(LANG_MARKERS)
)
_SQL_GREATEST = "greatest({})".format(
    ", ".join(f"score_{lg}" for lg in sorted(LANG_MARKERS))
)
_SQL_PRED_LANG = "CASE {} END".format(
    " ".join(
        f"WHEN score_{lg} = {_SQL_GREATEST} THEN '{lg}'" for lg in sorted(LANG_MARKERS)
    )
)


_PREP_EXACT_ORACLE = f"""
        WITH keepers AS (
          SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        tok AS (
          SELECT d.doc_id,
                 unnest(list_filter(regexp_split_to_array(lower(d.text), '\\s+'),
                                    t -> t <> '')) AS token
          FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
        ),
        s AS (
          SELECT doc_id,
                 COUNT(*) AS n_tokens,
                 COUNT(DISTINCT token) AS n_distinct,
                 CAST(SUM(length(token)) AS BIGINT) AS tok_chars,
                 CAST(SUM(CASE WHEN token IN ({", ".join(f"'{w}'" for w in STOPWORDS)})
                          THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits,
                 {_SQL_LANG_SCORES}
          FROM tok GROUP BY doc_id
        )
        SELECT doc_id, {_SQL_PRED_LANG} AS predicted_lang, n_tokens
        FROM s
        WHERE (n_tokens BETWEEN 20 AND 100000)
          AND (tok_chars * 10 BETWEEN n_tokens * 20 AND n_tokens * 120)
          AND (n_distinct * 10 >= n_tokens)
          AND (stop_hits * 100 >= n_tokens)
          AND {_SQL_PRED_LANG} = 'en'
"""


def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus prep, exact-dedup stage: exact dedup (keep lowest
    doc_id per identical text) -> Gopher-style quality gates -> language
    filter (en) -> surviving docs with token counts, composed as ONE
    plan: a dedup semi-join plus a single groupBy computing quality AND
    language scores in the same partial-aggregated pass."""
    return _corpus_prep(spark, sf_dir, near_dedup=False)


_PREP_FULL_ORACLE = f"""
        WITH RECURSIVE {_sql_cluster_ctes()},
        keepers AS (
          SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        tok2 AS (
          SELECT d.doc_id,
                 unnest(list_filter(regexp_split_to_array(lower(d.text), '\\s+'),
                                    t -> t <> '')) AS token
          FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
          WHERE d.doc_id NOT IN (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)
        ),
        s AS (
          SELECT doc_id,
                 COUNT(*) AS n_tokens,
                 COUNT(DISTINCT token) AS n_distinct,
                 CAST(SUM(length(token)) AS BIGINT) AS tok_chars,
                 CAST(SUM(CASE WHEN token IN ({", ".join(f"'{w}'" for w in STOPWORDS)})
                          THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits,
                 {_SQL_LANG_SCORES}
          FROM tok2 GROUP BY doc_id
        )
        SELECT doc_id, {_SQL_PRED_LANG} AS predicted_lang, n_tokens
        FROM s
        WHERE (n_tokens BETWEEN 20 AND 100000)
          AND (tok_chars * 10 BETWEEN n_tokens * 20 AND n_tokens * 120)
          AND (n_distinct * 10 >= n_tokens)
          AND (stop_hits * 100 >= n_tokens)
          AND {_SQL_PRED_LANG} = 'en'
"""


def corpus_prep_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE corpus-prep chain a 100 TB training run executes:
    exact dedup -> NEAR-dup removal (MinHash/LSH pairs -> connected-
    component clusters, non-keepers dropped) -> Gopher-style quality
    gates -> language filter. The near-dup stage reuses
    dedup_duplicate_clusters wholesale."""
    return _corpus_prep(spark, sf_dir, near_dedup=True)


@register(
    "corpus_prep",
    oracle=f"""
        SELECT 'exact_dedup' AS variant, * FROM ({_PREP_EXACT_ORACLE})
        UNION ALL
        SELECT 'near_dedup' AS variant, * FROM ({_PREP_FULL_ORACLE})
    """,
    doc=(
        "End-to-end training-corpus prep at BOTH dedup depths, union-"
        "tagged by `variant`: the exact-dedup chain (md5 keeper semi-join "
        "-> quality gates -> language filter) and the full chain adding "
        "MinHash/LSH near-dup cluster removal. Each stage keeps its own "
        "independent oracle derivation (the full variant recomputes the "
        "clusters via a recursive-CTE closure inside one statement)."
    ),
)
def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One tokenize pass serves BOTH variants: the quality/language gates
    aggregate per doc_id, so removing near-dup non-keepers AFTER the
    aggregation (a left-anti on doc_id) is row-identical to removing them
    before tokenization — at 100 TB that halves the dominant stage (the
    token explode + groupBy), and the gated profile is persisted once.

    The two expensive chains are INDEPENDENT: the near-dup cluster
    builder runs eager driver-blocking work while the query is built
    (shingle/minhash/band stages feeding the CC edge checkpoint + the
    fixpoint rounds), and the gated profile's persist would otherwise
    fill only at the final action, AFTER all of it. Filling the persist
    from a second driver thread overlaps the tokenize+aggregate stages
    with the cluster chain's small per-round waves (optimization guide
    §2.6 — overlap independent jobs); same jobs, same bytes, same rows,
    only the wall-clock serialization changes. Thread-safe under the
    r15 exact-id cache bookkeeping (gated is tracked on the main
    thread; the fill thread issues no track() calls of its own)."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    from ..registry import track
    from .dedup import dedup_duplicate_clusters

    docs = load_table(spark, "documents", sf_dir)
    gated = track(_gated_profile(_exact_kept(docs)).persist())
    with ThreadPoolExecutor(max_workers=1) as pool:
        fill = pool.submit(
            inheritable_thread_target(
                lambda: gated.write.format("noop").mode("overwrite").save()
            )
        )
        non_keepers = (
            dedup_duplicate_clusters(spark, sf_dir)
            .filter(F.col("is_keeper") == 0)
            .select("doc_id")
        )
        fill.result()
    a = gated.select(F.lit("exact_dedup").alias("variant"), "*")
    b = gated.join(non_keepers, "doc_id", "left_anti").select(
        F.lit("near_dedup").alias("variant"), "*"
    )
    return a.unionByName(b)


def _exact_kept(docs: DataFrame) -> DataFrame:
    """Exact-dedup stage: keep the lowest doc_id per identical text."""
    keepers = docs.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keepers.select("doc_id"), "doc_id", "left_semi")


def _gated_profile(kept: DataFrame) -> DataFrame:
    """Tokenize → one partial-aggregated pass computing quality AND
    language scores → Gopher gates + 'en' filter."""
    tok = kept.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))

    langs = sorted(LANG_MARKERS)
    aggs = [
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
        F.sum(F.length("token")).alias("tok_chars"),
        F.sum(F.when(F.col("token").isin(STOPWORDS), 1).otherwise(0)).alias("stop_hits"),
    ] + [
        F.sum(F.when(F.col("token").isin(LANG_MARKERS[lg]), 1).otherwise(0)).alias(
            f"score_{lg}"
        )
        for lg in langs
    ]
    s = tok.groupBy("doc_id").agg(*aggs)

    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = None
    for lg in langs:
        cond = F.col(f"score_{lg}") == best
        pred = F.when(cond, F.lit(lg)) if pred is None else pred.when(cond, F.lit(lg))

    gates = (
        F.col("n_tokens").between(20, 100000)
        & (F.col("tok_chars") * 10 >= F.col("n_tokens") * 20)
        & (F.col("tok_chars") * 10 <= F.col("n_tokens") * 120)
        & (F.col("n_distinct") * 10 >= F.col("n_tokens"))
        & (F.col("stop_hits") * 100 >= F.col("n_tokens"))
    )
    return (
        s.withColumn("predicted_lang", pred)
        .filter(gates & (F.col("predicted_lang") == "en"))
        .select("doc_id", "predicted_lang", "n_tokens")
    )


def _corpus_prep(spark: SparkSession, sf_dir: str, near_dedup: bool) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    kept = _exact_kept(docs)
    if near_dedup:
        from .dedup import dedup_duplicate_clusters

        non_keepers = (
            dedup_duplicate_clusters(spark, sf_dir)
            .filter(F.col("is_keeper") == 0)
            .select("doc_id")
        )
        kept = kept.join(non_keepers, "doc_id", "left_anti")
    return _gated_profile(kept)


# ------------------------------------------------------------- 5. TF-IDF

TFIDF_TOP_K = 5


@register(
    "doc_tfidf_topterms",
    oracle=f"""
        WITH {_SQL_TOK_CTE},
        tf AS (
          SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
        ),
        corpus AS (SELECT COUNT(*) AS n_docs FROM documents),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        scored AS (
          SELECT t.doc_id, t.token, t.tf,
                 round(t.tf * (round(ln((c.n_docs + 1.0) / (d.df + 1.0)), 9) + 1.0), 9)
                   AS tfidf
          FROM tf t JOIN dfreq d USING (token) CROSS JOIN corpus c
        )
        SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, tfidf, CAST(rk AS BIGINT) AS rk
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, token) AS rk
          FROM scored
        ) WHERE rk <= {TFIDF_TOP_K}
    """,
    doc=(
        "TF-IDF top-5 terms per document — the classic IR weighting as "
        "three partial-aggregated shuffles: (doc, term) term frequency, "
        "per-term document frequency, smoothed idf = ln((N+1)/(df+1)) + 1 "
        "(sklearn's smooth_idf), and a per-doc top-k window. N arrives by "
        "broadcasting a 1-row count — no driver round-trip. Scores round "
        "to 9dp in both engines so ln() ulp drift cannot flip ranks; ties "
        "break on the term. At 100 TB the df join is term-keyed and "
        "stopword-skewed — the same broadcast DF-cap used in the shingle "
        "blocking applies."
    ),
)
def doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.round(
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))), 9
    ) + F.lit(1.0)
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(F.col("tf") * idf, 9).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "token", "tf", "tfidf", F.col("rk").cast("long").alias("rk"))
    )


# ------------------------------------------------- 6. repetition analysis

# Gopher-style repetition gates (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", Table A1): a document dominated by one token or
# one bigram is boilerplate/spam, not prose. Integer-math thresholds:
# most-common token <= 10% of tokens, most-common bigram <= 18%.
REP_TOKEN_PCT = 10
REP_BIGRAM_PCT = 18


_REPSTATS_ORACLE = f"""
        WITH {_SQL_TOK_POS_CTE},
        tcnt AS (
          SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token
        ),
        tstats AS (
          SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 COUNT(*) AS n_distinct_tokens,
                 CAST(MAX(c) AS BIGINT) AS top_token_n
          FROM tcnt GROUP BY doc_id
        ),
        big AS (
          SELECT doc_id,
                 token || ' ' || LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS bigram
          FROM tok
        ),
        bcnt AS (
          SELECT doc_id, bigram, COUNT(*) AS c
          FROM big WHERE bigram IS NOT NULL GROUP BY doc_id, bigram
        ),
        bstats AS (
          SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_bigrams,
                 CAST(MAX(c) AS BIGINT) AS top_bigram_n
          FROM bcnt GROUP BY doc_id
        )
        SELECT
          t.doc_id,
          t.n_tokens,
          t.n_distinct_tokens,
          t.top_token_n,
          round(CAST(t.top_token_n AS DOUBLE) / t.n_tokens, 9) AS top_token_frac,
          COALESCE(b.n_bigrams, 0) AS n_bigrams,
          COALESCE(b.top_bigram_n, 0) AS top_bigram_n,
          round(CAST(b.top_bigram_n AS DOUBLE) / b.n_bigrams, 9) AS top_bigram_frac,
          round(CAST(t.n_tokens - t.n_distinct_tokens AS DOUBLE) / t.n_tokens, 9)
            AS dup_token_frac,
          (t.top_token_n * 100 <= t.n_tokens * {REP_TOKEN_PCT}) AS rep_token_ok,
          (COALESCE(b.top_bigram_n, 0) * 100 <= COALESCE(b.n_bigrams, 0) * {REP_BIGRAM_PCT})
            AS rep_bigram_ok
        FROM tstats t LEFT JOIN bstats b USING (doc_id)
"""


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates: most-common-token and most-common-
    bigram fractions plus duplicate-token fraction per document — the
    boilerplate/spam filter a pretraining pipeline runs after the
    length/diversity gates. Counting is two partial-aggregated
    shuffles on (doc, gram); the bigram build is the same posexplode
    +lead window the shingler uses. Gate comparisons are pure integer
    math (exact); reported fractions round to 9dp in both engines."""
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token")
    )
    tcnt = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    tstats = tcnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.max("c").alias("top_token_n"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("nxt", F.lead("token").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "token", "nxt").alias("bigram"))
    )
    bcnt = big.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    bstats = bcnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_n"),
    )
    return tstats.join(bstats, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "top_token_n",
        F.round(F.col("top_token_n").cast("double") / F.col("n_tokens"), 9).alias(
            "top_token_frac"
        ),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
        F.round(
            F.col("top_bigram_n").cast("double") / F.col("n_bigrams"), 9
        ).alias("top_bigram_frac"),
        F.round(
            (F.col("n_tokens") - F.col("n_distinct_tokens")).cast("double")
            / F.col("n_tokens"),
            9,
        ).alias("dup_token_frac"),
        (F.col("top_token_n") * 100 <= F.col("n_tokens") * REP_TOKEN_PCT).alias(
            "rep_token_ok"
        ),
        (
            F.coalesce("top_bigram_n", F.lit(0)) * 100
            <= F.coalesce("n_bigrams", F.lit(0)) * REP_BIGRAM_PCT
        ).alias("rep_bigram_ok"),
    )


# ------------------------------------------------------- 7. PII scrubbing

# Patterns kept to constructs with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded/unbounded repeats.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9][0-9\-]{6,}[0-9]"


@register(
    "pii_scrub",
    oracle=f"""
        WITH planted AS (
          SELECT doc_id,
            text || CASE
              WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                       || '@example.com for details'
              WHEN doc_id % 7 = 3 THEN ' call +1-555-'
                                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                                       || ' today'
              ELSE ''
            END AS t
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
               md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_hash,
               CAST(length(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                          '{PHONE_RE}', '<PHONE>', 'g')) AS BIGINT)
                 AS scrubbed_len
        FROM planted
    """,
    doc=(
        "PII scrubbing (training-data redaction): email and phone "
        "patterns detected with regexp_count and masked with "
        "regexp_replace — pure JVM expression work that rides the scan "
        "(no shuffle at all; at 100 TB this runs at read throughput). "
        "The synthetic corpus contains no PII-shaped strings (verified: "
        "zero digits/@/+ in text), so the query deterministically PLANTS "
        "addresses/numbers on a doc_id schedule first; both engines "
        "plant, count, and scrub identically — the md5 of the scrubbed "
        "text is the cross-engine witness that masking is byte-exact."
    ),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    did = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com for details"),
            ),
        )
        .when(
            did % 7 == 3,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
                F.lit(" today"),
            ),
        )
        .otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(planted, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(planted, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(planted, F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_hash"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    )


# ---------------------------------------------- folded per-doc text profile

# --------------------------------------------- BPE-ish subword token count

# GPT-2-style pretokenizer, restricted to constructs Java regex and RE2
# (DuckDB) evaluate identically: contraction suffixes, space-prefixed
# letter runs, space-prefixed digit runs, space-prefixed punctuation runs,
# bare apostrophes, residual whitespace runs. The original's \s+(?!\S)
# lookahead is dropped (RE2 has no lookahead); both engines then agree on
# leftmost-first greedy matching, so counts are bit-identical.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|'|\s+"
_SQL_BPE_PATTERN = BPE_PATTERN.replace("'", "''")


def bpe_token_count(text) -> object:
    """Column: number of pretokenizer tokens in ``text`` — the unit a
    subword (BPE) tokenizer would merge within; the standard proxy for
    'how many tokens will this doc cost' when budgeting training data
    without shipping a vocab. Pure JVM regex — no UDF."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)))


def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bpe_tokens, chars_per_bpe_token): pretokenizer token
    count per document plus the compression ratio (chars per token, the
    fertility proxy). One projection on the scan — no explode, no
    shuffle; at 100 TB this rides the same pass as any other per-doc
    profile column."""
    docs = load_table(spark, "documents", sf_dir)
    n = bpe_token_count(F.col("text"))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_bpe_tokens"),
        F.when(
            n > 0, F.round(F.col("n_chars").cast("double") / n, 9)
        ).alias("chars_per_bpe_token"),
    )


_BPE_ORACLE = f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_SQL_BPE_PATTERN}')) AS BIGINT)
                 AS n_bpe_tokens,
               CASE WHEN len(regexp_extract_all(text, '{_SQL_BPE_PATTERN}')) > 0
                    THEN round(CAST(n_chars AS DOUBLE)
                               / len(regexp_extract_all(text, '{_SQL_BPE_PATTERN}')), 9)
               END AS chars_per_bpe_token
        FROM documents
"""


# ------------------------------------ cross-document duplicated substrings

DUPSUB_W = 8  # rolling window width in tokens (Lee et al. 2021 use 50-token
#               windows on web corpora; the synthetic fixture docs are short)
DUPSUB_MAX_PCT = 20  # gate: at most 20% of a doc's windows cross-doc-dup'd


def _win_hashes(toks: str) -> object:
    """array<string>: 64-bit-equivalent md5-prefix hash of every rolling
    DUPSUB_W-token window — built from the token ARRAY with transform/
    slice, so window construction is per-row JVM work with NO shuffle."""
    return F.expr(
        f"transform(sequence(1, size({toks}) - {DUPSUB_W} + 1), "
        f"i -> substring(md5(concat_ws(' ', slice({toks}, i, {DUPSUB_W}))), 1, 16))"
    )


def doc_dup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-substring stats, the hashed-window
    approximation of exact substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): a
    DUPSUB_W-token window is duplicated iff its hash occurs in >= 2
    DISTINCT documents; per doc, report total windows and how many of
    its window occurrences are duplicated, plus the keep gate.

    Scale shape: windows come off the token array per-row (no shuffle);
    then (hash, doc) partial-agg -> per-hash doc count -> rejoin — every
    exchange is post-reduction, nothing carries the corpus quadratically.
    Hot boilerplate hashes reduce to one row per (hash, doc) before the
    doc-count, so a window shared by millions of docs costs |docs(hash)|
    rows, not |occurrences|.

    Approximation bound: windows are keyed by a 64-bit md5 prefix, so at
    ~1e12 distinct windows (the 100 TB regime) birthday collisions mark
    ~n^2/2^65 ~ 2.7e10 window PAIRS — i.e. on the order of 1e-2 of docs
    gain a false dup window. Fine for a dup-RATE gate (the stat this
    feeds); widen the prefix (substring(md5,1,24) = 96 bits) if exact
    per-window attribution at that scale ever matters."""
    docs = load_table(spark, "documents", sf_dir)
    arr = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    wins = arr.filter(F.size("toks") >= DUPSUB_W).select(
        "doc_id", F.explode(_win_hashes("toks")).alias("whash")
    )
    cpd = wins.groupBy("whash", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    nd = cpd.groupBy("whash").agg(F.count(F.lit(1)).alias("ndocs"))
    per_doc = (
        cpd.join(nd, "whash")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_windows"),
            F.sum(F.when(F.col("ndocs") >= 2, F.col("c")).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            (
                F.coalesce("n_dup_windows", F.lit(0)) * 100
                <= F.coalesce("n_windows", F.lit(0)) * DUPSUB_MAX_PCT
            ).alias("dup_win_ok"),
        )
    )


_DUPSUB_ORACLE = f"""
        WITH wtok AS (
          SELECT doc_id, {_SQL_TOKENS.format(col="text")} AS toks FROM documents
        ),
        wins AS (
          SELECT doc_id,
                 substring(md5(array_to_string(toks[i:i+{DUPSUB_W}-1], ' ')), 1, 16)
                   AS whash
          FROM wtok, LATERAL UNNEST(
            generate_series(1, greatest(len(toks) - {DUPSUB_W} + 1, 0))) AS g(i)
        ),
        cpd AS (SELECT whash, doc_id, COUNT(*) AS c FROM wins GROUP BY whash, doc_id),
        nd AS (SELECT whash, COUNT(*) AS ndocs FROM cpd GROUP BY whash)
        SELECT cpd.doc_id,
               CAST(SUM(cpd.c) AS BIGINT) AS n_windows,
               CAST(SUM(CASE WHEN nd.ndocs >= 2 THEN cpd.c ELSE 0 END) AS BIGINT)
                 AS n_dup_windows
        FROM cpd JOIN nd ON cpd.whash = nd.whash
        GROUP BY cpd.doc_id
"""


_LANG_SCORE_COLS = [f"score_{lg}" for lg in sorted(LANG_MARKERS)]


@register(
    "doc_text_profile",
    oracle=f"""
        SELECT
          ts.doc_id, ts.n_chars, ts.n_tokens, ts.n_distinct_tokens,
          ts.total_token_chars, ts.avg_token_len,
          q.stop_hits, q.len_ok, q.word_len_ok, q.diversity_ok,
          q.stopword_ok, q.quality_score,
          {", ".join(f"l.{c}" for c in _LANG_SCORE_COLS)}, l.predicted_lang,
          fp.fingerprint,
          r.top_token_n, r.top_token_frac, r.n_bigrams, r.top_bigram_n,
          r.top_bigram_frac, r.dup_token_frac, r.rep_token_ok, r.rep_bigram_ok,
          COALESCE(ds.n_windows, 0) AS n_windows,
          COALESCE(ds.n_dup_windows, 0) AS n_dup_windows,
          COALESCE(ds.n_dup_windows, 0) * 100
            <= COALESCE(ds.n_windows, 0) * {DUPSUB_MAX_PCT} AS dup_win_ok,
          bp.n_bpe_tokens, bp.chars_per_bpe_token
        FROM ({_TOKSTATS_ORACLE}) ts
        LEFT JOIN ({_QUALITY_ORACLE}) q ON ts.doc_id = q.doc_id
        LEFT JOIN ({_LANGID_ORACLE}) l ON ts.doc_id = l.doc_id
        LEFT JOIN ({_FPRINT_ORACLE}) fp ON ts.doc_id = fp.doc_id
        LEFT JOIN ({_REPSTATS_ORACLE}) r ON ts.doc_id = r.doc_id
        LEFT JOIN ({_DUPSUB_ORACLE}) ds ON ts.doc_id = ds.doc_id
        LEFT JOIN ({_BPE_ORACLE}) bp ON ts.doc_id = bp.doc_id
    """,
    doc=(
        "The per-document text-analysis PROFILE: token counting, Gopher-"
        "style quality gates, language-ID, positional rolling-hash "
        "fingerprint, and repetition gates in ONE wide row per document — "
        "computed SINGLE-PASS: the corpus is tokenized once (persisted "
        "posexplode), the (doc, token) count table feeds stats + quality + "
        "language + top-token in one partial-aggregated pass, and only the "
        "order-sensitive families (fingerprint, bigrams) re-read the cached "
        "tokens. At 100 TB this is 1 scan+explode instead of the 5 the "
        "naive per-family composition would run. The ORACLE stays the "
        "five-way join of each family's independent derivation, so the "
        "fused plan is certified cell-for-cell against the unfused "
        "semantics; the individual functions remain the composable API."
    ),
)
def doc_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..registry import track

    docs = load_table(spark, "documents", sf_dir)
    # ONE scan of documents: the token ARRAY is cached, and both the
    # positional explode (stats/quality/language/fingerprint/bigrams)
    # and the rolling-window family read it.
    arr = track(
        docs.select("doc_id", tokens(F.col("text")).alias("toks")).persist()
    )
    tok = track(arr.select("doc_id", F.posexplode("toks").alias("pos", "token")).persist())

    # (doc, token) counts: one table answers stats, quality, language-ID
    # and the repetition top-token in a single further aggregation.
    tcnt = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    langs = sorted(LANG_MARKERS)
    fam = tcnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.count(F.lit(1)).alias("n_dis"),
        F.sum(F.length("token") * F.col("c")).alias("tchars"),
        F.sum(
            F.when(F.col("token").isin(STOPWORDS), F.col("c")).otherwise(0)
        ).alias("shits"),
        F.max("c").alias("top_token_n"),
        *[
            F.sum(
                F.when(F.col("token").isin(LANG_MARKERS[lg]), F.col("c")).otherwise(0)
            ).alias(f"score_{lg}")
            for lg in langs
        ],
    )

    # order-sensitive families over the SAME cached tokens
    pow_table = F.array(*[F.lit(p) for p in FP_POWS])
    term = (
        (token_hash(F.col("token")) % FP_P)
        * F.element_at(pow_table, (F.col("pos") % 16) + 1).cast("long")
    ) % FP_P
    fp = tok.groupBy("doc_id").agg((F.sum(term) % FP_P).alias("fingerprint"))

    w = W.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("nxt", F.lead("token").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "token", "nxt").alias("bigram"))
    )
    bstats = (
        big.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams_raw"), F.max("c").alias("top_bigram_n_raw"))
    )

    # cross-doc duplicated windows over the SAME cached token arrays
    wins = arr.filter(F.size("toks") >= DUPSUB_W).select(
        "doc_id", F.explode(_win_hashes("toks")).alias("whash")
    )
    cpd = wins.groupBy("whash", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    ndh = cpd.groupBy("whash").agg(F.count(F.lit(1)).alias("ndocs"))
    dsub = (
        cpd.join(ndh, "whash")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_windows_raw"),
            F.sum(F.when(F.col("ndocs") >= 2, F.col("c")).otherwise(0)).alias(
                "n_dup_windows_raw"
            ),
        )
    )

    prof = (
        fam.join(fp, "doc_id")
        .join(bstats, "doc_id", "left")
        .join(dsub, "doc_id", "left")
    )

    # gates/derived columns — identical expressions to the per-family ops
    len_ok = F.col("n_tok").between(20, 100000)
    word_len_ok = (F.col("tchars") * 10 >= F.col("n_tok") * 20) & (
        F.col("tchars") * 10 <= F.col("n_tok") * 120
    )
    diversity_ok = F.col("n_dis") * 10 >= F.col("n_tok")
    stopword_ok = F.col("shits") * 100 >= F.col("n_tok")
    score = (
        len_ok.cast("int") + word_len_ok.cast("int")
        + diversity_ok.cast("int") + stopword_ok.cast("int")
    )
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = None
    for lg in langs:
        cond = F.col(f"score_{lg}") == best
        pred = F.when(cond, F.lit(lg)) if pred is None else pred.when(cond, F.lit(lg))
    # rep-family null semantics: for docs WITH tokens but no bigram the
    # family coalesces bigram counts to 0; for docs with NO tokens the
    # whole family row is absent (null after the spine join below) —
    # n_tok.isNotNull() distinguishes the two on the fused row.
    has_tokens = F.col("n_tok").isNotNull()
    n_bigrams = F.when(has_tokens, F.coalesce("n_bigrams_raw", F.lit(0)))
    top_bigram_n = F.when(has_tokens, F.coalesce("top_bigram_n_raw", F.lit(0)))

    # the BPE pretokenizer count rides the spine scan (pure regex, no
    # explode) — computed where `text` is still in scope
    _bpe_n = F.col("_bpe_raw")
    return (
        docs.select(
            "doc_id",
            "n_chars",
            bpe_token_count(F.col("text")).alias("_bpe_raw"),
        )
        .join(prof, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("n_tok", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_dis", F.lit(0)).alias("n_distinct_tokens"),
            F.coalesce("tchars", F.lit(0)).alias("total_token_chars"),
            (F.col("tchars").cast("double") / F.col("n_tok")).alias("avg_token_len"),
            F.col("shits").alias("stop_hits"),
            len_ok.alias("len_ok"),
            word_len_ok.alias("word_len_ok"),
            diversity_ok.alias("diversity_ok"),
            stopword_ok.alias("stopword_ok"),
            score.alias("quality_score"),
            *[f"score_{lg}" for lg in langs],
            pred.alias("predicted_lang"),
            "fingerprint",
            "top_token_n",
            F.round(F.col("top_token_n").cast("double") / F.col("n_tok"), 9).alias(
                "top_token_frac"
            ),
            n_bigrams.alias("n_bigrams"),
            top_bigram_n.alias("top_bigram_n"),
            F.round(
                F.col("top_bigram_n_raw").cast("double") / F.col("n_bigrams_raw"), 9
            ).alias("top_bigram_frac"),
            F.round(
                (F.col("n_tok") - F.col("n_dis")).cast("double") / F.col("n_tok"), 9
            ).alias("dup_token_frac"),
            (F.col("top_token_n") * 100 <= F.col("n_tok") * REP_TOKEN_PCT).alias(
                "rep_token_ok"
            ),
            F.when(
                has_tokens,
                F.coalesce("top_bigram_n_raw", F.lit(0)) * 100
                <= F.coalesce("n_bigrams_raw", F.lit(0)) * REP_BIGRAM_PCT,
            ).alias("rep_bigram_ok"),
            F.coalesce("n_windows_raw", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows_raw", F.lit(0)).alias("n_dup_windows"),
            (
                F.coalesce("n_dup_windows_raw", F.lit(0)) * 100
                <= F.coalesce("n_windows_raw", F.lit(0)) * DUPSUB_MAX_PCT
            ).alias("dup_win_ok"),
            _bpe_n.cast("long").alias("n_bpe_tokens"),
            F.when(
                _bpe_n > 0,
                F.round(F.col("n_chars").cast("double") / _bpe_n, 9),
            ).alias("chars_per_bpe_token"),
        )
    )
