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
