"""Invariants of the incremental corpus-ingestion dedup beyond the
oracle hash match: the verdict table is a total function over the batch,
tier precedence holds, and admission is consistent with the standalone
Jaccard pair surface."""

from pyspark.sql import functions as F

from twilio_event_streams_reporting_example_spark.operators.dedup import (
    INC_BATCH_MOD,
    INC_JACCARD_PCT,
    corpus_incremental_dedup,
)
from twilio_event_streams_reporting_example_spark.registry import release_caches
from twilio_event_streams_reporting_example_spark.sources.tables import load_table


def test_verdict_is_total_and_exclusive(spark, sf_dir):
    try:
        out = corpus_incremental_dedup(spark, sf_dir).cache()
        docs = load_table(spark, "documents", sf_dir)
        n_new = docs.filter(F.col("doc_id") % INC_BATCH_MOD == 0).count()
        # exactly one verdict row per incoming doc
        assert out.count() == n_new
        assert out.select("doc_id").distinct().count() == n_new
        # verdict domain is closed
        verdicts = {r["verdict"] for r in out.select("verdict").distinct().collect()}
        assert verdicts <= {"batch_dup", "exact_dup", "near_dup", "kept"}
        # kept rows carry no match; dup rows always carry one
        assert out.filter(
            (F.col("verdict") == "kept") & F.col("matched_doc_id").isNotNull()
        ).count() == 0
        assert out.filter(
            (F.col("verdict") != "kept") & F.col("matched_doc_id").isNull()
        ).count() == 0
        # near-dup scores respect the admission threshold
        bad = out.filter(
            (F.col("verdict") == "near_dup")
            & (F.col("inter") * 100 < F.col("uni") * INC_JACCARD_PCT)
        ).count()
        assert bad == 0
        # matches point outside the batch except for within-batch dups
        assert out.filter(
            (F.col("verdict").isin("exact_dup", "near_dup"))
            & (F.col("matched_doc_id") % INC_BATCH_MOD == 0)
        ).count() == 0
        assert out.filter(
            (F.col("verdict") == "batch_dup")
            & (
                (F.col("matched_doc_id") % INC_BATCH_MOD != 0)
                | (F.col("matched_doc_id") >= F.col("doc_id"))
            )
        ).count() == 0
        out.unpersist()
    finally:
        release_caches()


def test_exact_tier_matches_hash_equality(spark, sf_dir):
    """Every exact_dup's matched corpus doc has byte-identical text."""
    try:
        out = corpus_incremental_dedup(spark, sf_dir)
        docs = load_table(spark, "documents", sf_dir).select(
            "doc_id", F.md5("text").alias("h")
        )
        joined = (
            out.filter(F.col("verdict") == "exact_dup")
            .join(docs.select(F.col("doc_id"), F.col("h").alias("h_new")), "doc_id")
            .join(
                docs.select(
                    F.col("doc_id").alias("matched_doc_id"), F.col("h").alias("h_old")
                ),
                "matched_doc_id",
            )
        )
        assert joined.filter(F.col("h_new") != F.col("h_old")).count() == 0
    finally:
        release_caches()
