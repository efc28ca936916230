"""Physical-plan shape assertions: the plans we designed are the plans
we ship. These are scale guarantees (no accidental cartesian products,
filters reaching the scan, dimensions broadcast, shuffle-free maps) —
a regression here is a 100 TB incident even when results stay correct."""

import pytest

from twilio_event_streams_reporting_example_spark.registry import all_queries


def _plan(spark, name, sf_dir) -> str:
    df = all_queries()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_events_filter_pushdown(spark, sf_dir):
    """Filters and column pruning must reach the parquet scan."""
    plan = _plan(spark, "events_filter_project", sf_dir)
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, "revenue_by_nation", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_no_nested_loop_in_pairwise_operators(spark, sf_dir):
    """Every pairwise operator must block through an equi-join — a
    nested-loop or cartesian plan is the canonical scale-killer."""
    for name in (
        "embedding_neardup_pairs",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "simhash_neardup_pairs",
        "knn_lsh_bucketed",
        "corpus_prep_pipeline",
    ):
        plan = _plan(spark, name, sf_dir)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_knn_bruteforce_broadcasts_queries_only(spark, sf_dir):
    """The exact baseline is allowed its broadcast cross join — but only
    with the (tiny) query set on the broadcast side."""
    plan = _plan(spark, "knn_bruteforce_cosine", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan  # by design: |Q| rows broadcast


def test_multimodal_features_shuffle_free(spark, sf_dir):
    """Feature extraction is a pure scan→map: zero exchanges."""
    plan = _plan(spark, "multimodal_features", sf_dir)
    assert "Exchange" not in plan


def test_taskrouter_plan_has_no_cartesian(spark):
    plan = _plan(spark, "taskrouter_segments", "unused")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    # codegen stages are marked '*(n)' in executedPlan().toString()
    plan = _plan(spark, "events_filter_project", sf_dir)
    assert "*(1)" in plan
