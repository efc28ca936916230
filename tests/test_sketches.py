"""Unit tests for the bounded-state sketch machinery behind
dedup_exact_events' sections (operators/dedup.py): Misra-Gries heavy
hitters must be EXACT above the threshold regardless of partition
layout (the candidate set may vary; the verified output may not), and
the per-partition state bound must actually hold."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from twilio_event_streams_reporting_example_spark.operators.dedup import (
    HH_MG_CAPACITY,
    _heavy_hitters,
    _mg_candidates,
)


def _stream_df(spark, rows, n_parts):
    return spark.createDataFrame(
        pd.DataFrame({"k": rows}), schema="k long"
    ).repartition(n_parts)


def test_heavy_hitters_exact_under_adversarial_layouts(spark):
    """A 10%-heavy key hidden in a 90%-unique tail must be found with
    its EXACT count under several partition layouts — including a
    round-robin repartition that scatters the heavy key so no single
    partition sees it concentrated."""
    n = 20_000
    heavy = [0] * (n // 10)
    tail = list(range(1, n - len(heavy) + 1))
    rows = []
    # interleave: heavy key spread as thinly as possible
    hi, ti = 0, 0
    for i in range(n):
        if i % 10 == 0 and hi < len(heavy):
            rows.append(0)
            hi += 1
        else:
            rows.append(tail[ti])
            ti += 1
    for n_parts in (1, 7, 32):
        df = _stream_df(spark, rows, n_parts)
        out = _heavy_hitters(df, "k", "long", 10, HH_MG_CAPACITY).collect()
        assert [(r["k"], r["cnt"], r["n"]) for r in out] == [(0, n // 10, n)], (
            n_parts,
            out,
        )


def test_heavy_hitters_no_false_positives(spark):
    """Keys just UNDER the threshold must not appear even though MG
    certainly lists them as candidates (exact verification filters)."""
    # two keys at 9.9% and 10.0% of n=10000, tail unique
    n = 10_000
    rows = [1] * 1000 + [2] * 990 + list(range(10, 10 + n - 1990))
    df = _stream_df(spark, rows, 8)
    out = _heavy_hitters(df, "k", "long", 10, HH_MG_CAPACITY).collect()
    assert [(r["k"], r["cnt"]) for r in out] == [(1, 1000)]


def test_mg_candidate_state_bound(spark):
    """Each partition contributes at most HH_MG_CAPACITY candidate rows
    (the bounded-state contract that distinguishes this plan from a
    full groupBy at 100 TB)."""
    n, n_parts = 50_000, 4
    rows = list(range(n))  # all-unique worst case
    df = _stream_df(spark, rows, n_parts)
    cand = _mg_candidates(df, "k", "long", HH_MG_CAPACITY)
    assert cand.count() <= HH_MG_CAPACITY * n_parts


def test_mg_guarantee_margin_documented():
    """The registered thresholds must respect the merged-undercount
    bound n/(k+1): a key at the threshold cannot be evicted from every
    partition's summary."""
    from twilio_event_streams_reporting_example_spark.operators.dedup import (
        HH_PHI_PCT,
        HH_SCALE_MG_CAPACITY,
        HH_SCALE_PHI_PCT,
    )

    assert HH_PHI_PCT / 100 > 1 / (HH_MG_CAPACITY + 1)
    assert HH_SCALE_PHI_PCT / 100 > 1 / (HH_SCALE_MG_CAPACITY + 1)

def test_heavy_hitters_null_key_counted(spark):
    """NULL is a real group: a dataset whose modal key is NULL must
    surface it (pandas value_counts drops NaN by default, which would
    silently exclude NULL from MG candidacy; the recount join must be
    null-safe or the candidate would vanish between the two stages).
    Matches SQL GROUP BY semantics, which keep the NULL group."""
    n = 10_000
    rows = [None] * (n // 5) + [f"k{i}" for i in range(n - n // 5)]
    df = spark.createDataFrame(
        pd.DataFrame({"k": rows}), schema="k string"
    ).repartition(8)
    out = _heavy_hitters(df, "k", "string", 10, HH_MG_CAPACITY).collect()
    assert [(r["k"], r["cnt"], r["n"]) for r in out] == [(None, n // 5, n)]


def test_quantile_cert_survives_heavy_ties(spark):
    """Tie-correct cert: with 96% of values identical, count(<=qv) at the
    median is ~0.96n — the old one-sided |count(<=qv) - 0.5n| test reads
    that as a contract violation even though percentile_approx is
    perfectly in-contract (SOME rank in the tied value's rank interval
    is within eps*n of q*n). The interval form must certify 1 for every
    q, and on untied uniform data it must also still certify."""
    from twilio_event_streams_reporting_example_spark.operators.dedup import (
        _quantile_cert_df,
    )

    n = 10_000
    tied = spark.createDataFrame(
        pd.DataFrame({"value": [7.0] * (n * 96 // 100)
                      + [float(i) for i in range(n * 4 // 100)]}),
        schema="value double",
    ).repartition(8)
    out = {r["event_type"]: r["m1"] for r in _quantile_cert_df(tied).collect()}
    assert out == {"q50": 1, "q90": 1, "q99": 1}, out

    uniform = spark.createDataFrame(
        pd.DataFrame({"value": [float(i) for i in range(n)]}),
        schema="value double",
    ).repartition(8)
    out_u = {r["event_type"]: r["m1"] for r in _quantile_cert_df(uniform).collect()}
    assert out_u == {"q50": 1, "q90": 1, "q99": 1}, out_u


def test_dedup_exact_documents_scale_param(spark, sf_dir):
    """include_scale_section=False drops the synthetic 1M-row
    certification sections (consumers wanting just the corpus dedup);
    the default includes both — and is environment-independent, so the
    driver's certified row set cannot silently change (r7 ADVICE)."""
    import os

    from twilio_event_streams_reporting_example_spark.operators.dedup import (
        dedup_exact_documents,
    )

    slim = dedup_exact_documents(spark, sf_dir, include_scale_section=False)
    sections = {r["section"] for r in slim.select("section").distinct().collect()}
    assert sections == {"corpus"}
    assert "SPARK_GRAFT_SKIP_SCALE_SECTIONS" not in os.environ
    full = dedup_exact_documents(spark, sf_dir)
    sections = {r["section"] for r in full.select("section").distinct().collect()}
    assert "corpus" in sections and len(sections) > 1
