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
