"""Multimodal plumbing tests beyond the registered oracles."""

import pytest
from pyspark.sql import functions as F


def test_frame_sample_shape(spark, sf_dir):
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        FRAME_STRIDE,
        frame_sample,
        with_payload,
    )
    from twilio_event_streams_reporting_example_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir).limit(20)
    mm = with_payload(docs)
    frames = frame_sample(mm)
    joined = (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("max_idx"))
        .join(mm.select("doc_id", F.length("payload").alias("n_bytes")), "doc_id")
        .collect()
    )
    assert len(joined) == 20
    for r in joined:
        expected = (r["n_bytes"] + FRAME_STRIDE - 1) // FRAME_STRIDE
        assert r["n"] == expected
        assert r["max_idx"] == expected - 1


def test_real_decoder_is_gated():
    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        decode_real_media,
    )

    with pytest.raises(NotImplementedError):
        decode_real_media(b"\x89PNG", "image/png")


def test_resize_shuffle_free(spark, sf_dir):
    """The resize kernel is a pure scan→mapInPandas plan — no exchange."""
    from twilio_event_streams_reporting_example_spark.registry import all_queries

    from twilio_event_streams_reporting_example_spark.operators.multimodal import (
        multimodal_resize,
    )

    df = multimodal_resize(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
