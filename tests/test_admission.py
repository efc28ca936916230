"""S2 admission filter: signature validation over a request batch."""


def test_admit_signed_requests(spark):
    from twilio_event_streams_reporting_example_spark.sources.admission import (
        admit_signed_requests,
        compute_signature,
    )

    token = "test-auth-token"
    good_url = "https://example.com/events"
    rows = [
        (good_url, compute_signature(token, good_url), "ok"),
        (good_url, "forged-signature", "forged"),
        ("https://evil.example.com/events", compute_signature(token, good_url), "replayed"),
    ]
    df = spark.createDataFrame(rows, "url string, x_twilio_signature string, tag string")
    admitted = admit_signed_requests(df, token).collect()
    assert [r["tag"] for r in admitted] == ["ok"]
