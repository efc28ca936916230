"""Signature-based admission filter (S2).

The reference authenticates each webhook POST with the Twilio request
signature: base64(HMAC-SHA1(auth_token, url + sorted form params)) —
with an empty param set for the Event Streams JSON webhook, the signed
string is just the URL (reference middleware/
authenticate-twilio-signature.js:5, ``client.validateRequest(token,
signature, url, {})``).

In the engine this is an ingest-gateway concern (SURVEY §2.1 marks it
out-of-engine), modeled as an admission filter over a batch-of-requests
DataFrame: compute the expected signature and keep matching rows. The
HMAC runs in an Arrow-batched pandas UDF — acceptable because admission
is a per-REQUEST (batch envelope) operation, not per-event: its row
count is orders of magnitude below the event hot path.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def compute_signature(auth_token: str, url: str) -> str:
    """Twilio request signature for a JSON webhook (no form params)."""
    mac = hmac.new(auth_token.encode(), url.encode(), hashlib.sha1)
    return base64.b64encode(mac.digest()).decode()


def _signature_udf(auth_token: str):
    @pandas_udf("string")
    def sig(urls: Iterator[pd.Series]) -> Iterator[pd.Series]:
        token = auth_token.encode()
        for batch in urls:
            yield batch.map(
                lambda u: base64.b64encode(
                    hmac.new(token, str(u).encode(), hashlib.sha1).digest()
                ).decode()
            )

    return sig


def admit_signed_requests(
    requests: DataFrame,
    auth_token: str,
    url_col: str = "url",
    signature_col: str = "x_twilio_signature",
) -> DataFrame:
    """Keep only requests whose signature validates; rejected rows are
    dropped exactly like the reference's 403 path (middleware:12-13)."""
    expected = _signature_udf(auth_token)(F.col(url_col))
    return requests.filter(F.col(signature_col) == expected)


# --------------------------------------------------- registered S2 evidence

from ..registry import register  # noqa: E402

DEMO_AUTH_TOKEN = "graft_demo_auth_token"

# Request fixture with signatures PRECOMPUTED once (standard Python
# hmac/sha1, embedded as literals — independent of the engine's UDF
# implementation). Rows 1/3/6 carry another request's signature and row 5
# carries a corrupted one: the admission filter must drop exactly those,
# mirroring the reference middleware's 403 path
# (middleware/authenticate-twilio-signature.js:12-13).
_URL = "https://reporting.example.com/events?batch={i}"
_ADMISSION_FIXTURE = [
    (0, _URL.format(i=0), "bqC+/np3e9GUXIX5Bmq91HeMwxw="),  # valid
    (1, _URL.format(i=1), "bqC+/np3e9GUXIX5Bmq91HeMwxw="),  # replayed sig of 0
    (2, _URL.format(i=2), "vZM/AVHBTJ84zY+BhweEaqHrg0w="),  # valid
    (3, _URL.format(i=3), "fV/XzYBqNJxovjYv1Gna1ZLTvJU="),  # sig of batch 4
    (4, _URL.format(i=4), "fV/XzYBqNJxovjYv1Gna1ZLTvJU="),  # valid
    (5, _URL.format(i=5), "zw0lnK2c5nF+TGPZKMzS4JZtOgX="),  # corrupted tail
    (6, _URL.format(i=6), ""),                               # missing header
    (7, _URL.format(i=7), "zUqsVkkVfe6qLWoOHmTq/FeQBik="),  # valid
]


@register(
    "admission_signed_requests",
    priority=0,  # S2: the one §2.1 row that never had driver evidence
    oracle="""
        SELECT * FROM (VALUES
          (CAST(0 AS BIGINT), 'https://reporting.example.com/events?batch=0',
           'bqC+/np3e9GUXIX5Bmq91HeMwxw='),
          (CAST(2 AS BIGINT), 'https://reporting.example.com/events?batch=2',
           'vZM/AVHBTJ84zY+BhweEaqHrg0w='),
          (CAST(4 AS BIGINT), 'https://reporting.example.com/events?batch=4',
           'fV/XzYBqNJxovjYv1Gna1ZLTvJU='),
          (CAST(7 AS BIGINT), 'https://reporting.example.com/events?batch=7',
           'zUqsVkkVfe6qLWoOHmTq/FeQBik=')
        ) AS t(request_id, url, x_twilio_signature)
    """,
    doc=(
        "S2 webhook-signature admission (reference middleware/"
        "authenticate-twilio-signature.js): recompute base64(HMAC-SHA1("
        "auth_token, url)) per request in an Arrow-batched pandas UDF and "
        "keep only matching rows. The fixture's valid signatures are "
        "precomputed literals (independent of the UDF); replayed, "
        "corrupted, and missing signatures must all be rejected — the "
        "golden VALUES oracle lists exactly the admissible rows."
    ),
)
def admission_signed_requests(spark, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(
        _ADMISSION_FIXTURE, "request_id long, url string, x_twilio_signature string"
    )
    return admit_signed_requests(df, DEMO_AUTH_TOKEN).select(
        "request_id", "url", "x_twilio_signature"
    )
