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
