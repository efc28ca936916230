"""Write fixtures/media_payloads.parquet — the committed data-at-rest
media fixture the `stored_payload_decode` section of
`multimodal_media_ops` scans.

Deterministic: every payload comes from `media_fixture_rows()` (the
same closed-form generators the in-gate codec sections certify), so
re-running this script is a no-op byte-wise at the row level.
tests/test_media_fixture.py pins stored bytes == builder output.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from twilio_event_streams_reporting_example_spark.operators.multimodal import (
    MEDIA_FIXTURE_PATH,
    media_fixture_rows,
)


def main() -> None:
    rows = media_fixture_rows()
    table = pa.table(
        {
            "item_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
        }
    )
    os.makedirs(os.path.dirname(MEDIA_FIXTURE_PATH), exist_ok=True)
    pq.write_table(table, MEDIA_FIXTURE_PATH, compression="zstd")
    total = sum(len(r[2]) for r in rows)
    print(f"wrote {len(rows)} payloads ({total} bytes raw) -> {MEDIA_FIXTURE_PATH}")


if __name__ == "__main__":
    main()
