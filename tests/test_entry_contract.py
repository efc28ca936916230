"""Entry-point contract smoke — the <60s, no-Spark guard.

Round-12 post-mortem: a half-finished edit left an undefined name
inside `_ccitt_item_spec`; `oracle_sql()` raised NameError at import
of the oracle map, the driver wrote `{}` to CORRECTNESS_r12.json, and
the board went 50/50 → 0/50 — yet no test under a minute would have
caught it, because nothing outside the (35-min) oracle harness ever
CALLED `oracle_sql()` or materialized the worker-side spec items.

This module is that guard. It must stay cheap (no SparkSession, no
parquet reads) and is ALSO invoked by tools/pre_snapshot_gate.py's
always-on fast path, so an entry-point exception can never again
reach a snapshot without a red test.
"""

import builtins
import importlib
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # pytest rootdir already has it; the gate's
    sys.path.insert(0, REPO)  # in-process import path may not


def _entry():
    return importlib.import_module("__spark_entry__")


def test_queries_and_oracles_align():
    e = _entry()
    q = e.queries()
    o = e.oracle_sql()
    assert len(q) == 50, f"queries() must expose the pinned 50, got {len(q)}"
    assert set(o) <= set(q), f"orphan oracles: {set(o) - set(q)}"
    for name, sql in o.items():
        assert isinstance(sql, str) and sql.strip(), f"empty oracle: {name}"
    assert all(callable(fn) for fn in q.values())


def test_worker_side_spec_code_executes():
    """Materialize one item per closed-form certification family whose
    spec code runs on Python WORKERS inside the registered query — the
    exact code path that broke in round 12 (workers re-import the
    module, so an import-time-fine but call-time-broken spec only
    explodes inside executor tracebacks)."""
    mm = importlib.import_module(
        "twilio_event_streams_reporting_example_spark.operators.multimodal"
    )
    # last CCITT item: exercises the newest branch of _ccitt_item_spec
    payload, expect, black = mm._ccitt_item(mm.CCITT_N_ITEMS - 1)
    assert payload[:2] in (b"II", b"MM") and black > 0
    assert expect.ndim == 3
    # first + last stored-fixture payloads: drives every _STORED_*_FROM
    # range-map branch that the fixture sampler unpacks
    rows = mm.media_fixture_rows()
    assert len(rows) == mm.STORED_N_ITEMS
    for j in (0, mm.STORED_N_ITEMS - 1):
        m = mm._stored_payload_formula(j)
        assert len(m) == 3
    # one oracle-rows render per VALUES-backed family that f-strings
    # into oracle_sql() — a raise here is exactly the r12 blast
    # radius. Count ROW-LEADING markers `(k, ` rather than every
    # parenthesis, so a future value rendered with parens can't
    # silently break the invariant's meaning (round-13 advisor note).
    rows_txt = mm._ccitt_oracle_rows()
    row_ids = [
        int(m) for m in re.findall(r"(?m)^\s*\((\d+),", rows_txt)
    ]
    assert row_ids == list(range(mm.CCITT_N_ITEMS))


def test_fixture_rows_survive_pep594_removal(monkeypatch):
    """On Python >=3.13, aifc/sunau no longer exist (PEP 594) — the
    third-party stored items 92-95 must then come from the committed
    parquet, byte-identical to the builder output, so the always-on
    entry smoke passes rather than errors on such a host. Simulate the
    removal by making those imports raise."""
    mm = importlib.import_module(
        "twilio_event_streams_reporting_example_spark.operators.multimodal"
    )
    want = {
        j: (k, p)
        for j, k, p in mm.media_fixture_rows()
        if j >= mm._STORED_XAU_FROM
    }

    real_import = builtins.__import__

    def no_pep594(name, *a, **kw):
        if name in ("aifc", "sunau", "audioop"):
            raise ImportError(f"No module named {name!r} (simulated 3.13)")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_pep594)
    mm._STORED_AT_REST_CACHE.clear()
    try:
        rows = mm.media_fixture_rows()
    finally:
        monkeypatch.undo()
        mm._STORED_AT_REST_CACHE.clear()
    got = {j: (k, p) for j, k, p in rows if j >= mm._STORED_XAU_FROM}
    assert got == want, "parquet fallback must serve identical bytes"
    assert len(rows) == mm.STORED_N_ITEMS


def test_fixture_rows_survive_broken_image_library(monkeypatch):
    """A host where libpng/libtiff LOAD but the encode call FAILS (ABI
    drift, broken install) raises RuntimeError from _ximage_payload —
    the documented contract — and media_fixture_rows() must fall back
    to the committed parquet for items 96-103 exactly as it does for
    an absent library (round-14 advisor finding: the fallback caught
    only ImportError/OSError)."""
    mm = importlib.import_module(
        "twilio_event_streams_reporting_example_spark.operators.multimodal"
    )
    want = {
        j: (k, p)
        for j, k, p in mm.media_fixture_rows()
        if j >= mm._STORED_XIMG_FROM
    }

    def broken(_k):
        raise RuntimeError("libpng write failed: simulated broken lib")

    monkeypatch.setattr(mm, "_ximage_payload", broken)
    mm._STORED_AT_REST_CACHE.clear()
    try:
        rows = mm.media_fixture_rows()
    finally:
        monkeypatch.undo()
        mm._STORED_AT_REST_CACHE.clear()
    got = {j: (k, p) for j, k, p in rows if j >= mm._STORED_XIMG_FROM}
    assert got == want, "parquet fallback must serve identical bytes"
    assert len(rows) == mm.STORED_N_ITEMS


def test_oracle_sql_renders_ccitt_window():
    """The tiff_ccitt VALUES block must carry every certified item —
    catches a spec/count drift between kernel and oracle."""
    e = _entry()
    mm = importlib.import_module(
        "twilio_event_streams_reporting_example_spark.operators.multimodal"
    )
    sql = e.oracle_sql()["multimodal_media_ops"]
    assert f"({mm.CCITT_N_ITEMS - 1}, " in sql
