"""Local replica of the driver's correctness gate: run a registered query
in Spark AND its oracle SQL in DuckDB, then compare row-count, column
names, and an order-insensitive value hash. Strict by design — if this
passes, any reasonable driver normalization passes too."""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb

from twilio_event_streams_reporting_example_spark.sources.tables import TABLES


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return repr(v)  # bit-exact doubles by design
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        # Keep any tz offset: the driver's canonicalization does, so a
        # TIMESTAMPTZ-producing oracle (e.g. DuckDB to_timestamp) must
        # fail here too, not just in the driver.
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v))
    try:
        import numpy as np

        if isinstance(v, np.floating):
            return repr(float(v))
        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, np.bool_):
            return str(bool(v))
        if isinstance(v, np.datetime64):
            return _canon(v.astype("datetime64[us]").item())
    except ImportError:
        pass
    return str(v)


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_canon(row[c]) for c in cols)
        for row in df_pandas.to_dict("records")
    ]
    rows.sort()
    return cols, rows


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(spark, name: str, sf_dir: str) -> None:
    """Assert the Spark query matches its DuckDB oracle exactly."""
    from twilio_event_streams_reporting_example_spark.registry import all_queries

    from twilio_event_streams_reporting_example_spark.registry import (
        release_caches,
        resolve_oracle,
    )

    spec = all_queries()[name]
    assert spec.oracle is not None, f"{name} has no oracle (rows-only check)"
    try:
        spark_pdf = spec.fn(spark, sf_dir).toPandas()
    finally:
        release_caches()  # result consumed — drop this query's tracked blocks
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.sql(resolve_oracle(spec)).df()
    finally:
        con.close()

    s_cols, s_rows = _normalize(spark_pdf)
    d_cols, d_rows = _normalize(duck_pdf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
