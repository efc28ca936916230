"""Parquet table loaders for the driver's synthetic star schema + event/LLM
tables (TESTDATA.md).

Columnar parquet scan is the engine's default source: Catalyst pushes
filters and prunes columns at the scan (check ``PushedFilters`` /
``ReadSchema`` in ``df.explain("formatted")``), which replaces the
reference's LokiJS full-collection scans (reference routes/index.js:9-10).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    # The caller may hand us a session without our configs (e.g. the verify
    # driver builds its own); both are runtime-settable. UTC is required for
    # oracle comparability: toPandas() renders timestamps in session-local
    # time, so a non-UTC driver session would value-mismatch DuckDB on every
    # date_trunc'd column even though the results are correct in UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some driver
        # datasets (Spark reads it as long under nanosAsLong) and as
        # TIMESTAMP(MICROS) in others — adapt on the observed type so both
        # generations load to the same session-TZ TimestampType.
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # nanos-as-long → truncate to micros (DuckDB's nanos handling)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # reinterpret the wall clock in the (UTC) session timezone;
            # values are unchanged
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif ts_type != "timestamp":
            # Any other dtype is schema drift (e.g. string/double from a
            # malformed dataset); casting would silently yield nulls —
            # fail loud instead.
            raise TypeError(f"events.ts: unexpected dtype {ts_type!r}")
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so SQL-form queries can run."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
