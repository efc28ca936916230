"""Bucketed-table materialization: the co-located join storage layout.

The 100 TB story for repeated fact-to-fact joins: hash-bucket BOTH
tables on the join key at write time (``bucketBy`` + ``sortBy``), and
every later equi-join on that key is exchange-free — the scan itself
satisfies the join's required hash distribution, so the sort-merge join
runs scan→join with NO shuffle of either side. One write-time shuffle
amortized over every downstream join; this is the layout a warehouse
picks for orders⋈lineitem-shaped workloads instead of paying the
two-sided exchange per query.

The reference has no storage layout choices at all (in-memory LokiJS,
/root/reference/app.js:13); this operator is the Spark-native answer to
"the same join runs on every report".

Registered query contract: results are identical to the plain parquet
join (the DuckDB oracle), and ``tests/test_plans.py`` pins the physical
plan — exactly ONE exchange (the final small aggregation), zero
exchanges between the bucketed scans and the join.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .tables import load_table

N_BUCKETS = 8

# session-scoped registry of already-materialized bucketed table pairs:
# key -> ((orders_table, lineitem_table), base_dir)
_BUCKETED: dict[str, tuple[tuple[str, str], str]] = {}


def _cleanup_bucketed() -> None:
    """Drop the catalog tables and remove the on-disk layout at process
    exit — without this, every driver/test run leaks a temp directory and
    two catalog entries."""
    spark = SparkSession.getActiveSession()
    for names, base in _BUCKETED.values():
        if spark is not None:
            for t in names:
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {t}")
                except Exception:
                    pass  # JVM already gone; rmtree below still runs
        shutil.rmtree(base, ignore_errors=True)
    _BUCKETED.clear()


atexit.register(_cleanup_bucketed)


def bucketed_orders_lineitem(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize orders + lineitem bucketed by order key (once per
    session per sf_dir); returns the catalog table names.

    The suffix hashes (sf_dir, pid): deterministic WITHIN a process — a
    rerun in the same session overwrites its previous layout instead of
    accumulating orphans — but unique ACROSS processes, so two concurrent
    runs on the same sf_dir can't overwrite or atexit-delete each other's
    live bucketed files. The atexit hook removes this process's directory."""
    key = f"{spark.sparkContext.applicationId}/{sf_dir}"
    if key in _BUCKETED:
        return _BUCKETED[key][0]
    suffix = hashlib.md5(f"{sf_dir}|{os.getpid()}".encode()).hexdigest()[:8]
    names = (f"bkt_orders_{suffix}", f"bkt_lineitem_{suffix}")
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_bucketed_{suffix}")
    (
        load_table(spark, "orders", sf_dir)
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{base}/orders")
        .mode("overwrite")
        .saveAsTable(names[0])
    )
    (
        load_table(spark, "lineitem", sf_dir)
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{base}/lineitem")
        .mode("overwrite")
        .saveAsTable(names[1])
    )
    _BUCKETED[key] = (names, base)
    return names


def colocated_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exchange-free orders⋈lineitem join over the bucketed layout.
    ``hint("merge")`` pins sort-merge so the demo isn't silently turned
    into a broadcast join at small scale — at real scale both sides are
    fact-sized and broadcast is off the table anyway."""
    o_name, l_name = bucketed_orders_lineitem(spark, sf_dir)
    orders = spark.table(o_name)
    items = spark.table(l_name)
    return orders.hint("merge").join(
        items, orders["o_orderkey"] == items["l_orderkey"]
    )


@register(
    "bucketed_orders_lineitem_join",
    bench=False,  # materialization harness: writes the layout, then queries
    priority=0,  # never had a driver correctness row before round 5 — pin it
    oracle="""
        SELECT
          o.o_orderpriority,
          COUNT(*) AS n_items,
          CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
    """,
    doc=(
        "Co-located join over write-time-bucketed tables: orders and "
        "lineitem are materialized with bucketBy(8, orderkey)+sortBy, so "
        "the sort-merge join needs NO exchange on either side — the only "
        "shuffle in the whole plan is the final 5-row priority rollup. "
        "Results must equal the plain parquet join (the oracle); the "
        "plan-shape test pins the single-exchange property."
    ),
)
def bucketed_orders_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    jo = colocated_join_df(spark, sf_dir)
    return jo.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )
