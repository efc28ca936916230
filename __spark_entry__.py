"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``twilio_event_streams_reporting_example_spark``;
this module is the thin registry adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Pandas-UDF queries (mapInPandas / applyInPandasWithState) cloudpickle
# references to this package, so PYTHON WORKERS must be able to import it
# too. Workers inherit the driver process env at spawn (first UDF use —
# after this import), so exporting PYTHONPATH here makes the contract
# independent of the harness's working directory.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)
if _REPO_DIR not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)

from pyspark.sql import DataFrame, SparkSession

from twilio_event_streams_reporting_example_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship mirrors the reference's report surface (segments with
    queue-wait measures): as-of pairing of view→purchase per user — the
    D1/F6 queue_time operator — aggregated per user session count.
    """
    from twilio_event_streams_reporting_example_spark.operators.asof import (
        asof_view_to_purchase,
    )

    return asof_view_to_purchase(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases)."""
    return registry.oracle_sql()
