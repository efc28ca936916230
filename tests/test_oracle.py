"""Driver-gate replica: every registered query with an oracle must match
DuckDB exactly (row count + columns + order-insensitive values)."""

import pytest

from twilio_event_streams_reporting_example_spark.registry import all_queries

from .oracle_harness import compare

_WITH_ORACLE = sorted(
    name for name, spec in all_queries().items() if spec.oracle is not None
)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    compare(spark, name, sf_dir)


def test_all_queries_return_rows(spark, sf_dir):
    """Weak check for oracle-less queries + general smoke: every registered
    query runs and yields a stable schema."""
    for name, spec in all_queries().items():
        df = spec.fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        df.limit(5).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
