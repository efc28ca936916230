"""Query registry: the single source of truth behind ``__spark_entry__.py``.

Every operator module registers its driver-checkable queries here with an
optional DuckDB oracle SQL. The driver contract (see ``__spark_entry__.py``)
compares the Spark result against the oracle at sf=0.01 by row-count +
schema + order-insensitive value-hash, so:

  - every computed column is aliased IDENTICALLY in Spark and SQL;
  - float aggregation goes through DECIMAL (exact, order-independent) or
    produces bit-identical doubles in both engines;
  - every top-k / latest-per-key has a deterministic total tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""
    bench: bool = True  # False: correctness-gated harness (streaming /
    #                     materialization workflows), not a batch query


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "", bench: bool = True):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Release caches left by the PREVIOUS query before building this
            # one: operators persist() intermediates for legitimate stage
            # reuse within a single query (shingle sets, minhash signatures,
            # CC labels), but across a long driver session running the whole
            # registry those cached blocks would accumulate on executors.
            # localCheckpoint-based session memos are unaffected.
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # type: ignore[attr-defined]
        _REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, doc=doc or (fn.__doc__ or ""), bench=bench
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are side-effectful: each module's @register calls populate
    # _REGISTRY. Keep this list in sync with SURVEY.md §2 coverage.
    from .plans import relational  # noqa: F401
    from .operators import asof  # noqa: F401
    from .operators import sessionize  # noqa: F401
    from .operators import latest_state  # noqa: F401
    from .operators import pair_deltas  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import textstats  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .operators import sampling  # noqa: F401
    from .operators import vectorized  # noqa: F401
    from .sources import bucketing  # noqa: F401
    from .plans import taskrouter_queries  # noqa: F401

    _LOADED = True
