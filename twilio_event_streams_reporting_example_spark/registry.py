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
    priority: int = 5  # ordering class for the driver's correctness window
    seq: int = 0  # registration order within a priority class


_REGISTRY: dict[str, QuerySpec] = {}

# The driver's correctness gate checks the FIRST 50 entries of ``queries()``
# in dict order. ``priority`` budgets that window explicitly:
#   0 — the TaskRouter domain pipeline + streaming harnesses (the queries
#       that prove the reference's own semantics) and anything else that
#       must never fall out of the window;
#   5 — default: one query per distinct operator;
#   9 — tail: variants of an in-window query (same operator, alternate
#       physical strategy) whose exact form is still oracle-checked by the
#       local replica (tests/test_oracle.py) every round.
DRIVER_WINDOW = 50


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = True,
    priority: int = 5,
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            bench=bench,
            priority=priority,
            seq=len(_REGISTRY),
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Registered queries, ordered by (priority, registration order).

    The order IS the contract: the driver correctness-checks the first
    ``DRIVER_WINDOW`` entries, so priority-0 (domain) queries lead and
    variant queries trail.
    """
    _load_all()
    specs = sorted(_REGISTRY.values(), key=lambda s: (s.priority, s.seq))
    return {s.name: s for s in specs}


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
