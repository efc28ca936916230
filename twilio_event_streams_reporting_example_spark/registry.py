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
    # DuckDB SQL; None → driver does a rows-only check. A zero-arg
    # callable defers building the SQL text until oracle_sql() asks —
    # the media sections' closed-form VALUES rows cost ~0.9s of pure
    # Python to render, which every EXECUTOR python worker would
    # otherwise pay at import even though only the driver-side
    # correctness pass ever reads the SQL.
    oracle: str | Callable[[], str] | None
    doc: str = ""
    bench: bool = True  # False: correctness-gated harness (streaming /
    #                     materialization workflows), not a batch query
    priority: int = 5  # ordering class for the driver's correctness window
    seq: int = 0  # registration order within a priority class


_REGISTRY: dict[str, QuerySpec] = {}

# ------------------------------------------------------- cache bookkeeping
#
# Operators persist()/cache()/localCheckpoint() intermediates for legitimate
# within-query stage reuse (shingle sets, minhash signatures, CC round
# tables). Across a long driver session running the whole registry those
# blocks would accumulate on executors, but a global clearCache() between
# queries is a blunt instrument: it also drops intermediates of a
# previously-BUILT-but-not-yet-evaluated DataFrame a composing caller may
# still hold. Instead every operator registers its persisted handles here
# via track(); the harness (bench loop, driver sweep, tests) calls
# release_caches() AFTER it has consumed the current query's result.
#
# Contract: release_caches() only after the last-built query has been
# evaluated. Tracked localCheckpoint blocks are not recomputable (truncated
# lineage) — re-collecting a stale DataFrame from before the release is an
# error; rebuild the query instead.

_TRACKED: list = []
_SCOPED = __import__("threading").local()


def _add_release(cb) -> None:
    """Route a release callback to the innermost scoped_releases() block
    of THIS thread, falling back to the global tracker. Thread-local
    scoping is what lets independent sections of one query materialize
    CONCURRENTLY (optimization guide §2.6) and still release exactly
    their own blocks — the previous global persistent-RDD diffs would,
    under concurrency, capture (and later drop) blocks another thread
    had just checkpointed."""
    stack = getattr(_SCOPED, "stack", None)
    if stack:
        stack[-1].append(cb)
    else:
        _TRACKED.append(cb)


def track(df):
    """Register a persisted/cached DataFrame for later release."""
    _add_release(df.unpersist)
    return df


def track_release(fn) -> None:
    """Register an arbitrary zero-arg release callback (e.g. dropping
    localCheckpoint RDD blocks, which DataFrame.unpersist cannot reach)."""
    _add_release(fn)


def scoped_releases():
    """Context manager: capture every track()/track_release() issued by
    THIS thread inside the block and run them all at exit. For
    self-contained sections (the synthetic scale proofs) that collect
    their O(1)-row summary inside the block and must drop every cache /
    checkpoint they created the moment the block ends — exact handles,
    no global persistent-RDD diff, safe under concurrent sections."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        stack = getattr(_SCOPED, "stack", None)
        if stack is None:
            stack = []
            _SCOPED.stack = stack
        captured: list = []
        stack.append(captured)
        try:
            yield captured
        finally:
            stack.pop()
            while captured:
                fn = captured.pop()
                try:
                    fn()
                except Exception:
                    pass

    return _cm()


def release_caches() -> None:
    """Run every tracked release (see contract above)."""
    while _TRACKED:
        fn = _TRACKED.pop()
        try:
            fn()
        except Exception:
            pass  # session already stopped / blocks already dropped


def persistent_rdd_entries(sc) -> dict:
    """{rdd_id: java RDD handle} for every block-holding RDD — includes
    localCheckpoint RDDs, which the SQL cache manager does not track."""
    out = {}
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        e = it.next()
        out[e._1()] = e._2()
    return out


def unpersist_rdd_ids(sc, ids) -> None:
    """Drop blocks of the given persisted RDD ids (non-blocking). Only safe
    for RDDs whose consumers are already materialized — a localCheckpoint
    RDD cannot be recomputed after its blocks are gone."""
    entries = persistent_rdd_entries(sc)
    for i in ids:
        r = entries.get(i)
        if r is not None:
            r.unpersist(False)


def checkpoint_rdd_id(df) -> int | None:
    """The EXACT persisted-RDD id behind a ``localCheckpoint``'ed
    DataFrame (eager or lazy): after checkpointing, the analyzed plan is
    a LogicalRDD wrapping the persisted RDD. Exact ids replace the old
    global persistent-RDD-diff bookkeeping, which was only correct
    single-threaded — a diff taken while a concurrent section persists
    its own blocks captures (and later drops) blocks it does not own."""
    try:
        return df._jdf.queryExecution().analyzed().rdd().id()
    except Exception:
        return None


def pin_checkpoint(df) -> None:
    """Defer release of THIS DataFrame's localCheckpoint blocks to
    release_caches() — for checkpoint-backed RESULTS, whose blocks must
    live until the consumer has evaluated them (catalog clearCache
    cannot see checkpoint blocks at all)."""
    sc = df.sparkSession.sparkContext
    i = checkpoint_rdd_id(df)
    if i is not None:
        track_release(lambda: unpersist_rdd_ids(sc, {i}))

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


_SHIPPED_APPS: set[str] = set()


def _ensure_worker_imports(spark: SparkSession) -> None:
    """Pandas-UDF queries cloudpickle references to this package, so PYTHON
    WORKERS must import it too. Workers inherit the JVM's env/cwd captured
    at session creation — a harness running from another cwd (without the
    repo on PYTHONPATH) would fail exactly the mapInPandas/applyInPandas
    queries. addPyFile is runtime-effective: ship the package zip once per
    application when the ambient path doesn't already cover it."""
    app = spark.sparkContext.applicationId
    if app in _SHIPPED_APPS:
        return
    _SHIPPED_APPS.add(app)
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    pkg_name = __name__.rsplit(".", 1)[0]

    def _probe(_):  # closure: cloudpickled BY VALUE, runs even when the
        try:  # package itself is unimportable on the worker
            __import__(pkg_name)
            return True
        except Exception:
            return False

    try:
        ok = bool(
            spark.range(1)
            .select(F.udf(_probe, "boolean")("id").alias("ok"))
            .head()[0]
        )
    except Exception:
        ok = False
    if ok:
        return  # workers already resolve the package (env/cwd covers it)
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_pkg_{os.getpid()}")
    zp = shutil.make_archive(base, "zip", os.path.dirname(pkg_dir), pkg_name)
    spark.sparkContext.addPyFile(zp)


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

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_worker_imports(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # type: ignore[attr-defined]
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=wrapped,
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


def resolve_oracle(spec: QuerySpec) -> str | None:
    return spec.oracle() if callable(spec.oracle) else spec.oracle


def oracle_sql() -> dict[str, str]:
    return {
        name: resolve_oracle(spec)
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }


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
    from .sources import admission  # noqa: F401
    from .sources import bucketing  # noqa: F401
    from .plans import taskrouter_queries  # noqa: F401

    _LOADED = True
