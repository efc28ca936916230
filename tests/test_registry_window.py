"""Driver correctness-window invariants: the external driver checks only
the FIRST 50 registered queries (registration/dict order), so the window
budget is part of the product contract — a regression here silently
removes the domain pipeline's hard correctness signal (the round-4
finding: TaskRouter registered last, 22 queries unchecked)."""

from twilio_event_streams_reporting_example_spark.registry import (
    DRIVER_WINDOW,
    all_queries,
)


def test_domain_queries_lead_the_window():
    names = list(all_queries())
    window = set(names[:DRIVER_WINDOW])
    domain = {
        n
        for n in names
        if n.startswith(("taskrouter_", "streaming_"))
        or n in ("bucketed_orders_lineitem_join", "admission_signed_requests")
    }
    missing = domain - window
    assert not missing, f"domain queries outside the driver window: {missing}"


def test_nothing_falls_outside_window():
    """Round 6 folded the registry to <= 50 queries (union-tagged family
    suites), so EVERY registered query now earns a driver correctness
    row. A 51st registration silently loses its driver signal — fold it
    into an existing family suite instead."""
    names = list(all_queries())
    tail = names[DRIVER_WINDOW:]
    assert not tail, (
        f"{len(names)} queries registered but the driver checks only the "
        f"first {DRIVER_WINDOW}; fold these into a family suite: {tail}"
    )


def test_every_query_has_oracle_or_is_flagged():
    qs = all_queries()
    missing = [n for n, s in qs.items() if s.oracle is None]
    assert not missing, f"queries without oracles: {missing}"
