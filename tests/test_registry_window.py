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


def test_only_priority9_falls_outside_window():
    qs = all_queries()
    names = list(qs)
    tail = names[DRIVER_WINDOW:]
    wrong = [n for n in tail if qs[n].priority != 9]
    assert not wrong, f"non-demoted queries beyond the window: {wrong}"
    in_window_p9 = [n for n in names[:DRIVER_WINDOW] if qs[n].priority == 9]
    # p9 inside the window is fine (spare slots) but the demoted set must
    # be exactly the documented one
    documented = {
        "promo_revenue_by_type",
        "supplier_region_rollup",
        "event_type_frequency",
        "dedup_simhash",
        "multimodal_format_rollup",
        "multimodal_frame_sample",
        "dataset_split_stratified",
        "embedding_norms_arrow",
        "mixture_weighted_sample",
    }
    assert set(tail) | set(in_window_p9) <= documented


def test_every_query_has_oracle_or_is_flagged():
    qs = all_queries()
    missing = [n for n, s in qs.items() if s.oracle is None]
    assert not missing, f"queries without oracles: {missing}"
