"""Randomized engine↔simulator parity.

The batch engine (set-wise windows/joins) and the reference simulator
(row-at-a-time replay) are independent implementations of the same
semantics. This fuzz harness generates random scenario mixes — random
timings with ms jitter, random event subsets, shuffled arrival order,
duplicate deliveries, custom-data overrides — and asserts both produce
the IDENTICAL segment set. Seeds are fixed: failures reproduce.
"""

import datetime as dt
import json
import random

import pytest

from twilio_event_streams_reporting_example_spark.taskrouter.schema import (
    SEGMENT_COLUMNS,
)
from twilio_event_streams_reporting_example_spark.taskrouter.sim import ReferenceSim

BASE = dt.datetime(2024, 7, 1, 8, 0, 0)

SCENARIOS = [
    "happy",
    "no_wrapup",
    "rejected",
    "timeout",
    "canceled",
    "rescinded",
    "abandoned",
    "transfer_failed",
    "no_entry",
    "completed_no_accept",
    "late_wrapup",
    "retry",        # timeout → second reservation, SAME queue entry
    "transfer",     # completed → transfer-initiated → second reservation
    "same_ts",      # accepted at the exact entered timestamp (strict <)
]


def _iso(t: dt.datetime) -> str:
    return t.strftime("%Y-%m-%dT%H:%M:%S.") + f"{t.microsecond // 1000:03d}Z"


def _gen_events(seed: int, n_tasks: int) -> list[dict]:
    rng = random.Random(seed)
    events: list[dict] = []
    eid = [0]

    def ev(et, t, **payload):
        eid[0] += 1
        p = {"eventtype": et, "timestamp": _iso(t)}
        p.update({k: v for k, v in payload.items() if v is not None})
        return {
            "id": f"F-{seed}-{eid[0]}",
            "type": f"com.twilio.taskrouter.{et}",
            "data": {"payload": p},
        }

    for i in range(n_tasks):
        scen = rng.choice(SCENARIOS)
        task = f"FT{seed}-{i}"
        res = f"FR{seed}-{i}"
        wk = f"FW{rng.randrange(3)}"
        t0 = BASE + dt.timedelta(seconds=i * 600 + rng.randrange(60))

        def j(lo, hi):  # jittered offset with random milliseconds
            return dt.timedelta(seconds=rng.randrange(lo, hi), milliseconds=rng.randrange(1000))

        custom = None
        if rng.random() < 0.3:
            custom = {"conversations": {"conversation_id": f"C-{seed}-{i}",
                                        "queue_time": rng.randrange(500),
                                        "channel": rng.choice(["Video", "SMS"])}}
        ta = {"direction": rng.choice(["inbound", "outbound", "internal", "weird"]),
              "from": "+1500", "to": "+1600", **(custom or {})}
        common = dict(task_sid=task, task_attributes=json.dumps(ta),
                      task_channel_unique_name=rng.choice(["voice", "chat", "video", None]),
                      task_queue_name="Q", task_queue_sid="WQ", workflow_name="WF")

        t_entry = t0
        t_created = t0 + j(1, 10)
        t_exit = t_created + j(1, 120)
        if scen != "no_entry":
            events.append(ev("task-queue.entered", t_entry, **common))
        if scen == "same_ts":
            # accepted shares the entered timestamp exactly: the strict-<
            # as-of must NOT pair them (no QUEUE row, null queue_time)
            events.append(ev("reservation.created", t0 - dt.timedelta(seconds=2),
                             reservation_sid=res, worker_sid=wk, **common))
            events.append(ev("reservation.accepted", t_entry, reservation_sid=res,
                             worker_sid=wk, **common))
            events.append(ev("reservation.completed", t_entry + j(30, 60),
                             reservation_sid=res, worker_sid=wk, **common))
            continue
        if scen in ("retry", "transfer"):
            res_b = f"{res}B"
            if scen == "retry":
                # first reservation times out; the second one still pairs
                # with the ORIGINAL queue entry (no re-enter)
                events.append(ev("reservation.created", t_created, reservation_sid=res,
                                 worker_sid=wk, **common))
                events.append(ev("reservation.timeout", t_exit, reservation_sid=res,
                                 worker_sid=wk, **common))
                t_cb = t_exit + j(1, 10)
            else:
                # first conversation completes, task transfers: second
                # queue segment measured from transfer-initiated
                events.append(ev("reservation.created", t_created, reservation_sid=res,
                                 worker_sid=wk, **common))
                events.append(ev("reservation.accepted", t_exit, reservation_sid=res,
                                 worker_sid=wk, **common))
                events.append(ev("reservation.completed", t_exit + j(30, 120),
                                 reservation_sid=res, worker_sid=wk, **common))
                t_ti = t_exit + j(150, 200)
                events.append(ev("task.transfer-initiated", t_ti, **common))
                t_cb = t_ti + j(1, 10)
            t_ab = t_cb + j(1, 60)
            events.append(ev("reservation.created", t_cb, reservation_sid=res_b,
                             worker_sid=wk, **common))
            events.append(ev("reservation.accepted", t_ab, reservation_sid=res_b,
                             worker_sid=wk, **common))
            events.append(ev("reservation.completed", t_ab + j(30, 120),
                             reservation_sid=res_b, worker_sid=wk, **common))
            continue
        if scen in ("abandoned", "transfer_failed"):
            et = "task.canceled" if scen == "abandoned" else "task.transfer-failed"
            events.append(ev(et, t_exit, task_canceled_reason="gone", **common))
            continue
        events.append(ev("reservation.created", t_created, reservation_sid=res,
                         worker_sid=wk, **common))
        if scen == "rejected":
            events.append(ev("reservation.rejected", t_exit, reservation_sid=res,
                             worker_sid=wk, **common))
        elif scen == "timeout":
            events.append(ev("reservation.timeout", t_exit, reservation_sid=res,
                             worker_sid=wk, **common))
        elif scen == "canceled":
            events.append(ev("reservation.canceled", t_exit, reservation_sid=res,
                             worker_sid=wk, **common))
        elif scen == "rescinded":
            events.append(ev("reservation.rescinded", t_exit, reservation_sid=res,
                             worker_sid=wk, **common))
        elif scen == "completed_no_accept":
            events.append(ev("reservation.completed", t_exit, reservation_sid=res,
                             worker_sid=wk, **common))
        else:
            t_acc = t_exit
            events.append(ev("reservation.accepted", t_acc, reservation_sid=res,
                             worker_sid=wk, **common))
            t_done = t_acc + j(30, 600)
            if scen == "happy":
                t_wrap = t_acc + j(5, 25)
                events.append(ev("reservation.wrapup", t_wrap, reservation_sid=res,
                                 worker_sid=wk, **common))
                events.append(ev("reservation.completed", t_done, reservation_sid=res,
                                 worker_sid=wk, task_completed_reason="done", **common))
            elif scen == "no_wrapup":
                events.append(ev("reservation.completed", t_done, reservation_sid=res,
                                 worker_sid=wk, **common))
            elif scen == "late_wrapup":
                events.append(ev("reservation.completed", t_done, reservation_sid=res,
                                 worker_sid=wk, **common))
                events.append(ev("reservation.wrapup", t_done + j(1, 30),
                                 reservation_sid=res, worker_sid=wk, **common))
            # else: accepted never resolved → IN PROGRESS

    # random worker lifecycles (agent dimension + status sessions)
    for w in range(3):
        wk = f"FW{w}"
        t = BASE + dt.timedelta(seconds=rng.randrange(3600))
        attrs = {"email": f"{wk}@x", "agent_id": wk,
                 "roles": ["Agent"] if rng.random() < 0.5 else None,
                 "role": "Solo" if rng.random() < 0.5 else None,
                 "team_id": f"T{rng.randrange(2)}", "team_name": f"Team{rng.randrange(2)}"}
        attrs = {k: v for k, v in attrs.items() if v is not None}
        wcommon = dict(worker_sid=wk, worker_attributes=json.dumps(attrs))
        if rng.random() < 0.8:  # sometimes the created event is missing
            events.append(ev("worker.created", t, worker_activity_name="Offline", **wcommon))
        for _ in range(rng.randrange(4)):
            t += dt.timedelta(seconds=rng.randrange(60, 600),
                              milliseconds=rng.randrange(1000))
            kind = rng.choice(["worker.activity.update", "worker.attributes.update"])
            extra = {}
            if kind == "worker.activity.update":
                extra = dict(worker_activity_name=rng.choice(["Available", "Break"]),
                             worker_time_in_previous_activity=rng.randrange(5000))
            events.append(ev(kind, t, **extra, **wcommon))
        if rng.random() < 0.3:
            t += dt.timedelta(seconds=rng.randrange(60, 600))
            events.append(ev("worker.deleted", t, worker_activity_name="Offline", **wcommon))

    # duplicate deliveries: re-send ~10% with the same id
    dups = [e for e in events if rng.random() < 0.1]
    events.extend(json.loads(json.dumps(e)) for e in dups)
    rng.shuffle(events)  # arrival order is adversarial; event time governs
    return events


def _canon_rows(rows):
    out = []
    for r in rows:
        out.append(tuple(
            (v.isoformat() if isinstance(v, dt.datetime) else v)
            for v in (r[c] for c, _ in SEGMENT_COLUMNS)
        ))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_engine_matches_simulator_on_random_scenarios(spark, seed):
    events = _gen_events(seed, n_tasks=25)

    sim_rows = _canon_rows(ReferenceSim(events).segment_rows())

    from twilio_event_streams_reporting_example_spark.plans.taskrouter import (
        taskrouter_segments_df,
    )

    raw = spark.createDataFrame(
        [(i, json.dumps(e)) for i, e in enumerate(events)], "arrival_idx bigint, raw string"
    )
    eng_rows = _canon_rows([r.asDict() for r in taskrouter_segments_df(spark, raw).collect()])

    assert len(eng_rows) == len(sim_rows), (
        f"seed {seed}: engine {len(eng_rows)} rows vs sim {len(sim_rows)}"
    )
    for a, b in zip(eng_rows, sim_rows):
        assert a == b, f"seed {seed}: first diff\nengine: {a}\nsim:    {b}"


@pytest.mark.parametrize("seed", [7, 31])
def test_agents_dimension_matches_simulator(spark, seed):
    import datetime as dtm

    from twilio_event_streams_reporting_example_spark.plans.taskrouter import (
        taskrouter_agents_df,
    )
    from twilio_event_streams_reporting_example_spark.taskrouter.schema import (
        AGENT_COLUMNS,
    )

    events = _gen_events(seed, n_tasks=10)

    def canon(rows):
        out = []
        for r in rows:
            out.append(tuple(
                (v.isoformat() if isinstance(v, dtm.datetime) else v)
                for v in (r[c] for c, _ in AGENT_COLUMNS)
            ))
        return sorted(out, key=lambda t: tuple(str(x) for x in t))

    sim_rows = canon(ReferenceSim(events).agent_rows())
    raw = spark.createDataFrame(
        [(i, json.dumps(e)) for i, e in enumerate(events)], "arrival_idx bigint, raw string"
    )
    eng_rows = canon([r.asDict() for r in taskrouter_agents_df(spark, raw).collect()])
    assert eng_rows == sim_rows, f"seed {seed}: agents diverged"
