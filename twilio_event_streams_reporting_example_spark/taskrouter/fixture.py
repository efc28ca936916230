"""Deterministic TaskRouter CloudEvent fixture (FIXTURES.md §2-3).

One literal event list, in *arrival* order, covering every scenario row
of FIXTURES.md §3: happy path (with/without wrapup), rejected, missed
(timeout + canceled), revoked, abandoned-in-queue (task.canceled and
task.transfer-failed), transfer re-queue, agent lifecycle, custom-data
overrides, duplicate delivery (same ``id`` twice), out-of-order arrival,
missing entry/accepted events, unhandled taskrouter types, and a
non-taskrouter event.

Timestamps carry non-zero milliseconds to exercise the reference's
ms-truncation (events.js:162-165). Every event's JSON body is built
from literals — no RNG, no clock — so the fixture, the engine output,
and the golden oracles are all reproducible bit-for-bit.
"""

from __future__ import annotations

import json

# Worker attribute payloads (JSON-encoded at build time).
ALICE_ATTRS = {
    "email": "alice@example.com",
    "agent_id": "A-001",
    "location": "NYC",
    "phone": "+15550100",
    "roles": ["Agent", "Supervisor"],
    "team_id": "TM-US",
    "team_name": "US Support",
    "team_name_in_hierarchy": "US ▸ West",
    "manager": "Morgan",
    "department_id": "D-1",
    "department_name": "Support",
    "department_name_in_hierarchy": "Org ▸ Support",
    "agent_attribute_1": "senior",
}
ALICE_ATTRS_V2 = {**ALICE_ATTRS, "team_name": "US Support Tier 2", "agent_attribute_2": "mentor"}
BOB_ATTRS = {
    "email": "bob@example.com",
    "agent_id": "A-002",
    "location": "LON",
    "phone": "+15550101",
    "role": "Agent",
    "team_id": "TM-EU",
    "team_name": "EU Support",
    "manager": "Morgan",
    "department_id": "D-1",
    "department_name": "Support",
}
CARA_ATTRS = {
    "email": "cara@example.com",
    "agent_id": "A-003",
    "roles": ["Admin"],
    "team_id": "TM-US",
    "team_name": "US Support",
}

_SEQ = [0]


def _ev(
    eventtype: str,
    ts: str,
    *,
    event_id: str | None = None,
    task_sid: str | None = None,
    reservation_sid: str | None = None,
    worker_sid: str | None = None,
    task_attributes: dict | None = None,
    worker_attributes: dict | None = None,
    task_completed_reason: str | None = None,
    task_canceled_reason: str | None = None,
    channel: str | None = "voice",
    workflow_name: str | None = "Main",
    task_queue_name: str | None = "Support",
    task_queue_sid: str | None = "WQ-1",
    worker_activity_name: str | None = None,
    worker_time_in_previous_activity: int | None = None,
    type_override: str | None = None,
) -> dict:
    """One CloudEvent as the dict the JSON fixture serializes."""
    _SEQ[0] += 1
    payload: dict = {
        "eventtype": eventtype,
        "timestamp": ts,
        "task_sid": task_sid,
        "reservation_sid": reservation_sid,
        "worker_sid": worker_sid,
        "task_attributes": json.dumps(task_attributes) if task_attributes is not None else None,
        "worker_attributes": (
            json.dumps(worker_attributes) if worker_attributes is not None else None
        ),
        "task_completed_reason": task_completed_reason,
        "task_canceled_reason": task_canceled_reason,
        "task_channel_unique_name": channel,
        "workflow_name": workflow_name,
        "task_queue_name": task_queue_name,
        "task_queue_sid": task_queue_sid,
        "worker_activity_name": worker_activity_name,
        "worker_time_in_previous_activity": worker_time_in_previous_activity,
    }
    return {
        "id": event_id or f"EV-{_SEQ[0]:04d}",
        "type": type_override or f"com.twilio.taskrouter.{eventtype}",
        "data": {
            "payload": {k: v for k, v in payload.items() if v is not None},
            "publisher_metadata": {"source": "fixture"},
        },
    }


def _build() -> list[dict]:
    ev = []

    # --- agent lifecycle: Alice (W001) ---------------------------------
    ev.append(
        _ev("worker.created", "2024-05-01T09:00:00.500Z", worker_sid="WK001",
            worker_attributes=ALICE_ATTRS, worker_activity_name="Offline",
            channel=None, task_queue_name=None, task_queue_sid=None, workflow_name=None)
    )
    # duplicate delivery of the created event (same id) — engine dedups
    dup_created = _ev("worker.created", "2024-05-01T09:00:00.500Z", worker_sid="WK001",
                      worker_attributes=ALICE_ATTRS, worker_activity_name="Offline",
                      channel=None, task_queue_name=None, task_queue_sid=None,
                      workflow_name=None)
    dup_created["id"] = ev[-1]["id"]
    ev.append(dup_created)
    ev.append(
        _ev("worker.activity.update", "2024-05-01T09:05:00.250Z", worker_sid="WK001",
            worker_attributes=ALICE_ATTRS, worker_activity_name="Available",
            worker_time_in_previous_activity=300,
            channel=None, task_queue_name=None, task_queue_sid=None, workflow_name=None)
    )

    # --- agent lifecycle: Bob (W002) -----------------------------------
    ev.append(
        _ev("worker.created", "2024-05-01T09:10:00.900Z", worker_sid="WK002",
            worker_attributes=BOB_ATTRS, worker_activity_name="Available",
            channel=None, task_queue_name=None, task_queue_sid=None, workflow_name=None)
    )

    # --- Cara (W003): attributes.update with no prior created ----------
    ev.append(
        _ev("worker.attributes.update", "2024-05-01T09:20:00.000Z", worker_sid="WK003",
            worker_attributes=CARA_ATTRS, worker_activity_name="Available",
            channel=None, task_queue_name=None, task_queue_sid=None, workflow_name=None)
    )

    # --- T001/R001: happy path with wrapup (Alice) ---------------------
    t1 = {"direction": "inbound", "from": "+15551001", "to": "+15552001"}
    ev.append(_ev("task-queue.entered", "2024-05-01T10:00:00.100Z", task_sid="TK001",
                  task_attributes=t1))
    ev.append(_ev("reservation.created", "2024-05-01T10:00:05.900Z", task_sid="TK001",
                  reservation_sid="RS001", worker_sid="WK001", task_attributes=t1))
    ev.append(_ev("reservation.accepted", "2024-05-01T10:00:15.400Z", task_sid="TK001",
                  reservation_sid="RS001", worker_sid="WK001", task_attributes=t1,
                  worker_attributes=ALICE_ATTRS, worker_activity_name="Busy"))
    ev.append(_ev("reservation.wrapup", "2024-05-01T10:05:15.800Z", task_sid="TK001",
                  reservation_sid="RS001", worker_sid="WK001", task_attributes=t1))
    ev.append(_ev("reservation.completed", "2024-05-01T10:06:00.200Z", task_sid="TK001",
                  reservation_sid="RS001", worker_sid="WK001", task_attributes=t1,
                  task_completed_reason="completed"))
    # unhandled taskrouter type: cached, no segment
    ev.append(_ev("task.created", "2024-05-01T10:00:00.050Z", task_sid="TK001",
                  task_attributes=t1))

    # --- T002/R002: no wrapup, chat, OUT-OF-ORDER arrival (Bob) --------
    t2 = {"direction": "inbound", "from": "web:guest", "to": "support"}
    ev.append(_ev("task-queue.entered", "2024-05-01T10:10:00.000Z", task_sid="TK002",
                  task_attributes=t2, channel="chat"))
    # accepted arrives BEFORE created in the fixture list (event-time fixes it)
    ev.append(_ev("reservation.accepted", "2024-05-01T10:10:10.999Z", task_sid="TK002",
                  reservation_sid="RS002", worker_sid="WK002", task_attributes=t2,
                  worker_attributes=BOB_ATTRS, channel="chat"))
    ev.append(_ev("reservation.created", "2024-05-01T10:10:02.500Z", task_sid="TK002",
                  reservation_sid="RS002", worker_sid="WK002", task_attributes=t2,
                  channel="chat"))
    ev.append(_ev("reservation.completed", "2024-05-01T10:20:10.000Z", task_sid="TK002",
                  reservation_sid="RS002", worker_sid="WK002", task_attributes=t2,
                  task_completed_reason="solved", channel="chat"))

    # --- T003/R003: rejected (Alice) -----------------------------------
    t3 = {"direction": "inbound", "from": "+15551003", "to": "+15552003"}
    ev.append(_ev("task-queue.entered", "2024-05-01T10:15:00.000Z", task_sid="TK003",
                  task_attributes=t3))
    ev.append(_ev("reservation.created", "2024-05-01T10:15:03.200Z", task_sid="TK003",
                  reservation_sid="RS003", worker_sid="WK001", task_attributes=t3))
    ev.append(_ev("reservation.rejected", "2024-05-01T10:15:33.200Z", task_sid="TK003",
                  reservation_sid="RS003", worker_sid="WK001", task_attributes=t3))

    # --- T004/R004: missed via timeout (Bob) ---------------------------
    t4 = {"direction": "inbound", "from": "+15551004", "to": "+15552004"}
    ev.append(_ev("task-queue.entered", "2024-05-01T10:20:00.000Z", task_sid="TK004",
                  task_attributes=t4))
    ev.append(_ev("reservation.created", "2024-05-01T10:20:01.000Z", task_sid="TK004",
                  reservation_sid="RS004", worker_sid="WK002", task_attributes=t4))
    ev.append(_ev("reservation.timeout", "2024-05-01T10:21:01.000Z", task_sid="TK004",
                  reservation_sid="RS004", worker_sid="WK002", task_attributes=t4))

    # --- T005/R005: missed via reservation.canceled (Alice) ------------
    t5 = {"direction": "inbound", "from": "+15551005", "to": "+15552005"}
    ev.append(_ev("task-queue.entered", "2024-05-01T10:25:00.000Z", task_sid="TK005",
                  task_attributes=t5))
    ev.append(_ev("reservation.created", "2024-05-01T10:25:02.000Z", task_sid="TK005",
                  reservation_sid="RS005", worker_sid="WK001", task_attributes=t5))
    ev.append(_ev("reservation.canceled", "2024-05-01T10:25:32.000Z", task_sid="TK005",
                  reservation_sid="RS005", worker_sid="WK001", task_attributes=t5))

    # --- T006/R006: revoked (Bob) --------------------------------------
    t6 = {"direction": "internal", "from": "client:alice", "to": "client:bob"}
    ev.append(_ev("task-queue.entered", "2024-05-01T10:30:00.000Z", task_sid="TK006",
                  task_attributes=t6))
    ev.append(_ev("reservation.created", "2024-05-01T10:30:01.500Z", task_sid="TK006",
                  reservation_sid="RS006", worker_sid="WK002", task_attributes=t6))
    ev.append(_ev("reservation.rescinded", "2024-05-01T10:30:21.000Z", task_sid="TK006",
                  reservation_sid="RS006", worker_sid="WK002", task_attributes=t6))

    # --- Alice goes on Break (closes Available session) ----------------
    ev.append(
        _ev("worker.activity.update", "2024-05-01T10:30:00.750Z", worker_sid="WK001",
            worker_attributes=ALICE_ATTRS, worker_activity_name="Break",
            worker_time_in_previous_activity=5100,
            channel=None, task_queue_name=None, task_queue_sid=None, workflow_name=None)
    )

    # --- T007: abandoned in queue via task.canceled (no worker) --------
    t7 = {"direction": "inbound", "from": "+15551007", "to": "+15552007"}
    ev.append(_ev("task-queue.entered", "2024-05-01T10:35:00.800Z", task_sid="TK007",
                  task_attributes=t7))
    ev.append(_ev("task.canceled", "2024-05-01T10:36:30.200Z", task_sid="TK007",
                  task_attributes=t7, task_canceled_reason="caller hung up"))

    # --- T008: abandoned via task.transfer-failed ----------------------
    t8 = {"direction": "inbound", "from": "+15551008", "to": "+15552008"}
    ev.append(_ev("task-queue.entered", "2024-05-01T10:40:00.300Z", task_sid="TK008",
                  task_attributes=t8))
    ev.append(_ev("task.transfer-failed", "2024-05-01T10:41:00.900Z", task_sid="TK008",
                  task_attributes=t8))

    # --- T009: transfer re-queue (Alice then Bob) ----------------------
    t9 = {"direction": "inbound", "from": "+15551009", "to": "+15552009"}
    ev.append(_ev("task-queue.entered", "2024-05-01T10:45:00.000Z", task_sid="TK009",
                  task_attributes=t9))
    ev.append(_ev("reservation.created", "2024-05-01T10:45:02.000Z", task_sid="TK009",
                  reservation_sid="RS009A", worker_sid="WK001", task_attributes=t9))
    ev.append(_ev("reservation.accepted", "2024-05-01T10:45:10.600Z", task_sid="TK009",
                  reservation_sid="RS009A", worker_sid="WK001", task_attributes=t9,
                  worker_attributes=ALICE_ATTRS))
    ev.append(_ev("reservation.completed", "2024-05-01T10:50:10.000Z", task_sid="TK009",
                  reservation_sid="RS009A", worker_sid="WK001", task_attributes=t9,
                  task_completed_reason="transferred"))
    ev.append(_ev("task.transfer-initiated", "2024-05-01T10:50:20.400Z", task_sid="TK009",
                  task_attributes=t9))
    ev.append(_ev("reservation.created", "2024-05-01T10:50:22.000Z", task_sid="TK009",
                  reservation_sid="RS009B", worker_sid="WK002", task_attributes=t9))
    ev.append(_ev("reservation.accepted", "2024-05-01T10:50:30.200Z", task_sid="TK009",
                  reservation_sid="RS009B", worker_sid="WK002", task_attributes=t9,
                  worker_attributes=BOB_ATTRS))
    ev.append(_ev("reservation.wrapup", "2024-05-01T10:55:30.000Z", task_sid="TK009",
                  reservation_sid="RS009B", worker_sid="WK002", task_attributes=t9))
    ev.append(_ev("reservation.completed", "2024-05-01T10:56:00.000Z", task_sid="TK009",
                  reservation_sid="RS009B", worker_sid="WK002", task_attributes=t9,
                  task_completed_reason="completed"))

    # --- T010/R010: custom-data overrides, outbound (Bob) --------------
    t10_accept = {
        "direction": "outbound",
        "from": "+15550001",
        "to": "+15559999",
        "conversations": {
            "conversation_id": "CUSTOM-CONV-1",
            "queue_time": 99,  # overridden by the computed value (spread order)
            "time_in_seconds": 120,
            "priority": 5,
            "channel": "Video",
            "campaign": "Q3-outreach",
            "conversation_attribute_1": "attr-one",
            "conversation_label_1": "label-one",
            "in_business_hours": "Yes",
            "language": "en-US",
            "service_level": "Gold",
            "team": "Outbound-Team",
            "team_name_in_hierarchy": ["EMEA", "Outbound"],
            "handling_department_name_in_hierarchy": ["Org", "CS"],
            "department_id": "D-9",
            "department_name": "CS",
        },
    }
    t10_complete = {
        "direction": "outbound",
        "from": "+15550001",
        "to": "+15559999",
        "conversations": {
            "segment_link": "https://example.com/seg/1",
            "outcome": "Resolved",  # NOT picked up — only segment_link is
        },
    }
    ev.append(_ev("task-queue.entered", "2024-05-01T11:00:00.000Z", task_sid="TK010",
                  task_attributes={"direction": "outbound"}))
    ev.append(_ev("reservation.created", "2024-05-01T11:00:05.000Z", task_sid="TK010",
                  reservation_sid="RS010", worker_sid="WK002",
                  task_attributes={"direction": "outbound"}))
    ev.append(_ev("reservation.accepted", "2024-05-01T11:00:20.500Z", task_sid="TK010",
                  reservation_sid="RS010", worker_sid="WK002", task_attributes=t10_accept,
                  worker_attributes=BOB_ATTRS))
    ev.append(_ev("reservation.completed", "2024-05-01T11:05:20.000Z", task_sid="TK010",
                  reservation_sid="RS010", worker_sid="WK002", task_attributes=t10_complete))

    # --- Alice attribute change (no segment) ---------------------------
    ev.append(
        _ev("worker.attributes.update", "2024-05-01T11:00:00.100Z", worker_sid="WK001",
            worker_attributes=ALICE_ATTRS_V2, worker_activity_name="Break",
            channel=None, task_queue_name=None, task_queue_sid=None, workflow_name=None)
    )

    # --- R011: accepted with NO entry event (Cara) ---------------------
    t11 = {"direction": "inbound", "from": "+15551011", "to": "+15552011"}
    ev.append(_ev("reservation.created", "2024-05-01T11:10:00.000Z", task_sid="TK011",
                  reservation_sid="RS011", worker_sid="WK003", task_attributes=t11))
    ev.append(_ev("reservation.accepted", "2024-05-01T11:10:30.100Z", task_sid="TK011",
                  reservation_sid="RS011", worker_sid="WK003", task_attributes=t11,
                  worker_attributes=CARA_ATTRS))

    # --- T012: completed with NO accepted → no segments ----------------
    t12 = {"direction": "inbound", "from": "+15551012", "to": "+15552012"}
    ev.append(_ev("task-queue.entered", "2024-05-01T11:15:00.000Z", task_sid="TK012",
                  task_attributes=t12))
    ev.append(_ev("reservation.created", "2024-05-01T11:15:05.000Z", task_sid="TK012",
                  reservation_sid="RS012", worker_sid="WK003", task_attributes=t12))
    ev.append(_ev("reservation.completed", "2024-05-01T11:20:00.000Z", task_sid="TK012",
                  reservation_sid="RS012", worker_sid="WK003", task_attributes=t12))

    # --- T013/R013: wrapup delivered AFTER completed (Alice) -----------
    # the completed event must not see it: talk = completed - accepted,
    # wrapup_time = 0 (reference resolves the lookup at processing time)
    t13 = {"direction": "inbound", "from": "+15551013", "to": "+15552013"}
    ev.append(_ev("task-queue.entered", "2024-05-01T11:30:00.200Z", task_sid="TK013",
                  task_attributes=t13))
    ev.append(_ev("reservation.created", "2024-05-01T11:30:03.000Z", task_sid="TK013",
                  reservation_sid="RS013", worker_sid="WK001", task_attributes=t13))
    ev.append(_ev("reservation.accepted", "2024-05-01T11:30:10.700Z", task_sid="TK013",
                  reservation_sid="RS013", worker_sid="WK001", task_attributes=t13,
                  worker_attributes=ALICE_ATTRS))
    ev.append(_ev("reservation.completed", "2024-05-01T11:33:10.100Z", task_sid="TK013",
                  reservation_sid="RS013", worker_sid="WK001", task_attributes=t13,
                  task_completed_reason="completed"))
    ev.append(_ev("reservation.wrapup", "2024-05-01T11:34:00.000Z", task_sid="TK013",
                  reservation_sid="RS013", worker_sid="WK001", task_attributes=t13))

    # --- Bob's day ends: activity → Offline, then deleted --------------
    ev.append(
        _ev("worker.activity.update", "2024-05-01T11:45:00.300Z", worker_sid="WK002",
            worker_attributes=BOB_ATTRS, worker_activity_name="Offline",
            worker_time_in_previous_activity=9300,
            channel=None, task_queue_name=None, task_queue_sid=None, workflow_name=None)
    )
    ev.append(
        _ev("worker.deleted", "2024-05-01T12:00:00.000Z", worker_sid="WK002",
            worker_attributes=BOB_ATTRS, worker_activity_name="Offline",
            channel=None, task_queue_name=None, task_queue_sid=None, workflow_name=None)
    )

    # --- non-taskrouter event: dropped entirely ------------------------
    ev.append(_ev("call-summary.complete", "2024-05-01T11:59:00.000Z",
                  type_override="com.twilio.voice.insights.call-summary.complete"))

    return ev


FIXTURE_EVENTS: list[dict] = _build()

FIXTURE_JSON: list[str] = [json.dumps(e, sort_keys=True) for e in FIXTURE_EVENTS]


def fixture_df(spark):
    """The fixture as a one-column DataFrame of raw CloudEvent JSON strings
    plus an arrival index — exactly what an HTTP batch source would yield
    (S1); the engine's ingest does the envelope ``from_json`` (S3)."""
    from pyspark.sql import functions as F  # local: keep module importable w/o spark

    rows = [(i, s) for i, s in enumerate(FIXTURE_JSON)]
    return spark.createDataFrame(rows, "arrival_idx bigint, raw string").repartition(
        8, F.col("arrival_idx")
    )
