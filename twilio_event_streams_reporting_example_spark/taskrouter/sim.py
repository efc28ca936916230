"""Independent row-at-a-time simulator of the reference's TaskRouter
semantics — the golden-oracle generator.

This is a deliberate re-expression of the observed behavior of
reference routes/events.js (state machine 513-667, wide projection
337-485, agent entry 258-296, measures 159-208) in plain Python over
the fixture events. It shares NO code with the Spark engine — the
engine derives everything set-wise with windows/joins, this walks
events one at a time mutating little dicts, like the reference does.
Agreement between the two (checked by the driver via golden VALUES
oracles rendered from this simulator's output) is therefore meaningful.

Documented divergences from the reference — the ENGINE's contract,
applied identically here and in plans/taskrouter.py:

1. **Duplicate delivery is deduplicated** by CloudEvent ``id`` (first
   arrival wins). The reference double-inserts (events.js:488 never
   checks the indexed event_id).
2. **Event-time processing order**: events are processed in
   ``(timestamp, arrival_idx)`` order, not arrival order. The reference
   depends on arrival order and mis-computes on out-of-order delivery
   (README.md:13).
3. **Missing-correlation policy**: where the reference throws mid-event
   and silently drops ALL of that event's segments (e.g. accepted with
   no task-queue.entered → unguarded destructure at events.js:161), the
   engine emits the segments it can with NULL for the unavailable
   measures, and skips only the QUEUE segment (whose whole meaning is
   the missing queue visit).
"""

from __future__ import annotations

import datetime as dt
import json
from typing import Any

from .schema import (
    AGENT_ACTIVE,
    AGENT_COLUMNS,
    AGENT_DELETED,
    AGENT_STATUS,
    AGENT_STATUS_IN_PROGRESS,
    CONVO_IN_PROG_SEG,
    CONVO_MISSED,
    CONVO_REJECTED,
    CONVO_REVOKED,
    CONVO_SEG,
    QUEUE_SEGMENT,
    SEGMENT_COLUMNS,
    TASKROUTER_PREFIX,
)

def _js_or(*vals):
    """JS ``||``: first truthy value ('' / 0 / None are falsy)."""
    for v in vals:
        if v:
            return v
    return vals[-1] if vals else None


def _parse_ts(iso: str) -> dt.datetime:
    return dt.datetime.fromisoformat(iso.replace("Z", "+00:00")).replace(tzinfo=None)


def _trunc(iso: str) -> dt.datetime:
    """new Date(ts).setMilliseconds(0) (events.js:162-165)."""
    return _parse_ts(iso).replace(microsecond=0)


def _secs(end_iso: str, start_iso: str) -> int:
    return int((_trunc(end_iso) - _trunc(start_iso)).total_seconds())


def _hier_join(v):
    """join(' ▸ ') when array else pass-through (events.js:457,462)."""
    if isinstance(v, list):
        return " ▸ ".join(v)
    return v


class ReferenceSim:
    """Replays the fixture through the reference's per-event switch."""

    def __init__(self, events: list[dict]):
        self.tr_events: list[dict] = []  # cached parsed taskrouter events
        self.conversations: list[dict] = []
        self.agents: dict[str, dict] = {}
        seen: set[str] = set()
        ordered = []
        for idx, e in enumerate(events):
            if not e["type"].startswith(TASKROUTER_PREFIX):
                continue  # dropped, not cached (events.js:669-671)
            if e["id"] in seen:  # divergence 1: dedup
                continue
            seen.add(e["id"])
            ordered.append((e["data"]["payload"]["timestamp"], idx, e))
        ordered.sort(key=lambda t: (t[0], t[1]))  # divergence 2: event time
        for _, _, e in ordered:
            self._process(e)

    # ------------------------------------------------------- lookups (F3-F8)

    def _queue_entry_event(self, task_sid, exit_ts):
        """Latest entered/transfer-initiated before exit (events.js:74-87)."""
        cands = [
            p
            for p in self.tr_events
            if p.get("task_sid") == task_sid
            and p["timestamp"] < exit_ts
            and p["eventtype"] in ("task-queue.entered", "task.transfer-initiated")
        ]
        cands.sort(key=lambda p: p["timestamp"], reverse=True)
        return cands[0] if cands else None

    def _latest_for_reservation(self, reservation_sid, eventtype):
        cands = [
            p
            for p in self.tr_events
            if p.get("reservation_sid") == reservation_sid and p["eventtype"] == eventtype
        ]
        cands.sort(key=lambda p: p["timestamp"], reverse=True)
        return cands[0] if cands else None

    def _first_for_reservation(self, reservation_sid, eventtype):
        for p in self.tr_events:  # insertion order, first match (events.js:119-127)
            if p.get("reservation_sid") == reservation_sid and p["eventtype"] == eventtype:
                return p
        return None

    # ------------------------------------------------------------ measures

    def _queue_data(self, payload):
        entry = self._queue_entry_event(payload.get("task_sid"), payload["timestamp"])
        if entry is None:  # divergence 3
            return None
        return {
            "time_in_queue": _secs(payload["timestamp"], entry["timestamp"]),
            "start_date": _trunc(entry["timestamp"]),
        }

    def _ring_time(self, payload):
        created = self._latest_for_reservation(payload.get("reservation_sid"), "reservation.created")
        if created is None:  # divergence 3
            return None
        return _secs(payload["timestamp"], created["timestamp"])

    # ------------------------------------------- wide projection (P1-P12)

    def _default_segment(self, payload) -> dict:
        ta = payload.get("task_attributes") or {}
        wa = payload.get("worker_attributes") or {}
        custom: dict = {**(ta.get("conversations") or {}), **wa}  # events.js:353-356

        def c(key, default=None):
            return custom.get(key, default)

        tcun = payload.get("task_channel_unique_name")
        direction_raw = ta.get("direction")
        seg: dict[str, Any] = {
            "conversation_id": _js_or(
                c("conversation_id"), payload.get("task_sid"), payload.get("worker_sid")
            ),
            "segment_external_id": _js_or(payload.get("task_sid"), payload.get("worker_sid")),
            "reservation_sid": payload.get("reservation_sid") or "",
            "agent_uuid": payload.get("worker_sid") or "",
            "activity_time": payload.get("worker_time_in_previous_activity"),
            "abandon_time": c("abandon_time"),
            "queue_time": c("queue_time"),
            "ring_time": c("ring_time"),
            "talk_time": c("talk_time"),
            "wrapup_time": c("wrapup_time"),
            "time_in_seconds": c("time_in_seconds"),
            "agent_talk_time": c("agent_talk_time"),
            "longest_silence_before_agent": c("longest_silence_before_agent"),
            "longest_talk_by_agent": c("longest_talk_by_agent"),
            "silence_time": c("silence_time"),
            "cross_talk_time": c("cross_talk_time"),
            "customer_talk_time": c("customer_talk_time"),
            "longest_silence_before_customer": c("longest_silence_before_customer"),
            "longest_talk_by_customer": c("longest_talk_by_customer"),
            "hold_time": c("hold_time"),
            "average_response_time": c("average_response_time"),
            "first_response_time": c("first_response_time"),
            "focus_time": c("focus_time"),
            "ivr_time": c("ivr_time"),
            "priority": c("priority"),
            "date": _trunc(payload["timestamp"]),
            "time": _trunc(payload["timestamp"]),
            "abandoned": _js_or(c("abandoned"), "N"),
            "abandoned_phase": c("abandoned_phase"),
            "activity": _js_or(c("activity"), payload.get("worker_activity_name")),
            "campaign": c("campaign"),
            "case": c("case"),
            # events.js:420 — voice→Call, chat→Chat, else pass-through
            "channel": _js_or(
                c("channel"),
                "Call" if tcun == "voice" else None,
                "Chat" if tcun == "chat" else tcun,
            ),
            "content": c("content"),
            "destination": c("destination"),
            # events.js:443 — note the 'Inbound' default branch
            "direction": _js_or(
                c("direction"),
                "Inbound" if direction_raw == "inbound" else None,
                "Internal" if direction_raw == "internal" else None,
                "Outbound" if direction_raw == "outbound" else "Inbound",
            ),
            "external_contact": _js_or(
                c("external_contact"),
                ta.get("from") if direction_raw == "outbound" else ta.get("to"),
            ),
            "followed_by": c("followed_by"),
            "handling_department_id": c("department_id"),
            "handling_department_name": c("department_name"),
            "handling_department_name_in_hierarchy": _hier_join(
                c("handling_department_name_in_hierarchy")
            ),
            "handling_team_id": _js_or(c("team_id"), c("team"), payload.get("task_queue_sid")),
            "handling_team_name": _js_or(c("team_name"), c("team"), payload.get("task_queue_name")),
            "handling_team_name_in_hierarchy": _hier_join(c("team_name_in_hierarchy")),
            "hang_up_by": c("hang_up_by"),
            "in_business_hours": c("in_business_hours"),
            "initiated_by": c("initiated_by"),
            "initiative": c("initiative"),
            "ivr_path": c("ivr_path"),
            "language": c("language"),
            "order": c("order"),
            "outcome": _js_or(
                c("outcome"),
                ta.get("reason"),
                payload.get("task_completed_reason"),
                payload.get("task_canceled_reason"),
            ),
            "preceded_by": c("preceded_by"),
            "productive": c("productive"),
            "queue": _js_or(c("queue"), payload.get("task_queue_name")),
            "segment_link": c("segment_link"),
            "service_level": c("service_level"),
            "source": c("source"),
            "virtual": c("virtual"),
            "workflow": _js_or(c("workflow"), payload.get("workflow_name")),
        }
        for i in range(1, 11):
            seg[f"conversation_attribute_{i}"] = c(f"conversation_attribute_{i}")
            seg[f"conversation_label_{i}"] = c(f"conversation_label_{i}")
        return seg

    def _agent_entry(self, payload) -> dict:
        wa = payload.get("worker_attributes") or {}
        roles = wa.get("roles")
        return {
            "agent_uuid": payload.get("worker_sid"),
            "attribute_1": wa.get("agent_attribute_1"),
            "attribute_2": wa.get("agent_attribute_2"),
            "attribute_3": wa.get("agent_attribute_3"),
            "email": wa.get("email"),
            "agent_id": wa.get("agent_id"),
            "location": wa.get("location"),
            "phone": wa.get("phone"),
            "role": ", ".join(roles) if isinstance(roles, list) else wa.get("role"),
            "team_id": wa.get("team_id"),
            "team_name": wa.get("team_name"),
            "team_name_in_hierarchy": wa.get("team_name_in_hierarchy"),
            "manager": wa.get("manager"),
            "department_id": wa.get("department_id"),
            "department_name": wa.get("department_name"),
            "department_name_in_hierarchy": wa.get("department_name_in_hierarchy"),
        }

    # ---------------------------------------------------------- mutation

    def _insert_segment(self, overrides, payload):
        self.conversations.append({**self._default_segment(payload), **overrides})

    def _update_in_progress(self, key_field, key, kind, overrides):
        for row in self.conversations:
            if row.get(key_field) == key and row["segment_kind"] == kind:
                row.update(overrides)
                return True
        return False

    def _upsert_agent(self, payload, status):
        entry = self._agent_entry(payload)
        uid = entry["agent_uuid"]
        ts = _trunc(payload["timestamp"])
        date_left = ts if status == AGENT_DELETED else None
        if uid not in self.agents:  # insert (incl. update-miss retry path)
            self.agents[uid] = {**entry, "date_joined": ts, "state": status, "date_left": date_left}
        else:
            prev = self.agents[uid]
            self.agents[uid] = {
                **prev,
                **entry,
                "state": status,
                "date_left": date_left,  # Active updates RESET date_left (events.js:230,244)
                "date_joined": prev["date_joined"],
            }

    # ------------------------------------------------------ the switch

    def _process(self, event: dict):
        raw = event["data"]["payload"]
        payload = dict(raw)
        payload["task_attributes"] = json.loads(raw.get("task_attributes") or "{}")
        payload["worker_attributes"] = json.loads(raw.get("worker_attributes") or "{}")
        self.tr_events.append(payload)  # every taskrouter event is cached

        et = payload["eventtype"]
        if et == "reservation.accepted":
            qd = self._queue_data(payload)
            ring = self._ring_time(payload)
            if qd is not None:
                self._insert_segment(
                    {
                        "segment_kind": QUEUE_SEGMENT,
                        "queue_time": qd["time_in_queue"],
                        "date": qd["start_date"],
                        "time": qd["start_date"],
                    },
                    payload,
                )
            self._insert_segment(
                {
                    "segment_kind": CONVO_IN_PROG_SEG,
                    "queue_time": qd["time_in_queue"] if qd else None,
                    "ring_time": ring,
                },
                payload,
            )
        elif et in ("reservation.rejected", "reservation.timeout", "reservation.canceled",
                    "reservation.rescinded"):
            kind = {
                "reservation.rejected": CONVO_REJECTED,
                "reservation.timeout": CONVO_MISSED,
                "reservation.canceled": CONVO_MISSED,
                "reservation.rescinded": CONVO_REVOKED,
            }[et]
            self._insert_segment(
                {"segment_kind": kind, "ring_time": self._ring_time(payload)}, payload
            )
        elif et == "reservation.completed":
            rsid = payload.get("reservation_sid")
            accepted = self._first_for_reservation(rsid, "reservation.accepted")
            if accepted is None:
                return  # reference: update-miss, no row (events.js:308-310)
            wrapup = self._latest_for_reservation(rsid, "reservation.wrapup")
            talk_anchor = wrapup["timestamp"] if wrapup else payload["timestamp"]
            talk = _secs(talk_anchor, accepted["timestamp"])
            wrap = _secs(payload["timestamp"], wrapup["timestamp"]) if wrapup else 0
            ta = payload.get("task_attributes") or {}
            self._update_in_progress(
                "reservation_sid",
                rsid,
                CONVO_IN_PROG_SEG,
                {
                    "segment_kind": CONVO_SEG,
                    "talk_time": talk,
                    "wrapup_time": wrap,
                    # always overwritten, even to None (events.js:582 spread)
                    "segment_link": (ta.get("conversations") or {}).get("segment_link"),
                },
            )
        elif et in ("task.canceled", "task.transfer-failed"):
            qd = self._queue_data(payload)
            abandon = {
                "abandon_time": qd["time_in_queue"] if qd else None,
                "queue_time": qd["time_in_queue"] if qd else None,
                "abandoned_phase": "Queue",
                "abandoned": "Yes",
            }
            if qd is not None:
                self._insert_segment(
                    {
                        "segment_kind": QUEUE_SEGMENT,
                        **abandon,
                        "date": qd["start_date"],
                        "time": qd["start_date"],
                    },
                    payload,
                )
            self._insert_segment({"segment_kind": CONVO_SEG, **abandon}, payload)
        elif et == "worker.created":
            self._upsert_agent(payload, AGENT_ACTIVE)
            self._insert_segment(
                {
                    "segment_kind": AGENT_STATUS_IN_PROGRESS,
                    "activity": payload.get("worker_activity_name"),
                },
                payload,
            )
        elif et == "worker.deleted":
            self._upsert_agent(payload, AGENT_DELETED)
        elif et == "worker.attributes.update":
            self._upsert_agent(payload, AGENT_ACTIVE)
        elif et == "worker.activity.update":
            self._upsert_agent(payload, AGENT_ACTIVE)
            self._update_in_progress(
                "agent_uuid",
                payload.get("worker_sid"),
                AGENT_STATUS_IN_PROGRESS,
                {
                    "segment_kind": AGENT_STATUS,
                    "activity_time": payload.get("worker_time_in_previous_activity"),
                },
            )
            self._insert_segment(
                {
                    "segment_kind": AGENT_STATUS_IN_PROGRESS,
                    "activity": payload.get("worker_activity_name"),
                    "activity_time": None,  # explicit undefined (events.js:652)
                },
                payload,
            )
        # else: cached only (events.js:665-666)

    # ------------------------------------------------------------ output

    def segment_rows(self) -> list[dict]:
        cols = [c for c, _ in SEGMENT_COLUMNS]
        return [{c: row.get(c) for c in cols} for row in self.conversations]

    def agent_rows(self) -> list[dict]:
        cols = [c for c, _ in AGENT_COLUMNS]
        return [{c: row.get(c) for c in cols} for row in self.agents.values()]


def run_fixture_sim() -> ReferenceSim:
    from .fixture import FIXTURE_EVENTS

    return ReferenceSim(FIXTURE_EVENTS)
