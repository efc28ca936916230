"""TaskRouter segment engine: CloudEvents → conversations fact + agents
dimension, as a declarative batch recompute over the event log.

This is the Spark-first re-expression of the reference's per-event
mutating state machine (reference routes/events.js:513-667):

  reference (row-at-a-time, mutable)      this engine (set-wise, append-only)
  --------------------------------------  -----------------------------------
  per-event O(n) lookups into trEvents    one window/groupBy per correlation
    (events.js:74-157)                      key — as-of via running last(),
                                            reservation pivot via min/max-by
  IN PROGRESS row updated in place        kind decided declaratively: a
    (events.js:298-334)                     completed match → CONVERSATION,
                                            else CONVERSATION IN PROGRESS
  duplicate delivery double-inserts       dropDuplicates on CloudEvent id
    (events.js:488)                         (first arrival wins)
  arrival-order dependent (README.md:13)  event-time semantics throughout

Engine policy divergences from the reference are documented in
``taskrouter/sim.py`` (the golden-oracle generator) and applied
identically here — notably NULL measures instead of silently dropping
an event whose correlation partner is missing.

Scale design (100 TB):
  - The parsed event log is the only scanned input; every derivation is
    one hash shuffle on its natural key (task_sid for the queue as-of,
    reservation_sid for the reservation pivot, worker_sid for agent
    sessions + dimension). No shuffle reuses a skewed key twice in a row.
  - The as-of pairing is the O(n) running-``last()`` window formulation,
    not a range join: union entries+exits, sort within task_sid once.
  - Segment branches are unions of filtered projections over the SAME
    cached parse — Catalyst prunes each branch's columns independently.
  - Everything is built-in expressions (zero Python UDFs); the wide
    projection is ~65 JVM column expressions inside one codegen stage.
  - On a real cluster the event log would be date-partitioned parquet;
    here the fixture is tiny, but the plan shape is scale-invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exprs import (
    coalesce_chain,
    hierarchy_join,
    js_falsy_to_null,
    map_channel,
    map_direction,
    roles_join,
    seconds_between,
    truncate_ms,
)
from ..taskrouter import schema as S

# --------------------------------------------------------------- ingest


def ingest_taskrouter(raw: DataFrame) -> DataFrame:
    """CloudEvent JSON strings → parsed, deduplicated event log (S1+S3).

    ``raw``: (arrival_idx long, raw string). PERMISSIVE parse: events
    that fail the envelope schema yield null ids and are dropped, which
    mirrors the reference's per-event error isolation (events.js:672-674).
    """
    env = raw.select(
        "arrival_idx", F.from_json("raw", S.ENVELOPE_STRUCT).alias("e")
    ).select("arrival_idx", "e.id", "e.type", F.col("e.data.payload").alias("p"))

    ev = env.filter(F.col("type").startswith(S.TASKROUTER_PREFIX)).filter(
        F.col("id").isNotNull()
    )

    # Dedup by CloudEvent id, first arrival wins — one shuffle on id.
    dw = W.partitionBy("id").orderBy("arrival_idx")
    ev = ev.withColumn("rn", F.row_number().over(dw)).filter(F.col("rn") == 1).drop("rn")

    return ev.select(
        F.col("id").alias("event_id"),
        "arrival_idx",
        F.col("p.eventtype").alias("eventtype"),
        F.col("p.timestamp").cast("timestamp").alias("ts"),
        F.col("p.task_sid").alias("task_sid"),
        F.col("p.reservation_sid").alias("reservation_sid"),
        F.col("p.worker_sid").alias("worker_sid"),
        F.from_json("p.task_attributes", S.TASK_ATTRIBUTES_STRUCT).alias("ta"),
        F.col("p.task_attributes").alias("ta_raw"),
        F.from_json("p.worker_attributes", S.WORKER_ATTRIBUTES_STRUCT).alias("wa"),
        F.col("p.task_completed_reason").alias("task_completed_reason"),
        F.col("p.task_canceled_reason").alias("task_canceled_reason"),
        F.col("p.task_channel_unique_name").alias("tcun"),
        F.col("p.workflow_name").alias("workflow_name"),
        F.col("p.task_queue_name").alias("task_queue_name"),
        F.col("p.task_queue_sid").alias("task_queue_sid"),
        F.col("p.worker_activity_name").alias("worker_activity_name"),
        F.col("p.worker_time_in_previous_activity").alias("wtip"),
    )


# ------------------------------------------------- wide projection (P1-P12)

def _null_long() -> Column:
    # built lazily: F.lit needs an active SparkContext, and this module
    # must stay importable before the session exists
    return F.lit(None).cast("long")


def _null_ts() -> Column:
    return F.lit(None).cast("timestamp")


_falsy = js_falsy_to_null  # JS ``||`` treats '' as missing (strings only)


def _hier(col: Column) -> Column:
    """String-or-array<string> custom field → ' ▸ '-joined string
    (reference events.js:457,462). ``col`` is the raw JSON text from
    get_json_object: arrays arrive as '["a","b"]' JSON, scalars plain."""
    return F.when(
        col.startswith("["),
        hierarchy_join(F.from_json(col, "array<string>")),
    ).otherwise(col)


def default_segment_exprs(df: DataFrame) -> dict[str, Column]:
    """The ~65-column default segment projection of one event row
    (reference events.js:337-485), as named JVM column expressions.

    custom_data = {...ta.conversations, ...worker_attributes}
    (events.js:353-356, worker wins) → per-field coalesce; fields the
    worker schema doesn't define read straight from ta.conversations.
    """
    conv = F.col("ta.conversations")
    wa = F.col("wa")

    def cust(field: str, falsy: bool = False) -> Column:
        c = conv.getField(field)
        if field in S.WORKER_ATTR_STRINGS:
            c = F.coalesce(wa.getField(field), c)
        return _falsy(c) if falsy else c

    def cust_m(field: str) -> Column:
        # numeric custom measure: plain assignment, 0 is kept (no ||)
        return conv.getField(field)

    tcun = F.col("tcun")
    dir_raw = F.col("ta.direction")
    ts_sec = truncate_ms(F.col("ts"))

    exprs: dict[str, Column] = {
        "conversation_id": coalesce_chain(
            cust("conversation_id", falsy=True),
            _falsy(F.col("task_sid")),
            _falsy(F.col("worker_sid")),
        ),
        "segment_external_id": coalesce_chain(
            _falsy(F.col("task_sid")), _falsy(F.col("worker_sid"))
        ),
        "reservation_sid": F.coalesce(F.col("reservation_sid"), F.lit("")),
        "agent_uuid": F.coalesce(F.col("worker_sid"), F.lit("")),
        "date": ts_sec,
        "time": ts_sec,
        "activity_time": F.col("wtip"),
        "abandoned": F.coalesce(cust("abandoned", falsy=True), F.lit("N")),
        "abandoned_phase": cust("abandoned_phase"),
        "activity": F.coalesce(cust("activity", falsy=True), F.col("worker_activity_name")),
        "campaign": cust("campaign"),
        "case": cust("case"),
        # events.js:420 — voice→'Call', chat→'Chat', else pass-through
        "channel": F.coalesce(cust("channel", falsy=True), map_channel(tcun)),
        "content": cust("content"),
        "destination": cust("destination"),
        # events.js:443 — note the default 'Inbound' branch
        "direction": F.coalesce(cust("direction", falsy=True), map_direction(dir_raw)),
        "external_contact": F.coalesce(
            cust("external_contact", falsy=True),
            F.when(dir_raw == "outbound", F.col("ta").getField("from")).otherwise(
                F.col("ta.to")
            ),
        ),
        "followed_by": cust("followed_by"),
        "handling_department_id": cust("department_id"),
        "handling_department_name": cust("department_name"),
        "handling_department_name_in_hierarchy": _hier(
            F.get_json_object("ta_raw", "$.conversations.handling_department_name_in_hierarchy")
        ),
        "handling_team_id": F.coalesce(
            cust("team_id", falsy=True), cust("team", falsy=True), F.col("task_queue_sid")
        ),
        "handling_team_name": F.coalesce(
            cust("team_name", falsy=True), cust("team", falsy=True), F.col("task_queue_name")
        ),
        "handling_team_name_in_hierarchy": F.coalesce(
            wa.getField("team_name_in_hierarchy"),
            _hier(F.get_json_object("ta_raw", "$.conversations.team_name_in_hierarchy")),
        ),
        "hang_up_by": cust("hang_up_by"),
        "in_business_hours": cust("in_business_hours"),
        "initiated_by": cust("initiated_by"),
        "initiative": cust("initiative"),
        "ivr_path": cust("ivr_path"),
        "language": cust("language"),
        "order": cust("order"),
        "outcome": F.coalesce(
            cust("outcome", falsy=True),
            _falsy(F.col("ta.reason")),
            _falsy(F.col("task_completed_reason")),
            _falsy(F.col("task_canceled_reason")),
        ),
        "preceded_by": cust("preceded_by"),
        "productive": cust("productive"),
        "queue": F.coalesce(cust("queue", falsy=True), F.col("task_queue_name")),
        "segment_link": cust("segment_link"),
        "service_level": cust("service_level"),
        "source": cust("source"),
        "virtual": cust("virtual"),
        "workflow": F.coalesce(cust("workflow", falsy=True), F.col("workflow_name")),
    }
    for m in S.CUSTOM_MEASURES:
        exprs[m] = cust_m(m)  # plain assignment: custom value or null, 0 kept
    for i in range(1, 11):
        exprs[f"conversation_attribute_{i}"] = cust(f"conversation_attribute_{i}")
        exprs[f"conversation_label_{i}"] = cust(f"conversation_label_{i}")
    return exprs


def _wide_select(df: DataFrame, overrides: dict[str, Column]) -> DataFrame:
    """Default projection ⊕ per-kind overrides, in canonical column order
    (the engine analog of ``{...defaultSegment, ...segmentDetails}``,
    reference events.js:215-218)."""
    base = default_segment_exprs(df)
    cols = []
    for name, _ in S.SEGMENT_COLUMNS:
        if name == "segment_kind":
            cols.append(overrides["segment_kind"].alias("segment_kind"))
        else:
            cols.append(overrides.get(name, base[name]).alias(name))
    return df.select(*cols)


# --------------------------------------------------------- correlations


def _queue_asof(parsed: DataFrame, exits: DataFrame) -> DataFrame:
    """As-of pairing (F6/D1): for each exit row, the latest
    entered/transfer-initiated event of the same task STRICTLY before it.

    O(n) running-last window per task_sid: union entries+exits, order by
    (ts, is_entry, arrival_idx) — exits sort before a same-ts entry, so
    the running ``last(entry_ts)`` at an exit row sees only strictly
    earlier entries (the reference compares raw ms timestamps with ``<``,
    events.js:80). Returns (event_id, entry_ts)."""
    entries = parsed.filter(
        F.col("eventtype").isin(S.ET_TASK_QUEUE_ENTERED, S.ET_TASK_TRANSFER_INITIATED)
    ).select(
        "task_sid", "ts", "arrival_idx", F.lit(1).alias("is_entry"),
        F.lit(None).cast("string").alias("event_id"),
    )
    ex = exits.select(
        "task_sid", "ts", "arrival_idx", F.lit(0).alias("is_entry"), "event_id"
    )
    un = entries.unionByName(ex)
    w = (
        W.partitionBy("task_sid")
        .orderBy("ts", "is_entry", "arrival_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    entry_ts = F.last(F.when(F.col("is_entry") == 1, F.col("ts")), ignorenulls=True).over(w)
    return (
        un.withColumn("entry_ts", entry_ts)
        .filter(F.col("is_entry") == 0)
        .select("event_id", "entry_ts")
    )


def _created_asof(parsed: DataFrame, exits: DataFrame) -> DataFrame:
    """Ring-time anchor (D2): for each exit row (accepted/failed), the
    latest reservation.created of the same reservation processed STRICTLY
    earlier in event-time order ``(ts, arrival_idx)``.

    The reference resolves the created lookup AT exit-processing time
    (events.js:92-104 scans only already-cached events), so a created
    event timestamped after the exit must yield NULL ring_time — never a
    negative one. Same O(n) running-last window as :func:`_queue_asof`,
    keyed on reservation_sid; since processing order is ts-ascending, the
    running last visible created IS the max-ts one the reference picks.
    Returns (event_id, created_ts)."""
    created = parsed.filter(F.col("eventtype") == S.ET_RESERVATION_CREATED).select(
        "reservation_sid", "ts", "arrival_idx",
        F.lit(1).alias("is_created"),
        F.lit(None).cast("string").alias("event_id"),
    )
    ex = exits.select(
        "reservation_sid", "ts", "arrival_idx", F.lit(0).alias("is_created"), "event_id"
    )
    un = created.unionByName(ex)
    w = (
        W.partitionBy("reservation_sid")
        .orderBy("ts", "arrival_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    created_ts = F.last(
        F.when(F.col("is_created") == 1, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        un.withColumn("created_ts", created_ts)
        .filter(F.col("is_created") == 0)
        .select("event_id", "created_ts")
    )


def _reservation_pivot(parsed: DataFrame) -> DataFrame:
    """One row per reservation_sid with the correlation anchors the state
    machine needs (F5 latest wrapup, first completed + its segment_link
    custom override). One groupBy shuffle. The created/ring anchor is
    per-exit, not per-reservation — see :func:`_created_asof`."""
    et = F.col("eventtype")
    is_wrapup = et == S.ET_RESERVATION_WRAPUP
    is_completed = et == S.ET_RESERVATION_COMPLETED
    ord_ = F.struct("ts", "arrival_idx")
    piv = (
        parsed.filter(is_wrapup | is_completed)
        .groupBy("reservation_sid")
        .agg(
            # every wrapup ts (tiny list per reservation): the one the
            # completed event SEES is resolved below against completed_ts
            F.collect_list(F.when(is_wrapup, F.col("ts"))).alias("wrapup_ts_all"),
            F.min_by(F.when(is_completed, F.col("ts")), F.when(is_completed, ord_)).alias(
                "completed_ts"
            ),
            F.min_by(
                F.when(is_completed, F.col("ta.conversations.segment_link")),
                F.when(is_completed, ord_),
            ).alias("completed_segment_link"),
            # first completed may carry a null segment_link that must still
            # OVERWRITE the accepted event's custom value (events.js:578-583
            # spread) — track presence separately from the value.
            F.max(F.when(is_completed, F.lit(True))).alias("has_completed"),
        )
    )
    # The reference resolves the wrapup lookup AT completed-processing
    # time (events.js:181): in event-time order that means only wrapups
    # strictly BEFORE the completed event count — a wrapup delivered
    # after completion yields talk=completed-accepted and wrapup_time=0,
    # not a retroactive recompute.
    eligible = F.when(
        F.col("completed_ts").isNotNull(),
        F.filter("wrapup_ts_all", lambda w: w < F.col("completed_ts")),
    ).otherwise(F.col("wrapup_ts_all"))
    return piv.withColumn("wrapup_ts", F.array_max(eligible)).drop("wrapup_ts_all")


# ---------------------------------------------------------- the segments


def taskrouter_segments_df(spark: SparkSession, raw: DataFrame) -> DataFrame:
    """The conversations fact table: every §2.5 transition as a union of
    filtered projections over one parsed event log."""
    # same defense as sources/tables.py: a non-UTC driver session would
    # render every truncated timestamp in local time and value-mismatch
    # the golden oracles even though the instants are correct
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    parsed = ingest_taskrouter(raw).cache()
    et = F.col("eventtype")

    # first accepted per reservation (F3; event-time first)
    aw = W.partitionBy("reservation_sid").orderBy("ts", "arrival_idx")
    accepted = (
        parsed.filter(et == S.ET_RESERVATION_ACCEPTED)
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    abandons = parsed.filter(et.isin(S.ET_TASK_CANCELED, S.ET_TASK_TRANSFER_FAILED))
    failed_ev = parsed.filter(
        et.isin(
            S.ET_RESERVATION_REJECTED,
            S.ET_RESERVATION_TIMEOUT,
            S.ET_RESERVATION_CANCELED,
            S.ET_RESERVATION_RESCINDED,
        )
    )

    # one as-of pass covers both exit families (same task_sid shuffle)
    exits = accepted.select("task_sid", "ts", "arrival_idx", "event_id").unionByName(
        abandons.select("task_sid", "ts", "arrival_idx", "event_id")
    )
    asof = _queue_asof(parsed, exits)  # (event_id, entry_ts)
    # one created-as-of pass covers both ring families (reservation_sid)
    ring_exits = accepted.select(
        "reservation_sid", "ts", "arrival_idx", "event_id"
    ).unionByName(failed_ev.select("reservation_sid", "ts", "arrival_idx", "event_id"))
    casof = _created_asof(parsed, ring_exits)  # (event_id, created_ts)
    pivot = _reservation_pivot(parsed)

    acc = (
        accepted.join(asof, "event_id", "left")
        .join(casof, "event_id", "left")
        .join(pivot, "reservation_sid", "left")
        .withColumn("entry_date", truncate_ms(F.col("entry_ts")))
        .withColumn(
            "queue_time_calc",
            F.when(
                F.col("entry_ts").isNotNull(), seconds_between(F.col("ts"), F.col("entry_ts"))
            ),
        )
        .withColumn(
            "ring_time_calc",
            F.when(
                F.col("created_ts").isNotNull(),
                seconds_between(F.col("ts"), F.col("created_ts")),
            ),
        )
        .withColumn(
            "talk_time_calc",
            F.when(
                F.col("has_completed"),
                seconds_between(
                    F.coalesce(F.col("wrapup_ts"), F.col("completed_ts")), F.col("ts")
                ),
            ),
        )
        .withColumn(
            "wrapup_time_calc",
            F.when(
                F.col("has_completed"),
                F.when(
                    F.col("wrapup_ts").isNotNull(),
                    seconds_between(F.col("completed_ts"), F.col("wrapup_ts")),
                ).otherwise(F.lit(0)),
            ),
        )
        .cache()
    )

    # QUEUE from accepted (only with an observed queue visit; engine policy)
    queue_acc = _wide_select(
        acc.filter(F.col("entry_ts").isNotNull()),
        {
            "segment_kind": F.lit(S.QUEUE_SEGMENT),
            "queue_time": F.col("queue_time_calc"),
            "date": F.col("entry_date"),
            "time": F.col("entry_date"),
        },
    )

    # CONVERSATION (completed) / CONVERSATION IN PROGRESS (still open)
    conv_base = default_segment_exprs(acc)
    convo = _wide_select(
        acc,
        {
            "segment_kind": F.when(
                F.col("has_completed"), F.lit(S.CONVO_SEG)
            ).otherwise(F.lit(S.CONVO_IN_PROG_SEG)),
            "queue_time": F.col("queue_time_calc"),
            "ring_time": F.col("ring_time_calc"),
            "talk_time": F.col("talk_time_calc"),
            "wrapup_time": F.col("wrapup_time_calc"),
            # completed's spread overwrites segment_link even with null
            "segment_link": F.when(
                F.col("has_completed"), F.col("completed_segment_link")
            ).otherwise(conv_base["segment_link"]),
        },
    )

    # REJECTED / MISSED / REVOKED (terminal ring-only segments)
    failed = failed_ev.join(casof, "event_id", "left")
    failed_kind = (
        F.when(et == S.ET_RESERVATION_REJECTED, F.lit(S.CONVO_REJECTED))
        .when(et == S.ET_RESERVATION_RESCINDED, F.lit(S.CONVO_REVOKED))
        .otherwise(F.lit(S.CONVO_MISSED))
    )
    failed_seg = _wide_select(
        failed,
        {
            "segment_kind": failed_kind,
            "ring_time": F.when(
                F.col("created_ts").isNotNull(),
                seconds_between(F.col("ts"), F.col("created_ts")),
            ),
        },
    )

    # abandoned-in-queue: QUEUE + CONVERSATION from the task event (D5)
    aband = abandons.join(asof, "event_id", "left").withColumn(
        "entry_date", truncate_ms(F.col("entry_ts"))
    ).withColumn(
        "queue_time_calc",
        F.when(F.col("entry_ts").isNotNull(), seconds_between(F.col("ts"), F.col("entry_ts"))),
    )
    abandon_overrides = {
        "queue_time": F.col("queue_time_calc"),
        "abandon_time": F.col("queue_time_calc"),
        "abandoned_phase": F.lit("Queue"),
        "abandoned": F.lit("Yes"),
    }
    queue_aband = _wide_select(
        aband.filter(F.col("entry_ts").isNotNull()),
        {
            "segment_kind": F.lit(S.QUEUE_SEGMENT),
            **abandon_overrides,
            "date": F.col("entry_date"),
            "time": F.col("entry_date"),
        },
    )
    convo_aband = _wide_select(
        aband, {"segment_kind": F.lit(S.CONVO_SEG), **abandon_overrides}
    )

    # agent-status sessionization (D6): created/activity.update open
    # intervals; the NEXT activity.update closes the previous one and
    # carries its activity_time (reference events.js:639-664)
    openers = parsed.filter(et.isin(S.ET_WORKER_CREATED, S.ET_WORKER_ACTIVITY_UPDATE))
    sw = W.partitionBy("worker_sid").orderBy("ts", "arrival_idx")
    sess = openers.withColumn("next_wtip", F.lead("wtip").over(sw)).withColumn(
        "next_ts", F.lead("ts").over(sw)
    )
    agent_seg = _wide_select(
        sess,
        {
            "segment_kind": F.when(
                F.col("next_ts").isNotNull(), F.lit(S.AGENT_STATUS)
            ).otherwise(F.lit(S.AGENT_STATUS_IN_PROGRESS)),
            "activity": F.col("worker_activity_name"),
            # closed → closing event's payload value; open → the opener's
            # own value for worker.created, explicit null for updates
            # (events.js:647,652)
            "activity_time": F.when(
                F.col("next_ts").isNotNull(), F.col("next_wtip")
            ).otherwise(
                F.when(et == S.ET_WORKER_CREATED, F.col("wtip")).otherwise(_null_long())
            ),
        },
    )

    out = (
        queue_acc.unionByName(convo)
        .unionByName(failed_seg)
        .unionByName(queue_aband)
        .unionByName(convo_aband)
        .unionByName(agent_seg)
    )
    # long-typed measures are long already; normalize every column type
    casts = {
        "BIGINT": "long",
        "VARCHAR": "string",
        "TIMESTAMP": "timestamp",
    }
    return out.select(
        *[F.col(name).cast(casts[t]).alias(name) for name, t in S.SEGMENT_COLUMNS]
    )


# ------------------------------------------------------- agents dimension


def taskrouter_agents_df(
    spark: SparkSession, raw: DataFrame, with_ordering: bool = False
) -> DataFrame:
    """Agents current-state dimension (S7 upsert → latest-wins recompute):
    latest worker.* event per worker supplies the 16 attribute columns
    (each reference upsert fully overwrites them, events.js:240-246);
    date_joined = first event's ts; state/date_left from the latest
    event's type. One window shuffle on worker_sid.

    ``with_ordering=True`` appends a ``last_ts`` column (the latest
    event's raw timestamp) so incremental upsert sinks can merge this
    batch's rows against an existing dimension (streaming foreachBatch
    path)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    parsed = ingest_taskrouter(raw)
    et = F.col("eventtype")
    workers = parsed.filter(
        et.isin(
            S.ET_WORKER_CREATED,
            S.ET_WORKER_DELETED,
            S.ET_WORKER_ACTIVITY_UPDATE,
            S.ET_WORKER_ATTRIBUTES_UPDATE,
        )
    )
    w = W.partitionBy("worker_sid")
    ww = w.orderBy(F.col("ts").desc(), F.col("arrival_idx").desc())
    latest = (
        workers.withColumn("rn", F.row_number().over(ww))
        .withColumn("first_ts", F.min("ts").over(w))
        .filter(F.col("rn") == 1)
    )
    wa = F.col("wa")
    is_deleted = et == S.ET_WORKER_DELETED
    cols = [
        F.col("worker_sid").alias("agent_uuid"),
        wa.getField("agent_attribute_1").alias("attribute_1"),
        wa.getField("agent_attribute_2").alias("attribute_2"),
        wa.getField("agent_attribute_3").alias("attribute_3"),
        wa.getField("email").alias("email"),
        wa.getField("agent_id").alias("agent_id"),
        wa.getField("location").alias("location"),
        wa.getField("phone").alias("phone"),
        roles_join(wa.getField("roles"), wa.getField("role")).alias("role"),
        wa.getField("team_id").alias("team_id"),
        wa.getField("team_name").alias("team_name"),
        wa.getField("team_name_in_hierarchy").alias("team_name_in_hierarchy"),
        wa.getField("manager").alias("manager"),
        wa.getField("department_id").alias("department_id"),
        wa.getField("department_name").alias("department_name"),
        wa.getField("department_name_in_hierarchy").alias("department_name_in_hierarchy"),
        F.when(is_deleted, F.lit(S.AGENT_DELETED)).otherwise(F.lit(S.AGENT_ACTIVE)).alias(
            "state"
        ),
        truncate_ms(F.col("first_ts")).alias("date_joined"),
        F.when(is_deleted, truncate_ms(F.col("ts"))).otherwise(_null_ts()).alias("date_left"),
    ]
    out = latest.select(*cols, F.col("ts").alias("last_ts"))
    casts = {"BIGINT": "long", "VARCHAR": "string", "TIMESTAMP": "timestamp"}
    ordered = [F.col(name).cast(casts[t]).alias(name) for name, t in S.AGENT_COLUMNS]
    if with_ordering:
        ordered.append(F.col("last_ts"))
    return out.select(*ordered)
