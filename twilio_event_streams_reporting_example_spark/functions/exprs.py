"""Scalar expression library (SURVEY.md §2.3, P1-P12).

Everything here is built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd. No Python UDFs in this module by design: these
expressions sit in the hot path of a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def truncate_ms(ts: Column) -> Column:
    """Truncate a timestamp to whole seconds before any duration math.

    Mirrors the reference's ``new Date(ts).setMilliseconds(0)``
    (reference routes/events.js:162-165) — "flex insights ignores those".
    """
    return F.date_trunc("second", ts)


def epoch_seconds(ts: Column) -> Column:
    """Epoch seconds as a long, after ms truncation (P10)."""
    return truncate_ms(ts).cast("long")


def seconds_between(end_ts: Column, start_ts: Column) -> Column:
    """Integer-second delta: round((end - start)/1000) with ms pre-truncated.

    Reference: routes/events.js:166,176,189,194,207. Because both ends are
    truncated to the second first, the division is exact and ``round`` is a
    no-op — we keep plain long subtraction (cheaper, same value).
    """
    return epoch_seconds(end_ts) - epoch_seconds(start_ts)


def coalesce_chain(*cols: Column | str) -> Column:
    """``custom_data?.x || fallback || ...`` chains (P2, P6).

    NOTE the reference uses JS ``||`` which treats '' and 0 as missing; we
    deliberately use SQL NULL semantics (coalesce) — empty string is a value.
    Call sites that need JS semantics wrap inputs with ``nullif(col, '')``.
    """
    return F.coalesce(*[F.col(c) if isinstance(c, str) else c for c in cols])


def js_falsy_to_null(col: Column) -> Column:
    """Map JS-falsy string values ('' only, for string columns) to NULL so a
    coalesce chain reproduces ``||`` behavior."""
    return F.nullif(col, F.lit(""))


def map_channel(channel: Column) -> Column:
    """voice→'Call', chat→'Chat', else pass-through (P3; reference events.js:420)."""
    return (
        F.when(channel == "voice", F.lit("Call"))
        .when(channel == "chat", F.lit("Chat"))
        .otherwise(channel)
    )


def map_direction(direction: Column) -> Column:
    """inbound/internal/outbound → title-case, else DEFAULT 'Inbound'
    (P4; reference events.js:443 — note the default branch)."""
    return (
        F.when(direction == "inbound", F.lit("Inbound"))
        .when(direction == "internal", F.lit("Internal"))
        .when(direction == "outbound", F.lit("Outbound"))
        .otherwise(F.lit("Inbound"))
    )


def hierarchy_join(col: Column, sep: str = " ▸ ") -> Column:
    """Array→string join with the reference's ' ▸ ' separator when the value
    is an array, pass-through when scalar (P8; reference events.js:457,462).

    Expects the column already typed as array<string>; scalar variants are
    handled by the caller's schema (string column passes through).
    """
    return F.array_join(col, sep)


def roles_join(roles: Column, role: Column) -> Column:
    """roles array joined ', ' if present else scalar role
    (P7; reference events.js:274)."""
    return F.when(roles.isNotNull(), F.array_join(roles, ", ")).otherwise(role)
