"""Driver-checkable queries for the TaskRouter pipeline (golden fixture).

The driver's parquet tables are generic, so these queries build the
reference-shaped CloudEvent fixture inline (deterministic literal rows per
FIXTURES.md §3) and run the real pipeline over it; the oracles are golden
VALUES rows hand-derived from the reference's semantics
(reference routes/events.js:513-667).

Populated together with plans/taskrouter.py.
"""

from __future__ import annotations
