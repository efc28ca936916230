"""TaskRouter domain pipeline: the reference's actual purpose.

Turns Twilio Event Streams CloudEvents for TaskRouter into the Flex
Insights "conversations" segment fact table and "agents" current-state
dimension (reference routes/events.js:513-667 state machine,
events.js:337-485 wide projection, events.js:258-296 agent entry).

Modules:
  schema   — CloudEvent envelope / payload StructTypes + the segment and
             agent column specs shared by engine, simulator and oracles.
  fixture  — deterministic CloudEvent fixture rows (FIXTURES.md §2-3).
  sim      — independent pure-Python row-at-a-time simulator of the
             reference semantics; produces the golden oracle rows.
"""
