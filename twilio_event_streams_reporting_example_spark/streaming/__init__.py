"""Structured Streaming variants of the TaskRouter pipeline.

``taskrouter_stream`` — watermarked ingest with duplicate-delivery
dedup, the stateful conversation lifecycle (applyInPandasWithState
keyed by task_sid, event-time timeout → CORRUPTED CONVERSATION), and
the append event-log sink (S4).
"""
