"""PySpark-native analytics engine with the query and data-processing
capabilities of twilio-professional-services/twilio-event-streams-reporting-example,
re-expressed Spark-first (DataFrame/SQL + Structured Streaming).

Layout:
    session     - SparkSession factory tuned for local[N] and cluster scale
    sources     - table loaders / CloudEvents ingestion
    functions   - scalar expression library (coalesce chains, mappings, time)
    operators   - as-of join, sessionization, latest-state, dedup, similarity,
                  text analysis, multimodal plumbing
    plans       - the TaskRouter "conversations"/"agents" reporting pipeline
    streaming   - Structured Streaming variants (watermark dedup, stateful
                  conversation lifecycle, foreachBatch upsert)
"""

__version__ = "0.1.0"
