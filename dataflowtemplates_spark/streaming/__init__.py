"""Structured Streaming extensions.

The reference is 100% batch — no windows, watermarks, triggers or
state anywhere in its 36 files (SURVEY.md §2.7) — so nothing here is
parity; these are the streaming forms a 100 TB ingestion pipeline
needs, built on the same operator semantics as the batch queries
(q16/q34 are the batch twins of the session/tumbling aggregations).
"""

from dataflowtemplates_spark.streaming.pipelines import (  # noqa: F401
    dedup_stream,
    sessionized_stream,
    stream_events,
    stream_to_keyed_table,
    tumbling_counts_stream,
    user_stats_stateful,
)
