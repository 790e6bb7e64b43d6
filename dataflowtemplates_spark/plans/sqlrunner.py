"""SQL execution surface (reference operators S1-S4).

The reference pushes the whole SQL string down to Spanner/BigQuery
(reference: transforms/SpannerQueryIO.java:127,
templates/BigQueryToSpanner.java:101-103); here Catalyst *is* the
engine, so `run_query` = `spark.sql` plus the reference's API sugar:

* `--SPLITTER--` multi-query union (reference: SpannerQueryIO.java:29,
  73-87): each sub-query runs as one branch of a UNION ALL. In the
  reference this is the user's manual parallelism knob; Catalyst
  parallelizes a single query fine, but the semantics (concat the
  sub-results) are preserved.
* timestamp-bound snapshot reads (reference: SpannerQueryIO.java:129-136):
  for the engine's own mutable KeyedTables, pass them via
  ``keyed_tables`` and the bound resolves each to its versioned
  snapshot (operators/mutations.py `read_at`) before the query runs.
  Immutable parquet sources are snapshots already, so a bound without
  keyed tables is a no-op by construction.
* the serial-read fallback for non-root-partitionable queries
  (reference: SpannerQueryIO.java:152-171) has no Spark analogue —
  ORDER BY / LIMIT queries already execute distributed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

#: Literal splitter token (reference: SpannerQueryIO.java:29).
SPLITTER = "--SPLITTER--"


def split_queries(query: str) -> list[str]:
    """Split a multi-query string on the literal ``--SPLITTER--`` token."""
    return [q.strip() for q in query.split(SPLITTER) if q.strip()]


def run_query(spark: SparkSession, query: str,
              timestamp_bound: str | None = None,
              keyed_tables: dict | None = None) -> DataFrame:
    """Execute a (possibly ``--SPLITTER--``-joined) SQL string.

    Sub-query results are concatenated with UNION ALL by position
    (the reference flattens the per-query PCollections —
    SpannerQueryIO.java:86-87). ``keyed_tables`` maps view names to
    KeyedTable instances; with a ``timestamp_bound`` each is registered
    at its snapshot as of the bound (SpannerQueryIO.java:129-136
    semantics), otherwise at its current state. Immutable parquet
    views are unaffected by the bound (snapshot-by-immutability).
    """
    for name, table in (keyed_tables or {}).items():
        table.register(name, timestamp_bound)
    parts = split_queries(query)
    if not parts:
        raise ValueError("empty query")
    dfs = [spark.sql(q) for q in parts]
    return reduce(DataFrame.unionAll, dfs)
