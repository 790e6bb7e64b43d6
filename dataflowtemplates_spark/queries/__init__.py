"""Query registry: every operator surfaced as (spark, sf_dir) -> DataFrame.

Each submodule exports ``QUERIES`` (name -> callable) and ``ORACLES``
(name -> equivalent DuckDB SQL). ``__spark_entry__.py`` aggregates them
for the driver's correctness harness; ``bench.py`` runs the headline
subset.

Determinism contract (why the decimal casts everywhere): floating-point
aggregation is order-dependent, and Spark/DuckDB will not sum a parquet
column in the same order. Every money/measure aggregate therefore casts
to an exact DECIMAL first (the data is 2-decimal currency — SURVEY.md
§7.4), aggregates exactly, and casts the final result to DOUBLE. Both
engines then produce bit-identical doubles, so the driver's value-hash
matches without tolerance.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataflowtemplates_spark.queries import (
    dedup,
    generator_queries,
    multimodal_queries,
    relational,
    sampling,
    similarity,
    streaming_queries,
    temporal,
    text,
)

_MODULES = (relational, temporal, text, sampling, dedup, similarity,
            generator_queries, multimodal_queries, streaming_queries)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
