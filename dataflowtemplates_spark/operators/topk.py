"""Distributed per-key top-k that never funnels the scored set into
``n_keys`` tasks and never crosses into Python.

The naive form — ``row_number().over(Window.partitionBy(key))`` then
``filter(rk <= k)`` — shuffles EVERY scored row into ``n_keys``
partitions. When the key is low-cardinality (a handful of ANN query
ids) that is a handful of giant tasks holding the whole scored set:
correct at sf0.1, catastrophic at 100 TB.

``topk_per_key`` is the two-phase decomposition (top-k is a
decomposable aggregate, so the result is bit-identical):

1. **Balanced local top-k**: group by ``(key, spark_partition_id())``
   and keep the k best rows per group via
   ``slice(sort_array(collect_list(struct)), 1, k)``. The exchange
   this plans has cardinality ``n_keys x n_partitions`` — every task
   holds ~one input partition's worth of narrow rows regardless of key
   skew, so parallelism survives low key cardinality. Rows are
   projected down to ``(key, id, payload, score)`` before the exchange;
   nothing else moves.
2. **Merge** (tiny shuffle): groupBy(key) over at most
   ``n_partitions x k`` survivors per key, ordered merge via the same
   sort_array+slice, ranked by position.

Memory bound: phase 1's collect_list buffers, per aggregation task, at
most one input partition's worth of the NARROW projection (the slice
applies after the per-group list completes) — bounded by the scan
split size (`spark.sql.files.maxPartitionBytes`), and the planner's
ObjectHashAggregate falls back to sort-based aggregation on memory
pressure, so a wide partition spills instead of OOMing. The earlier
pandas partial held only k rows per key but paid an Arrow crossing on
every scored row; this trade buys zero Python and codegen'd sorts.

Both phases are pure JVM expressions inside whole-stage codegen — an
earlier revision ran phase 1 as an Arrow-batched ``mapInPandas``
partial, which kept memory bounded but paid a per-row Arrow crossing
into Python on the full scored set (and disagreed with phase 2 on NaN
ordering: pandas sorts NaN last, ``sort_array`` sorts NaN above all
doubles).

NaN policy: rows whose score is NaN (e.g. 0/0 cosine from a zero-norm
vector) are DROPPED up front — a NaN score carries no ranking
information, and dropping it makes both phases agree by construction.

Ordering contract (mirrored in the DuckDB oracles): score DESC, then
``id_col`` ASC as the deterministic tiebreak — one ascending
lexicographic struct sort on ``(-score, id)``; negation is a lossless
sign-bit flip for doubles, so the score round-trips exactly. The id
column may be ANY orderable type (numeric, string, date); the score
must be numeric.

Reference parity note: mercari/DataflowTemplates has no top-k operator
(its "queries" are pushed down); this is engine infrastructure for the
ANN extension operators (queries/similarity.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, FloatType, NumericType

__all__ = ["topk_per_key"]


def topk_per_key(scored: DataFrame, key: str, score: str, id_col: str,
                 k: int, payload: Sequence[str] = ()) -> DataFrame:
    """Top ``k`` rows per ``key`` ordered by ``score`` DESC, ``id_col``
    ASC, with an ``rk`` (1-based int) rank column.

    Output columns: ``key, rk, id_col, *payload, score``. Rows with a
    NaN score are dropped (see module docstring). Raises ``TypeError``
    if the score column is not numeric — a lexicographic string sort on
    scores would silently mis-rank.
    """
    payload = list(payload)
    narrow = scored.select(key, id_col, *payload, score)
    stype = narrow.schema[score].dataType
    if not isinstance(stype, NumericType):
        raise TypeError(
            f"topk_per_key score column {score!r} must be numeric, "
            f"got {stype.simpleString()}")
    if isinstance(stype, (FloatType, DoubleType)):
        narrow = narrow.filter(~F.isnan(F.col(score)))

    ordered = F.struct(
        (-F.col(score)).alias("_ns"),
        F.col(id_col).alias("_id"),
        *[F.col(p).alias(p) for p in payload])
    local = (
        narrow
        .groupBy(key, F.spark_partition_id().alias("_pid"))
        .agg(F.slice(F.sort_array(F.collect_list(ordered)), 1, k)
             .alias("_top"))
        .select(key, F.explode("_top").alias("_t")))
    return (
        local.groupBy(key)
        .agg(F.slice(F.sort_array(F.collect_list("_t")), 1, k).alias("_top"))
        .select(key, F.posexplode("_top").alias("_pos", "_t"))
        .select(F.col(key),
                (F.col("_pos") + 1).cast("int").alias("rk"),
                F.col("_t._id").alias(id_col),
                *[F.col(f"_t.{p}").alias(p) for p in payload],
                (-F.col("_t._ns")).alias(score)))
