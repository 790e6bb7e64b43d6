"""Distributed per-key top-k without shuffling the scored rows.

The naive form — ``row_number().over(Window.partitionBy(key))`` then
``filter(rk <= k)`` — shuffles EVERY scored row into ``n_keys``
partitions. When the key is low-cardinality (a handful of ANN query
ids) that is a handful of giant tasks holding the whole scored set:
correct at sf0.1, catastrophic at 100 TB.

``topk_per_key`` is the two-phase decomposition (top-k is a
decomposable aggregate, so the result is bit-identical):

1. **Partition-local top-k** (no shuffle): an Arrow-batched
   ``mapInPandas`` pass keeps at most ``k`` rows per key per
   partition, carrying a bounded ``n_keys_seen x k`` frame across
   batches. Scoring stays JVM-side; only the already-scored scalar
   rows (ids + payload + the double score) cross into Python.
2. **Merge** (tiny shuffle): groupBy(key) over at most
   ``n_partitions x n_keys x k`` survivors, ordered merge via
   ``slice(sort_array(collect_list(struct(...))), 1, k)`` and ranked
   by position.

Ordering contract (mirrored in the DuckDB oracles): score DESC, then
``id_col`` ASC as the deterministic tiebreak — encoded in phase 2 as a
lexicographic struct sort on ``(score, -id)`` descending.

Reference parity note: mercari/DataflowTemplates has no top-k operator
(its "queries" are pushed down); this is engine infrastructure for the
ANN extension operators (queries/similarity.py).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["topk_per_key"]


def topk_per_key(scored: DataFrame, key: str, score: str, id_col: str,
                 k: int, payload: Sequence[str] = ()) -> DataFrame:
    """Top ``k`` rows per ``key`` ordered by ``score`` DESC, ``id_col``
    ASC, with an ``rk`` (1-based int) rank column.

    Output columns: ``key, rk, id_col, *payload, score``.
    """
    payload = list(payload)
    cols = [key, id_col, *payload, score]
    narrow = scored.select(*cols)
    id_type = narrow.schema[id_col].dataType.simpleString()

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if carry is None else pd.concat(
                [carry, pdf], ignore_index=True)
            if len(cur) == 0:
                carry = cur
                continue
            cur = cur.sort_values([key, score, id_col],
                                  ascending=[True, False, True],
                                  kind="mergesort")
            carry = cur.groupby(key, sort=False).head(k)
        if carry is not None and len(carry):
            yield carry

    partial = narrow.mapInPandas(_partial, schema=narrow.schema)

    ordered = F.struct(
        F.col(score).alias("_s"),
        (-F.col(id_col)).cast("long").alias("_nid"),
        *[F.col(p).alias(p) for p in payload])
    return (
        partial.groupBy(key)
        .agg(F.slice(F.sort_array(F.collect_list(ordered), asc=False),
                     1, k).alias("_top"))
        .select(key, F.posexplode("_top").alias("_pos", "_t"))
        .select(F.col(key),
                (F.col("_pos") + 1).cast("int").alias("rk"),
                (-F.col("_t._nid")).cast(id_type).alias(id_col),
                *[F.col(f"_t.{p}").alias(p) for p in payload],
                F.col("_t._s").alias(score)))
