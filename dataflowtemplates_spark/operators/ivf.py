"""Persisted IVF index: inverted lists as a cell-partitioned table.

q65 builds its IVF cells inline; at 100 TB the build is a one-time
job and queries should touch only their probed cells. This module
persists the cell assignment as a parquet table PARTITIONED BY cell,
so a search with nprobe cells prunes every other partition at the
SCAN (PartitionFilters — no task even opens the unprobed files).

Build: one map-only `assign_cells` pass + a partitioned write.
Search: partition-pruned scan of the probed cells, exact cosine
scoring against the broadcast queries, shuffle-free two-phase top-k.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["append_ivf_index", "build_ivf_index", "search_ivf_index"]


def _write_cells(emb: DataFrame, codebook: list[tuple[int, list[float]]],
                 path: str, mode: str) -> None:
    """Shared assign-and-persist body for build/append: one map-only
    nearest-cell assignment, one cell-partitioned parquet write."""
    from dataflowtemplates_spark.queries.similarity import (
        _with_norm, assign_cells)
    n = _with_norm(emb, "c_id", "c_vec", "c_nrm")
    cells = assign_cells(n, "c_vec", "c_nrm", codebook, nprobe=1)
    (cells.write.mode(mode).partitionBy("cell").parquet(path))


def build_ivf_index(emb: DataFrame, codebook: list[tuple[int, list[float]]],
                    path: str) -> None:
    """Assign every vector to its nearest codebook cell (map-only) and
    persist the inverted lists partitioned by cell."""
    _write_cells(emb, codebook, path, "overwrite")


def append_ivf_index(emb_new: DataFrame,
                     codebook: list[tuple[int, list[float]]],
                     path: str) -> None:
    """Incremental index maintenance: assign ONLY the new vectors
    (map-only, O(batch)) and append their inverted-list rows — the
    codebook is frozen, so assignment is a pure function of the vector
    and the appended index is IDENTICAL to a from-scratch rebuild over
    the union (pinned by tests/test_scale_ops.py). This is how a 100 TB
    index absorbs a daily increment without re-touching the corpus;
    codebook refresh (drifted centroids) is the declared O(table)
    rebuild, exactly like rebucket for the keyed table."""
    _write_cells(emb_new, codebook, path, "append")


def search_ivf_index(spark: SparkSession, path: str, queries: DataFrame,
                     codebook: list[tuple[int, list[float]]],
                     k: int = 3, nprobe: int = 2) -> DataFrame:
    """Top-k nearest stored vectors for each query row (vec_id +
    embedding), probing ``nprobe`` cells per query. The cell filter is
    a partition predicate, so unprobed inverted lists are never read.
    """
    from dataflowtemplates_spark.operators.topk import topk_per_key
    from dataflowtemplates_spark.queries.similarity import (
        _cosine, _with_norm, assign_cells)
    q = _with_norm(queries, "q_id", "q_vec", "q_nrm", spread=False)
    probes = assign_cells(q, "q_vec", "q_nrm", codebook, nprobe=nprobe)
    probe_cells = sorted({r["cell"] for r in
                          probes.select("cell").distinct().collect()})
    index = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    scored = (index.join(F.broadcast(probes), "cell")
              .select("q_id", "c_id", "cell",
                      _cosine("q_vec", "c_vec", "q_nrm", "c_nrm")
                      .alias("cosine")))
    return topk_per_key(scored, "q_id", "cosine", "c_id", k,
                        payload=["cell"])
