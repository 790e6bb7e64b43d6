"""Partition-count hygiene for compute-heavy scans.

A single small parquet file arrives as ONE input partition, which pins
every downstream explode/hash/codegen pass to one core; but an
unconditional ``repartition()`` is a full shuffle of the input — at
100 TB that is a gratuitous exchange of the whole corpus that the
cluster's scan parallelism already made unnecessary (a big table scan
arrives in thousands of splits). ``spread_if_narrow`` repartitions ONLY
when the scan is actually narrower than the cluster's parallelism, so
toy inputs fan out and at-scale inputs keep their scan partitioning
with zero added exchanges.

Reference parity note: mercari/DataflowTemplates delegates input
splitting to Dataflow's liquid sharding; this is the Spark-native
equivalent guard (engine infrastructure, SURVEY §7 scale plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_if_narrow"]


def spread_if_narrow(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Round-robin repartition to ``defaultParallelism`` — but only when
    the plan's current partition count is below ``min_factor`` x that
    target.

    SCAN-INPUT ONLY: pass a DataFrame whose plan is a file scan plus
    map-side projections/filters. For such plans ``df.rdd`` is
    job-free — the partition count comes from the file-split math. On
    a SHUFFLED input under AQE the same probe can execute the upstream
    query stages to materialize the shuffle (and the ``.rdd`` hop
    detaches the Dataset lineage Catalyst would otherwise reuse), so
    this helper must not be applied post-exchange; file-count width is
    no substitute either (one large file still splits into many scan
    partitions, so ``df.inputFiles()`` under-counts real width).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < int(target * min_factor):
        return df.repartition(target)
    return df
