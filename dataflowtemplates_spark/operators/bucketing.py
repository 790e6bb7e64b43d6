"""Bucketed-table helpers: co-located joins without a runtime shuffle.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides on the key. Writing both tables BUCKETED on that key (same
bucket count) moves the shuffle to write time, once; every subsequent
join on the key is exchange-free — each task reads bucket i from both
sides. This is the Spark-native equivalent of the co-located table
layouts warehouses use for their biggest recurring joins.

Reference parity note: the reference has no storage layout control
(Dataflow shuffles per job); this is engine infrastructure for the
repeated-join workloads SURVEY §7's scale plan calls out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready"]


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int,
                   sort_cols: list[str] | None = None) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) on ``bucket_cols``. Joins between tables
    bucketed on the same columns with the same bucket count skip the
    exchange entirely (and the sort, when sorted)."""
    writer = (df.write.mode("overwrite")
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True when both tables exist and bucketing is enabled, i.e. a
    join on their bucket columns will be exchange-free."""
    cat = spark.catalog
    return (spark.conf.get("spark.sql.sources.bucketing.enabled") == "true"
            and cat.tableExists(left) and cat.tableExists(right))
