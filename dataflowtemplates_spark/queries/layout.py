"""Physical-layout queries: data-clustering audits for scan pruning.

At 100 TB the scan is the query: a parquet/Delta/Iceberg reader skips a
file when the predicate cannot match the file's min/max column stats, so
HOW rows were clustered into files decides how much of the lake a
two-column box predicate has to read. The reference engine inherits this
from BigQuery/Spanner storage (clustered tables); here the engine makes
the trade itself, and this module measures it instead of guessing:
q171 lays the SAME rows out three ways — shuffled (no clustering),
linear (sorted by one dimension), and Z-order (Morton-interleaved bits
of both dimensions, the Delta ``OPTIMIZE ZORDER BY`` device) — computes
real per-file min/max stats, and counts the files a box predicate scans
under each layout.

Everything is exact integer arithmetic (the registry's determinism
contract): bit interleaving, fixed-range file assignment, min/max stats,
and skip decisions are all BIGINT ops that DuckDB reproduces
bit-for-bit; the single float division (scan efficiency) is one
identical op in both engines.

Reference anchors: SpannerToText.java:41-75 exports rows whose storage
order Spanner chose; this module is the Spark-native answer to choosing
that order deliberately for downstream scan cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables
from dataflowtemplates_spark.functions.zorder import interleave_expr

#: Number of target files in the layout audit (a real OPTIMIZE job's
#: file-size knob; 64 keeps per-file row counts meaningful at sf0.01).
ZORDER_N_FILES = 64

#: The audited box predicate, on the 16-bit normalized dimension scale:
#: the middle quarter of each dimension (a ~6% selectivity 2-D box —
#: the shape partition pruning exists for).
ZORDER_BOX_LO = 16384
ZORDER_BOX_HI = 32767

#: Deterministic LCG scramble for the "shuffled" (unclustered) layout —
#: portable to ANSI SQL, unlike xxhash64.
_SHUFFLE_KEY = "(l_orderkey * 1103515245 + l_linenumber * 12345) % 2147483647"


# the Morton kernel is shared with the KeyedTable clustering write
# path (operators/mutations.py) via functions/zorder.py — the audit
# must measure exactly the expression the writer sorts by
_interleave_expr = interleave_expr


def q171_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear vs shuffled layout: measured file-skip audit.

    Pipeline (all exact integers):

    1. Normalize the two clustering dimensions (``l_partkey``,
       ``l_suppkey``) to 16-bit ints via min/max scaling — one 1-row
       aggregate broadcast back over the scan.
    2. Assign every row to one of ``ZORDER_N_FILES`` files under three
       layouts, each by fixed-range partition of its ordering key —
       ``(key * N) DIV range`` — which is exactly how a distributed
       writer buckets rows after sampling boundaries
       (``repartitionByRange`` + ``sortWithinPartitions``): no global
       row_number, no single-partition window, so the assignment
       itself scales.
       - shuffled: LCG scramble of the row id (no clustering),
       - linear:   composite ``d1 * 65536 + d2`` (sort by d1, then d2),
       - zorder:   Morton interleave of d1/d2 bits.
    3. Per file: row count + min/max of both dimensions — the stats a
       parquet footer / Delta add-file carries.
    4. Replay the box predicate against the stats: a file is SCANNED
       iff its [min,max] ranges overlap the box on BOTH dimensions.

    Output, one row per layout: files scanned, rows scanned, rows
    actually matching, and scan efficiency (matching/scanned). The
    expected shape — shuffled scans ~everything, linear prunes one
    dimension, zorder prunes both — is measured, not asserted.

    100 TB: steps 2-4 are one groupBy(file_id) over the scan (one
    shuffle, 64 groups) per layout; stats tables are O(files) and the
    skip replay is driver-free. The production twin writes the files
    with ``df.repartitionByRange(N, key).sortWithinPartitions(key)``
    and lets the reader's stats pruning do step 4 for free.
    """
    register_tables(spark, sf_dir)
    li = spark.table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

    bounds = li.agg(
        F.min("l_partkey").alias("p_lo"), F.max("l_partkey").alias("p_hi"),
        F.min("l_suppkey").alias("s_lo"), F.max("l_suppkey").alias("s_hi"))
    norm = (li.crossJoin(F.broadcast(bounds))
            .withColumn("d1", F.expr(
                "((l_partkey - p_lo) * 65535) DIV greatest(p_hi - p_lo, 1)"))
            .withColumn("d2", F.expr(
                "((l_suppkey - s_lo) * 65535) DIV greatest(s_hi - s_lo, 1)")))

    z_spark, _ = _interleave_expr("d1", "d2")
    n, lo, hi = ZORDER_N_FILES, ZORDER_BOX_LO, ZORDER_BOX_HI
    keys = {
        "1_shuffled": (f"({_SHUFFLE_KEY}) * {n} DIV 2147483647"),
        "2_linear": (f"(d1 * 65536 + d2) * {n} DIV 4294967296"),
        "3_zorder": (f"({z_spark}) * {n} DIV 4294967296"),
    }

    audits = []
    for layout, fid_expr in keys.items():
        stats = (norm.withColumn("fid", F.expr(fid_expr))
                 .groupBy("fid")
                 .agg(F.count(F.lit(1)).alias("n_rows"),
                      F.min("d1").alias("d1_min"), F.max("d1").alias("d1_max"),
                      F.min("d2").alias("d2_min"), F.max("d2").alias("d2_max"),
                      F.sum(F.when((F.col("d1").between(lo, hi))
                                   & (F.col("d2").between(lo, hi)), 1)
                            .otherwise(0)).alias("n_match")))
        scanned = ((F.col("d1_min") <= hi) & (F.col("d1_max") >= lo)
                   & (F.col("d2_min") <= hi) & (F.col("d2_max") >= lo))
        audits.append(
            stats.agg(
                F.lit(layout).alias("layout"),
                F.count(F.lit(1)).cast("bigint").alias("n_files"),
                F.sum(scanned.cast("bigint")).cast("bigint")
                .alias("files_scanned"),
                F.sum("n_rows").cast("bigint").alias("rows_total"),
                F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
                .cast("bigint").alias("rows_scanned"),
                F.sum("n_match").cast("bigint").alias("rows_matching")))
    out = audits[0]
    for a in audits[1:]:
        out = out.unionAll(a)
    return (out.withColumn(
        "scan_efficiency",
        F.col("rows_matching").cast("double")
        / F.col("rows_scanned").cast("double"))
        .orderBy("layout"))


def _q171_oracle() -> str:
    _, z_duck = _interleave_expr("d1", "d2")
    n, lo, hi = ZORDER_N_FILES, ZORDER_BOX_LO, ZORDER_BOX_HI
    keys = {
        "1_shuffled": f"(({_SHUFFLE_KEY}) * {n}) // 2147483647",
        "2_linear": f"((d1 * 65536 + d2) * {n}) // 4294967296",
        "3_zorder": f"(({z_duck}) * {n}) // 4294967296",
    }
    blocks = []
    for layout, fid in keys.items():
        blocks.append(f"""
SELECT '{layout}' AS layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN d1_min <= {hi} AND d1_max >= {lo}
                      AND d2_min <= {hi} AND d2_max >= {lo}
                THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(SUM(n_rows) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN d1_min <= {hi} AND d1_max >= {lo}
                      AND d2_min <= {hi} AND d2_max >= {lo}
                THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(SUM(n_match) AS BIGINT) AS rows_matching
FROM (
  SELECT ({fid}) AS fid, COUNT(*) AS n_rows,
         MIN(d1) AS d1_min, MAX(d1) AS d1_max,
         MIN(d2) AS d2_min, MAX(d2) AS d2_max,
         SUM(CASE WHEN d1 BETWEEN {lo} AND {hi}
                   AND d2 BETWEEN {lo} AND {hi} THEN 1 ELSE 0 END)
           AS n_match
  FROM norm GROUP BY 1) s""")
    union = "\nUNION ALL\n".join(blocks)
    return f"""
WITH bounds AS (
  SELECT MIN(l_partkey) AS p_lo, MAX(l_partkey) AS p_hi,
         MIN(l_suppkey) AS s_lo, MAX(l_suppkey) AS s_hi
  FROM lineitem),
norm AS (
  SELECT l_orderkey, l_linenumber,
         ((l_partkey - p_lo) * 65535) // GREATEST(p_hi - p_lo, 1) AS d1,
         ((l_suppkey - s_lo) * 65535) // GREATEST(s_hi - s_lo, 1) AS d2
  FROM lineitem CROSS JOIN bounds)
SELECT layout, n_files, files_scanned, rows_total, rows_scanned,
       rows_matching,
       CAST(rows_matching AS DOUBLE) / CAST(rows_scanned AS DOUBLE)
         AS scan_efficiency
FROM ({union}) u
ORDER BY layout
"""


QUERIES = {
    "q171_zorder_layout": q171_zorder_layout,
}

ORACLES = {
    "q171_zorder_layout": _q171_oracle(),
}
