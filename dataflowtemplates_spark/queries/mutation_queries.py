"""Mutation-family registry query: the K5/K6 write dispositions run as
an oracle-checkable pipeline.

The keyed-table mutation operators (reference
``StructToMutationConverter.java:152-167`` op dispatch,
``templates/SpannerToSpannerDelete.java:78-91`` delete-by-key, and the
REPORT_FAILURES error stream of ``SpannerToSpanner.java:109-121``) were
previously covered only by unit tests — the one §2 family with no
driver-gated row, because a mutation sink has no obvious SELECT shape.
q78 closes that: it routes deterministic conflicting batches through
``KeyedTable.apply_mutations`` and surfaces, per step, the (applied,
failed, table_rows) counts. DuckDB reproduces the same counts
relationally (INSERT conflicts = semi-join on the seeded keys, UPDATE
misses = anti-join, batch duplicates = the extra copies), so the
driver's rows+schema+hash gate verifies the mutation semantics
themselves: conflict detection, per-row failure isolation, upsert
reachability, and delete-by-key matching.

Scale note: each step is one key-join against the current table state
plus a rewrite — the same shuffle shape the operator runs at any scale
(AQE handles key skew); nothing here is local-mode-only except the
parquet-directory stand-in for the transactional store.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables
from dataflowtemplates_spark.operators.mutations import KeyedTable


def q78_mutation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-step mutation audit over ``customer`` (key ``c_custkey``):

    1. INSERT the seed half (custkey %2==0) into an empty table.
    2. INSERT custkey %3==0, with the %21==0 subset duplicated in the
       batch — expecting ALREADY_EXISTS quarantines for %6==0 keys and
       DUPLICATE_KEY_IN_BATCH for the extra copies.
    3. UPDATE custkey %5==0 (acctbal bump) — NOT_FOUND for keys the
       table doesn't hold.
    4. INSERT_OR_UPDATE custkey %7==0 — upsert, never fails.
    5. DELETE custkey %11==0 — applied counts only matched rows.

    Every count is a pure function of the key residues, which is what
    the DuckDB oracle computes set-relationally.
    """
    register_tables(spark, sf_dir)
    cust = spark.table("customer").select("c_custkey", "c_name", "c_acctbal")
    k = F.col("c_custkey")

    tmp = tempfile.mkdtemp(prefix="q78_mutation_audit_")
    try:
        tbl = KeyedTable(spark, os.path.join(tmp, "tbl"), ["c_custkey"])
        tbl.create(cust)

        steps: list[tuple[int, str, int, int, int]] = []

        def run(step: int, op: str, batch: DataFrame) -> None:
            res = tbl.apply_mutations(batch, op)
            steps.append((step, op, res.applied, res.failed,
                          tbl.read().count()))

        run(1, "INSERT", cust.filter(k % 2 == 0))
        run(2, "INSERT", cust.filter(k % 3 == 0)
            .unionByName(cust.filter(k % 21 == 0)))
        run(3, "UPDATE", cust.filter(k % 5 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(100.0)))
        run(4, "INSERT_OR_UPDATE", cust.filter(k % 7 == 0))
        run(5, "DELETE", cust.filter(k % 11 == 0).select("c_custkey"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return spark.createDataFrame(
        steps, "step long, op string, applied long, failed long, "
               "table_rows long").orderBy("step")


_Q78_ORACLE = """
WITH f AS (
  SELECT c_custkey AS k,
         c_custkey % 2 = 0 AS s2, c_custkey % 3 = 0 AS s3,
         c_custkey % 5 = 0 AS s5, c_custkey % 7 = 0 AS s7,
         c_custkey % 11 = 0 AS s11, c_custkey % 21 = 0 AS s21
  FROM customer)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step, 'INSERT' AS op,
         CAST((SELECT COUNT(*) FROM f WHERE s2) AS BIGINT) AS applied,
         CAST(0 AS BIGINT) AS failed,
         CAST((SELECT COUNT(*) FROM f WHERE s2) AS BIGINT) AS table_rows
  UNION ALL
  SELECT 2, 'INSERT',
         (SELECT COUNT(*) FROM f WHERE s3 AND NOT s2),
         (SELECT COUNT(*) FROM f WHERE s3 AND s2)
           + (SELECT COUNT(*) FROM f WHERE s21),
         (SELECT COUNT(*) FROM f WHERE s2 OR s3)
  UNION ALL
  SELECT 3, 'UPDATE',
         (SELECT COUNT(*) FROM f WHERE s5 AND (s2 OR s3)),
         (SELECT COUNT(*) FROM f WHERE s5 AND NOT (s2 OR s3)),
         (SELECT COUNT(*) FROM f WHERE s2 OR s3)
  UNION ALL
  SELECT 4, 'INSERT_OR_UPDATE',
         (SELECT COUNT(*) FROM f WHERE s7),
         0,
         (SELECT COUNT(*) FROM f WHERE s2 OR s3 OR s7)
  UNION ALL
  SELECT 5, 'DELETE',
         (SELECT COUNT(*) FROM f WHERE s11 AND (s2 OR s3 OR s7)),
         0,
         (SELECT COUNT(*) FROM f WHERE (s2 OR s3 OR s7) AND NOT s11)
) ORDER BY step
"""


def q99_snapshot_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-bound snapshot reads (S3) through the oracle gate.

    The reference's ``TimestampBound.ofReadTimestamp`` semantics
    (``SpannerQueryIO.java:129-136``) — read the state produced by the
    last commit at or before the bound — were previously pinned only by
    unit tests. Here a keyed table takes three commits (seed INSERT,
    acctbal-bumping upsert, delete), then ``read_at`` replays EVERY
    recorded commit time and surfaces each snapshot's (row count, exact
    acctbal sum). The DuckDB oracle recomputes the three states
    set-relationally from the key residues, so the hash gate verifies
    the version history itself: no commit lost, no later mutation
    leaking into an earlier bound.

    Scale note: snapshot selection is commit-log metadata (tiny);
    reading a version is an ordinary pruned parquet scan of that
    version's directory — history depth costs storage, not query time.
    """
    register_tables(spark, sf_dir)
    cust = spark.table("customer").select("c_custkey", "c_name", "c_acctbal")
    k = F.col("c_custkey")

    tmp = tempfile.mkdtemp(prefix="q99_snapshot_audit_")
    try:
        tbl = KeyedTable(spark, os.path.join(tmp, "tbl"), ["c_custkey"])
        tbl.create(cust)
        tbl.apply_mutations(cust.filter(k % 2 == 0), "INSERT")
        tbl.apply_mutations(
            cust.filter(k % 3 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(1000.0)),
            "INSERT_OR_UPDATE")
        tbl.apply_mutations(cust.filter(k % 5 == 0).select("c_custkey"),
                            "DELETE")

        # the first commit is the empty CREATE; the data commits that
        # follow are numbered 1..n here (their log version ids are an
        # internal detail — the bound TIME is the contract under test).
        # All snapshot aggregates run as ONE job: a UNION of the
        # per-version agg frames, materialized (localCheckpoint) before
        # the parquet stand-in is torn down — not a per-version collect
        # loop, which audit-query templates would then inherit.
        from functools import reduce
        per_version = [
            tbl.read_at(c["time"]).agg(
                F.lit(i).cast("long").alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("acctbal_sum"))
            for i, c in enumerate(tbl._commits()[1:], start=1)]
        out = reduce(DataFrame.unionByName, per_version) \
            .localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return out.orderBy("version")


_Q99_ORACLE = """
WITH f AS (
  SELECT c_custkey AS k, c_acctbal,
         c_custkey % 2 = 0 AS s2, c_custkey % 3 = 0 AS s3,
         c_custkey % 5 = 0 AS s5
  FROM customer),
v1 AS (SELECT k, c_acctbal FROM f WHERE s2),
v2 AS (
  SELECT k, CASE WHEN s3 THEN c_acctbal + 1000.0 ELSE c_acctbal END
           AS c_acctbal
  FROM f WHERE s2 OR s3),
v3 AS (
  SELECT v2.k, v2.c_acctbal FROM v2 JOIN f ON f.k = v2.k WHERE NOT f.s5)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS version,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           AS acctbal_sum
  FROM v1
  UNION ALL
  SELECT 2, COUNT(*), CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
  FROM v2
  UNION ALL
  SELECT 3, COUNT(*), CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
  FROM v3
) ORDER BY version
"""


QUERIES = {"q78_mutation_audit": q78_mutation_audit,
           "q99_snapshot_audit": q99_snapshot_audit}
ORACLES = {"q78_mutation_audit": _Q78_ORACLE,
           "q99_snapshot_audit": _Q99_ORACLE}
