"""Table-layout maintenance: small-file compaction and sorted writes.

At 100 TB the dominant cost of a badly-maintained table is not compute
but LAYOUT: a streaming ingest leaves thousands of KB-sized files
(every one a scan task + a footer fetch), and unsorted data defeats
parquet min/max pruning so every query reads every row group. The two
operators here are the standard maintenance passes:

* ``compact`` — rewrite a directory of small parquet files into
  ~``target_mb`` outputs. File count comes from the ACTUAL byte size
  on the Hadoop FS (works on object stores), not a row-count guess;
  the rewrite is a plain scan + repartition, so Spark parallelizes it
  and the result is committed via write-then-atomic-swap (temp dir +
  rename), never an in-place delete-first.
* ``write_sorted`` — range-partition by the given columns and sort
  within partitions before writing. Each output file then covers a
  DISJOINT range of the sort key, so parquet footer min/max statistics
  let any engine (Spark scan pruning, DuckDB zone-map style skipping)
  drop whole files/row-groups for selective predicates. This is the
  portable four-fifths of what table formats call clustering or
  Z-ordering, expressed with nothing but repartitionByRange +
  sortWithinPartitions.

Reference parity note: mercari/DataflowTemplates delegates file layout
to BigQuery/Spanner storage; these are the Spark-native equivalents
for the parquet-lake deployment this engine targets (engine
infrastructure, SURVEY §7 scale plan).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["compact", "fingerprint", "fingerprint_aggs",
           "fingerprint_hash", "write_sorted", "write_zordered",
           "zorder_key", "CompactResult"]


@dataclass
class CompactResult:
    files_before: int
    files_after: int
    bytes_total: int
    rows: int


def _fs(spark: SparkSession, root: str):
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path
    return jpath, jpath(root).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration())  # noqa: SLF001


def _data_files(jpath, fs, root: str) -> list[tuple[str, int]]:
    out = []
    it = fs.listFiles(jpath(root), True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            out.append((str(st.getPath()), int(st.getLen())))
    return out


def compact(spark: SparkSession, path: str, target_mb: int = 256,
            fmt: str = "parquet") -> CompactResult:
    """Rewrite ``path`` into ``ceil(total_bytes / target_mb)`` files.

    The swap is write-to-temp + two renames (old -> trash, new -> old,
    delete trash). CONCURRENCY CONTRACT — single writer, no concurrent
    readers during the swap: between the two renames the table path
    does not exist, so a reader racing the swap can fail or see an
    empty listing, and rows appended by a concurrent writer during the
    rewrite are lost with the trash directory. On a real HDFS the
    renames are atomic metadata ops (the unavailable window is the gap
    BETWEEN them, not within); on object stores "rename" is copy+delete
    and the window widens to the copy — only the LISTING here is
    object-store-safe, not the swap. For concurrent readers commit via
    catalog/view repointing (write new dir, repoint the view, reap the
    old dir later) or use a transactional table format (Delta/Iceberg),
    whose commit log is this seam hardened. Row count rides the rewrite
    via an Observation — no second scan.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    jpath, fs = _fs(spark, path)
    before = _data_files(jpath, fs, path)
    total = sum(sz for _, sz in before)
    n_out = max(1, -(-total // (target_mb * 1024 * 1024)))

    obs = Observation()
    df = (spark.read.format(fmt).load(path)
          .observe(obs, F.count(F.lit(1)).alias("n")))
    tmp = path.rstrip("/") + "._compact_tmp"
    trash = path.rstrip("/") + "._compact_old"
    (df.repartition(n_out).write.mode("overwrite").format(fmt).save(tmp))
    rows = int(obs.get["n"])
    if fs.exists(jpath(trash)):
        fs.delete(jpath(trash), True)
    if not fs.rename(jpath(path), jpath(trash)):
        raise IOError(f"compact: could not move {path} aside")
    if not fs.rename(jpath(tmp), jpath(path)):
        fs.rename(jpath(trash), jpath(path))  # roll back
        raise IOError(f"compact: could not commit {tmp} -> {path}")
    fs.delete(jpath(trash), True)
    after = _data_files(jpath, fs, path)
    return CompactResult(files_before=len(before), files_after=len(after),
                         bytes_total=total, rows=rows)


def write_sorted(df: DataFrame, path: str, order_cols: list[str],
                 n_files: int | None = None, fmt: str = "parquet") -> None:
    """Write ``df`` clustered on ``order_cols``: range-partitioned so
    files cover disjoint key ranges, sorted within each file so row
    groups carry tight min/max footer statistics.

    ``repartitionByRange`` samples the key distribution, so output
    files are balanced even under skew (a hash partitioning would
    interleave ranges and destroy file-level skipping).
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (df.repartitionByRange(n, *order_cols)
       .sortWithinPartitions(*order_cols)
       .write.mode("overwrite").format(fmt).save(path))


def zorder_key(bucketed, bits: int = 8):
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    already-bucketed column expression into one integer sort key.

    ``write_sorted`` clusters ONE dimension perfectly and leaves every
    other column spanning the full range in every file; the interleaved
    key trades a little per-dimension locality for locality in ALL
    dimensions at once, so footer min/max statistics prune selective
    predicates on ANY of the keyed columns. Pure bit arithmetic
    (shift/and/or) — whole-stage-codegen'd, map-only.
    """
    from pyspark.sql import functions as F

    ndim = len(bucketed)
    if bits * ndim > 63:
        raise ValueError(
            f"zorder_key: {bits} bits x {ndim} columns = "
            f"{bits * ndim} interleaved bits overflows the signed "
            "64-bit key — lower bits (e.g. bits=63//ndim) or cluster "
            "fewer columns")
    key = F.lit(0)
    for d, b in enumerate(bucketed):
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)),
                            i * ndim + d))
    return key


def write_zordered(df: DataFrame, path: str, zorder_cols: list[str],
                   bits: int = 8, n_files: int | None = None,
                   fmt: str = "parquet") -> None:
    """Write ``df`` clustered on a Z-order curve over ``zorder_cols``
    (numeric): each column is linearly bucketed into ``2**bits`` bins
    between its global min and max (one tiny aggregate — 2 scalars per
    column of driver-held state, O(model) like every codebook here),
    the bucket bits are interleaved into a Morton key, and the frame is
    range-partitioned + sorted on that key.

    The result: every output file covers a small hyper-rectangle of the
    key space, so min/max footer statistics prune scans filtering on
    ANY subset of ``zorder_cols`` — the multi-column complement of
    ``write_sorted``'s single-axis clustering. Linear (min/max)
    bucketing keeps the bucket assignment a pure map-side expression;
    under heavy value skew, pre-bucket with quantile boundaries and
    pass the bucket columns through ``zorder_key`` directly.
    """
    from pyspark.sql import functions as F

    stats = df.agg(*[f(c).alias(f"{p}_{c}")
                     for c in zorder_cols
                     for p, f in (("mn", F.min), ("mx", F.max))]
                   ).collect()[0]
    nb = 1 << bits
    bucketed = []
    for c in zorder_cols:
        if stats[f"mn_{c}"] is None:  # empty or all-NULL input: no
            # stats to bucket against — write unclustered rather than
            # crash on float(None)
            (df.write.mode("overwrite").format(fmt).save(path))
            return
        mn, mx = float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        bucketed.append(
            F.least(F.floor((F.col(c) - mn) / span * nb),
                    F.lit(nb - 1)).cast("long"))
    keyed = df.withColumn("_zkey", zorder_key(bucketed, bits))
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (keyed.repartitionByRange(n, "_zkey")
          .sortWithinPartitions("_zkey")
          .drop("_zkey")
          .write.mode("overwrite").format(fmt).save(path))


def fingerprint(df: DataFrame, cols: list[str] | None = None,
                mod: int = 1_000_000_007) -> DataFrame:
    """Order-independent content fingerprint of ``df`` over ``cols``
    (default: every column), as ONE row ``(n_rows, fp_xor, fp_sum)`` —
    the replication / CDC-validation primitive: two sides of a copy
    compare one tiny row instead of shipping data (q159 is the
    oracle-gated query form).

    Each row's canonical string (``'|'``-joined, NULLs as the ``\\N``
    sentinel so ``('a', NULL)`` and ``('a',)`` differ) is md5-hashed
    and the first 15 hex nibbles parsed as a 60-bit int; the frame
    fingerprint folds those with XOR plus a mod-``mod`` sum. XOR alone
    cancels even-multiplicity duplicates; count + sum close that hole.

    All three components merge associatively (XOR the XORs, add the
    sums mod p, add the counts), so fingerprints computed per
    partition / per day / per bucket roll up without rescanning — the
    property that makes this viable at 100 TB. Pure map-side hash +
    one all-combining aggregate: no shuffle of data rows.

    Determinism across engines: md5 over UTF-8 bytes is identical in
    Spark and DuckDB; callers fold doubles/timestamps only via an
    explicit cast convention (q159 restricts itself to bigint/varchar).
    """
    return (df.select(fingerprint_hash(df, cols).alias("h"))
            .agg(*fingerprint_aggs(mod)))


def fingerprint_hash(df: DataFrame, cols: list[str] | None = None):
    """The per-row 60-bit hash column :func:`fingerprint` folds —
    exposed so a caller can ride extra aggregates on the SAME scan
    (one job computes fingerprint + snapshot stats instead of two
    serial passes; the audit queries' step probes use this)."""
    from pyspark.sql import functions as F

    use = cols or df.columns
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\\N"))
               for c in use])
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")


def fingerprint_aggs(mod: int = 1_000_000_007) -> list:
    """The three fold expressions over a ``h`` column from
    :func:`fingerprint_hash` — identical to what :func:`fingerprint`
    aggregates, for callers composing a fused single-pass agg."""
    from pyspark.sql import functions as F

    return [F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.coalesce(F.expr("bit_xor(h)"), F.lit(0)).cast("bigint")
             .alias("fp_xor"),
            F.coalesce(F.sum(F.col("h") % mod), F.lit(0))
             .cast("bigint").alias("fp_sum")]


def replicate_changes(src, dst, bound_from: str, bound_to: str,
                      txn_app: str | None = None,
                      txn_version: int | None = None):
    """Incremental table-to-table replication step: apply the SOURCE
    KeyedTable's net changes in ``(bound_from, bound_to]`` to the
    DESTINATION as ONE atomic commit — the reference's
    SpannerToSpanner sync (templates/SpannerToSpanner.java:78-121)
    re-done CDC-style, so each step ships O(changed buckets), never
    O(table). Composition of two verified pieces: ``changes_between``
    (Delta-CDF net diff, path-pruned on both snapshots) feeds
    ``apply_changes`` (update preimages dropped; deletes map to D,
    inserts and update postimages to U — a commit window nets at most
    one change per key, so no intra-batch sequencing is needed).

    Pass ``txn_app`` (+ the source version as ``txn_version``) to make
    each step idempotent: a replayed window — scheduler double-fire,
    retry after an ambiguous failure — no-ops against the recorded
    watermark instead of re-applying. Validate a replica with
    :func:`fingerprint` on both sides (same engine, one tiny row
    each). Returns the destination's :class:`MutationResult`.
    """
    from pyspark.sql import functions as F

    cdf = src.changes_between(bound_from, bound_to)
    batch = (cdf.filter(F.col("_change_type") != "update_preimage")
             .withColumn("_op",
                         F.when(F.col("_change_type") == "delete",
                                F.lit("D")).otherwise(F.lit("U")))
             .drop("_change_type"))
    return dst.apply_changes(batch, op_col="_op",
                             txn_app=txn_app, txn_version=txn_version)
