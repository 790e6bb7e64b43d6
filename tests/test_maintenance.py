"""Table maintenance: compaction must preserve the exact row multiset
while collapsing the file count; sorted writes must produce disjoint
per-file key ranges (the property parquet min/max skipping needs)."""

import os

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from dataflowtemplates_spark.operators.maintenance import (
    compact,
    write_sorted,
    write_zordered,
)


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 shards of ~tiny files
    want = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}

    res = compact(spark, path, target_mb=256)
    assert res.files_before == 64
    assert res.files_after == 1  # 10k rows << 256 MB
    assert res.rows == 10_000
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == want
    # no temp/trash residue
    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_old")


def test_compact_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "frag2")
    spark.range(0, 100).write.parquet(path)
    r1 = compact(spark, path)
    r2 = compact(spark, path)
    assert r2.files_before == r1.files_after == r2.files_after
    assert spark.read.parquet(path).count() == 100


def test_write_sorted_produces_disjoint_file_ranges(spark, tmp_path):
    path = str(tmp_path / "sorted")
    df = (spark.range(0, 50_000)
          .withColumn("key", (F.col("id") * 2654435761 % 50_000))
          .select("key", "id"))
    write_sorted(df, path, ["key"], n_files=8)

    ranges = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, fn))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # key
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint: file N's max <= file N+1's min
    # multiset preserved
    assert spark.read.parquet(path).count() == 50_000


def _file_spans(path, col_idx):
    """Per-file (max - min) footer span of one column."""
    spans = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, fn))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append(max(maxs) - min(mins))
    return spans


def test_write_zordered_clusters_both_dimensions(spark, tmp_path):
    """Two independent uniform keys: a single-axis sort leaves the
    second column spanning ~the full range in every file; the Z-order
    write must bound BOTH columns' per-file spans well below it."""
    n = 50_000
    df = (spark.range(0, n)
          .select((F.col("id") * 2654435761 % n).alias("x"),
                  (F.col("id") * 40503 % n).alias("y")))

    lin, zed = str(tmp_path / "linear"), str(tmp_path / "zorder")
    write_sorted(df, lin, ["x"], n_files=16)
    write_zordered(df, zed, ["x", "y"], bits=8, n_files=16)

    # single-axis sort: y unclustered — full-range spans
    lin_y = _file_spans(lin, 1)
    assert min(lin_y) > 0.8 * n
    # z-order: most files are small hyper-rectangles, but files whose
    # z-range crosses a high-order curve seam span the range in one
    # dimension — inherent to Morton ordering, so the clustering
    # guarantee (and the pruning win) is about the AVERAGE span
    for idx in (0, 1):
        spans = _file_spans(zed, idx)
        assert sum(spans) / len(spans) <= 0.5 * n, (idx, spans)
        # and the typical file is far tighter than the seam files
        assert sorted(spans)[len(spans) // 2] <= 0.4 * n, (idx, spans)
    # multiset preserved
    got = {(r["x"], r["y"]) for r in spark.read.parquet(zed).collect()}
    want = {(r["x"], r["y"]) for r in df.collect()}
    assert got == want


def _fp(df, **kw):
    from dataflowtemplates_spark.operators.maintenance import fingerprint
    r = fingerprint(df, **kw).collect()[0]
    return (r["n_rows"], r["fp_xor"], r["fp_sum"])


def test_fingerprint_is_order_and_partitioning_invariant(spark):
    df = spark.range(0, 2_000).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("s"))
    base = _fp(df)
    assert base == _fp(df.orderBy(F.desc("id")))
    assert base == _fp(df.repartition(17, "s"))


def test_fingerprint_detects_single_row_change_and_nulls(spark):
    df = spark.range(0, 1_000).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("s"))
    base = _fp(df)
    bumped = df.withColumn(
        "s", F.when(F.col("id") == 500, F.lit("CHANGED"))
              .otherwise(F.col("s")))
    assert _fp(bumped) != base
    # NULL is not the same as its sentinel-free neighbour: ('a', NULL)
    # vs ('a',)-with-empty must differ
    a = spark.createDataFrame([("a", None)], "x string, y string")
    b = spark.createDataFrame([("a", "")], "x string, y string")
    assert _fp(a) != _fp(b)


def test_fingerprint_merges_associatively(spark):
    """Per-bucket fingerprints roll up to the whole-table fingerprint
    without rescanning — the 100 TB incremental property."""
    df = spark.range(0, 3_000).select(
        F.col("id"), (F.col("id") * 31 % 997).cast("string").alias("s"))
    half1 = df.filter(F.col("id") < 1_500)
    half2 = df.filter(F.col("id") >= 1_500)
    n, x, s = _fp(df)
    n1, x1, s1 = _fp(half1)
    n2, x2, s2 = _fp(half2)
    assert n == n1 + n2
    assert x == x1 ^ x2
    assert s == s1 + s2  # sums are < mod * n_rows, no overflow here


def test_fingerprint_empty_frame(spark):
    df = spark.range(0, 10).filter(F.col("id") < 0)
    assert _fp(df) == (0, 0, 0)
