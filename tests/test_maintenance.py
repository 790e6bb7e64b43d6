"""Table maintenance: compaction must preserve the exact row multiset
while collapsing the file count; sorted writes must produce disjoint
per-file key ranges (the property parquet min/max skipping needs)."""

import os

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from dataflowtemplates_spark.operators.maintenance import (
    compact,
    write_sorted,
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
