"""E2E writer tests: write to a temp dir, re-read, inspect (reference
test tier 3: file-writing integration, StructToAvroTransformTest)."""

import json
import os

import pytest
from pyspark.sql import Row

from dataflowtemplates_spark.sources.writers import (
    write_columnar_dynamic,
    write_text_dynamic,
)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame([
        Row(id=1, grp="a", name="one"),
        Row(id=2, grp="b", name="two"),
        Row(id=3, grp="a", name="three"),
        Row(id=4, grp=None, name="ungrouped"),
    ])


def test_json_dynamic_split(spark, sample, tmp_path):
    out = str(tmp_path / "out")
    res = write_text_dynamic(sample, out, fmt="json", split_field="grp",
                             prefix="export")
    assert res.row_count == 4
    groups = sorted(os.listdir(out))
    assert "a" in groups and "b" in groups
    # null split key -> empty-string group -> files at the root
    root_files = [f for f in groups if f.endswith(".json")]
    assert len(root_files) == 1
    a_rows = []
    for f in res.files:
        if f"{os.sep}a{os.sep}" in f:
            with open(f) as fh:
                a_rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in a_rows) == [1, 3]
    # split column itself is not written into the payload? reference keeps
    # all queried fields in the row; ours keeps them too:
    assert set(a_rows[0]) == {"id", "grp", "name"}


def test_csv_header_single_file(spark, sample, tmp_path):
    out = str(tmp_path / "csv")
    res = write_text_dynamic(sample, out, fmt="csv", header=True,
                             without_sharding=True, prefix="data")
    assert len(res.files) == 1
    assert os.path.basename(res.files[0]) == "data.csv"
    with open(res.files[0]) as fh:
        lines = fh.read().splitlines()
    assert lines[0] == "id,grp,name"
    assert len(lines) == 5
    assert "1,a,one" in lines


def test_empty_result_writes_empty_file(spark, sample, tmp_path):
    out = str(tmp_path / "empty")
    notify = str(tmp_path / "notify.txt")
    res = write_text_dynamic(sample.filter("id > 99"), out, fmt="csv",
                             header=True, prefix="data", empty_text="",
                             output_empty=True, output_notify=notify)
    assert res.empty
    assert len(res.files) == 1
    with open(res.files[0]) as fh:
        assert fh.read().splitlines() == ["id,grp,name"]
    with open(notify) as fh:
        assert fh.read() == res.files[0]


def test_notify_manifest(spark, sample, tmp_path):
    out = str(tmp_path / "o")
    notify = str(tmp_path / "manifest.txt")
    res = write_text_dynamic(sample, out, fmt="json", prefix="part",
                             output_notify=notify)
    with open(notify) as fh:
        listed = fh.read().splitlines()
    assert listed == res.files
    assert all(os.path.exists(p) for p in listed)


def test_columnar_dynamic_writes_real_avro(spark, sample, tmp_path):
    out = str(tmp_path / "col")
    res = write_columnar_dynamic(sample, out, split_field="grp", fmt="avro")
    # with or without the spark-avro jar, K2 emits real .avro containers
    assert res.format == "avro"
    assert res.files and all(f.endswith(".avro") for f in res.files)
    from dataflowtemplates_spark.operators.avro_io import read_avro
    back = read_avro(spark, out)
    assert back.count() == 4
    assert sorted(r["name"] for r in back.collect()) == \
        ["one", "three", "two", "ungrouped"]
    # dirs are plain `value/` (reference naming), not hive `k=v/`
    listed = sorted(os.listdir(out))
    assert "a" in listed and "b" in listed


def test_split_values_with_escaped_chars(spark, tmp_path):
    # Spark percent-escapes ':' '%' etc. in partition paths; the
    # finalized group dirs must carry the DECODED value (reference
    # names by raw key)
    df = spark.createDataFrame([
        Row(id=1, grp="a:b"), Row(id=2, grp="pct%20"), Row(id=3, grp="plain"),
    ])
    out = str(tmp_path / "esc")
    res = write_text_dynamic(df, out, fmt="json", split_field="grp")
    listed = sorted(os.listdir(out))
    assert "a:b" in listed and "pct%20" in listed and "plain" in listed
    assert res.row_count == 3


def test_csv_header_written_per_split_file(spark, sample, tmp_path):
    out = str(tmp_path / "hdr")
    res = write_text_dynamic(sample, out, fmt="csv", split_field="grp",
                             header=True)
    assert res.row_count == 4
    # EVERY data file starts with the header line (executor-side header,
    # not a driver rewrite)
    for f in res.files:
        with open(f) as fh:
            assert fh.readline().rstrip("\n") == "id,grp,name"


def test_text_write_is_single_job(spark, sample, tmp_path):
    # row counting rides the write job via Observation metrics — the
    # old pre-write df.count() cost a full extra scan
    sc = spark.sparkContext
    sc.setJobGroup("single-job-write", "write_text_dynamic")
    try:
        res = write_text_dynamic(sample, str(tmp_path / "one"), fmt="json")
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("single-job-write")
    assert len(jobs) == 1
    assert res.row_count == 4


def test_columnar_dynamic_orc_and_parquet(spark, sample, tmp_path):
    """K2's native-datasource path: ORC and parquet dynamic writes go
    through the same split/finalize/count machinery as Avro."""
    for fmt in ("orc", "parquet"):
        out = str(tmp_path / f"col_{fmt}")
        res = write_columnar_dynamic(sample, out, split_field="grp",
                                     fmt=fmt, compression="snappy" if
                                     fmt == "parquet" else "zlib")
        assert res.format == fmt
        assert res.row_count == 4
        # group dirs are plain `value/` (reference naming, not hive
        # k=v), so re-reading the tree needs recursive lookup
        back = (spark.read.format(fmt)
                .option("recursiveFileLookup", "true").load(out))
        assert sorted(r["name"] for r in back.collect()) == \
            ["one", "three", "two", "ungrouped"]


def test_manifest_and_finalization_through_object_backend(spark, sample,
                                                          tmp_path):
    """The writer FS layer rides the fsio object-backend seam (r13):
    a manifest destined for a registered object-store scheme lands in
    the store (not on local disk), and the finalization helpers
    (list/rename/delete) operate on store objects through the same
    interface the local path uses."""
    from dataflowtemplates_spark.operators import fsio
    from dataflowtemplates_spark.sources.writers import (
        _fs_for, _FsioFS, _list_data_files, _rename_with_suffix,
        _write_notify, WriteResult)

    store = fsio.MemoryObjectStore()
    fsio.register_object_backend("mockw", store)
    try:
        # routing: object scheme -> _FsioFS, local path -> _HadoopFS
        assert isinstance(_fs_for(sample, "mockw://b/out"), _FsioFS)
        assert not isinstance(_fs_for(sample, str(tmp_path)), _FsioFS)

        # manifest through the seam
        res = WriteResult(files=["mockw://b/out/a.json",
                                 "mockw://b/out/b.json"], row_count=2)
        _write_notify(res, "mockw://b/notify/manifest.txt")
        assert store.read_bytes("mockw://b/notify/manifest.txt") == \
            b"mockw://b/out/a.json\nmockw://b/out/b.json"

        # finalization helpers over store objects
        store.write_bytes("mockw://b/out/part-00000-uuid.json", b"x")
        store.write_bytes("mockw://b/out/part-00001-uuid.json", b"y")
        store.write_bytes("mockw://b/out/_SUCCESS", b"")
        fs = _fs_for(sample, "mockw://b/out")
        assert _list_data_files(fs, "mockw://b/out") == [
            "mockw://b/out/part-00000-uuid.json",
            "mockw://b/out/part-00001-uuid.json"]
        renamed = _rename_with_suffix(fs, "mockw://b/out", "export",
                                      ".json")
        assert renamed == ["mockw://b/out/export-00000.json",
                           "mockw://b/out/export-00001.json"]
        assert store.read_bytes("mockw://b/out/export-00000.json") == b"x"
        fs.delete("mockw://b/out", recursive=True)
        assert not store.is_dir("mockw://b/out")
    finally:
        fsio.unregister_object_backend("mockw")
