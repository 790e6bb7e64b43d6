"""Distributed object-store data plane (operators/objstore_plane.py):
KeyedTable DATA — not just the metadata CAS — flowing through the HTTP
backends from executor tasks, over both emulators, plus the N-writer
mixed-operation race with fault injection.

What a native connector (s3a / GCS Hadoop connector) would do on a
real cluster, exercised here through the pure-Python plane: the same
commit protocol publishes the same immutable directories, so every
storage-engine invariant (dense log, owner folds, orphan reclaim)
must hold verbatim when the bytes live behind live HTTP."""

import threading

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataflowtemplates_spark.operators import fsio
from dataflowtemplates_spark.operators.gcshttp import GcsHttpBackend
from dataflowtemplates_spark.operators.mutations import (
    ConcurrentWriteError,
    KeyedTable,
)
from dataflowtemplates_spark.operators.s3http import S3HttpBackend
from dataflowtemplates_spark.testing.gcs_emulator import GcsEmulator
from dataflowtemplates_spark.testing.s3_emulator import S3Emulator

SIGV4_CREDS = ("AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")


@pytest.fixture()
def s3(request):
    emu = S3Emulator().start()
    emu.require_sigv4 = SIGV4_CREDS
    b = S3HttpBackend(emu.endpoint, timeout_s=5.0,
                      credentials=SIGV4_CREDS)
    fsio.register_object_backend("s3pl", b)
    try:
        yield emu, b
    finally:
        fsio.unregister_object_backend("s3pl")
        emu.stop()


def test_full_data_lifecycle_over_live_s3_http(spark, s3):
    """create -> upsert -> apply_changes -> rebucket -> vacuum ->
    reclaim -> read with every parquet byte behind the signed HTTP
    endpoint. Values pinned exactly; schema evolution (a column added
    mid-life) must null-fill on read like the native source."""
    emu, backend = s3
    t = KeyedTable(spark, "s3pl://bkt/tbl", ["id"], n_buckets=4)
    t.apply_mutations(spark.createDataFrame(
        [Row(id=i, v=float(i)) for i in range(40)]), "INSERT")
    t.apply_mutations(spark.createDataFrame(
        [Row(id=i, v=float(i) + 100) for i in range(0, 40, 5)]),
        "INSERT_OR_UPDATE")
    # CDC batch: update / delete / insert in one atomic commit
    r = t.apply_changes(spark.createDataFrame(
        [Row(id=1, v=999.0, _op="U", seq=1),
         Row(id=2, v=None, _op="D", seq=1),
         Row(id=77, v=77.0, _op="I", seq=1)]),
        op_col="_op", seq_col="seq")
    assert r.applied == 3
    # schema evolution (opt-in handle): later batch carries a NEW
    # column; existing HTTP-resident files must null-fill it on read
    evolving = KeyedTable(spark, "s3pl://bkt/tbl", ["id"],
                          schema_evolution=True)
    evolving.apply_mutations(spark.createDataFrame(
        [Row(id=0, v=0.5, tag="new")]), "INSERT_OR_UPDATE")
    t.rebucket(8)
    t.vacuum(keep_last=2, truncate_log=True)
    assert t.reclaim_orphans(grace_s=0.0) == 0
    got = {r["id"]: (r["v"], r["tag"]) for r in t.read().collect()}
    assert len(got) == 40  # 40 - 1 delete + 1 insert
    assert 2 not in got
    assert got[1] == (999.0, None)
    assert got[77] == (77.0, None)
    assert got[0] == (0.5, "new")
    assert got[5] == (105.0, None) and got[3] == (3.0, None)
    # nothing but parquet part objects under published data dirs, with
    # the deterministic per-(partition, seq) names
    names = [k.rsplit("/", 1)[-1]
             for k in backend.list_files("s3pl://bkt/tbl/data")]
    assert names and all(n.startswith("part-") and
                         n.endswith(".parquet") for n in names)


def test_part_rotation_and_missing_column_nullfill(spark, s3):
    """flush_rows forcing rotation: the seq-named objects per bucket
    are a PURE function of the bucket's row count (every object
    exactly flush_rows rows except the last — the determinism that
    makes task retries overwrite rather than duplicate), nothing lost
    on read-back; a file written under an OLDER schema null-fills the
    new column."""
    from dataflowtemplates_spark.operators import objstore_plane as op

    _, backend = s3
    df = (spark.range(0, 2000)
          .select(F.col("id"),
                  F.sha2(F.col("id").cast("string"), 256).alias("s"))
          .withColumn("kb", (F.col("id") % 2).cast("int"))
          .repartition(2, F.col("kb")))
    op.write_partitioned(df, "s3pl://bkt/rot", "kb", backend,
                         flush_rows=300)
    files = backend.list_files("s3pl://bkt/rot")
    # 1000 rows per bucket at 300/object = 4 objects per bucket, with
    # deterministic seq names 0000..0003 whatever the arrival order
    assert len(files) == 8
    assert len(set(files)) == len(files)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for kb in (0, 1):
        leaf = [f for f in files if f"/kb={kb}/" in f]
        assert sorted(f.rsplit("-", 1)[1] for f in leaf) == \
            ["0000.parquet", "0001.parquet", "0002.parquet",
             "0003.parquet"]
        sizes = sorted(
            pq.read_table(pa.BufferReader(
                backend.read_bytes(f))).num_rows for f in leaf)
        assert sizes == [100, 300, 300, 300]
    from pyspark.sql import types as T

    wide = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("later", T.DoubleType()),  # not in the files
    ])
    back = op.read_parquet(spark, ["s3pl://bkt/rot/kb=0",
                                   "s3pl://bkt/rot/kb=1"], wide, backend)
    assert back.count() == 2000
    assert back.filter(F.col("later").isNull()).count() == 2000
    assert back.agg(F.sum("id")).first()[0] == sum(range(2000))


def test_part_bytes_are_pure_function_of_row_multiset(spark, s3,
                                                      monkeypatch):
    """Retry-idempotence grounding: the SAME row multiset committed
    from two different input orders (different slicing, shuffled row
    order) must produce byte-identical part objects under identical
    relative names. Intra-partition arrival order out of a shuffle is
    not deterministic across task attempts — the commit path therefore
    total-orders each partition (bucket, keys) before slicing, making
    every object's name AND bytes a pure function of the multiset.
    flush_rows is forced low so the multi-part slicing is exercised,
    not just whole-bucket objects."""
    import random

    from dataflowtemplates_spark.operators import objstore_plane as op

    _, backend = s3
    orig = op.write_partitioned
    monkeypatch.setattr(
        op, "write_partitioned",
        lambda staged, d, c, b, **kw: orig(staged, d, c, b,
                                           flush_rows=50))
    rows = [Row(id=i, v=float(i % 17), s=f"s-{i % 7}")
            for i in range(500)]
    shuffled = rows[:]
    random.Random(15).shuffle(shuffled)

    def parts(path, data, slices):
        t = KeyedTable(spark, path, ["id"], n_buckets=3)
        df = spark.createDataFrame(data)
        if slices:
            df = df.repartition(slices)
        t.apply_mutations(df, "INSERT")
        out = {}
        for f in backend.list_files(path + "/data"):
            rel = f.split("/data/", 1)[1].split("/", 1)[1]
            out[rel] = backend.read_bytes(f)
        return out

    a = parts("s3pl://bkt/det-a", rows, 0)
    b = parts("s3pl://bkt/det-b", shuffled, 7)
    assert sorted(a) == sorted(b)
    assert len(a) >= 6  # rotation actually split buckets into parts
    for rel in a:
        assert a[rel] == b[rel], f"part bytes differ for {rel}"


def test_plane_native_parity_on_wide_types(spark, s3, tmp_path):
    """The plane must be a drop-in for the native parquet source on
    the FULL type surface KeyedTable schemas can carry: timestamps
    (tz and ntz), dates, decimals, arrays, structs, maps, binary,
    booleans, unicode strings, nulls. The same DataFrame goes through
    (a) write_partitioned+read_parquet over live HTTP and (b) the
    native partitionBy writer + schema'd reader; the two read-backs
    must agree row-for-row."""
    from dataflowtemplates_spark.operators import objstore_plane as op
    from pyspark.sql import types as T

    _, backend = s3
    df = (spark.range(0, 400)
          .select(
              F.col("id"),
              F.when(F.col("id") % 7 == 0, F.lit(None))
               .otherwise(F.col("id") * 3).alias("nullable_long"),
              F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
              F.to_timestamp_ntz(
                  F.timestamp_seconds(F.col("id") * 60)).alias("ts_ntz"),
              F.date_add(F.lit("2024-01-01").cast("date"),
                         F.col("id").cast("int")).alias("d"),
              (F.col("id") * 1.25).cast("decimal(18,2)").alias("dec"),
              F.array(F.col("id") * 1.0,
                      F.col("id") * 2.0).alias("vec"),
              F.struct(F.col("id").alias("a"),
                       F.array(F.concat(F.lit("s"),
                                        F.col("id"))).alias("tags"))
               .alias("st"),
              F.create_map(F.lit("k"), F.col("id").cast("int"),
                           F.lit("k2"),
                           (F.col("id") * 2).cast("int")).alias("m"),
              F.encode(F.concat(F.lit("raw-é"), F.col("id")),
                       "utf-8").alias("b"),
              (F.col("id") % 2 == 0).alias("flag"),
              F.concat(F.lit("日本語-"),
                       F.col("id")).alias("s"))
          .withColumn("kb", (F.col("id") % 4).cast("int"))
          .repartition(4, F.col("kb")))
    op.write_partitioned(df, "s3pl://bkt/wide", "kb", backend)
    native_dir = str(tmp_path / "wide_native")
    df.write.partitionBy("kb").parquet(native_dir)
    # declared read schema = what the native reader itself infers
    # (parquet normalizes nullability on read; KeyedTable stores this
    # normalized form in its config too)
    schema = T.StructType([
        f for f in spark.read.parquet(f"{native_dir}/kb=0").schema.fields
        if f.name != "kb"])

    plane_back = op.read_parquet(
        spark, [f"s3pl://bkt/wide/kb={i}" for i in range(4)],
        schema, backend)
    native_back = spark.read.schema(schema).parquet(
        *[f"{native_dir}/kb={i}" for i in range(4)])
    assert plane_back.schema == native_back.schema == schema
    a = sorted(plane_back.collect(), key=lambda r: r["id"])
    b = sorted(native_back.collect(), key=lambda r: r["id"])
    assert len(a) == len(b) == 400
    for ra, rb in zip(a, b):
        assert ra == rb, (ra, rb)


def test_plane_streams_large_objects_via_multipart(spark, s3):
    """With part_bytes below the object size, the plane streams row
    groups through S3 multipart uploads (bounded memory per object)
    and the read-back is exact — the emulator counts the completes."""
    from dataflowtemplates_spark.operators import objstore_plane as op
    from pyspark.sql import types as T

    emu, backend = s3
    # ~16 MB of high-entropy rows: the object crosses S3's REAL 5 MiB
    # part floor (open_write clamps up to it), so streaming engages
    # without opting the emulator's enforcement down
    wide = F.concat(*[
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(k))), 512)
        for k in range(8)])
    df = (spark.range(0, 16000)
          .select(F.col("id"), wide.alias("s"))
          .withColumn("kb", F.lit(0))
          .repartition(1, F.col("kb")))
    op.write_partitioned(df, "s3pl://bkt/mp", "kb", backend,
                         flush_rows=100_000)
    assert emu.multipart_completed >= 1  # streamed, not buffered
    files = backend.list_files("s3pl://bkt/mp")
    assert len(files) == 1  # one object: rotation never fired
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("s", T.StringType())])
    back = op.read_parquet(spark, ["s3pl://bkt/mp/kb=0"], schema,
                           backend)
    assert back.count() == 16000
    assert back.agg(F.sum("id")).first()[0] == sum(range(16000))


def test_data_lifecycle_over_live_gcs_http(spark):
    """The same data plane over the GCS JSON API emulator with bearer
    auth — proving the plane is backend-generic, not S3-shaped."""
    emu = GcsEmulator().start()
    emu.require_bearer = "data-token"
    b = GcsHttpBackend(emu.endpoint, timeout_s=5.0,
                       bearer_token="data-token")
    fsio.register_object_backend("gspl", b)
    try:
        t = KeyedTable(spark, "gspl://bkt/tbl", ["id"], n_buckets=2)
        t.apply_mutations(spark.createDataFrame(
            [Row(id=i, v=i * 10) for i in range(12)]), "INSERT")
        t.apply_mutations(spark.createDataFrame(
            [Row(id=3, v=-1)]), "INSERT_OR_UPDATE")
        t.apply_mutations(spark.createDataFrame(
            [Row(id=11)]), "DELETE")
        # the maintenance ops compose over GCS exactly like the S3
        # twin: layout rewrite, retention, debris reclamation
        t.rebucket(4)
        t.vacuum(keep_last=2, truncate_log=True)
        b.write_bytes("gspl://bkt/tbl/data/v99999-dead/kb=0/p0",
                      b"dead")
        assert t.reclaim_orphans(grace_s=0.0) == 1
        got = {r["id"]: r["v"] for r in t.read().collect()}
        assert len(got) == 11 and got[3] == -1 and 11 not in got
        assert int(t._config_at(t._latest_version())["n_buckets"]) == 4
    finally:
        fsio.unregister_object_backend("gspl")
        emu.stop()


def test_n_writer_mixed_op_race_with_faults(spark, s3):
    """6 writers x mixed upsert/delete plus a rebucket thread and a
    vacuum thread, racing one table over live signed HTTP WITH fault
    injection (transient 500s and an applied-but-response-lost put
    fired mid-race): the version counter never wedges (every writer
    finishes), the log stays dense, the final state equals the serial
    expectation (ops are key-disjoint, hence order-free), and after
    reclaim every surviving data dir is referenced."""
    emu, backend = s3
    path = "s3pl://bkt/race"
    seed = KeyedTable(spark, path, ["id"], n_buckets=4)
    seed.apply_mutations(
        spark.createDataFrame([Row(id=i, v=-1) for i in range(10)]),
        "INSERT")

    errors = []
    done = threading.Event()

    def writer(wid):
        t = KeyedTable(spark, path, ["id"])
        for op in range(2):
            key = 100 + wid * 10 + op
            try:
                if wid % 3 == 2 and op == 1:
                    # delete one of the seed keys (writer-unique)
                    t.apply_mutations_with_retry(
                        spark.createDataFrame([Row(id=wid)]),
                        "DELETE", retries=40, backoff_s=0.05)
                else:
                    t.apply_mutations_with_retry(
                        spark.createDataFrame([Row(id=key, v=wid)]),
                        "INSERT_OR_UPDATE", retries=40, backoff_s=0.05)
            except Exception as exc:  # noqa: BLE001 - recorded for assert
                errors.append((wid, op, repr(exc)))

    landed = {"rebucket": False, "vacuum": False}

    def maintenance():
        t = KeyedTable(spark, path, ["id"])
        for step, act in (("rebucket", lambda: t.rebucket(8)),
                          ("vacuum", lambda: t.vacuum(keep_last=50))):
            for _ in range(40):
                try:
                    act()
                    landed[step] = True
                    break
                except Exception:  # noqa: BLE001 - CAS loss or an
                    #   injected fault mid-scan: retry like any writer
                    if done.is_set():
                        return

    def chaos():
        import time

        time.sleep(0.3)
        emu.reject_next_put = 2       # two transient 500s
        time.sleep(0.3)
        emu.drop_response_next_put = True  # one ambiguous timeout

    threads = ([threading.Thread(target=writer, args=(w,))
                for w in range(6)]
               + [threading.Thread(target=maintenance),
                  threading.Thread(target=chaos)])
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    done.set()
    # an injected 500 mid-commit surfaces as an error and leaves an
    # orphan — the documented crash-equivalence. The CONTRACT under
    # test: nothing wedges, so each such op replays cleanly, and only
    # the injected faults (2 rejects + their collateral) may have
    # errored at all.
    assert len(errors) <= 3, f"more failures than injected: {errors}"
    for wid, op, _msg in list(errors):
        key = 100 + wid * 10 + op
        t = KeyedTable(spark, path, ["id"])
        if wid % 3 == 2 and op == 1:
            t.apply_mutations_with_retry(
                spark.createDataFrame([Row(id=wid)]), "DELETE",
                retries=40, backoff_s=0.05)
        else:
            t.apply_mutations_with_retry(
                spark.createDataFrame([Row(id=key, v=wid)]),
                "INSERT_OR_UPDATE", retries=40, backoff_s=0.05)

    t = KeyedTable(spark, path, ["id"])
    # serial expectation: seed 0..9 minus the writer-deleted keys
    # {2, 5} (wid % 3 == 2), plus the key-disjoint upserts
    expect = set(range(10)) - {2, 5}
    for w in range(6):
        for op in range(2):
            if not (w % 3 == 2 and op == 1):
                expect.add(100 + w * 10 + op)
    got = {r["id"] for r in t.read().collect()}
    assert got == expect
    # dense log: every version present exactly once
    versions = [c["version"] for c in t._commits()]
    assert versions == list(range(versions[0], versions[0] + len(versions)))
    # both maintenance ops landed despite the race; layout moved
    assert landed == {"rebucket": True, "vacuum": True}
    assert int(t._config_at(t._latest_version())["n_buckets"]) == 8
    # crash debris (500-killed stagings) reclaims; referenced dirs stay
    t.reclaim_orphans(grace_s=0.0)
    referenced = {c["dir"] for c in t._commits() if c.get("dir")}
    on_disk = set(backend.list_dir(path + "/data"))
    assert on_disk <= referenced
    assert {r["id"] for r in t.read().collect()} == expect


def _entropy_df(spark, n_rows, width=8):
    """Deterministic high-entropy rows (incompressible, so objects
    cross streaming thresholds) carrying the plane's bucket column."""
    wide = F.concat(*[
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(k))), 512)
        for k in range(width)])
    return (spark.range(0, n_rows)
            .select(F.col("id"), wide.alias("s"))
            .withColumn("kb", F.lit(0))
            .repartition(1, F.col("kb"))
            .sortWithinPartitions("id"))  # the caller contract:
    #       deterministic within-partition total order


def test_uploadpart_response_loss_is_transport_retried(s3):
    """UploadPart is service-idempotent (re-PUT of the same
    partNumber overwrites the staged part), so an applied-but-
    response-lost part recovers TRANSPARENTLY via the transport's
    one fresh-socket retry — the write completes, bytes exact, no
    upload left staged."""
    import os as _os

    emu, b = s3
    emu.min_part_bytes = 64 * 1024
    b.MIN_PART_BYTES = 64 * 1024  # instance override: cheap parts
    data = _os.urandom(200 * 1024)
    emu.drop_response_next_part = True
    with b.open_write("s3pl://bkt/amb/part-00000-0000.bin",
                      part_bytes=64 * 1024) as sink:
        sink.write(data)
    assert b.read_bytes("s3pl://bkt/amb/part-00000-0000.bin") == data
    assert not emu._uploads
    assert not emu.drop_response_next_part  # the fault did fire


def test_complete_response_loss_s3_task_retry_overwrites(spark, s3):
    """CompleteMultipartUpload applied but the response lost: the
    backend surfaces the ambiguity (never guesses), the plane task
    aborts its staged uploads on the way out, and a task RETRY —
    rerunning the same write — overwrites the deterministically
    named object: final state exact, no duplicate rows, no orphaned
    UploadId (the documented recovery at objstore_plane.py:33-40)."""
    from dataflowtemplates_spark.operators import objstore_plane as op
    from pyspark.sql import types as T

    emu, b = s3
    emu.min_part_bytes = 64 * 1024
    b.MIN_PART_BYTES = 64 * 1024
    df = _entropy_df(spark, 2000)
    emu.drop_response_next_complete = True
    with pytest.raises(Exception, match="CompleteMultipartUpload"):
        op.write_partitioned(df, "s3pl://bkt/ambc", "kb", b,
                             flush_rows=1_000_000,
                             part_bytes=64 * 1024)
    # the ambiguity resolved server-side: object live OR absent, but
    # the UploadId is consumed/aborted either way — nothing staged
    assert not emu._uploads
    # the task retry: same input, same deterministic names
    op.write_partitioned(df, "s3pl://bkt/ambc", "kb", b,
                         flush_rows=1_000_000, part_bytes=64 * 1024)
    assert not emu._uploads
    files = b.list_files("s3pl://bkt/ambc")
    assert len(files) == 1  # overwritten, not duplicated
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("s", T.StringType())])
    back = op.read_parquet(spark, ["s3pl://bkt/ambc/kb=0"], schema, b)
    assert back.count() == 2000
    assert back.agg(F.sum("id")).first()[0] == sum(range(2000))


def test_final_chunk_response_loss_gcs_task_retry_overwrites(spark):
    """The GCS twin: the resumable FINAL chunk applied (object
    materialized, session consumed) but the response lost — the
    backend raises, the plane aborts the session (404-tolerant), and
    the task retry overwrites the same object name. Exact final
    state, no session debris."""
    from dataflowtemplates_spark.operators import objstore_plane as op
    from pyspark.sql import types as T

    emu = GcsEmulator().start()
    emu.require_bearer = "tok-amb"
    b = GcsHttpBackend(emu.endpoint, timeout_s=5.0,
                       bearer_token="tok-amb")
    fsio.register_object_backend("gsamb", b)
    try:
        df = _entropy_df(spark, 2000)  # ~1 MB: crosses the 256 KiB
        #                                chunk quantum -> resumable path
        emu.drop_response_next_final_chunk = True
        with pytest.raises(Exception, match="resumable chunk"):
            op.write_partitioned(df, "gsamb://bkt/ambg", "kb", b,
                                 flush_rows=1_000_000,
                                 part_bytes=256 * 1024)
        assert not emu._sessions  # consumed by the applied finalize
        #                           and/or aborted by the error path
        assert emu.resumable_completed == 1  # the fault DID apply
        op.write_partitioned(df, "gsamb://bkt/ambg", "kb", b,
                             flush_rows=1_000_000,
                             part_bytes=256 * 1024)
        assert not emu._sessions
        files = b.list_files("gsamb://bkt/ambg")
        assert len(files) == 1
        schema = T.StructType([T.StructField("id", T.LongType()),
                               T.StructField("s", T.StringType())])
        back = op.read_parquet(spark, ["gsamb://bkt/ambg/kb=0"],
                               schema, b)
        assert back.count() == 2000
        assert back.agg(F.sum("id")).first()[0] == sum(range(2000))
    finally:
        fsio.unregister_object_backend("gsamb")
        emu.stop()


def test_distributed_snapshot_listing_parity(spark, s3, monkeypatch):
    """A snapshot spanning many commit dirs lists from executor tasks
    (one per commit dir) instead of serializing the LIST round trips
    on the driver; the distributed manifest must equal the
    driver-path manifest exactly, and the read over it must be
    exact. Threshold forced to 1 so BOTH paths run on the same
    snapshot; the default read (threshold 8, 10 commit dirs here)
    takes the distributed path organically too."""
    from dataflowtemplates_spark.operators import objstore_plane as op

    _, backend = s3
    t = KeyedTable(spark, "s3pl://bkt/many", ["id"], n_buckets=3)
    # 10 commits -> 10 live commit dirs (no compaction in between)
    for c in range(10):
        t.apply_mutations(spark.createDataFrame(
            [Row(id=c * 100 + i, v=float(c)) for i in range(30)]),
            "INSERT")
    # leaf dirs straight from the owner fold: the read path's input
    leaf_dirs = sorted({f.rsplit("/", 1)[0].replace("s3pl://", "")
                        for f in backend.list_files(
                            "s3pl://bkt/many/data")})
    leaf_dirs = [f"s3pl://{d}" for d in leaf_dirs]
    assert len({d.rsplit("/", 2)[1] for d in leaf_dirs}) == 10
    driver_files = sorted(op._list_leaf_files(leaf_dirs, backend))
    monkeypatch.setattr(op, "_DIST_LIST_MIN_DIRS", 1)
    dist_files = sorted(op._list_leaf_files(leaf_dirs, backend,
                                            spark))
    assert dist_files == driver_files and len(dist_files) >= 10
    # and the full read (which now routes through the distributed
    # listing) stays exact
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert len(got) == 300
    assert got[0] == 0.0 and got[905] == 9.0
