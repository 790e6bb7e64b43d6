"""Distributed parquet data plane over registered object-store
backends (the fsio seam), for schemes Spark's own datasources cannot
reach in this environment.

The KeyedTable engine (operators/mutations.py) separates METADATA
(commit-log JSON, always through fsio and its conditional-put CAS)
from DATA (immutable parquet under ``data/vNNNNN-uuid/kb=N/``). On
``file://``/HDFS paths Spark's native parquet source reads and writes
the data; on an object-store scheme a production cluster would mount
the native connector (s3a / the GCS Hadoop connector) for the same
effect. This sandbox ships neither connector jar, so this module
provides the pure-Python equivalent — and it is a real distributed
plane, not a driver shim:

* **Write** (:func:`write_partitioned`): ``mapInArrow`` over the
  staged slice — each EXECUTOR task serializes its partition's rows
  to parquet bytes per bucket (pyarrow, snappy) and PUTs them
  straight to the store through the pickled backend
  (``S3HttpBackend``/``GcsHttpBackend`` pickle by configuration).
  Part objects are named ``part-{partition:05d}-{seq:04d}.parquet``
  — deterministic per task partition, so a task RETRY overwrites its
  own objects instead of duplicating rows (unconditional full-object
  puts are idempotent; the directory is this writer's private staging
  dir, published only by the later metadata CAS). Buffers rotate at
  ``flush_bytes`` so executor memory stays bounded regardless of
  bucket size; production would swap the buffered PUT for a
  multipart upload behind the same batch shape.
* **Read** (:func:`read_parquet`): the driver lists the snapshot's
  leaf directories through the backend (bucket pruning happened
  upstream in the ``_owners`` fold — the file list IS the pruned
  scan), then ``mapInArrow`` over a one-file-per-partition path frame
  fetches and decodes each object executor-side, conforming to the
  table schema (missing columns null-fill: the engine's
  schema-evolution rule, same as parquet's missing-column semantics).

Scale notes: both directions are map-only (no shuffle, no
driver-side data movement; the driver handles O(files) strings).
Column pruning does NOT push into this plane (each object is fetched
whole) — with the native connector on a real cluster it does; this is
the documented cost of the pure-Python seam, bounded by
rewrite-granularity object sizes (n_buckets sizing, SCALE.md).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: rotate part objects once the in-memory parquet buffer passes this
_FLUSH_BYTES = 128 * 1024 * 1024


def _arrow_schema(spark_schema: T.StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


def write_partitioned(staged: DataFrame, data_dir: str, bucket_col: str,
                      backend, flush_bytes: int = _FLUSH_BYTES) -> None:
    """Write ``staged`` (which carries ``bucket_col``) as
    ``data_dir/{bucket_col}={b}/part-*.parquet`` objects via
    ``backend``, from executor tasks. Mirrors
    ``df.write.partitionBy(bucket_col).parquet(data_dir)``: the bucket
    column lives in the directory name, not in the files."""
    out_schema = T.StructType(
        [f for f in staged.schema.fields if f.name != bucket_col])
    arrow_out = _arrow_schema(out_schema)

    def task(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        # part names are DETERMINISTIC per (partition, bucket, seq):
        # a task retry or speculative attempt overwrites its own
        # objects byte-for-byte instead of duplicating rows — the
        # idempotence rule Spark's own committers get from
        # task-attempt promotion, achieved here by stable naming
        state: dict[int, dict] = {}
        manifest: list[tuple[int, str, int]] = []

        def flush(b, st):
            st["writer"].close()
            key = posixpath.join(
                data_dir, f"{bucket_col}={b}",
                f"part-{pid:05d}-{st['seq']:04d}.parquet")
            backend.write_bytes(key, st["buf"].getvalue().to_pybytes())
            manifest.append((b, key, st["rows"]))

        def fresh(seq):
            buf = pa.BufferOutputStream()
            return {"buf": buf, "rows": 0, "seq": seq,
                    "writer": pq.ParquetWriter(buf, arrow_out,
                                               compression="snappy")}

        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            kb = tbl.column(bucket_col)
            for b in pc.unique(kb).to_pylist():
                part = (tbl.filter(pc.equal(kb, b))
                        .drop_columns([bucket_col])
                        .cast(arrow_out))
                st = state.setdefault(b, fresh(0))
                st["writer"].write_table(part)
                st["rows"] += part.num_rows
                if st["buf"].tell() >= flush_bytes:
                    flush(b, st)
                    state[b] = fresh(st["seq"] + 1)  # seq carries on:
                    #     the next rotation must not overwrite this one
        for b, st in state.items():
            if st["rows"]:
                flush(b, st)
        yield pa.RecordBatch.from_arrays(
            [pa.array([m[0] for m in manifest], pa.int64()),
             pa.array([m[1] for m in manifest], pa.string()),
             pa.array([m[2] for m in manifest], pa.int64())],
            names=["bucket", "key", "rows"])

    # the collect() is the ACTION that runs the distributed write;
    # the manifest is O(part files), driver-safe
    staged.mapInArrow(task, "bucket long, key string, rows long") \
        .collect()


def read_parquet(spark: SparkSession, leaf_dirs: list[str],
                 schema: T.StructType, backend) -> DataFrame:
    """Distributed read of the given leaf directories' parquet objects
    through ``backend``, conformed to ``schema`` (missing columns
    null-fill — the engine's schema-evolution rule)."""
    files: list[str] = []
    for d in leaf_dirs:
        files.extend(backend.list_files(d, suffix=".parquet"))
    if not files:
        return spark.createDataFrame([], schema)
    arrow_schema = _arrow_schema(schema)

    def task(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        for batch in batches:
            for path in batch.column("path").to_pylist():
                raw = backend.read_bytes(path)
                tbl = pq.read_table(pa.BufferReader(raw))
                cols = []
                for field in arrow_schema:
                    if field.name in tbl.column_names:
                        cols.append(tbl.column(field.name)
                                    .cast(field.type))
                    else:
                        cols.append(pa.nulls(tbl.num_rows, field.type))
                out = pa.table(dict(zip(arrow_schema.names, cols)),
                               schema=arrow_schema)
                yield from out.to_batches()

    paths = spark.createDataFrame([(f,) for f in sorted(files)],
                                  "path string")
    # one file per task: the parallel unit is the object, matching the
    # native source's file-split granularity at these object sizes
    return paths.repartition(len(files)).mapInArrow(task, schema)
