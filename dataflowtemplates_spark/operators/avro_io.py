"""Pure-Python Avro Object Container File writer/reader (S5 / K2).

The reference's Avro surface is first-class
(transforms/sinks/AvroDynamicSink.java:33-49 — snappy container files;
templates/AvroToSpanner.java:75-77 — container read). This sandbox has
neither the spark-avro datasource jar nor a Python avro package, so
the container format (public Avro 1.11 spec) is implemented directly —
the same hand-rolled-codec pattern as the TFRecord writer
(operators/tfrecord.py), which proves byte-level round-trips in tests.

Format notes:
* OCF layout: magic ``Obj\\x01`` · file-metadata map (``avro.schema``
  JSON + ``avro.codec``) · 16-byte sync marker · data blocks
  (row-count, byte-size, payload, sync).
* Codecs: ``null`` and ``deflate`` (raw RFC-1951 via zlib — a REQUIRED
  spec codec every Avro reader supports). ``snappy`` is accepted as an
  argument for reference parity but lowered to ``deflate`` because no
  snappy implementation ships in this container; the file metadata
  records the codec actually used, so files stay self-describing.
* Schemas come from functions/avroschema.py (C13): every field a
  nullable union, decimal bytes, date as logical int days, timestamp
  as logical timestamp-millis. Naive datetimes are treated as epoch
  offsets symmetrically on encode and decode, so values round-trip
  exactly under any session timezone.

Scale stance: encoding runs per-partition on executors (one container
file per partition, grouped by ``split_field`` like the reference's
dynamic destinations); only file PATHS return to the driver. Reads
parallelize over the file list, one decode task per container file.

Executor self-containment: the encoder/decoder are built by factory
functions and captured as CLOSURES (pickled by value), never as module
attributes — same contract as operators/tfrecord.py's inline helpers.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflowtemplates_spark.functions.avroschema import (
    avro_schema_from_spark,
    spark_schema_from_avro,
)

__all__ = ["write_avro", "read_avro_rows", "read_avro", "MAGIC",
           "AvroWriteResult"]

MAGIC = b"Obj\x01"


from dataclasses import dataclass, field


@dataclass
class AvroWriteResult:
    files: list[str] = field(default_factory=list)
    row_count: int = 0


def _encoder_factory():
    """Returns build(schema_dict) -> (encode_row, zigzag). Self-contained."""

    def build(schema):
        import struct as _struct
        from datetime import date as _date, datetime as _dt
        from decimal import Decimal as _Dec

        def zigzag(n):
            n = (n << 1) ^ (n >> 63)
            out = bytearray()
            while True:
                b = n & 0x7F
                n >>= 7
                if n:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    return bytes(out)

        def enc_blob(b):
            return zigzag(len(b)) + b

        def enc_str(v):
            return enc_blob(v.encode("utf-8") if isinstance(v, str)
                            else bytes(v))

        def make(t):
            if isinstance(t, list):  # union — avroschema emits [null, T]
                null_at = t.index("null")
                other = [x for x in t if x != "null"]
                assert len(other) == 1, f"unsupported union {t}"
                val_ix, val_enc = 1 - null_at, make(other[0])

                def enc_union(v):
                    if v is None:
                        return zigzag(null_at)
                    return zigzag(val_ix) + val_enc(v)
                return enc_union
            if isinstance(t, dict):
                logical = t.get("logicalType")
                base = t["type"]
                if logical == "date":
                    def enc_date(v):
                        if isinstance(v, _dt):
                            v = v.date()
                        return zigzag((v - _date(1970, 1, 1)).days)
                    return enc_date
                if logical in ("timestamp-millis", "timestamp-micros"):
                    unit = 1000 if logical == "timestamp-millis" else 1000000

                    def enc_ts(v):
                        delta = v.replace(tzinfo=None) - _dt(1970, 1, 1)
                        micros = ((delta.days * 86400 + delta.seconds)
                                  * 1000000 + delta.microseconds)
                        return zigzag(micros * unit // 1000000)
                    return enc_ts
                if logical == "decimal":
                    scale = t.get("scale", 0)

                    def enc_dec(v):
                        unscaled = int(_Dec(v).scaleb(scale))
                        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
                        return enc_blob(unscaled.to_bytes(nbytes, "big",
                                                          signed=True))
                    return enc_dec
                if base == "array":
                    item = make(t["items"])

                    def enc_arr(v):
                        v = list(v)
                        if not v:
                            return zigzag(0)
                        return (zigzag(len(v))
                                + b"".join(item(x) for x in v) + zigzag(0))
                    return enc_arr
                if base == "map":
                    val = make(t["values"])

                    def enc_map(v):
                        items = dict(v)
                        if not items:
                            return zigzag(0)
                        body = b"".join(enc_str(k) + val(x)
                                        for k, x in items.items())
                        return zigzag(len(items)) + body + zigzag(0)
                    return enc_map
                if base == "record":
                    fields = [(f["name"], make(f["type"]))
                              for f in t["fields"]]

                    def enc_rec(v):
                        return b"".join(e(v[n]) for n, e in fields)
                    return enc_rec
                return make(base)  # {"type": "string", "sqlType": ...}
            if t == "boolean":
                return lambda v: b"\x01" if v else b"\x00"
            if t in ("int", "long"):
                return lambda v: zigzag(int(v))
            if t == "float":
                return lambda v: _struct.pack("<f", v)
            if t == "double":
                return lambda v: _struct.pack("<d", v)
            if t == "string":
                return enc_str
            if t == "bytes":
                return enc_str
            raise ValueError(f"no encoder for Avro type {t!r}")

        return make(schema), zigzag

    return build


def _decoder_factory():
    """Returns decode(raw_bytes) -> (schema_dict, rows). Self-contained."""

    def decode(raw):
        import json as _json
        import struct as _struct
        import zlib as _zlib
        from datetime import date as _date, datetime as _dt, \
            timedelta as _td
        from decimal import Decimal as _Dec

        class Cur:
            __slots__ = ("buf", "pos")

            def __init__(self, buf):
                self.buf, self.pos = buf, 0

            def take(self, n):
                s = self.pos
                self.pos = s + n
                return self.buf[s:s + n]

            def zig(self):
                shift, acc = 0, 0
                while True:
                    b = self.buf[self.pos]
                    self.pos += 1
                    acc |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                return (acc >> 1) ^ -(acc & 1)

        cur = Cur(raw)
        assert cur.take(4) == b"Obj\x01", "not an Avro container file"
        meta = {}
        while True:
            n = cur.zig()
            if n == 0:
                break
            if n < 0:
                cur.zig()  # block byte size
                n = -n
            for _ in range(n):
                k = cur.take(cur.zig()).decode()
                meta[k] = cur.take(cur.zig())
        schema = _json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        sync = cur.take(16)

        def make(t):
            if isinstance(t, list):
                branches = [make(x) for x in t]
                return lambda c: branches[c.zig()](c)
            if isinstance(t, dict):
                logical = t.get("logicalType")
                base = t["type"]
                if logical == "date":
                    return lambda c: _date(1970, 1, 1) + _td(days=c.zig())
                if logical in ("timestamp-millis", "timestamp-micros"):
                    unit = 1000 if logical == "timestamp-millis" else 1
                    return lambda c: (_dt(1970, 1, 1)
                                      + _td(microseconds=c.zig() * unit))
                if logical == "decimal":
                    scale = t.get("scale", 0)

                    def dec(c):
                        b = c.take(c.zig())
                        return _Dec(
                            int.from_bytes(b, "big", signed=True)
                        ).scaleb(-scale)
                    return dec
                if base == "array":
                    item = make(t["items"])

                    def arr(c):
                        out = []
                        while True:
                            n = c.zig()
                            if n == 0:
                                return out
                            if n < 0:
                                c.zig()
                                n = -n
                            out.extend(item(c) for _ in range(n))
                    return arr
                if base == "map":
                    val = make(t["values"])

                    def mp(c):
                        out = {}
                        while True:
                            n = c.zig()
                            if n == 0:
                                return out
                            if n < 0:
                                c.zig()
                                n = -n
                            for _ in range(n):
                                k = c.take(c.zig()).decode()
                                out[k] = val(c)
                    return mp
                if base == "record":
                    fields = [(f["name"], make(f["type"]))
                              for f in t["fields"]]
                    return lambda c: {n: d(c) for n, d in fields}
                return make(base)
            if t == "boolean":
                return lambda c: c.take(1) == b"\x01"
            if t in ("int", "long"):
                return lambda c: c.zig()
            if t == "float":
                return lambda c: _struct.unpack("<f", c.take(4))[0]
            if t == "double":
                return lambda c: _struct.unpack("<d", c.take(8))[0]
            if t == "string":
                return lambda c: c.take(c.zig()).decode()
            if t == "bytes":
                return lambda c: bytes(c.take(c.zig()))
            if t == "null":
                return lambda c: None
            raise ValueError(f"no decoder for Avro type {t!r}")

        dec_row = make(schema)
        rows = []
        while cur.pos < len(raw):
            count = cur.zig()
            size = cur.zig()
            block = cur.take(size)
            if codec == "deflate":
                block = _zlib.decompress(block, -15)
            bc = Cur(block)
            rows.extend(dec_row(bc) for _ in range(count))
            assert cur.take(16) == sync, "sync marker mismatch"
        return schema, rows

    return decode


def write_avro(df: DataFrame, path: str, split_field: str | None = None,
               codec: str = "deflate", prefix: str = "output",
               rows_per_block: int = 4096) -> AvroWriteResult:
    """Write ``df`` as Avro container files, one per partition (grouped
    into per-key subdirectories when ``split_field`` is set, matching
    the reference's dynamic destinations). Returns written paths plus
    the row count (tallied during the single encode pass — callers
    never need a separate count job).

    ``codec="snappy"`` is accepted (reference parity:
    AvroDynamicSink.java:37) but lowered to deflate — see module note.
    """
    codec_name = (codec or "null").lower()
    if codec_name == "snappy":
        codec_name = "deflate"
    if codec_name in ("none", "uncompressed"):
        codec_name = "null"
    if codec_name not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    os.makedirs(path, exist_ok=True)

    if split_field is not None:
        data_cols = list(df.columns)
        work = (df.withColumn(
            "_split",
            F.coalesce(F.col(split_field).cast("string"), F.lit("")))
            .repartition(F.col("_split")))
        avro = avro_schema_from_spark(df.select(*data_cols).schema)
    else:
        work = df
        avro = avro_schema_from_spark(df.schema)
    schema_json = json.dumps(avro)
    build_encoder = _encoder_factory()
    magic = MAGIC
    has_split = split_field is not None

    def per_part(idx, rows):
        import io as _io
        import json as _json
        import os as _os
        import zlib as _zlib

        if codec_name == "deflate":
            def compress(b):
                c = _zlib.compressobj(9, _zlib.DEFLATED, -15)
                return c.compress(b) + c.flush()
        else:
            def compress(b):
                return b

        enc_row, zigzag = build_encoder(_json.loads(schema_json))
        sync = _os.urandom(16)
        sj = schema_json.encode()
        cd = codec_name.encode()
        header = (magic + zigzag(2)
                  + zigzag(11) + b"avro.schema" + zigzag(len(sj)) + sj
                  + zigzag(10) + b"avro.codec" + zigzag(len(cd)) + cd
                  + zigzag(0) + sync)

        def flush(fh, buf, count):
            payload = compress(buf.getvalue())
            fh.write(zigzag(count) + zigzag(len(payload)) + payload + sync)

        by_key: dict[str, list] = {}
        for r in rows:
            key = r["_split"] if has_split else ""
            by_key.setdefault(key, []).append(r)
        written = []
        for key, krows in by_key.items():
            subdir = path if key == "" else _os.path.join(path, key)
            _os.makedirs(subdir, exist_ok=True)
            target = _os.path.join(subdir, f"{prefix}-{idx:05d}.avro")
            total = 0
            with open(target, "wb") as fh:
                fh.write(header)
                buf, count = _io.BytesIO(), 0
                for r in krows:
                    d = r.asDict(recursive=True)
                    d.pop("_split", None)
                    buf.write(enc_row(d))
                    count += 1
                    total += 1
                    if count >= rows_per_block:
                        flush(fh, buf, count)
                        buf, count = _io.BytesIO(), 0
                if count:
                    flush(fh, buf, count)
            written.append((target, total))
        return iter(written)

    stats = work.rdd.mapPartitionsWithIndex(per_part).collect()
    return AvroWriteResult(files=sorted(p for p, _n in stats),
                           row_count=sum(n for _p, n in stats))


_decode = _decoder_factory()


def read_avro_rows(path: str):
    """Driver-side decode of one .avro file -> (schema_dict, rows)."""
    with open(path, "rb") as fh:
        return _decode(fh.read())


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed read: one decode task per container file (S5)."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(dp, fn)
            for dp, _dirs, fns in os.walk(path)
            for fn in fns if fn.endswith(".avro"))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    schema, _ = read_avro_rows(files[0])
    spark_schema = spark_schema_from_avro(schema)
    names = [f.name for f in spark_schema.fields]
    decode = _decode

    def load(p):
        with open(p, "rb") as fh:
            _schema, rows = decode(fh.read())
        return [tuple(r[n] for n in names) for r in rows]

    rdd = spark.sparkContext.parallelize(files, len(files)).flatMap(load)
    return spark.createDataFrame(rdd, schema=spark_schema)
