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
* Codecs: ``null``, ``deflate`` (raw RFC-1951 via zlib — a REQUIRED
  spec codec), and ``snappy`` (the reference's pinned codec,
  AvroDynamicSink.java:37): raw-Snappy blocks implemented from the
  public format description plus the Avro-spec 4-byte big-endian CRC32
  of the uncompressed data per block (``_snappy_factory``). No snappy
  library ships in this container, so the codec is hand-rolled like
  the OCF framing itself; files written this way are readable by any
  stock Avro reader.
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

from dataflowtemplates_spark.operators.fsio import (
    list_files as _list_files,
    resolve_fs as _resolve_fs,
)
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


def _snappy_factory():
    """Returns (compress, decompress) for RAW Snappy block format —
    implemented from the public format description
    (google/snappy format_description.txt), self-contained closures
    like the encoder/decoder factories.

    Avro's snappy codec (spec: Object Container Files / Required
    Codecs) is raw-Snappy per block followed by the 4-byte big-endian
    CRC32 of the UNCOMPRESSED data; the CRC handling lives at the call
    sites, this factory is pure block codec. The compressor is a greedy
    hash-of-4-bytes matcher emitting 2-byte-offset copies — modest
    ratios at pure-Python speed, which is the correct trade for this
    jar-less seam (production writes go through spark-avro + native
    snappy; this path exists so `codec="snappy"` produces files any
    Avro reader accepts, reference: AvroDynamicSink.java:37).
    """

    def _uvarint(n: int) -> bytes:
        out = bytearray()
        while n >= 0x80:
            out.append((n & 0x7F) | 0x80)
            n >>= 7
        out.append(n)
        return bytes(out)

    def compress(data: bytes) -> bytes:
        n = len(data)
        out = bytearray(_uvarint(n))

        def emit_literal(start: int, end: int) -> None:
            ln = end - start - 1
            if ln < 60:
                out.append(ln << 2)
            elif ln < (1 << 8):
                out.append(60 << 2)
                out.append(ln)
            elif ln < (1 << 16):
                out.append(61 << 2)
                out.extend(ln.to_bytes(2, "little"))
            elif ln < (1 << 24):
                out.append(62 << 2)
                out.extend(ln.to_bytes(3, "little"))
            else:
                out.append(63 << 2)
                out.extend(ln.to_bytes(4, "little"))
            out.extend(data[start:end])

        table: dict[int, int] = {}
        i = lit_start = 0
        limit = n - 4
        while i <= limit:
            key = int.from_bytes(data[i:i + 4], "little")
            cand = table.get(key)
            table[key] = i
            if cand is None or i - cand > 0xFFFF \
                    or data[cand:cand + 4] != data[i:i + 4]:
                i += 1
                continue
            # extend the match
            m = i + 4
            c = cand + 4
            while m < n and data[m] == data[c]:
                m += 1
                c += 1
            if lit_start < i:
                emit_literal(lit_start, i)
            off = i - cand
            mlen = m - i
            while mlen >= 4:
                chunk = min(60, mlen)
                if 0 < mlen - chunk < 4:
                    chunk = mlen - 4
                out.append(((chunk - 1) << 2) | 0b10)
                out += off.to_bytes(2, "little")
                mlen -= chunk
            i = m - mlen  # mlen in 0..3 tail bytes rejoin the literal run
            lit_start = i
        if lit_start < n:
            emit_literal(lit_start, n)
        return bytes(out)

    def decompress(data: bytes) -> bytes:
        pos = 0
        shift = n = 0
        while True:
            b = data[pos]
            pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        out = bytearray()
        end = len(data)
        while pos < end:
            tag = data[pos]
            pos += 1
            kind = tag & 0b11
            if kind == 0:  # literal
                ln = tag >> 2
                if ln >= 60:
                    nb = ln - 59
                    ln = int.from_bytes(data[pos:pos + nb], "little")
                    pos += nb
                ln += 1
                out += data[pos:pos + ln]
                pos += ln
            else:
                if kind == 1:
                    ln = ((tag >> 2) & 0b111) + 4
                    off = ((tag >> 5) << 8) | data[pos]
                    pos += 1
                elif kind == 2:
                    ln = (tag >> 2) + 1
                    off = int.from_bytes(data[pos:pos + 2], "little")
                    pos += 2
                else:
                    ln = (tag >> 2) + 1
                    off = int.from_bytes(data[pos:pos + 4], "little")
                    pos += 4
                if off == 0 or off > len(out):
                    raise ValueError("snappy: invalid copy offset")
                start = len(out) - off
                if off >= ln:
                    out += out[start:start + ln]
                else:  # overlapping copy: repeat the pattern
                    while ln > 0:
                        take = min(off, ln)
                        out += out[start:start + take]
                        ln -= take
        if len(out) != n:
            raise ValueError(
                f"snappy: declared {n} bytes, got {len(out)}")
        return bytes(out)

    return compress, decompress


def _decoder_factory():
    """Returns decode(raw_bytes) -> (schema_dict, rows). Self-contained
    (the snappy codec is built here and rides the closure by value)."""

    snappy_decompress = _snappy_factory()[1]

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
            elif codec == "snappy":
                crc = int.from_bytes(block[-4:], "big")
                block = snappy_decompress(block[:-4])
                if (_zlib.crc32(block) & 0xFFFFFFFF) != crc:
                    raise ValueError("snappy block CRC mismatch")
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

    ``codec="snappy"`` produces real snappy blocks (reference parity:
    AvroDynamicSink.java:37) via the pure-Python raw-Snappy codec plus
    the Avro-spec 4-byte big-endian CRC32 of the uncompressed block.
    """
    codec_name = (codec or "null").lower()
    if codec_name in ("none", "uncompressed"):
        codec_name = "null"
    if codec_name not in ("null", "deflate", "snappy"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    fs0, base0 = _resolve_fs(path)
    fs0.create_dir(base0, recursive=True)

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
    # built on the driver, captured by value in the per_part closure —
    # same executor self-containment contract as build_encoder
    sn_compress = (_snappy_factory()[0] if codec_name == "snappy" else None)
    magic = MAGIC
    has_split = split_field is not None

    def per_part(idx, rows):
        import io as _io
        import json as _json
        import os as _os
        import posixpath as _pp
        import zlib as _zlib

        import pyarrow.fs as _pafs

        # executor-side scheme resolution: file://, hdfs://, s3://,
        # gs:// all stream from the task (same stance as the K3 writer)
        if "://" in path:
            fs, base = _pafs.FileSystem.from_uri(path)
            spfx = path.split("://", 1)[0] + "://"
        else:
            fs, base = _pafs.LocalFileSystem(), path
            spfx = ""

        if codec_name == "deflate":
            def compress(b):
                c = _zlib.compressobj(9, _zlib.DEFLATED, -15)
                return c.compress(b) + c.flush()
        elif codec_name == "snappy":
            def compress(b):
                # Avro spec: snappy block + big-endian CRC32 of the
                # UNCOMPRESSED data
                return (sn_compress(b)
                        + (_zlib.crc32(b) & 0xFFFFFFFF).to_bytes(4, "big"))
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
            subdir = base if key == "" else _pp.join(base, key)
            if key != "":
                fs.create_dir(subdir, recursive=True)
            target = _pp.join(subdir, f"{prefix}-{idx:05d}.avro")
            total = 0
            with fs.open_output_stream(target, compression=None) as fh:
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
            written.append((spfx + target, total))
        return iter(written)

    stats = work.rdd.mapPartitionsWithIndex(per_part).collect()
    return AvroWriteResult(files=sorted(p for p, _n in stats),
                           row_count=sum(n for _p, n in stats))


_decode = _decoder_factory()


def _resolver_factory():
    """Build the Avro schema-resolution adapter (spec §Schema
    Resolution, the subset real pipelines hit): reader/writer fields
    matched by name or reader-declared aliases; writer-only fields
    dropped; reader-only fields filled from their ``default`` (error
    if none); numeric promotions int->long/float/double,
    long->float/double, float->double and string<->bytes; null-unions
    unnested on both sides; records/arrays/maps resolved recursively.

    Returned as a self-contained closure (same executor-pickling
    stance as the encoder/decoder factories): ``build(writer, reader)``
    -> row-adapting callable, constructed per file so directories whose
    files carry DIFFERENT writer schemas (real schema evolution) read
    under one reader schema.
    """
    def unnest(s):
        if isinstance(s, list):
            branches = [b for b in s if b != "null"]
            if len(branches) != 1:
                raise ValueError(f"non-null-union not supported: {s}")
            return branches[0], True
        return s, False

    def type_name(s):
        return s.get("type") if isinstance(s, dict) else s

    _PROMOTE = {("int", "long"), ("int", "float"), ("int", "double"),
                ("long", "float"), ("long", "double"),
                ("float", "double"), ("string", "bytes"),
                ("bytes", "string")}

    def value_adapter(w, r):
        w, _ = unnest(w)
        r, _ = unnest(r)
        wt, rt = type_name(w), type_name(r)
        if wt == "record" and rt == "record":
            inner = build(w, r)
            return lambda v: None if v is None else inner(v)
        if wt == "array" and rt == "array":
            el = value_adapter(w["items"], r["items"])
            return lambda v: None if v is None else [el(x) for x in v]
        if wt == "map" and rt == "map":
            el = value_adapter(w["values"], r["values"])
            return (lambda v: None if v is None
                    else {k: el(x) for k, x in v.items()})
        if wt == rt:
            return lambda v: v
        if (wt, rt) in _PROMOTE:
            if rt in ("float", "double"):
                return lambda v: None if v is None else float(v)
            if rt == "long":
                return lambda v: None if v is None else int(v)
            if rt == "bytes":
                return (lambda v: None if v is None
                        else v.encode() if isinstance(v, str) else v)
            return (lambda v: None if v is None
                    else v.decode() if isinstance(v, (bytes, bytearray))
                    else v)
        raise ValueError(
            f"cannot resolve writer type {wt!r} to reader type {rt!r}")

    _MISSING = object()

    def build(writer: dict, reader: dict):
        wfields = {f["name"]: f for f in writer.get("fields", [])}
        plan = []
        for rf in reader.get("fields", []):
            names = [rf["name"], *rf.get("aliases", [])]
            wf = next((wfields[n] for n in names if n in wfields), None)
            if wf is not None:
                plan.append((rf["name"], wf["name"],
                             value_adapter(wf["type"], rf["type"]),
                             _MISSING))
            elif "default" in rf:
                plan.append((rf["name"], None, None, rf["default"]))
            else:
                raise ValueError(
                    f"reader field {rf['name']!r} absent from writer "
                    "schema and declares no default")

        def adapt(row: dict) -> dict:
            return {rname: (default if wname is None
                            else conv(row.get(wname)))
                    for rname, wname, conv, default in plan}
        return adapt

    return build


_build_resolver = _resolver_factory()


def read_avro_rows(path: str):
    """Driver-side decode of one .avro file -> (schema_dict, rows)."""
    fs, base = _resolve_fs(path)
    with fs.open_input_stream(base) as fh:
        return _decode(fh.read())


def read_avro(spark: SparkSession, path: str,
              reader_schema: dict | None = None) -> DataFrame:
    """Distributed read: one decode task per container file (S5).

    Listing and the per-file open both resolve through ``pyarrow.fs``,
    so any scheme the writer can target reads back the same way.

    With ``reader_schema`` (an Avro record schema dict) each file is
    decoded under ITS OWN embedded writer schema and then resolved to
    the reader schema per the Avro spec (name/alias matching, defaults
    for reader-only fields, numeric/string promotions, writer-only
    fields dropped) — so a directory whose files were written across a
    schema migration reads back as ONE uniform frame. Without it, the
    first file's schema is the frame schema (homogeneous directories,
    the reference's behavior — AvroToSpanner reads the embedded schema
    only)."""
    try:
        files = _list_files(path, suffix=".avro")
    except FileNotFoundError:
        files = []
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    if reader_schema is None:
        target_avro, _ = read_avro_rows(files[0])
    else:
        target_avro = reader_schema
    spark_schema = spark_schema_from_avro(target_avro)
    names = [f.name for f in spark_schema.fields]
    decode = _decode
    build_resolver = _build_resolver if reader_schema is not None else None
    reader_json = json.dumps(target_avro) if reader_schema is not None \
        else None

    def load(p):
        import json as _json

        import pyarrow.fs as _pafs
        if "://" in p:
            fs, lp = _pafs.FileSystem.from_uri(p)
        else:
            fs, lp = _pafs.LocalFileSystem(), p
        with fs.open_input_stream(lp) as fh:
            wschema, rows = decode(fh.read())
        if build_resolver is not None:
            adapt = build_resolver(wschema, _json.loads(reader_json))
            rows = [adapt(r) for r in rows]
        return [tuple(r[n] for n in names) for r in rows]

    rdd = spark.sparkContext.parallelize(files, len(files)).flatMap(load)
    return spark.createDataFrame(rdd, schema=spark_schema)
