"""TFRecord encoder tests: wire-format round-trip + type lowering
(reference C12 semantics)."""

import struct

from pyspark.sql import Row
from pyspark.sql import types as T

from dataflowtemplates_spark.operators.tfrecord import (
    _example,
    _masked_crc,
    encode_examples,
    frame_record,
    read_tfrecords,
    write_tfrecords,
)


def _decode_example(buf: bytes) -> dict:
    """Minimal Example proto decoder for assertions."""
    def varint(b, i):
        n = shift = 0
        while True:
            n |= (b[i] & 0x7F) << shift
            shift += 7
            i += 1
            if not b[i - 1] & 0x80:
                return n, i

    def fields(b):
        i = 0
        while i < len(b):
            tag, i = varint(b, i)
            fno, wt = tag >> 3, tag & 7
            assert wt == 2
            ln, i = varint(b, i)
            yield fno, b[i:i + ln]
            i += ln

    out = {}
    (fno, features), = fields(buf)
    assert fno == 1
    for fno, entry in fields(features):
        assert fno == 1
        name = kind = None
        for eno, val in fields(entry):
            if eno == 1:
                name = val.decode()
            else:
                (kno, body), = fields(val)
                if kno == 1:   # bytes list
                    kind = [v.decode(errors="replace") for _n, v in fields(body)]
                elif kno == 2:  # float list (packed)
                    (_n, packed), = fields(body)
                    kind = list(struct.unpack(f"<{len(packed)//4}f", packed))
                else:          # int64 list (packed varints)
                    (_n, packed), = fields(body)
                    vals, i = [], 0
                    while i < len(packed):
                        v, i = varint(packed, i)
                        if v >= 1 << 63:
                            v -= 1 << 64
                        vals.append(v)
                    kind = vals
        out[name] = kind
    return out


def test_frame_roundtrip(tmp_path):
    payloads = [b"abc", b"", b"x" * 1000]
    target = str(tmp_path / "t.tfrecord")
    with open(target, "wb") as fh:
        for p in payloads:
            fh.write(frame_record(p))
    assert read_tfrecords(target) == payloads


def test_masked_crc_known_value():
    # crc32c("") = 0; masked = rot-right-15(0) + MASK = 0xA282EAD8
    assert _masked_crc(b"") == 0xA282EAD8


def test_encode_type_lowering(spark):
    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("f", T.DoubleType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("raw", T.BinaryType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField("nest", T.StructType([
            T.StructField("x", T.StringType())])),
        T.StructField("skipme", T.MapType(T.StringType(), T.LongType())),
    ])
    df = spark.createDataFrame([Row(
        s="hi", i=42, f=1.5, flag=True, raw=b"\x01\x02",
        arr=[1, 2, 3], nest=Row(x="deep"), skipme={"k": 1})], schema)
    encoded = encode_examples(df).collect()[0].example
    got = _decode_example(bytes(encoded))
    assert got["s"] == ["hi"]
    assert got["i"] == [42]
    assert got["f"] == [1.5]
    assert got["flag"] == [1]          # bool -> int64 0/1 (reference :89-90)
    assert got["arr"] == [1, 2, 3]
    assert got["nest_x"] == ["deep"]   # underscore flattening
    assert "skipme" not in got         # MAP skipped


def test_write_tfrecords_split(spark, tmp_path):
    df = spark.createDataFrame([
        Row(grp="a", v=1), Row(grp="b", v=2), Row(grp="a", v=3),
        Row(grp=None, v=4),
    ])
    out = str(tmp_path / "tfr")
    files = write_tfrecords(df, out, split_field="grp", compress=True)
    assert files and all(f.endswith(".tfrecord.gz") for f in files)
    total = []
    for f in files:
        total += read_tfrecords(f)
    assert len(total) == 4
    decoded = [_decode_example(p) for p in total]
    # split column is passthrough metadata, not a feature
    assert all(set(d) == {"grp", "v"} or set(d) == {"v"} for d in decoded)


def test_null_timestamp_and_null_array_elements(spark):
    """Arrow renders null timestamps as NaT — the encoder must skip
    them like any other null feature, and null array elements drop."""
    from datetime import datetime
    from dataflowtemplates_spark.operators.tfrecord import encode_examples
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0, 0), [1, None, 3]),
         (2, None, None)],
        "id long, ts timestamp, arr array<long>")
    rows = encode_examples(df).collect()
    assert len(rows) == 2 and all(len(r.example) > 0 for r in rows)


def test_non_string_passthrough_keeps_type(spark):
    from dataflowtemplates_spark.operators.tfrecord import encode_examples
    df = spark.createDataFrame([(7, "a")], "num long, txt string")
    out = encode_examples(df, passthrough=("num",))
    assert dict(out.dtypes)["num"] == "bigint"
    assert out.collect()[0].num == 7


def test_read_tfrecord_df_roundtrip(spark, tmp_path):
    """The new TFRecord source must read the K3 sink's output back
    bit-for-bit (values, arrays, nesting-flattened names, gzip frames,
    CRC verification on every record)."""
    from dataflowtemplates_spark.operators.tfrecord import read_tfrecord_df

    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("f", T.DoubleType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("raw", T.BinaryType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField("nest", T.StructType([
            T.StructField("x", T.StringType())])),
    ])
    rows = [Row(s=f"r{i}", i=i, f=i + 0.5, flag=i % 2 == 0,
                raw=bytes([i]), arr=[i, i * 2, -i], nest=Row(x=f"n{i}"))
            for i in range(7)]
    df = spark.createDataFrame(rows, schema).repartition(3)
    target = str(tmp_path / "rt")
    files = write_tfrecords(df, target, compress=True)
    assert files

    got = read_tfrecord_df(
        spark, target,
        {"s": "string", "i": "int64", "f": "float", "flag": "int64",
         "raw": "bytes", "arr": "int64", "nest_x": "string"},
        list_fields=("arr",)).collect()
    assert len(got) == len(rows)
    by_key = {r["s"]: r for r in got}
    import struct as _st
    for src in rows:
        g = by_key[src.s]
        assert g["i"] == src.i
        # writer lowers double -> float32; reader returns that float32
        assert g["f"] == _st.unpack("<f", _st.pack("<f", src.f))[0]
        assert g["flag"] == int(src.flag)   # bool -> int64 lowering
        assert g["raw"] == src.raw
        assert g["arr"] == src.arr
        assert g["nest_x"] == src.nest.x    # `_`-flattened nesting


def test_read_tfrecord_df_rejects_corrupt_crc(spark, tmp_path):
    from dataflowtemplates_spark.operators.tfrecord import read_tfrecord_df

    schema = T.StructType([T.StructField("i", T.LongType())])
    df = spark.createDataFrame([Row(i=1)], schema)
    target = str(tmp_path / "bad")
    files = write_tfrecords(df, target, compress=False)
    data = bytearray(open(files[0], "rb").read())
    data[-5] ^= 0xFF  # flip a payload byte, leave the CRC stale
    open(files[0], "wb").write(bytes(data))
    import pytest
    with pytest.raises(Exception, match="CRC"):
        read_tfrecord_df(spark, target, {"i": "int64"}).collect()


def test_read_tfrecord_df_unpacked_scalars(spark, tmp_path):
    """Externally produced files may encode repeated scalars UNPACKED
    (one wire-type-0/5 field per value) — valid protobuf the K3 writer
    never emits. The reader must return the values, not drop them."""
    from dataflowtemplates_spark.operators.tfrecord import (
        _len_delimited,
        _tag,
        _varint,
        frame_record,
        read_tfrecord_df,
    )

    ints = [3, -4, 1 << 40]
    floats = [1.5, -2.25]
    int_body = b"".join(_tag(1, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)
                        for v in ints)
    float_body = b"".join(_tag(1, 5) + struct.pack("<f", v)
                          for v in floats)
    entries = (
        _len_delimited(1, _len_delimited(1, b"iv")
                       + _len_delimited(2, _len_delimited(3, int_body)))
        + _len_delimited(1, _len_delimited(1, b"fv")
                         + _len_delimited(2, _len_delimited(2, float_body)))
    )
    example = _len_delimited(1, entries)
    target = tmp_path / "unpacked"
    target.mkdir()
    (target / "part.tfrecord").write_bytes(frame_record(example))

    got = read_tfrecord_df(
        spark, str(target), {"iv": "int64", "fv": "float"},
        list_fields=("iv", "fv")).collect()
    assert len(got) == 1
    assert list(got[0]["iv"]) == ints
    assert list(got[0]["fv"]) == floats


def test_read_tfrecord_df_bad_wire_type_raises(spark, tmp_path):
    """A malformed wire type inside a value list must raise — silent
    data loss on externally produced files is worse than an error."""
    from dataflowtemplates_spark.operators.tfrecord import (
        _len_delimited,
        _tag,
        frame_record,
        read_tfrecord_df,
    )
    import pytest

    bad_body = _tag(1, 1) + struct.pack("<d", 1.0)  # wt=1 in an int64 list
    entries = _len_delimited(
        1, _len_delimited(1, b"iv")
        + _len_delimited(2, _len_delimited(3, bad_body)))
    example = _len_delimited(1, entries)
    target = tmp_path / "badwire"
    target.mkdir()
    (target / "part.tfrecord").write_bytes(frame_record(example))
    with pytest.raises(Exception, match="wire type"):
        read_tfrecord_df(spark, str(target), {"iv": "int64"},
                         list_fields=("iv",)).collect()


def test_write_tfrecords_file_uri_scheme(spark, tmp_path):
    """The sink streams through pyarrow.fs resolved from the path's
    scheme — a file:// URI (the stand-in for hdfs://, s3://, gs://)
    writes and round-trips identically to a bare path."""
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(s="x", i=1), Row(s="y", i=2)])
    out = f"file://{tmp_path}/tfr_uri"
    files = write_tfrecords(df, out, compress=True)
    assert files and all(f.startswith("file:///") for f in files)
    total = []
    for f in files:
        total += read_tfrecords(f.removeprefix("file://"))
    assert len(total) == 2
    # the distributed reader takes the URI directly (binaryFile source)
    from dataflowtemplates_spark.operators.tfrecord import read_tfrecord_df
    back = read_tfrecord_df(spark, out, {"s": "string", "i": "int64"})
    assert {(r.s, r.i) for r in back.collect()} == {("x", 1), ("y", 2)}
