"""Golden-string tests for the conversion layer (reference test tier 1:
exact expected output strings, modeled on the reference's
StructAndJsonConverterTest / StructAndCsvConverterTest)."""

import base64
import datetime as dt
import json
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataflowtemplates_spark.functions import (
    avro_schema_from_spark,
    csv_line,
    ddl_from_schema,
    decimal_plain_string,
    epoch_days,
    epoch_millis_truncated,
    epoch_seconds,
    flatten_for_tfrecord,
    iso_zulu,
    json_line,
    spark_schema_from_avro,
)


def _flat_df(spark):
    schema = T.StructType([
        T.StructField("sid", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("f", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("raw", T.BinaryType()),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampType()),
    ])
    rows = [
        Row(sid="abc", n=12, f=1.5, b=True, raw=b"hello",
            d=dt.date(2020, 5, 17),
            ts=dt.datetime(2020, 5, 17, 10, 30, 15, 123456)),
        Row(sid=None, n=None, f=None, b=None, raw=None, d=None, ts=None),
    ]
    return spark.createDataFrame(rows, schema)


def test_json_line_golden(spark):
    df = _flat_df(spark)
    lines = [r[0] for r in df.select(json_line(df)).collect()]
    got = json.loads(lines[0])
    assert got == {
        "sid": "abc", "n": 12, "f": 1.5, "b": True,
        "raw": base64.b64encode(b"hello").decode(),
        "d": "2020-05-17", "ts": "2020-05-17T10:30:15Z",
    }
    # nulls explicit (reference: StructToJsonConverter renders null fields)
    got_null = json.loads(lines[1])
    assert got_null == {k: None for k in df.columns}


def test_csv_line_golden(spark):
    df = _flat_df(spark)
    lines = [r[0] for r in df.select(csv_line(df)).collect()]
    assert lines[0] == f"abc,12,1.5,true,{base64.b64encode(b'hello').decode()},2020-05-17,2020-05-17T10:30:15Z"
    assert lines[1] == ",,,,,,"  # nulls -> empty


def test_csv_nested_java_rendering(spark):
    """Nested struct -> {k=v, ...}; array -> [a, b, c] (reference golden:
    StructAndCsvConverterTest.java:27-35)."""
    schema = T.StructType([
        T.StructField("sid", T.StringType()),
        T.StructField("child", T.StructType([
            T.StructField("cif", T.LongType()),
            T.StructField("name", T.StringType()),
        ])),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ])
    df = spark.createDataFrame(
        [Row(sid="x", child=Row(cif=12, name="ann"), tags=["a", "b", "c"])],
        schema)
    line = df.select(csv_line(df)).collect()[0][0]
    assert line == 'x,"{cif=12, name=ann}","[a, b, c]"'


def test_csv_quoting(spark):
    df = spark.createDataFrame([Row(s='say "hi", friend')])
    line = df.select(csv_line(df)).collect()[0][0]
    assert line == '"say ""hi"", friend"'


def test_epoch_conversions(spark):
    df = spark.createDataFrame(
        [Row(ts=dt.datetime(2020, 5, 17, 10, 30, 15, 987000),
             d=dt.date(2020, 5, 17))])
    row = df.select(
        epoch_days("d").alias("days"),
        epoch_seconds("ts").alias("secs"),
        epoch_millis_truncated("ts").alias("millis"),
        iso_zulu("ts").alias("iso")).collect()[0]
    assert row.days == (dt.date(2020, 5, 17) - dt.date(1970, 1, 1)).days
    assert row.secs == 1589711415
    # sub-second TRUNCATED, not rounded (reference README.md:116)
    assert row.millis == 1589711415000
    assert row.iso == "2020-05-17T10:30:15Z"


def test_decimal_plain_string(spark):
    df = spark.createDataFrame(
        [(Decimal("12.3400"),), (Decimal("500.00"),), (Decimal("0.001"),)],
        T.StructType([T.StructField("x", T.DecimalType(10, 4))]))
    got = [r[0] for r in df.select(decimal_plain_string("x")).collect()]
    assert got == ["12.34", "500", "0.001"]


def test_flatten_for_tfrecord(spark):
    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("nest", T.StructType([
            T.StructField("x", T.StringType()),
            T.StructField("deep", T.StructType([
                T.StructField("y", T.DoubleType())])),
        ])),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
    ])
    df = spark.createDataFrame(
        [Row(a=1, nest=Row(x="s", deep=Row(y=2.0)), m={"k": 1})], schema)
    flat = flatten_for_tfrecord(df)
    # depth-first, underscore-joined; MAP skipped (reference C12)
    assert flat.columns == ["a", "nest_x", "nest_deep_y"]
    assert flat.collect()[0] == Row(a=1, nest_x="s", nest_deep_y=2.0)


def test_ddl_from_schema():
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.DecimalType(38, 9)),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("nested", T.StructType([T.StructField("x", T.LongType())])),
    ])
    ddl = ddl_from_schema("t1", schema, ["id"])
    # decimal -> STRING(MAX); struct skipped (reference SpannerTablePrepareDoFn)
    assert ddl == ("CREATE TABLE t1 (id INT64 NOT NULL, name STRING(MAX), "
                   "price STRING(MAX), tags ARRAY<STRING(MAX)>) PRIMARY KEY (id)")


def test_avro_schema_roundtrip():
    schema = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("amount", T.DecimalType(38, 9), True),
        T.StructField("born", T.DateType(), True),
        T.StructField("at", T.TimestampType(), True),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType(), True), True),
        T.StructField("child", T.StructType([
            T.StructField("x", T.DoubleType(), True)]), True),
    ])
    avro = avro_schema_from_spark(schema)
    # reference convention: every field is a nullable union
    assert all(f["type"][0] == "null" for f in avro["fields"])
    back = spark_schema_from_avro(avro)
    assert back == schema


def test_avro_schema_roundtrip_property():
    """C13 as a property: ANY StructType built from the supported type
    pool (scalars, decimal, date/timestamp, arrays, maps, structs to
    depth 2) survives Spark -> Avro -> Spark unchanged."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = st.sampled_from([
        T.LongType(), T.IntegerType(), T.StringType(), T.DoubleType(),
        T.FloatType(), T.BooleanType(), T.BinaryType(), T.DateType(),
        T.TimestampType(), T.DecimalType(38, 9),
    ])

    def fields(types, max_n=4):
        names = st.lists(
            st.text("abcdefgh_", min_size=1, max_size=8),
            min_size=1, max_size=max_n, unique=True)
        return names.flatmap(lambda ns: st.tuples(*[
            types.map(lambda t, n=n: T.StructField(n, t, True))
            for n in ns]))

    nested = st.recursive(
        scalars,
        lambda inner: st.one_of(
            inner.map(lambda t: T.ArrayType(t, True)),
            inner.map(lambda t: T.MapType(T.StringType(), t, True)),
            fields(inner, 3).map(lambda fs: T.StructType(list(fs)))),
        max_leaves=6)

    @given(fields(nested).map(lambda fs: T.StructType(list(fs))))
    @settings(max_examples=150, deadline=None)
    def check(schema):
        back = spark_schema_from_avro(avro_schema_from_spark(schema))
        assert back == schema

    check()
