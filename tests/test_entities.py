"""Entity-lowering tests (reference C10 semantics)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from dataflowtemplates_spark.operators.entities import (
    MAX_INDEXED_STRING,
    to_entities,
    write_entities_json,
)


def test_key_kinds(spark):
    df = spark.createDataFrame([Row(sid="k1", num=7, payload="x")])
    by_name = to_entities(df, "Doc", "sid").collect()[0]
    assert by_name["__key__"]["kind"] == "Doc"
    assert by_name["__key__"]["name"] == "k1" and by_name["__key__"]["id"] is None

    by_id = to_entities(df, "Doc", "num").collect()[0]
    assert by_id["__key__"]["id"] == 7 and by_id["__key__"]["name"] is None


def test_key_type_rejected(spark):
    df = spark.createDataFrame([Row(f=1.5)])
    with pytest.raises(ValueError, match="key field"):
        to_entities(df, "Doc", "f")


def test_long_string_auto_excluded(spark):
    df = spark.createDataFrame([
        Row(sid="a", body="short", note="n"),
        Row(sid="b", body="y" * (MAX_INDEXED_STRING + 1), note="n"),
    ])
    rows = {r.sid: r for r in to_entities(df, "Doc", "sid").collect()}
    assert rows["a"]["__excluded__"] == []
    assert rows["b"]["__excluded__"] == ["body"]   # >1500 bytes (reference :126-129)


def test_arrays_never_excluded(spark):
    schema = T.StructType([
        T.StructField("sid", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ])
    df = spark.createDataFrame([Row(sid="a", tags=["t" * 2000])], schema)
    row = to_entities(df, "Doc", "sid", exclude_from_indexes=("tags",)).collect()[0]
    assert row["__excluded__"] == []  # reference :124-125


def test_map_to_kv_entities(spark):
    schema = T.StructType([
        T.StructField("sid", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType())),
    ])
    df = spark.createDataFrame([Row(sid="a", attrs={"x": 1, "y": 2})], schema)
    row = to_entities(df, "Doc", "sid").collect()[0]
    got = {e.key: e.value for e in row.attrs}
    assert got == {"x": 1, "y": 2}  # MAP -> array of {key,value} (reference :219-231)


def test_write_json(spark, tmp_path):
    df = spark.createDataFrame([Row(sid="a", v=1), Row(sid="b", v=2)])
    out = str(tmp_path / "ents")
    n = write_entities_json(df, out, "Doc", "sid")
    assert n == 2
    back = spark.read.json(out)
    assert back.count() == 2
    assert "__key__" in back.columns and "__excluded__" in back.columns
