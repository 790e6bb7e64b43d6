"""Spark StructType <-> Avro schema (dict) mapping (reference C13).

The reference converts between four schema dialects with one utility
(reference: util/AvroSchemaUtil.java:83-351). In Spark the DataFrame
schema is the single source of truth, so two functions suffice. The
reference's conventions are preserved:

* every field is a nullable union `["null", T]`
  (AvroSchemaUtil.java:298-322 — Spanner fields always nullable);
* NUMERIC is pinned to decimal(38,9) bytes (AvroSchemaUtil.java:63,75);
* DATE -> logical `date` over int, TIMESTAMP -> `timestamp-millis`
  over long (the Avro path truncates sub-millis; README.md:116);
* MAP -> map with string keys (Avro maps key by string);
* DATETIME/GEOGRAPHY-style string subtypes ride on a `sqlType` prop
  (AvroSchemaUtil.java:220-227), surfaced via Spark column metadata.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

_PRIMITIVE_TO_AVRO: list[tuple[type, str | dict]] = [
    (T.BooleanType, "boolean"),
    (T.IntegerType, "int"),
    (T.ShortType, "int"),
    (T.ByteType, "int"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.StringType, "string"),
    (T.BinaryType, "bytes"),
    (T.DateType, {"type": "int", "logicalType": "date"}),
    (T.TimestampType, {"type": "long", "logicalType": "timestamp-millis"}),
    (T.TimestampNTZType, {"type": "long", "logicalType": "timestamp-millis"}),
]


def _avro_type(dt: T.DataType, name: str) -> str | dict | list:
    if isinstance(dt, T.DecimalType):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": dt.precision, "scale": dt.scale}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _avro_type(dt.elementType, name)}
    if isinstance(dt, T.MapType):
        return {"type": "map", "values": _avro_type(dt.valueType, name)}
    if isinstance(dt, T.StructType):
        return {"type": "record", "name": name,
                "fields": [_avro_field(f, f"{name}_{f.name}") for f in dt.fields]}
    for klass, avro in _PRIMITIVE_TO_AVRO:
        if isinstance(dt, klass):
            return avro
    raise ValueError(f"no Avro lowering for Spark type {dt}")


def _avro_field(f: T.StructField, nested_name: str) -> dict:
    t = _avro_type(f.dataType, nested_name)
    if f.metadata and "sqlType" in f.metadata:
        # string subtype tag (DATETIME/GEOGRAPHY convention)
        t = {"type": t, "sqlType": f.metadata["sqlType"]} if isinstance(t, str) else {
            **t, "sqlType": f.metadata["sqlType"]}
    # reference convention: every field nullable union
    return {"name": f.name, "type": ["null", t], "default": None}


def avro_schema_from_spark(schema: T.StructType,
                           name: str = "topLevelRecord") -> dict:
    """StructType -> Avro record schema dict (json.dumps-able)."""
    return {"type": "record", "name": name,
            "fields": [_avro_field(f, f.name) for f in schema.fields]}


def _unnest_union(t) -> tuple[object, bool]:
    """`["null", T]` -> (T, nullable) (reference: AvroSchemaUtil.java:199-207)."""
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1:
            raise ValueError(f"unsupported union {t}")
        return non_null[0], "null" in t
    return t, False


_AVRO_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    # reference treats enum as string, fixed as bytes
    # (RecordToStructConverter.java:78-100)
    "enum": T.StringType(),
    "fixed": T.BinaryType(),
}


def _spark_type(t) -> T.DataType:
    t, _ = _unnest_union(t)
    if isinstance(t, str):
        return _AVRO_TO_SPARK[t]
    logical = t.get("logicalType")
    base = t["type"]
    if logical == "date":
        return T.DateType()
    if logical in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampType()
    if logical in ("time-millis", "time-micros"):
        # reference renders times as ISO local-time STRINGs (no TIME type)
        # (RecordToStructConverter.java:104-106,243-249)
        return T.StringType()
    if logical == "decimal":
        return T.DecimalType(t.get("precision", 38), t.get("scale", 9))
    if base == "array":
        return T.ArrayType(_spark_type(t["items"]))
    if base == "map":
        return T.MapType(T.StringType(), _spark_type(t["values"]))
    if base == "record":
        return T.StructType([
            T.StructField(f["name"], _spark_type(f["type"]),
                          _is_nullable(f["type"]))
            for f in t["fields"]])
    if base in _AVRO_TO_SPARK:
        return _AVRO_TO_SPARK[base]
    raise ValueError(f"unsupported Avro type {t}")


def _is_nullable(t) -> bool:
    _, nullable = _unnest_union(t)
    return nullable


def spark_schema_from_avro(avro: dict | str) -> T.StructType:
    """Avro record schema (dict or JSON string) -> StructType."""
    if isinstance(avro, str):
        avro = json.loads(avro)
    if avro.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    fields = []
    for f in avro["fields"]:
        t, nullable = _unnest_union(f["type"])
        fields.append(T.StructField(f["name"], _spark_type(t), nullable))
    return T.StructType(fields)
