"""Datastore-entity sink lowering (reference K7/C10:
templates/BigQueryToDatastore.java:59-88, AvroToDatastore.java:63-81,
util/converter/RecordToEntityConverter.java).

A Datastore Entity is a keyed document with per-property index
exclusion flags. The Spark-first lowering keeps everything columnar: a
`__key__` struct column plus an `__excluded__` array of property names,
written as JSON lines locally (the connector-ready seam — a real
Datastore writer consumes the same frame via foreachPartition).

Reference semantics reproduced:

* key from ``key_field`` by type: STRING -> name key, INT/LONG -> id
  key, BYTES -> name from the bytes' string form; any other type is an
  error (RecordToEntityConverter.java:238-254);
* explicit ``exclude_from_indexes`` property set (`:37`);
* **strings longer than 1500 bytes are auto-excluded** — Datastore's
  indexable-size limit (`:126-129`);
* **array properties are never excluded** (`:124-125`);
* MAP properties become an array of {key, value} entities (`:219-231`);
* the kind rides on the key struct (`kind`, `:96-110` — the
  reference's static-field caching quirk is intentionally NOT
  reproduced: kind/key_field are plain per-call arguments here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY_STRUCT = "__key__"
EXCLUDED = "__excluded__"

#: Datastore's indexable string limit in bytes.
MAX_INDEXED_STRING = 1500


def _key_col(df: DataFrame, kind: str, key_field: str) -> Column:
    dt = df.schema[key_field].dataType
    if isinstance(dt, T.StringType):
        name, kid = F.col(key_field), F.lit(None).cast("long")
    elif isinstance(dt, T.LongType | T.IntegerType | T.ShortType | T.ByteType):
        name, kid = F.lit(None).cast("string"), F.col(key_field).cast("long")
    elif isinstance(dt, T.BinaryType):
        name, kid = F.col(key_field).cast("string"), F.lit(None).cast("long")
    else:
        raise ValueError(
            f"key field {key_field!r} must be STRING/INT/LONG/BYTES, got {dt}")
    return F.struct(F.lit(kind).alias("kind"),
                    name.alias("name"),
                    kid.alias("id"))


def to_entities(df: DataFrame, kind: str, key_field: str,
                exclude_from_indexes: tuple[str, ...] = ()) -> DataFrame:
    """Lower a DataFrame to entity rows: ``__key__`` struct,
    ``__excluded__`` property-name array, properties as-is (maps lowered
    to {key, value} struct arrays)."""
    if key_field not in df.columns:
        raise ValueError(f"key field {key_field!r} not in {df.columns}")

    props: list[Column] = []
    excluded_parts: list[Column] = []
    for f in df.schema.fields:
        col = F.col(f.name)
        if isinstance(f.dataType, T.MapType):
            col = F.transform(
                F.map_entries(col),
                lambda kv: F.struct(kv.getField("key").alias("key"),
                                    kv.getField("value").alias("value"))
            ).alias(f.name)
        props.append(col)

        if isinstance(f.dataType, T.ArrayType):
            continue  # arrays never excluded (reference :124-125)
        if f.name in exclude_from_indexes:
            excluded_parts.append(F.lit(f.name))
        elif isinstance(f.dataType, T.StringType):
            # auto-exclude over-long strings (reference :126-129)
            excluded_parts.append(
                F.when(F.octet_length(F.col(f.name)) > MAX_INDEXED_STRING,
                       F.lit(f.name)))

    excluded = (F.array_compact(F.array(*excluded_parts))
                if excluded_parts else F.array().cast("array<string>"))
    return df.select(
        _key_col(df, kind, key_field).alias(KEY_STRUCT),
        excluded.alias(EXCLUDED),
        *props)


def write_entities_json(df: DataFrame, path: str, kind: str, key_field: str,
                        exclude_from_indexes: tuple[str, ...] = ()) -> int:
    """K7 local stand-in: entity frame -> JSON lines directory."""
    ent = to_entities(df, kind, key_field, exclude_from_indexes)
    ent.write.mode("overwrite").json(path)
    return ent.count()
