"""Row-rendering and scalar conversion semantics (reference C1-C13).

These reproduce the reference's *observable* value mappings as pure
Catalyst column expressions — no Python UDFs, so they run inside
whole-stage codegen at any scale:

* JSON lines (reference: util/converter/StructToJsonConverter.java:29-135):
  explicit nulls, bytes as base64, timestamps as Zulu ISO strings.
* CSV lines (reference: util/converter/StructToCsvConverter.java:32-43):
  nulls empty, bytes base64, nested struct/array rendered in the Java
  `Map.toString()` / `List.toString()` shape (`{k=v, ...}` / `[a, b]`,
  golden: src/test/.../StructAndCsvConverterTest.java:27-35) — built
  recursively from concat/array_join expressions, not a UDF.
* Epoch conventions, each preserved per-path, not "fixed"
  (reference keeps three lossy conventions side by side):
  - DATE -> epoch days (Avro path, StructToRecordConverter.java:75-79)
  - TIMESTAMP -> epoch millis with sub-second truncation
    (StructToRecordConverter.java:85-86, README.md:116)
  - TIMESTAMP -> epoch seconds (BigQuery path,
    StructToTableRowConverter.java:89-90)
* Decimal plain string with trailing-zero strip
  (RecordToStructConverter.java:258-274).
* TFRecord flattening: nested record fields joined with `_`
  (RecordToTFRecordConverter.java:155-176).
* DDL generation from a Spark schema
  (transforms/dofns/SpannerTablePrepareDoFn.java:72-148).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Scalar conversions
# ---------------------------------------------------------------------------


def bytes_base64(c: Column | str) -> Column:
    """BYTES rendered as base64 in text outputs (reference: util/StructUtil.java:59-60)."""
    return F.base64(F.col(c) if isinstance(c, str) else c)


def epoch_days(c: Column | str) -> Column:
    """DATE -> epoch days, the Avro DATE convention (reference:
    util/converter/StructToRecordConverter.java:75-79)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.datediff(F.to_date(col), F.lit("1970-01-01").cast("date")).cast("long")


def epoch_seconds(c: Column | str) -> Column:
    """TIMESTAMP -> epoch seconds, the BigQuery convention (reference:
    util/converter/StructToTableRowConverter.java:89-90)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp").cast("long")


def epoch_millis_truncated(c: Column | str) -> Column:
    """TIMESTAMP -> epoch millis with sub-second TRUNCATION — the Avro
    timestamp convention, which multiplies whole seconds by 1000
    (reference: StructToRecordConverter.java:85-86; README.md:116
    documents the truncation)."""
    return epoch_seconds(c) * 1000


def iso_zulu(c: Column | str) -> Column:
    """TIMESTAMP -> `yyyy-MM-ddTHH:mm:ssZ` (reference:
    util/converter/StructToJsonConverter.java:59-62). Session timezone
    must be UTC (session.py pins it)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col.cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'")


def iso_date(c: Column | str) -> Column:
    """DATE -> ISO `yyyy-MM-dd` string."""
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(F.to_date(col), "yyyy-MM-dd")


def iso_local_time(c: Column | str) -> Column:
    """TIME-of-day -> ISO local-time string `HH:mm:ss` (the reference
    renders Avro time-millis/micros as ISO local time strings —
    RecordToStructConverter.java:104-106,243-249; it has no TIME type)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col.cast("timestamp"), "HH:mm:ss")


def decimal_plain_string(c: Column | str) -> Column:
    """DECIMAL -> plain string with trailing zeros stripped (reference:
    RecordToStructConverter.java:258-274 — `stripTrailingZeros` then
    `toPlainString`). `12.3400` -> `12.34`, `500.00` -> `500`."""
    col = F.col(c) if isinstance(c, str) else c
    s = col.cast("string")
    # strip trailing zeros after a decimal point, then a dangling point
    stripped = F.regexp_replace(F.regexp_replace(s, r"(\.\d*?)0+$", "$1"), r"\.$", "")
    return F.when(s.contains("."), stripped).otherwise(s)


# ---------------------------------------------------------------------------
# Row rendering: JSON / CSV lines (C1, C2, C3)
# ---------------------------------------------------------------------------


def _json_ready(col: Column, dt: T.DataType) -> Column:
    """Lower a column so to_json matches the reference's JSON shape."""
    if isinstance(dt, T.BinaryType):
        return F.base64(col)
    if isinstance(dt, T.TimestampType | T.TimestampNTZType):
        return iso_zulu(col)
    if isinstance(dt, T.DateType):
        return iso_date(col)
    if isinstance(dt, T.DecimalType):
        return decimal_plain_string(col)
    if isinstance(dt, T.ArrayType):
        return F.transform(col, lambda x: _json_ready(x, dt.elementType))
    if isinstance(dt, T.StructType):
        return F.struct(*[
            _json_ready(col.getField(f.name), f.dataType).alias(f.name)
            for f in dt.fields
        ])
    return col


def json_line(df: DataFrame) -> Column:
    """One JSON line per row (reference C1): explicit nulls, base64
    bytes, Zulu timestamps, recursive structs/arrays."""
    cols = [
        _json_ready(F.col(f.name), f.dataType).alias(f.name)
        for f in df.schema.fields
    ]
    return F.to_json(F.struct(*cols), {"ignoreNullFields": "false"})


def _csv_scalar(col: Column, dt: T.DataType) -> Column:
    """Render one value the way the reference's CSV path does."""
    if isinstance(dt, T.BinaryType):
        return F.base64(col)
    if isinstance(dt, T.TimestampType | T.TimestampNTZType):
        return iso_zulu(col)
    if isinstance(dt, T.DateType):
        return iso_date(col)
    if isinstance(dt, T.DecimalType):
        return decimal_plain_string(col)
    if isinstance(dt, T.ArrayType):
        # Java List.toString(): "[a, b, c]"
        inner = F.transform(col, lambda x: _csv_scalar(x, dt.elementType))
        return F.concat(F.lit("["), F.array_join(inner, ", ", "null"), F.lit("]"))
    if isinstance(dt, T.StructType):
        # Java Map.toString() in field order: "{k1=v1, k2=v2}"
        parts = []
        for i, f in enumerate(dt.fields):
            prefix = "" if i == 0 else ", "
            parts.append(F.concat(
                F.lit(f"{prefix}{f.name}="),
                F.coalesce(_csv_scalar(col.getField(f.name), f.dataType)
                           .cast("string"), F.lit("null"))))
        return F.concat(F.lit("{"), *parts, F.lit("}"))
    if isinstance(dt, T.BooleanType):
        return F.when(col, "true").when(~col, "false")
    return col.cast("string")


def _csv_quote(col: Column) -> Column:
    """commons-csv DEFAULT quoting: quote if the value contains a comma,
    quote, CR or LF; double embedded quotes."""
    needs = (col.contains(",") | col.contains('"')
             | col.contains("\n") | col.contains("\r"))
    quoted = F.concat(F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"'))
    return F.when(col.isNull(), F.lit("")).when(needs, quoted).otherwise(col)


def csv_line(df: DataFrame) -> Column:
    """One CSV line per row (reference C2): null -> empty, bytes ->
    base64, nested struct/array -> Java Map/List.toString() rendering
    (golden: src/test/.../StructAndCsvConverterTest.java:27-35).
    Built entirely from concat/transform expressions — codegen-friendly."""
    rendered = [
        _csv_quote(_csv_scalar(F.col(f.name), f.dataType).cast("string"))
        for f in df.schema.fields
    ]
    return F.concat_ws(",", *rendered)


def text_line(df: DataFrame, fmt: str) -> Column:
    """Dispatcher (reference C3, StructToTextConverter.java:25-35):
    'json' -> JSON line, anything else -> CSV line."""
    return json_line(df) if fmt.lower() == "json" else csv_line(df)


# ---------------------------------------------------------------------------
# TFRecord flattening (C12)
# ---------------------------------------------------------------------------


def flatten_columns(df: DataFrame,
                    skip: tuple[str, ...] = ()) -> list[Column]:
    """The column expressions that flatten nested structs depth-first,
    joining path segments with `_` (reference:
    RecordToTFRecordConverter.java:155-176). Map and null-typed fields
    are skipped (reference `:167-169`)."""
    cols: list[Column] = []

    def walk(col: Column, dt: T.DataType, path: str) -> None:
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                walk(col.getField(f.name), f.dataType, f"{path}_{f.name}")
        elif isinstance(dt, T.MapType | T.NullType):
            return  # reference skips MAP and NULL features
        else:
            cols.append(col.alias(path))

    for f in df.schema.fields:
        if f.name in skip:
            continue
        walk(F.col(f.name), f.dataType, f.name)
    return cols


def flatten_for_tfrecord(df: DataFrame) -> DataFrame:
    """Flatten nested struct columns `a_b`-style (see flatten_columns)."""
    return df.select(*flatten_columns(df))


# ---------------------------------------------------------------------------
# DDL generation (R12)
# ---------------------------------------------------------------------------

_DDL_TYPES: dict[type, str] = {
    T.BooleanType: "BOOL",
    T.LongType: "INT64",
    T.IntegerType: "INT64",
    T.ShortType: "INT64",
    T.ByteType: "INT64",
    T.DoubleType: "FLOAT64",
    T.FloatType: "FLOAT64",
    T.StringType: "STRING(MAX)",
    T.BinaryType: "BYTES(MAX)",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.TimestampNTZType: "TIMESTAMP",
}


def _ddl_type(dt: T.DataType) -> str | None:
    """Spanner-style DDL type lowering (reference:
    SpannerTablePrepareDoFn.java:105-148 — decimals become STRING(MAX)
    `:112-114`, timestamps TIMESTAMP `:129-131`); unsupported kinds
    (struct/map) return None and are skipped (reference `:86-103`)."""
    if isinstance(dt, T.DecimalType):
        return "STRING(MAX)"
    if isinstance(dt, T.ArrayType):
        inner = _ddl_type(dt.elementType)
        return f"ARRAY<{inner}>" if inner else None
    for klass, name in _DDL_TYPES.items():
        if isinstance(dt, klass):
            return name
    return None


def ddl_from_schema(table: str, schema: T.StructType,
                    primary_keys: list[str]) -> str:
    """`CREATE TABLE t (cols) PRIMARY KEY (ks)` from a Spark schema
    (reference: SpannerTablePrepareDoFn.java:72-84). Columns whose type
    has no Spanner lowering are skipped, as the reference does."""
    cols = []
    for f in schema.fields:
        lowered = _ddl_type(f.dataType)
        if lowered is None:
            continue
        null_sfx = "" if f.nullable else " NOT NULL"
        cols.append(f"{f.name} {lowered}{null_sfx}")
    pk = ", ".join(primary_keys)
    return f"CREATE TABLE {table} ({', '.join(cols)}) PRIMARY KEY ({pk})"
