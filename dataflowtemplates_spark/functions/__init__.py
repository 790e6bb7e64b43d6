"""Conversion-semantics layer (reference converter inventory C1-C13)."""

from dataflowtemplates_spark.functions.convert import (  # noqa: F401
    bytes_base64,
    csv_line,
    ddl_from_schema,
    decimal_plain_string,
    epoch_days,
    epoch_millis_truncated,
    epoch_seconds,
    flatten_for_tfrecord,
    iso_date,
    iso_local_time,
    iso_zulu,
    json_line,
    text_line,
)
from dataflowtemplates_spark.functions.avroschema import (  # noqa: F401
    avro_schema_from_spark,
    spark_schema_from_avro,
)
