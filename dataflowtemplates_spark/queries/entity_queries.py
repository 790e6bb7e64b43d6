"""Datastore entity lowering (K7/C10) through the driver's oracle gate.

The entity converter's semantics (key kind by type, explicit
exclude-from-indexes set, the 1500-byte auto-exclusion, arrays never
excluded — reference ``util/converter/RecordToEntityConverter.java``)
were previously pinned only by unit tests (`tests/test_entities.py`).
q131 runs the ACTUAL lowering over a deterministic corpus shape and
surfaces the per-entity index-exclusion outcome, which DuckDB
reproduces from the same length rules — so the driver's hash gate
covers the one §2 sink family that had no query-shaped row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables
from dataflowtemplates_spark.operators.entities import (
    EXCLUDED,
    KEY_STRUCT,
    to_entities,
)


def q131_entity_index_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity index-exclusion audit over the documents table.

    Input shape is made deterministic for the length rule: ``padded``
    is the text right-padded to 1600 bytes for every 4th doc (over the
    1500-byte indexable limit -> AUTO-excluded) and truncated to 100
    otherwise; ``tags`` is an array property (NEVER excluded, however
    long); ``source`` is explicitly excluded by the caller. The query
    lowers through the real ``to_entities`` operator and surfaces, per
    entity: the key kind/id (long key field -> id key, name NULL), the
    property count, and the sorted exclusion list — everything the
    reference's converter decides per row.

    Scale shape: the lowering is pure map-side column expressions (no
    shuffle, no Python); the only exchange is the output ORDER BY.
    """
    register_tables(spark, sf_dir)
    docs = (spark.table("documents")
            .select("doc_id", "source",
                    F.rpad(F.col("text"),
                           F.when(F.col("doc_id") % 4 == 0, 1600)
                            .otherwise(100), "x").alias("padded"),
                    F.array(F.col("source")).alias("tags")))
    ents = to_entities(docs, kind="Doc", key_field="doc_id",
                       exclude_from_indexes=("source",))
    return (ents.select(
        F.col(f"{KEY_STRUCT}.kind").alias("kind"),
        F.col(f"{KEY_STRUCT}.id").alias("key_id"),
        F.col(f"{KEY_STRUCT}.name").alias("key_name"),
        F.lit(len(docs.columns)).alias("n_props"),
        F.array_join(F.array_sort(F.col(EXCLUDED)), ",").alias("excluded"))
        .orderBy("key_id"))


# rpad counts CHARACTERS; the corpus is ASCII so chars == bytes and the
# %4==0 rows land at 1601+ bytes > 1500 only via the padded length 1600
# ... 1600 > 1500, auto-exclude fires. doc_id is a LONG key field ->
# id key with NULL name. Properties: doc_id, source, padded, tags.
_Q131_ORACLE = """
SELECT 'Doc' AS kind,
       doc_id AS key_id,
       CAST(NULL AS VARCHAR) AS key_name,
       4 AS n_props,
       CASE WHEN doc_id % 4 = 0 THEN 'padded,source' ELSE 'source' END
         AS excluded
FROM documents
ORDER BY key_id
"""


QUERIES = {"q131_entity_index_audit": q131_entity_index_audit}
ORACLES = {"q131_entity_index_audit": _Q131_ORACLE}
