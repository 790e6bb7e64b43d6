"""dataflowtemplates_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of mercari/DataflowTemplates
(reference surveyed in SURVEY.md) as idiomatic Spark: the delegated SQL
surface runs through Spark SQL / Catalyst over registered tables, the
reference's own operators (partitioned sources, dynamic-destination
writers, five-type-system conversion semantics, upsert/delete write
dispositions with quarantine, synthetic generator) become
DataFrame-in/DataFrame-out functions, and LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing) are
first-class operators designed for 100 TB scale.
"""

from dataflowtemplates_spark.session import build_session
from dataflowtemplates_spark.catalog import TABLES, register_tables

__all__ = ["build_session", "register_tables", "TABLES"]
__version__ = "0.1.0"
