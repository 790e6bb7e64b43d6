from dataflowtemplates_spark.plans.sqlrunner import SPLITTER, run_query, split_queries

__all__ = ["run_query", "split_queries", "SPLITTER"]
