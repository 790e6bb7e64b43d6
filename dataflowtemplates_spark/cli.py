"""Launchable template mains — the reference's template invocation
surface (each template is a runnable binary taking ``--name=value``
pipeline options, e.g. SpannerToText.java:100-102's options interface).

Usage::

    python -m dataflowtemplates_spark.cli SpannerToText \
        --query="SELECT * FROM region" --output=/tmp/out --type=csv

One subcommand per reference template, flags mirroring the reference's
option names 1:1 (camelCase, ``--name=value`` — a reference user's
invocation line ports by changing only the launcher). Local-engine
bindings of the cloud locators:

* ``--projectId/--instanceId/--databaseId`` (and their input*/output*
  variants) are accepted for invocation-line compatibility and
  recorded in the result summary, but the binding storage location is
  ``--table``, a keyed-table DIRECTORY (the local Spanner stand-in —
  a real connector slots into the same seam).
* Keyed-table key columns come from ``--primaryKeyFields`` (the
  BigQueryToSpanner option; Spanner templates read them from
  INFORMATION_SCHEMA, which the local stand-in does not have).
* ``--dataDir`` registers the parquet tables queries read (the local
  stand-in for the source database).

Each main prints ONE JSON result line (rows written / applied /
failed / files) and exits 0 on success — the notification contract a
scheduler scrapes.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from dataflowtemplates_spark import templates
from dataflowtemplates_spark.operators.mutations import KeyedTable


def _csv(s: str) -> list[str]:
    return [p.strip() for p in s.split(",") if p.strip()]


def _add_locators(p: argparse.ArgumentParser, prefixes=("",)) -> None:
    for pre in prefixes:
        for loc in ("ProjectId", "InstanceId", "DatabaseId"):
            flag = (pre + loc) if pre else loc[0].lower() + loc[1:]
            p.add_argument(f"--{flag}", default=None,
                           help="cloud locator (informational in the "
                                "local engine; storage binds to --table)")


def _keyed(spark: SparkSession, args, attr: str = "table") -> KeyedTable:
    keys = _csv(args.primaryKeyFields)
    return KeyedTable(spark, getattr(args, attr), keys)


def _keyed_views(args, tbl: KeyedTable) -> dict | None:
    """If the target keyed table already exists, expose it to the query
    under its directory basename. ONLY the delete template uses this:
    SpannerToSpannerDelete's key query canonically reads the table it
    deletes from (SpannerToSpannerDelete.java:78-91), so there the
    target deliberately shadows any same-named --dataDir view; the
    view is registered at --timestampBound when given (run_query
    resolves it via read_at). The copy templates (SpannerToSpanner /
    BigQueryToSpanner) must NOT register it — their query reads the
    SOURCE database, and shadowing a same-named source view on a
    re-run would silently re-copy from the half-maintained target."""
    import posixpath
    if not tbl.exists():
        return None
    return {posixpath.basename(args.table.rstrip("/")): tbl}


def _mutation_outputs(args, result) -> dict:
    from dataflowtemplates_spark.operators.mutations import (
        write_failure_count, write_quarantine)
    out = {"applied": result.applied, "failed": result.failed}
    if getattr(args, "outputError", None):
        write_quarantine(result, args.outputError)
        out["outputError"] = args.outputError
    if getattr(args, "failedMutations", None):
        write_failure_count(result, args.failedMutations)
        out["failedMutations"] = args.failedMutations
    return out


# -- per-template runners (argparse Namespace + live session -> summary) ----

def _run_spanner_to_text(spark, args):
    r = templates.table_to_text(
        spark, args.query, args.output, fmt=args.type,
        split_field=args.splitField, header=args.header,
        without_sharding=args.withoutSharding,
        output_notify=args.outputNotify, output_empty=args.outputEmpty,
        empty_text=args.emptyText, timestamp_bound=args.timestampBound)
    return {"rows": r.row_count, "files": r.files}


def _run_spanner_to_avro(spark, args):
    r = templates.table_to_columnar(
        spark, args.query, args.output, split_field=args.splitField,
        fmt=args.format, output_notify=args.outputNotify,
        timestamp_bound=args.timestampBound)
    return {"rows": r.row_count, "files": r.files}


def _run_spanner_to_bigquery(spark, args):
    if args.jdbcUrl:
        # executing database sink (Spark's JDBC provider; embedded
        # Derby in the sandbox, any warehouse URL in production)
        n = templates.query_to_jdbc(
            spark, args.query, args.jdbcUrl, args.output, mode=args.mode,
            timestamp_bound=args.timestampBound)
        return {"table": args.output, "jdbcUrl": args.jdbcUrl, "rows": n}
    n = templates.query_to_table(spark, args.query, args.output,
                                 mode=args.mode,
                                 timestamp_bound=args.timestampBound)
    return {"table": args.output, "rows": n}


def _run_jdbc_incremental(spark, args):
    tbl = _keyed(spark, args)
    result = templates.jdbc_to_keyed_table_incremental(
        spark, args.jdbcUrl, args.srcTable, args.watermarkColumn, tbl,
        op=args.mutationOp)
    return _mutation_outputs(args, result)


def _run_to_keyed_table(spark, args):
    tbl = _keyed(spark, args)
    result = templates.query_to_keyed_table(
        spark, args.query, tbl, op=args.mutationOp,
        timestamp_bound=args.timestampBound)
    return _mutation_outputs(args, result)


def _run_spanner_delete(spark, args):
    tbl = KeyedTable(spark, args.table, _csv(args.keyFields))
    result = templates.query_delete_keyed_table(
        spark, args.query, tbl, timestamp_bound=args.timestampBound,
        keyed_tables=_keyed_views(args, tbl))
    return {"applied": result.applied, "failed": result.failed}


def _run_to_entities(spark, args):
    n = templates.query_to_entities(
        spark, args.query, args.output, args.kind, args.keyField,
        tuple(_csv(args.excludeFromIndexFields)))
    return {"entities": n, "output": args.output}


def _run_to_tfrecord(spark, args):
    files = templates.query_to_tfrecord(
        spark, args.query, args.output, split_field=args.splitField,
        output_notify=args.outputNotify)
    return {"files": files}


def _run_avro_to_keyed_table(spark, args):
    result = templates.files_to_keyed_table(
        spark, args.input, _keyed(spark, args), fmt=args.format,
        op=args.mutationOp)
    return _mutation_outputs(args, result)


def _run_avro_to_entities(spark, args):
    n = templates.files_to_entities(
        spark, args.input, args.output, args.kind, args.keyField,
        fmt=args.format,
        exclude_from_indexes=tuple(_csv(args.excludeFromIndexFields)))
    return {"entities": n, "output": args.output}


def _run_dummy_to_keyed_table(spark, args):
    import posixpath

    from dataflowtemplates_spark.sources.generator import (
        TableSpec, apply_config, load_yaml_config, parse_tables_arg)
    config = {}
    if args.config:
        with open(args.config) as fh:
            config = load_yaml_config(fh.read())
    keys = _csv(args.primaryKeyFields)
    out = {}
    for name, count in parse_tables_arg(args.tables).items():
        spec = apply_config(
            TableSpec.from_table(spark, name, keys, count=count), config)
        tbl = KeyedTable(spark, posixpath.join(args.table, name), keys)
        result = templates.generate_to_keyed_table(
            spark, spec, tbl, seed=args.seed,
            parallelism=args.parallelNum)
        out[name] = {"applied": result.applied, "failed": result.failed}
    return out


def build_parser() -> argparse.ArgumentParser:
    root = argparse.ArgumentParser(
        prog="dataflowtemplates_spark",
        description="Launchable template mains (reference §2.8).")
    sub = root.add_subparsers(dest="template", required=True)

    def tpl(name, runner, ref):
        p = sub.add_parser(name, help=f"reference: templates/{ref}")
        p.set_defaults(_runner=runner)
        p.add_argument("--dataDir", default=None,
                       help="parquet table directory to register as the "
                            "source catalog (local source-DB stand-in)")
        return p

    p = tpl("SpannerToText", _run_spanner_to_text, "SpannerToText.java")
    _add_locators(p)
    p.add_argument("--query", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--type", default="json", choices=("json", "csv"))
    p.add_argument("--splitField", default=None)
    p.add_argument("--header", action="store_true")
    p.add_argument("--withoutSharding", action="store_true")
    p.add_argument("--outputNotify", default=None)
    p.add_argument("--outputEmpty", action="store_true")
    p.add_argument("--emptyText", default="")
    p.add_argument("--timestampBound", default=None)

    p = tpl("SpannerToAvro", _run_spanner_to_avro, "SpannerToAvro.java")
    _add_locators(p)
    p.add_argument("--query", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--splitField", default=None)
    p.add_argument("--outputNotify", default=None)
    p.add_argument("--timestampBound", default=None)
    p.add_argument("--format", default="avro", choices=("avro", "parquet"))

    p = tpl("JdbcToSpannerIncremental", _run_jdbc_incremental,
            "BigQueryToSpanner.java (made incremental — engine extension)")
    _add_locators(p)
    p.add_argument("--jdbcUrl", required=True)
    p.add_argument("--srcTable", required=True)
    p.add_argument("--watermarkColumn", required=True)
    p.add_argument("--table", required=True,
                   help="keyed-table directory (upsert target)")
    p.add_argument("--primaryKeyFields", required=True)
    p.add_argument("--mutationOp", default="INSERT_OR_UPDATE")
    p.add_argument("--outputError", default=None)
    p.add_argument("--failedMutations", default=None)

    p = tpl("SpannerToBigQuery", _run_spanner_to_bigquery,
            "SpannerToBigQuery.java")
    _add_locators(p)
    p.add_argument("--query", required=True)
    p.add_argument("--output", required=True,
                   help="managed table name to append into")
    p.add_argument("--mode", default="append")
    p.add_argument("--timestampBound", default=None)
    p.add_argument("--jdbcUrl", default=None,
                   help="write to this JDBC database instead of a "
                        "managed table (executing connector path)")

    for name, ref in (("SpannerToSpanner", "SpannerToSpanner.java"),
                      ("BigQueryToSpanner", "BigQueryToSpanner.java")):
        p = tpl(name, _run_to_keyed_table, ref)
        _add_locators(p, prefixes=(("input", "output")
                                   if name == "SpannerToSpanner"
                                   else ("",)))
        p.add_argument("--query", required=True)
        p.add_argument("--table", required=True,
                       help="keyed-table directory (local Spanner "
                            "stand-in)")
        p.add_argument("--primaryKeyFields", required=True)
        p.add_argument("--mutationOp", default="INSERT_OR_UPDATE",
                       choices=("INSERT", "UPDATE", "REPLACE",
                                "INSERT_OR_UPDATE"))
        p.add_argument("--outputError", default=None)
        p.add_argument("--failedMutations", default=None)
        p.add_argument("--timestampBound", default=None)

    p = tpl("SpannerToSpannerDelete", _run_spanner_delete,
            "SpannerToSpannerDelete.java")
    _add_locators(p)
    p.add_argument("--query", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--keyFields", required=True,
                   help="comma-separated composite key, in order")
    p.add_argument("--timestampBound", default=None)

    p = tpl("BigQueryToDatastore", _run_to_entities,
            "BigQueryToDatastore.java")
    _add_locators(p)
    p.add_argument("--query", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--kind", required=True)
    p.add_argument("--keyField", required=True)
    p.add_argument("--excludeFromIndexFields", default="")

    p = tpl("BigQueryToTFRecord", _run_to_tfrecord,
            "BigQueryToTFRecord.java")
    p.add_argument("--query", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--splitField", default=None)
    p.add_argument("--outputNotify", default=None)

    p = tpl("AvroToSpanner", _run_avro_to_keyed_table,
            "AvroToSpanner.java")
    _add_locators(p)
    p.add_argument("--input", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--primaryKeyFields", required=True)
    p.add_argument("--mutationOp", default="INSERT_OR_UPDATE",
                   choices=("INSERT", "UPDATE", "REPLACE",
                            "INSERT_OR_UPDATE"))
    p.add_argument("--format", default="avro",
                   choices=("avro", "parquet", "json", "csv"))
    p.add_argument("--outputError", default=None)
    p.add_argument("--failedMutations", default=None)

    p = tpl("AvroToDatastore", _run_avro_to_entities,
            "AvroToDatastore.java")
    _add_locators(p)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--kind", required=True)
    p.add_argument("--keyField", required=True)
    p.add_argument("--excludeFromIndexFields", default="")
    p.add_argument("--format", default="avro",
                   choices=("avro", "parquet", "json", "csv"))

    p = tpl("DummyToSpanner", _run_dummy_to_keyed_table,
            "DummyToSpanner.java")
    _add_locators(p)
    p.add_argument("--tables", required=True,
                   help='"name:count,name:count" (reference syntax)')
    p.add_argument("--config", default=None,
                   help="YAML overlay ({tables: [{name, randomRate, "
                        "fields: [{name, range}]}]})")
    p.add_argument("--table", required=True,
                   help="root directory; each generated table lands "
                        "in <root>/<name>")
    p.add_argument("--primaryKeyFields", required=True)
    p.add_argument("--parallelNum", type=int, default=None)
    p.add_argument("--seed", default="42")

    return root


def main(argv: list[str] | None = None,
         spark: SparkSession | None = None) -> int:
    """Run one template invocation. ``spark`` may be injected (tests);
    otherwise a local session is built and stopped around the run."""
    args = build_parser().parse_args(argv)
    own_session = spark is None
    if own_session:
        from dataflowtemplates_spark.session import build_session
        spark = build_session()
    try:
        if args.dataDir:
            from dataflowtemplates_spark.catalog import register_tables
            register_tables(spark, args.dataDir)
        summary = args._runner(spark, args)
        print(json.dumps({"template": args.template, **summary}))
        return 0
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
