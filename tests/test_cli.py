"""Template CLI mains: every reference template is launchable with
``--name=value`` flags mirroring its Java options surface
(SpannerToText.java:100-102 etc.), producing the same artifacts as the
function API in templates.py."""

import json
import os

import pytest

from dataflowtemplates_spark.cli import main

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _run(capsys, spark, argv):
    rc = main(argv, spark=spark)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_spanner_to_text_main(spark, tmp_path, capsys):
    out = str(tmp_path / "txt")
    got = _run(capsys, spark, [
        "SpannerToText", f"--dataDir={SF}",
        "--query=SELECT r_regionkey, r_name FROM region ORDER BY 1",
        f"--output={out}", "--type=csv", "--header", "--withoutSharding",
        f"--outputNotify={tmp_path}/notify.txt"])
    assert got["template"] == "SpannerToText" and got["rows"] == 5
    assert os.path.exists(f"{tmp_path}/notify.txt")
    data = open(got["files"][0]).read().splitlines()
    assert data[0] == "r_regionkey,r_name" and len(data) == 6


def test_spanner_to_avro_main(spark, tmp_path, capsys):
    from dataflowtemplates_spark.operators.avro_io import read_avro
    out = str(tmp_path / "avro")
    got = _run(capsys, spark, [
        "SpannerToAvro", f"--dataDir={SF}",
        "--query=SELECT n_nationkey, n_name FROM nation",
        f"--output={out}"])
    assert got["rows"] == 25
    assert read_avro(spark, out).count() == 25


def test_spanner_to_bigquery_main(spark, tmp_path, capsys):
    got = _run(capsys, spark, [
        "SpannerToBigQuery", f"--dataDir={SF}",
        "--query=SELECT r_regionkey FROM region",
        "--output=cli_bq_target", "--mode=overwrite"])
    assert got["rows"] == 5
    spark.sql("DROP TABLE IF EXISTS cli_bq_target")


def test_spanner_to_spanner_and_delete_mains(spark, tmp_path, capsys):
    tbl = str(tmp_path / "kt")
    got = _run(capsys, spark, [
        "SpannerToSpanner", f"--dataDir={SF}",
        "--query=SELECT r_regionkey, r_name FROM region",
        f"--table={tbl}", "--primaryKeyFields=r_regionkey",
        "--mutationOp=INSERT_OR_UPDATE",
        f"--failedMutations={tmp_path}/failed.txt",
        # cloud locators accepted for invocation-line compatibility
        "--inputProjectId=p", "--inputInstanceId=i",
        "--inputDatabaseId=d"])
    assert got["applied"] == 5 and got["failed"] == 0
    assert open(f"{tmp_path}/failed.txt").read() == "0"

    got = _run(capsys, spark, [
        "SpannerToSpannerDelete", f"--dataDir={SF}",
        "--query=SELECT r_regionkey FROM region WHERE r_regionkey < 2",
        f"--table={tbl}", "--keyFields=r_regionkey"])
    assert got["applied"] == 2

    from dataflowtemplates_spark.operators.mutations import KeyedTable
    t = KeyedTable(spark, tbl, ["r_regionkey"])
    assert t.read().count() == 3


def test_spanner_to_bigquery_jdbc_sink(spark, tmp_path, capsys):
    """--jdbcUrl switches the table sink to the executing JDBC
    connector (embedded Derby here; a warehouse URL in production)."""
    from dataflowtemplates_spark.sources.connectors import (
        SourceSpec, read_source)
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", f"{tmp_path}/derby.log")
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    got = _run(capsys, spark, [
        "SpannerToBigQuery", f"--dataDir={SF}",
        "--query=SELECT r_regionkey, r_name FROM region",
        "--output=REGION_OUT", "--mode=overwrite", f"--jdbcUrl={url}"])
    assert got["rows"] == 5 and got["jdbcUrl"] == url
    back = read_source(spark, SourceSpec(
        kind="jdbc-table", table="REGION_OUT", options={"url": url}))
    assert back.count() == 5


def test_spanner_delete_timestamp_bound(spark, tmp_path, capsys):
    """--timestampBound threads into the key query: the delete reads
    the TARGET table's snapshot as of the bound, so keys inserted
    after the bound are not produced (SpannerToSpannerDelete's
    timestampBound option; SpannerQueryIO.java:129-136 semantics)."""
    from datetime import datetime, timezone

    from dataflowtemplates_spark.operators.mutations import KeyedTable
    tbl = str(tmp_path / "ktb")
    _run(capsys, spark, [
        "SpannerToSpanner", f"--dataDir={SF}",
        "--query=SELECT r_regionkey, r_name FROM region "
        "WHERE r_regionkey < 3",
        f"--table={tbl}", "--primaryKeyFields=r_regionkey"])
    bound = datetime.now(timezone.utc).isoformat()
    _run(capsys, spark, [
        "SpannerToSpanner", f"--dataDir={SF}",
        "--query=SELECT r_regionkey, r_name FROM region "
        "WHERE r_regionkey >= 3",
        f"--table={tbl}", "--primaryKeyFields=r_regionkey"])
    # at `bound` the table held keys 0..2 — the delete query sees only
    # those, so the two later keys (3, 4) survive
    got = _run(capsys, spark, [
        "SpannerToSpannerDelete",
        "--query=SELECT r_regionkey FROM ktb",
        f"--table={tbl}", "--keyFields=r_regionkey",
        f"--timestampBound={bound}"])
    assert got["applied"] == 3
    t = KeyedTable(spark, tbl, ["r_regionkey"])
    assert sorted(r.r_regionkey for r in t.read().collect()) == [3, 4]


def test_bigquery_to_spanner_main_reports_quarantine(spark, tmp_path,
                                                     capsys):
    tbl = str(tmp_path / "kt2")
    _run(capsys, spark, [
        "BigQueryToSpanner", f"--dataDir={SF}",
        "--query=SELECT n_nationkey, n_name FROM nation",
        f"--table={tbl}", "--primaryKeyFields=n_nationkey",
        "--mutationOp=INSERT"])
    got = _run(capsys, spark, [
        "BigQueryToSpanner", f"--dataDir={SF}",
        "--query=SELECT n_nationkey, n_name FROM nation "
        "WHERE n_nationkey < 3",
        f"--table={tbl}", "--primaryKeyFields=n_nationkey",
        "--mutationOp=INSERT",
        f"--outputError={tmp_path}/errors"])
    assert got["applied"] == 0 and got["failed"] == 3
    assert os.path.isdir(f"{tmp_path}/errors")


def test_bigquery_to_datastore_main(spark, tmp_path, capsys):
    out = str(tmp_path / "ent")
    got = _run(capsys, spark, [
        "BigQueryToDatastore", f"--dataDir={SF}",
        "--query=SELECT r_regionkey, r_name FROM region",
        f"--output={out}", "--kind=Region", "--keyField=r_regionkey",
        "--excludeFromIndexFields=r_name"])
    assert got["entities"] == 5


def test_bigquery_to_tfrecord_main(spark, tmp_path, capsys):
    from dataflowtemplates_spark.operators.tfrecord import read_tfrecords
    out = str(tmp_path / "tfr")
    got = _run(capsys, spark, [
        "BigQueryToTFRecord", f"--dataDir={SF}",
        "--query=SELECT r_regionkey, r_name FROM region",
        f"--output={out}"])
    assert got["files"]
    assert sum(len(read_tfrecords(f)) for f in got["files"]) == 5


def test_avro_to_spanner_and_datastore_mains(spark, tmp_path, capsys):
    from dataflowtemplates_spark.catalog import register_tables
    from dataflowtemplates_spark.operators.avro_io import write_avro
    register_tables(spark, SF)
    src = str(tmp_path / "src")
    write_avro(spark.table("region").select("r_regionkey", "r_name"), src)

    tbl = str(tmp_path / "kt3")
    got = _run(capsys, spark, [
        "AvroToSpanner", f"--input={src}", f"--table={tbl}",
        "--primaryKeyFields=r_regionkey", "--mutationOp=INSERT"])
    assert got["applied"] == 5

    got = _run(capsys, spark, [
        "AvroToDatastore", f"--input={src}",
        f"--output={tmp_path}/ent2", "--kind=Region",
        "--keyField=r_regionkey"])
    assert got["entities"] == 5


def test_dummy_to_spanner_main(spark, tmp_path, capsys):
    cfg = tmp_path / "gen.yaml"
    cfg.write_text(
        "tables:\n"
        "  - name: region\n"
        "    randomRate: 0\n")
    got = _run(capsys, spark, [
        "DummyToSpanner", f"--dataDir={SF}",
        "--tables=region:20", f"--config={cfg}",
        f"--table={tmp_path}/gen", "--primaryKeyFields=r_regionkey",
        "--parallelNum=2"])
    assert got["region"]["applied"] == 20

    from dataflowtemplates_spark.operators.mutations import KeyedTable
    t = KeyedTable(spark, str(tmp_path / "gen" / "region"),
                   ["r_regionkey"])
    assert t.read().count() == 20


def test_unknown_template_rejected(spark):
    with pytest.raises(SystemExit):
        main(["PubSubToSpanner", "--query=SELECT 1"], spark=spark)


def test_jdbc_to_spanner_incremental_main(spark, tmp_path, capsys):
    """The incremental sync extension main: two invocations against a
    growing Derby source converge the keyed table; the second run
    applies only the delta (watermark derived from the target)."""
    import pyspark.sql.functions as F

    from dataflowtemplates_spark.catalog import register_tables
    from dataflowtemplates_spark.operators.mutations import KeyedTable
    from dataflowtemplates_spark.sources.connectors import write_jdbc

    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", f"{tmp_path}/derby.log")
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    register_tables(spark, SF)
    nat = spark.table("nation").select("n_nationkey", "n_name")
    tbl_dir = str(tmp_path / "tbl")
    argv = ["JdbcToSpannerIncremental", f"--jdbcUrl={url}",
            "--srcTable=NAT", "--watermarkColumn=n_nationkey",
            f"--table={tbl_dir}", "--primaryKeyFields=n_nationkey"]

    write_jdbc(nat.filter(F.col("n_nationkey") < 10), url, "NAT",
               mode="overwrite")
    got = _run(capsys, spark, argv)
    assert got["applied"] == 10 and got["failed"] == 0

    write_jdbc(nat.filter(F.col("n_nationkey") >= 10), url, "NAT",
               mode="append")
    got = _run(capsys, spark, argv)
    assert got["applied"] == 15 and got["failed"] == 0

    t = KeyedTable(spark, tbl_dir, ["n_nationkey"])
    assert t.read().count() == 25
