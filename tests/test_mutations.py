"""Mutation-sink tests: the INSERT / UPDATE / REPLACE / INSERT_OR_UPDATE /
DELETE dispositions with per-row failure isolation (reference semantics:
StructToMutationConverter.java:152-167 + REPORT_FAILURES)."""

import pytest
from pyspark.sql import Row

from dataflowtemplates_spark.operators.mutations import (
    KeyedTable,
    write_failure_count,
    write_quarantine,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = KeyedTable(spark, str(tmp_path / "tbl"), ["id"])
    base = spark.createDataFrame([
        Row(id=1, name="one", val=10),
        Row(id=2, name="two", val=20),
    ])
    r = t.apply_mutations(base, "INSERT")
    assert r.applied == 2 and r.failed == 0
    return t


def _rows(t):
    return {r.id: (r.name, r.val) for r in t.read().collect()}


def test_insert_conflict_quarantines(spark, table):
    batch = spark.createDataFrame([
        Row(id=2, name="dup", val=99),   # exists -> quarantine
        Row(id=3, name="three", val=30),
    ])
    r = table.apply_mutations(batch, "INSERT")
    assert r.applied == 1
    q = r.quarantine.collect()
    assert len(q) == 1 and q[0].id == 2 and q[0]._error == "ALREADY_EXISTS"
    assert _rows(table) == {1: ("one", 10), 2: ("two", 20), 3: ("three", 30)}


def test_update_requires_presence(spark, table):
    batch = spark.createDataFrame([
        Row(id=1, name="uno", val=11),
        Row(id=9, name="ghost", val=0),  # absent -> quarantine
    ])
    r = table.apply_mutations(batch, "UPDATE")
    assert r.applied == 1
    assert [x.id for x in r.quarantine.collect()] == [9]
    assert _rows(table)[1] == ("uno", 11)
    assert _rows(table)[2] == ("two", 20)


def test_insert_or_update_upserts_and_keeps_unspecified(spark, table):
    # batch lacks the `val` column: upsert keeps current value
    batch = spark.createDataFrame([Row(id=2, name="TWO"), Row(id=5, name="five")])
    r = table.apply_mutations(batch, "INSERT_OR_UPDATE")
    assert r.applied == 2 and r.failed == 0
    rows = _rows(table)
    assert rows[2] == ("TWO", 20)        # unspecified val kept
    assert rows[5] == ("five", None)     # new row: missing col null


def test_replace_nulls_unspecified(spark, table):
    batch = spark.createDataFrame([Row(id=1, name="replaced")])
    r = table.apply_mutations(batch, "REPLACE")
    assert r.applied == 1
    assert _rows(table)[1] == ("replaced", None)  # delete-then-insert


def test_delete_by_key_and_null_key(spark, table):
    batch = spark.createDataFrame(
        [(1, None, None), (None, None, None)],  # second: null key -> quarantine
        "id BIGINT, name STRING, val BIGINT")
    r = table.apply_mutations(batch, "DELETE")
    assert r.applied == 1
    assert r.failed == 1
    assert set(_rows(table)) == {2}


def test_duplicate_key_in_batch(spark, table):
    batch = spark.createDataFrame([
        Row(id=7, name="first", val=1),
        Row(id=7, name="second", val=2),
    ])
    r = table.apply_mutations(batch, "INSERT")
    assert r.applied == 1
    q = r.quarantine.collect()
    assert len(q) == 1 and q[0]._error == "DUPLICATE_KEY_IN_BATCH"


def test_composite_key_order(spark, tmp_path):
    """Composite delete key respects the user-given field order
    (reference: delete key appended in order, StructToMutationConverter
    .java:112-150)."""
    t = KeyedTable(spark, str(tmp_path / "ck"), ["a", "b"])
    t.apply_mutations(spark.createDataFrame(
        [Row(a=1, b="x", v=1), Row(a=1, b="y", v=2), Row(a=2, b="x", v=3)]),
        "INSERT")
    r = t.apply_mutations(
        spark.createDataFrame([Row(a=1, b="x")]), "DELETE")
    assert r.applied == 1
    left = {(x.a, x.b) for x in t.read().collect()}
    assert left == {(1, "y"), (2, "x")}


def test_quarantine_and_count_files(spark, table, tmp_path):
    batch = spark.createDataFrame([Row(id=1, name="dup", val=0)])
    r = table.apply_mutations(batch, "INSERT")
    qpath = str(tmp_path / "errors")
    cpath = str(tmp_path / "failcount.txt")
    assert write_quarantine(r, qpath) == 1
    assert write_failure_count(r, cpath) == 1
    # reference parity: quarantine records land as Avro container files
    from dataflowtemplates_spark.operators.avro_io import read_avro
    assert read_avro(spark, qpath).count() == 1
    with open(cpath) as fh:
        assert fh.read() == "1"


def test_timestamp_bound_snapshot_read(spark, tmp_path):
    """Mutate, then read at a pre-mutation bound: old rows must be
    visible (reference: SpannerQueryIO.java:129-136 exact-staleness)."""
    from datetime import datetime, timezone
    t = KeyedTable(spark, str(tmp_path / "versioned"), ["id"])
    t.apply_mutations(
        spark.createDataFrame([Row(id=1, v="before"), Row(id=2, v="keep")]),
        "INSERT")
    bound = datetime.now(timezone.utc).isoformat()
    t.apply_mutations(
        spark.createDataFrame([Row(id=1, v="after")]), "INSERT_OR_UPDATE")
    # current read sees the mutation...
    now = {r.id: r.v for r in t.read().collect()}
    assert now == {1: "after", 2: "keep"}
    # ...the bounded read does not
    old = {r.id: r.v for r in t.read_at(bound).collect()}
    assert old == {1: "before", 2: "keep"}
    # a bound before table creation is an error
    with pytest.raises(ValueError):
        t.read_at("2000-01-01T00:00:00Z")


def test_timestamp_bound_through_run_query(spark, tmp_path):
    from datetime import datetime, timezone
    from dataflowtemplates_spark.plans import run_query
    t = KeyedTable(spark, str(tmp_path / "vq"), ["id"])
    t.apply_mutations(spark.createDataFrame([Row(id=1, v="x")]), "INSERT")
    bound = datetime.now(timezone.utc).isoformat()
    t.apply_mutations(spark.createDataFrame([Row(id=1, v="y")]), "REPLACE")
    rows = run_query(spark, "SELECT v FROM snap ORDER BY id",
                     timestamp_bound=bound,
                     keyed_tables={"snap": t}).collect()
    assert [r.v for r in rows] == ["x"]
    rows = run_query(spark, "SELECT v FROM snap ORDER BY id",
                     keyed_tables={"snap": t}).collect()
    assert [r.v for r in rows] == ["y"]


def test_struct_and_nested_array_columns_skipped(spark, tmp_path):
    """C4: STRUCT and ARRAY<STRUCT>/ARRAY<ARRAY> columns are dropped at
    the mutation boundary (StructToMutationConverter.java:59-62,89-96),
    storable columns apply normally."""
    t = KeyedTable(spark, str(tmp_path / "c4"), ["id"])
    batch = spark.createDataFrame(
        [(1, "ok", (1, "in"), [[1, 2]], [10, 20])],
        "id long, name string, s struct<x: long, y: string>,"
        " aa array<array<long>>, plain array<long>")
    r = t.apply_mutations(batch, "INSERT")
    assert r.applied == 1 and r.failed == 0
    cols = set(t.read().columns)
    assert cols == {"id", "name", "plain"}  # s and aa skipped
    row = t.read().collect()[0]
    assert row.name == "ok" and row.plain == [10, 20]
