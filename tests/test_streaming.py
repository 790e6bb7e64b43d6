"""Streaming pipeline tests: bounded availableNow runs over testdata
parquet, cross-checked against the equivalent batch aggregation."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dataflowtemplates_spark.operators.mutations import KeyedTable
from dataflowtemplates_spark.streaming import (
    sessionized_stream,
    stream_events,
    stream_to_keyed_table,
    tumbling_counts_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Copy the events parquet into a stream-source dir (nanos timestamps
    need the catalog's conversion, so rewrite through the catalog)."""
    from dataflowtemplates_spark.catalog import load_table
    src = str(tmp_path / "events_src")
    load_table(spark, SF, "events").write.parquet(src)
    return src


def _run_available_now(writer, tmp_path, name):
    q = (writer.trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .start())
    q.awaitTermination(120)
    assert not q.isActive


def test_tumbling_counts_matches_batch(spark, events_dir, tmp_path):
    stream = stream_events(spark, events_dir)
    agg = tumbling_counts_stream(stream, window="1 hour")
    out = str(tmp_path / "tumbling_out")
    _run_available_now(
        agg.writeStream.outputMode("append").format("parquet")
        .option("path", out), tmp_path, "tumbling")

    got = spark.read.parquet(out)
    batch = (spark.read.parquet(events_dir)
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n")))
    # availableNow + watermark: windows older than (max ts - watermark)
    # are emitted; compare the emitted subset against batch truth
    joined = (got.join(batch.select(F.col("w.start").alias("window_start"),
                                    "event_type",
                                    F.col("n").alias("n_batch")),
                       ["window_start", "event_type"]))
    assert joined.count() == got.count()  # every emitted window exists in batch
    assert joined.filter("n <> n_batch").count() == 0  # with equal counts
    assert got.count() > 0


def test_sessionized_stream_runs(spark, events_dir, tmp_path):
    stream = stream_events(spark, events_dir)
    sess = sessionized_stream(stream, gap="30 minutes")
    out = str(tmp_path / "sess_out")
    _run_available_now(
        sess.writeStream.outputMode("append").format("parquet")
        .option("path", out), tmp_path, "sess")
    got = spark.read.parquet(out)
    assert got.count() > 0
    # session invariant: start <= end, n_events >= 1
    assert got.filter("session_start > session_end").count() == 0
    assert got.filter("n_events < 1").count() == 0


def test_stream_to_keyed_table_upsert(spark, events_dir, tmp_path):
    table = KeyedTable(spark, str(tmp_path / "kt_stream"), ["event_id"])
    stream = stream_events(spark, events_dir, max_files_per_trigger=1)
    writer = stream_to_keyed_table(
        stream.select("event_id", "user_id", "event_type"),
        table, "INSERT_OR_UPDATE",
        checkpoint=str(tmp_path / "ckpt_kt"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    n_stream = table.read().count()
    n_batch = spark.read.parquet(events_dir).count()
    assert n_stream == n_batch


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """Rows older than the watermark horizon do not resurrect closed
    windows across restarts (state eviction works)."""
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    base = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00", "click", 1.0, "{}"),
         (2, 1, "2024-01-01 20:00:00", "click", 1.0, "{}")],
        "event_id LONG, user_id LONG, ts STRING, event_type STRING, value DOUBLE, props STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    base.coalesce(1).write.mode("append").parquet(src)

    stream = stream_events(spark, src)
    agg = tumbling_counts_stream(stream, window="1 hour", watermark="2 hours")
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "ckpt_late")
    q = (agg.writeStream.outputMode("append").format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()

    # append a LATE row (10:30, far behind the 20:00 max) and restart
    late = spark.createDataFrame(
        [(3, 1, "2024-01-01 10:30:00", "click", 1.0, "{}")],
        "event_id LONG, user_id LONG, ts STRING, event_type STRING, value DOUBLE, props STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    late.coalesce(1).write.mode("append").parquet(src)
    q2 = (agg.writeStream.outputMode("append").format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    after = spark.read.parquet(out)
    # the 10:00 window was already finalized; the late row must not
    # produce a new/duplicate emission for it
    assert after.filter("window_start = timestamp '2024-01-01 10:00:00'").count() <= 1
    assert after.count() >= first


def _progresses(q):
    """recentProgress as plain dicts across pyspark versions."""
    import json
    out = []
    for p in q.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        else:
            out.append(json.loads(p.json))
    return out


def test_watermark_bounds_state_across_batches(spark, tmp_path):
    """State-cleanup metrics, not just output values: streaming the
    events corpus in time-ordered chunks, the tumbling aggregation's
    state-store rows must be EVICTED as the watermark advances — the
    peak state never approaches the total window count, and
    numRowsRemoved shows real cleanup. This is the unbounded-state
    regression guard for the watermarked pipelines."""
    from dataflowtemplates_spark.catalog import load_table

    src = str(tmp_path / "chunked_src")
    os.makedirs(src)
    ev = load_table(spark, SF, "events").orderBy("ts").collect()
    chunk = len(ev) // 6 + 1
    schema = load_table(spark, SF, "events").schema
    for i in range(6):
        rows = ev[i * chunk:(i + 1) * chunk]
        if rows:
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode("append").parquet(src)

    stream = stream_events(spark, src, max_files_per_trigger=1)
    agg = tumbling_counts_stream(stream, window="1 hour",
                                 watermark="2 hours")
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("state_plateau_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt_plateau"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    progs = [p for p in _progresses(q) if p.get("stateOperators")]
    assert len(progs) >= 3, "expected one micro-batch per chunk file"
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progs]
    removed = sum(p["stateOperators"][0].get("numRowsRemoved", 0)
                  for p in progs)
    n_windows = (load_table(spark, SF, "events")
                 .groupBy(F.window("ts", "1 hour"), "event_type")
                 .count().count())
    # eviction really ran, and peak state stayed a fraction of the
    # would-be-unbounded total (all windows ever seen)
    assert removed > 0
    assert max(totals) < n_windows
    # after the last batch the store holds only the watermark horizon
    assert totals[-1] < max(totals) or totals[-1] < n_windows // 2


def test_q95_state_grain_is_bucket_not_document(spark, tmp_path):
    """The streaming-LSH aggregation must keep ONE state row per band
    bucket (corpus-bounded, the documented complete-mode contract) —
    a per-document state grain creeping in upstream would multiply
    state by docs x bands and OOM at scale. Pinned via the state-store
    metrics of a multi-batch run."""
    from dataflowtemplates_spark.queries.streaming_queries import (
        _DOCS_SCHEMA, neardup_bucket_stream)

    src = str(tmp_path / "docs_chunks")
    os.makedirs(src)
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .select("doc_id", "text", "lang", "source", "n_chars")
            .orderBy("doc_id").collect())
    chunk = len(docs) // 3 + 1
    for i in range(3):
        rows = docs[i * chunk:(i + 1) * chunk]
        if rows:
            spark.createDataFrame(rows, _DOCS_SCHEMA).coalesce(1) \
                .write.mode("append").parquet(src)

    stream = spark.readStream.schema(_DOCS_SCHEMA) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    agg = neardup_bucket_stream(stream)
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("q95_state_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt_q95state"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    progs = [p for p in _progresses(q) if p.get("stateOperators")]
    assert len(progs) >= 2
    final_state = progs[-1]["stateOperators"][0]["numRowsTotal"]
    n_buckets = spark.table("q95_state_sink").count()
    from dataflowtemplates_spark.queries.dedup import BAND_SIZE, N_HASHES
    n_docs = len(docs)
    # state rows == emitted buckets (one per distinct band_key), and
    # strictly below the doc x band blow-up a per-doc grain would cost
    assert final_state == n_buckets
    assert final_state < n_docs * (N_HASHES // BAND_SIZE)


def test_streaming_upserts_create_snapshot_history(spark, tmp_path):
    """Each foreachBatch commit into the versioned KeyedTable is a
    snapshot: a timestamp bound captured mid-stream reads the
    intermediate state even after later batches mutate rows."""
    from datetime import datetime, timezone
    src = str(tmp_path / "vsrc")
    os.makedirs(src)

    def emit(eid, etype):
        spark.createDataFrame(
            [(eid, 1, "2024-01-01 10:00:00", etype, 1.0, "{}")],
            "event_id LONG, user_id LONG, ts STRING, event_type STRING,"
            " value DOUBLE, props STRING"
        ).withColumn("ts", F.col("ts").cast("timestamp")) \
         .coalesce(1).write.mode("append").parquet(src)

    table = KeyedTable(spark, str(tmp_path / "vkt"), ["event_id"])
    ckpt = str(tmp_path / "vckpt")

    def run_once():
        q = stream_to_keyed_table(
            stream_events(spark, src).select("event_id", "event_type"),
            table, "INSERT_OR_UPDATE", checkpoint=ckpt) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

    emit(1, "before")
    run_once()
    bound = datetime.now(timezone.utc).isoformat()
    emit(1, "after")          # upserts the same key
    run_once()
    assert {r.event_type for r in table.read().collect()} == {"after"}
    old = {r.event_type for r in table.read_at(bound).collect()}
    assert old == {"before"}  # mid-stream snapshot preserved


def test_stateful_user_stats_across_batches(spark, tmp_path):
    """applyInPandasWithState must carry state across micro-batches:
    two files + maxFilesPerTrigger=1 force two batches; the break
    between the batches' events must be counted from persisted state."""
    from dataflowtemplates_spark.streaming import user_stats_stateful

    src = str(tmp_path / "ssrc")
    os.makedirs(src)
    schema = ("event_id LONG, user_id LONG, ts STRING, event_type STRING,"
              " value DOUBLE, props STRING")

    def emit(rows):
        (spark.createDataFrame(rows, schema)
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("append").parquet(src))

    # batch 1: user 1 at 10:00 and 10:10 (no break between them)
    emit([(1, 1, "2024-01-01 10:00:00", "a", 1.0, "{}"),
          (2, 1, "2024-01-01 10:10:00", "a", 1.0, "{}")])
    # batch 2: user 1 at 11:00 (>30min after batch-1's last -> 1 break)
    #          user 2 first appearance
    emit([(3, 1, "2024-01-01 11:00:00", "a", 1.0, "{}"),
          (4, 2, "2024-01-01 09:00:00", "b", 1.0, "{}")])

    from dataflowtemplates_spark.streaming.pipelines import EVENTS_SCHEMA
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (user_stats_stateful(stream)
         .writeStream.outputMode("update").format("memory")
         .queryName("t_stateful_sink")
         .option("checkpointLocation", str(tmp_path / "sckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    emitted = spark.table("t_stateful_sink").collect()
    # update mode emits one row per touched key per batch
    assert len(emitted) >= 3
    final = {r.user_id: r for r in
             spark.table("t_stateful_sink")
             .groupBy("user_id")
             .agg(F.max("n_events").alias("n_events"),
                  F.max("n_breaks").alias("n_breaks"),
                  F.min("first_event").alias("first_event"),
                  F.max("last_event").alias("last_event"))
             .collect()}
    assert final[1].n_events == 3
    assert final[1].n_breaks == 1          # counted ACROSS the batch gap
    assert str(final[1].first_event) == "2024-01-01 10:00:00"
    assert str(final[1].last_event) == "2024-01-01 11:00:00"
    assert final[2].n_events == 1 and final[2].n_breaks == 0


def test_dedup_stream_drops_within_watermark(spark, tmp_path):
    from dataflowtemplates_spark.streaming import dedup_stream, stream_events

    src = str(tmp_path / "dsrc")
    schema = ("event_id LONG, user_id LONG, ts STRING, event_type STRING,"
              " value DOUBLE, props STRING")
    (spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00", "a", 1.0, "{}"),
         (2, 1, "2024-01-01 10:05:00", "a", 2.0, "{}"),   # dup key
         (3, 1, "2024-01-01 10:06:00", "b", 3.0, "{}"),
         (4, 2, "2024-01-01 10:07:00", "a", 4.0, "{}")], schema)
     .withColumn("ts", F.col("ts").cast("timestamp"))
     .coalesce(1).write.parquet(src))

    deduped = dedup_stream(stream_events(spark, src),
                           ["user_id", "event_type"])
    q = (deduped.select("user_id", "event_type")
         .writeStream.outputMode("append").format("memory")
         .queryName("t_dedup_sink")
         .option("checkpointLocation", str(tmp_path / "dckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.user_id, r.event_type)
            for r in spark.table("t_dedup_sink").collect()}
    assert rows == {(1, "a"), (1, "b"), (2, "a")}
    assert spark.table("t_dedup_sink").count() == 3


def test_q91_exact_gap_boundary_matches_oracle(spark, tmp_path):
    """Pins the session_window boundary semantics: an event at exactly
    prev + 30min CONTINUES the session (Spark merges touching windows),
    so the oracle's strict-> lag predicate is the correct rendering.
    Round-5 review hypothesized the opposite (end-exclusive split);
    this fixture is the empirical answer."""
    import duckdb

    from dataflowtemplates_spark.queries.streaming_queries import (
        _Q91_ORACLE, q91_stream_sessionize)

    sf_dir = str(tmp_path / "sfq91")
    import os
    os.makedirs(sf_dir)
    schema = ("event_id LONG, user_id LONG, ts STRING, event_type STRING,"
              " value DOUBLE, props STRING")
    rows = [
        (1, 1, "2024-01-01 10:00:00", "a", 1.0, "{}"),
        (2, 1, "2024-01-01 10:10:00", "a", 1.0, "{}"),
        # exactly 1800 s after event 2 -> SAME session (touching windows
        # merge); 1801 s would start a new one
        (3, 1, "2024-01-01 10:40:00", "a", 1.0, "{}"),
        # 1801 s after event 3 -> NEW session (strictly over the gap)
        (4, 1, "2024-01-01 11:10:01", "a", 1.0, "{}"),
        (5, 2, "2024-01-01 09:00:00", "b", 1.0, "{}"),
    ]
    (spark.createDataFrame(rows, schema)
     .withColumn("ts", F.col("ts").cast("timestamp"))
     .coalesce(1).write.parquet(os.path.join(sf_dir, "events.parquet")))

    got = [(r["user_id"], str(r["session_start"]), str(r["session_end"]),
            r["n_events"])
           for r in q91_stream_sessionize(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')")
    want = [(r[0], str(r[1]), str(r[2]), r[3])
            for r in con.execute(_Q91_ORACLE).fetchall()]
    assert got == want
    # user 1: the exact-gap event merges (3 events), the 1801s one splits
    u1 = [g for g in got if g[0] == 1]
    assert [g[3] for g in u1] == [3, 1]


def test_checkpoint_recovery_is_exactly_once(spark, tmp_path):
    """Stop/restart against the same checkpoint must neither drop nor
    double-process: batch A is processed in run 1, the stream stops,
    batch B lands, run 2 resumes from the checkpoint — the file sink
    must hold each row exactly once. This is the production restart
    story for every pipeline in streaming/ (the checkpoint, not the
    availableNow drain, is what makes a 100 TB/day ingest resumable)."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    batch_a = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], schema)
    batch_b = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50, 80)], schema)
    batch_a.coalesce(1).write.mode("append").parquet(str(src))

    def run_once():
        stream = (spark.readStream.schema(schema).parquet(str(src))
                  .withColumn("n_tokens", F.size(F.split("text", " "))))
        q = (stream.writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run_once()
    got_1 = spark.read.parquet(str(out)).count()
    assert got_1 == 50

    batch_b.coalesce(1).write.mode("append").parquet(str(src))
    run_once()

    final = spark.read.parquet(str(out))
    assert final.count() == 80                       # B processed once
    ids = sorted(r.doc_id for r in final.select("doc_id").collect())
    assert ids == list(range(80))                    # A not re-processed


def test_q96_join_state_is_watermark_bounded(spark, tmp_path):
    """The stream-stream interval join's buffered-row state must be
    EVICTED as the two-sided watermark advances — the range condition,
    not hope, is what bounds join state. Feeding the corpus in
    time-ordered chunks, the state store must show real removals and a
    peak well below the would-be-unbounded total (all views+purchases
    ever seen). Catches range-condition regressions that the value
    gate (q96 vs its batch oracle) cannot."""
    from dataflowtemplates_spark.catalog import load_table
    from dataflowtemplates_spark.queries.streaming_queries import (
        attribution_join,
    )
    from dataflowtemplates_spark.streaming.pipelines import EVENTS_SCHEMA

    src = str(tmp_path / "q96_chunks")
    os.makedirs(src)
    evdf = load_table(spark, SF, "events")
    schema = evdf.schema
    ev = evdf.orderBy("ts").collect()
    chunk = len(ev) // 6 + 1
    for i in range(6):
        rows = ev[i * chunk:(i + 1) * chunk]
        if rows:
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode("append").parquet(src)

    def side():
        # catalog yields TIMESTAMP_NTZ; watermarks need TIMESTAMP
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
                .withColumn("ts", F.col("ts").cast("timestamp")))

    joined = attribution_join(side(), side())
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("q96_state_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt_q96state"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    progs = [p for p in _progresses(q) if p.get("stateOperators")]
    assert len(progs) >= 3, "expected one micro-batch per chunk file"
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progs]
    removed = sum(p["stateOperators"][0].get("numRowsRemoved", 0)
                  for p in progs)
    n_sides = len([r for r in ev
                   if r["event_type"] in ("view", "purchase")])
    assert removed > 0, "watermark never evicted join state"
    assert max(totals) < n_sides, (
        f"peak join state {max(totals)} ~ unbounded total {n_sides}")


def _write_events(spark, src, rows):
    from dataflowtemplates_spark.streaming.pipelines import EVENTS_SCHEMA
    schema = ("event_id LONG, user_id LONG, ts STRING, event_type STRING,"
              " value DOUBLE, props STRING")
    (spark.createDataFrame(rows, schema)
     .withColumn("ts", F.col("ts").cast("timestamp"))
     .select([f.name for f in EVENTS_SCHEMA])
     .coalesce(1).write.mode("append").parquet(src))


def test_q96_checkpoint_recovery_restores_join_state(spark, tmp_path):
    """Restarting the stream-stream join from its checkpoint must
    RESTORE the buffered join state: a view processed before the stop
    must still match a purchase arriving after the restart, and the
    pre-stop match must not re-emit."""
    from dataflowtemplates_spark.queries.streaming_queries import (
        attribution_join,
    )
    from dataflowtemplates_spark.streaming.pipelines import EVENTS_SCHEMA

    src = str(tmp_path / "j_src")
    out = str(tmp_path / "j_out")
    ckpt = str(tmp_path / "j_ckpt")
    os.makedirs(src)

    def run_once():
        def side():
            return (spark.readStream.schema(EVENTS_SCHEMA).parquet(src))
        q = (attribution_join(side(), side())
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    _write_events(spark, src, [
        (1, 1, "2024-01-01 10:00:00", "view", 1.0, "{}"),
        (2, 1, "2024-01-01 10:30:00", "purchase", 5.0, "{}"),
    ])
    run_once()
    first = {(r["view_id"], r["purchase_id"])
             for r in spark.read.parquet(out).collect()}
    assert first == {(1, 2)}

    # lands AFTER the restart; must match the view buffered pre-stop
    _write_events(spark, src, [
        (3, 1, "2024-01-01 10:45:00", "purchase", 7.0, "{}"),
    ])
    run_once()
    final = [(r["view_id"], r["purchase_id"], r["gap_us"])
             for r in spark.read.parquet(out).collect()]
    assert sorted((v, p) for v, p, _ in final) == [(1, 2), (1, 3)]
    gaps = {p: g for _, p, g in final}
    assert gaps[3] == 45 * 60 * 1_000_000  # restored state, right math


def test_q91_checkpoint_recovery_restores_session_state(spark, tmp_path):
    """Restarting the session_window aggregation from its checkpoint
    must restore open-session state: events before the stop and events
    after the restart that fall within the gap must land in ONE merged
    session with the pre-stop start time."""
    src = str(tmp_path / "s_src")
    out = str(tmp_path / "s_out")
    ckpt = str(tmp_path / "s_ckpt")
    os.makedirs(src)

    from dataflowtemplates_spark.streaming.pipelines import EVENTS_SCHEMA

    def run_once():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
        agg = (stream.withWatermark("ts", "30 minutes")
               .groupBy(F.session_window("ts", "30 minutes").alias("sw"),
                        "user_id")
               .agg(F.count(F.lit(1)).alias("n_events"))
               .select("user_id",
                       F.col("sw.start").alias("session_start"),
                       F.col("sw.end").alias("session_end"),
                       "n_events"))
        q = (agg.writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    _write_events(spark, src, [
        (1, 1, "2024-01-01 10:00:00", "view", 1.0, "{}"),
        (2, 1, "2024-01-01 10:10:00", "view", 1.0, "{}"),
    ])
    run_once()

    # within the 30-min gap of event 2 -> must MERGE into the open
    # session restored from the checkpoint; the far-future row pushes
    # the watermark past the merged session's end so it finalizes
    _write_events(spark, src, [
        (3, 1, "2024-01-01 10:20:00", "view", 1.0, "{}"),
        (4, 2, "2024-01-01 15:00:00", "view", 1.0, "{}"),
    ])
    run_once()

    rows = [r for r in spark.read.parquet(out).collect()
            if r["user_id"] == 1]
    assert len(rows) == 1, f"session split across restart: {rows}"
    r = rows[0]
    assert str(r["session_start"]).startswith("2024-01-01 10:00:00")
    assert r["n_events"] == 3
    assert str(r["session_end"]).startswith("2024-01-01 10:50:00")


# -- q144/q145 kernel properties -------------------------------------


def test_mg_fold_bound_holds_under_any_split():
    """Misra-Gries theorem bound, property-style: for random multisets
    folded under random batch splits and orders, EVERY key satisfies
    true - n/capacity <= est <= true (est = 0 if untracked). The
    candidate SET may differ between splits; the bound may not."""
    import random

    from dataflowtemplates_spark.streaming.pipelines import mg_fold

    rng = random.Random(1449)
    for trial in range(25):
        n = rng.randrange(50, 400)
        # skewed: small key space so some keys are genuinely heavy
        keys = [rng.randrange(12) for _ in range(n)]
        capacity = rng.choice([2, 3, 5, 8])
        true = {}
        for k in keys:
            true[k] = true.get(k, 0) + 1
        for _ in range(3):
            perm = keys[:]
            rng.shuffle(perm)
            d = {}
            i = 0
            while i < len(perm):
                j = min(len(perm), i + rng.randrange(1, 60))
                d = mg_fold(d, perm[i:j], capacity)
                i = j
            for k, tc in true.items():
                est = d.get(k, 0)
                assert est <= tc
                assert (tc - est) * capacity <= n, (
                    f"bound broken: key {k} true {tc} est {est} "
                    f"n {n} cap {capacity}")


def test_versioned_upsert_fold_is_batch_split_invariant(spark, tmp_path):
    """q145's fold applied over two DIFFERENT manual splits of the same
    event set must land the table in the identical final state — the
    associativity claim (additive count + max-struct version guard)
    tested without the streaming engine."""
    from pyspark.sql import types as T

    from dataflowtemplates_spark.catalog import load_table
    from dataflowtemplates_spark.streaming.pipelines import (
        versioned_upsert_fold)

    ev = (load_table(spark, SF, "events")
          .select("event_id", "ts", "user_id", "event_type", "value")
          .localCheckpoint(eager=True))

    def run(split_col_mod: int, path: str):
        seed = spark.createDataFrame([], T.StructType([
            T.StructField("user_id", T.LongType()),
            T.StructField("n_seen", T.LongType()),
            T.StructField("last_ts", ev.schema["ts"].dataType),
            T.StructField("last_event_id", T.LongType()),
            T.StructField("last_value", T.DoubleType()),
            T.StructField("last_event_type", T.StringType()),
        ]))
        KeyedTable(spark, path, ["user_id"]).create(seed)
        fold = versioned_upsert_fold(path)
        # deterministic split by event_id residue — residue order is
        # deliberately NOT time order, so late batches carry early rows
        for r in range(split_col_mod):
            fold(ev.filter(F.col("event_id") % split_col_mod == r), r)
        return (KeyedTable(spark, path, ["user_id"]).read()
                .orderBy("user_id").collect())

    a = run(2, str(tmp_path / "t2"))
    b = run(5, str(tmp_path / "t5"))
    assert a == b
    total = ev.count()
    assert sum(r["n_seen"] for r in a) == total


def test_idempotent_jdbc_load_collapses_redelivery(spark, tmp_path):
    """Exactly-once discipline for the JDBC warehouse loader
    (streaming/pipelines.idempotent_jdbc_load): foreachBatch is
    at-least-once under failure redelivery, so the fold must make a
    replayed (batch, batch_id) land exactly once — the _batch_id-slice
    DELETE before re-insert. Delivering batch 0 three times must leave
    one copy."""
    from pyspark.sql import Row

    from dataflowtemplates_spark.sources.connectors import (
        SourceSpec, read_source)
    from dataflowtemplates_spark.streaming.pipelines import (
        idempotent_jdbc_load)

    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", f"{tmp_path}/derby.log")
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    fold = idempotent_jdbc_load(url, "LOADS")
    b0 = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")])
    b1 = spark.createDataFrame([Row(id=3, v="c")])
    fold(b0, 0)
    fold(b1, 1)
    fold(b0, 0)  # redelivery (restart replays the last batch)
    fold(b0, 0)  # and again
    back = read_source(spark, SourceSpec(
        kind="jdbc-table", table="LOADS", options={"url": url}))
    rows = {(r["id"], r["v"], r["_batch_id"]) for r in back.collect()}
    assert rows == {(1, "a", 0), (2, "b", 0), (3, "c", 1)}
    assert back.count() == 3


def test_stream_changes_to_keyed_table_sink(spark, tmp_path):
    """The public streamed CDC sink: tagged I/U/D rows from a file
    stream land atomically per batch with a txn identity; the drained
    state equals the ordered-feed fold and a stream RESTART over the
    same checkpoint re-applies nothing."""
    import os
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from dataflowtemplates_spark.operators.mutations import KeyedTable
    from dataflowtemplates_spark.streaming.pipelines import (
        stream_changes_to_keyed_table)

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    rows = [
        [Row(id=1, v=10, _op="I", seq=1), Row(id=2, v=20, _op="I", seq=2)],
        [Row(id=1, v=11, _op="U", seq=3), Row(id=2, v=0, _op="D", seq=4)],
        [Row(id=3, v=30, _op="I", seq=5), Row(id=3, v=31, _op="U", seq=6)],
    ]
    for i, batch in enumerate(rows):
        p = os.path.join(stage, f"{i:04d}.parquet")
        spark.createDataFrame(batch).coalesce(1).write.parquet(p + ".d")
        part = [f for f in os.listdir(p + ".d")
                if f.endswith(".parquet")][0]
        os.rename(os.path.join(p + ".d", part), p)
        os.utime(p, (1000 + i, 1000 + i))

    tbl_path = str(tmp_path / "tbl")
    t = KeyedTable(spark, tbl_path, ["id"], n_buckets=4)
    t.create(spark.createDataFrame(rows[0]).drop("_op", "seq"))
    src = (spark.readStream
           .schema(spark.createDataFrame(rows[0]).schema)
           .option("maxFilesPerTrigger", 1)
           .option("pathGlobFilter", "*.parquet").parquet(stage))
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (stream_changes_to_keyed_table(
                src, t, ckpt, op_col="_op", seq_col="seq", txn_app="s")
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    want = [(1, 11), (3, 31)]
    assert sorted((r.id, r.v) for r in t.read().collect()) == want
    v = t._latest_version()
    drain()  # restart over the same checkpoint: nothing re-applies
    assert sorted((r.id, r.v) for r in t.read().collect()) == want
    assert t._latest_version() == v
