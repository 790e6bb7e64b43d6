"""Streaming pipelines over the events schema.

Design notes (100 TB stance):

* File-source streams (`readStream.format("parquet")`) discover new
  files per micro-batch — the cloud-bucket ingestion pattern; the
  `maxFilesPerTrigger` knob bounds batch size.
* Watermarks bound state: the tumbling aggregation keeps only windows
  newer than the watermark, so state is O(windows x keys in horizon),
  not O(stream).
* `session_window` is the built-in form of q16's batch sessionization
  (same 30-min gap semantics) — state-backed, watermark-evicted.
* `foreachBatch` + the keyed-table mutation sink gives exactly-once-
  per-batch upserts into the same table abstraction the batch
  templates write to (checkpointing makes the batch id durable).
* Tests drive everything with `trigger(availableNow=True)` so they
  run bounded and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The events table schema (streams need an explicit schema).
EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def stream_events(spark: SparkSession, path: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of events rows (new files appear -> new rows)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts_stream(events: DataFrame,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type (the streaming
    twin of q34). Late rows beyond the watermark are dropped; state is
    bounded by the watermark horizon."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("value_sum"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "value_sum"))


def sessionized_stream(events: DataFrame,
                       gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Session windows per user with an inactivity gap (the streaming
    twin of q16's lag+cumsum sessionization)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("first_event"),
                 F.max("ts").alias("last_event"))
            .select("user_id", F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "n_events", "first_event", "last_event"))


def dedup_stream(events: DataFrame, keys: list[str],
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact deduplication on ``keys`` with bounded state.

    Uses ``dropDuplicatesWithinWatermark``: per-key state is evicted
    once the event-time watermark passes, so state is O(keys within
    the watermark horizon) — plain ``dropDuplicates`` on non-time keys
    would grow state forever on an unbounded stream (the 100 TB
    killer). Keeps the first-arriving row per key; duplicates arriving
    within the watermark window are dropped exactly.
    """
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys))


#: gap that splits two events into separate sessions (micros).
SESSION_GAP_US = 30 * 60 * 1_000_000

USER_STATS_OUTPUT = ("user_id long, n_events long, first_event timestamp, "
                     "last_event timestamp, n_breaks long")
_USER_STATS_STATE = "n long, first_us long, last_us long, breaks long"


def user_stats_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event stats plus ORDER-DEPENDENT session-break counting
    (gaps > 30 min between consecutive events) — the fold that built-in
    streaming aggregations cannot express because it depends on the
    event sequence, not just commutative combines.

    State per user is four longs; each micro-batch folds its (sorted)
    rows into the state and emits the updated totals. Counts are
    monotone across batches, so a bounded drain's final value per key
    is the max over emitted rows (see q93). Assumes batches arrive in
    event-time order per key (file-source micro-batches do); a
    production deployment would pair this with a watermark-buffered
    reorder stage.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdfs, state):
        import pandas as pd
        if state.exists:
            n, first_us, last_us, breaks = state.get
        else:
            n, first_us, last_us, breaks = 0, None, None, 0
        ts = pd.concat([pdf["ts"] for pdf in pdfs])
        if len(ts):
            us = ts.astype("datetime64[us]").astype("int64").sort_values()
            prev = last_us
            for v in us:
                v = int(v)
                if prev is not None and v - prev > SESSION_GAP_US:
                    breaks += 1
                prev = v
            n += len(us)
            first_us = int(us.iloc[0]) if first_us is None \
                else min(first_us, int(us.iloc[0]))
            last_us = prev
        state.update((n, first_us, last_us, breaks))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "first_event": [pd.Timestamp(first_us, unit="us")],
            "last_event": [pd.Timestamp(last_us, unit="us")],
            "n_breaks": [breaks],
        })

    return (events
            .groupBy("user_id")
            .applyInPandasWithState(fold, USER_STATS_OUTPUT,
                                    _USER_STATS_STATE, "update",
                                    GroupStateTimeout.NoTimeout))


#: Misra-Gries summary capacity: state per group is at most this many
#: (key, count) pairs regardless of stream length — the O(1)-state
#: frequent-items sketch. The estimate guarantee for ANY key is
#: true_count - n/capacity <= est <= true_count, independent of
#: arrival order or micro-batch splits.
MG_CAPACITY = 32

MG_OUTPUT = ("event_type string, user_id long, est long, n_processed long")
_MG_STATE = "keys array<long>, counts array<long>, n_processed long"


def mg_fold(d: dict, keys, capacity: int) -> dict:
    """Fold a sequence of keys into a Misra-Gries summary ``d`` (key ->
    counter, at most ``capacity`` entries): increment if tracked,
    insert if there is room, otherwise decrement ALL counters and drop
    zeros — charging one arrival against ``capacity`` tracked keys at
    once. Pure function (mutates/replaces and returns ``d``) so the
    theorem bound — for EVERY key, true - n/capacity <= est <= true
    under ANY arrival order or batch split — is property-testable
    without the streaming engine (tests/test_streaming.py)."""
    for k in keys:
        k = int(k)
        if k in d:
            d[k] += 1
        elif len(d) < capacity:
            d[k] = 1
        else:
            d = {kk: c - 1 for kk, c in d.items() if c > 1}
    return d


def heavy_hitters_stateful(events: DataFrame,
                           capacity: int = MG_CAPACITY) -> DataFrame:
    """Streaming frequent-items (heavy hitters) per event_type via a
    Misra-Gries summary in ``applyInPandasWithState`` state — the
    fixed-size streaming counterpart of the batch count-min pass
    (q118). State per group is <= ``capacity`` counters + one long, so
    an unbounded stream of any cardinality holds O(capacity) state.

    Each micro-batch folds its keys (sorted for within-batch
    determinism) into the summary: increment if tracked, insert if
    there is room, otherwise decrement ALL counters and drop zeros —
    the classic MG step that charges one arrival against ``capacity``
    tracked keys at once. The surviving candidate SET depends on batch
    boundaries, but the MG bound (est >= true - n/capacity, est <=
    true) holds for EVERY key under ANY order — that bound, not the
    raw estimates, is what q144 gates on.

    Every batch emits the full summary stamped with ``n_processed``;
    the bounded drain recovers the FINAL summary by keeping each
    group's rows at the maximum stamp (same monotone-drain idiom as
    q93).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdfs, state):
        import pandas as pd
        if state.exists:
            keys, counts, n_proc = state.get
            d = dict(zip(keys, counts))
        else:
            d, n_proc = {}, 0
        for pdf in pdfs:
            uids = pdf["user_id"].sort_values()
            d = mg_fold(d, uids, capacity)
            n_proc += len(uids)
        items = sorted(d.items())
        state.update(([k for k, _ in items], [c for _, c in items],
                      n_proc))
        yield pd.DataFrame({
            "event_type": [key[0]] * len(items),
            "user_id": [k for k, _ in items],
            "est": [c for _, c in items],
            "n_processed": [n_proc] * len(items),
        })

    return (events
            .groupBy("event_type")
            .applyInPandasWithState(fold, MG_OUTPUT, _MG_STATE, "update",
                                    GroupStateTimeout.NoTimeout))


def stream_to_keyed_table(stream: DataFrame, table, key_op: str,
                          checkpoint: str, mode: str = "update",
                          txn_app: str | None = None):
    """foreachBatch sink into the mutation-disposition keyed table —
    the streaming form of query_to_keyed_table. Each micro-batch is
    applied with the given op; the checkpoint makes batch ids durable
    so restarts do not re-apply completed batches. Applies through the
    optimistic-retry loop: a batch writer sharing the table with other
    writers loses the commit CAS occasionally, and a mutation that
    raised published NOTHING — recompute-and-retry is always safe.

    ``txn_app`` upgrades the sink from at-least-once to EXACTLY-ONCE
    table state: foreachBatch REDELIVERS a batch whose epoch marker was
    lost (crash between the table commit and the checkpoint commit),
    and with a txn identity the redelivered (txn_app, batch_id) is
    already recorded in the table's commit object, so the replay
    no-ops — Delta's txnAppId/txnVersion discipline. Use one stable
    app id per (query, table) pair."""
    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # foreachBatch runs on a session CLONE: rebind so the batch
        # plan never splices the driver session into the micro-batch
        t = table.rebind(batch_df.sparkSession)
        t.create(batch_df)
        t.apply_mutations_with_retry(
            batch_df, key_op, txn_app=txn_app,
            txn_version=(int(batch_id) if txn_app is not None else None))

    return (stream.writeStream
            .outputMode(mode)
            .option("checkpointLocation", checkpoint)
            .foreachBatch(apply_batch))


def stream_changes_to_keyed_table(stream: DataFrame, table,
                                  checkpoint: str,
                                  op_col: str = "_op",
                                  seq_col: str | None = None,
                                  txn_app: str | None = None):
    """foreachBatch CDC sink: each micro-batch of tagged change rows
    (``op_col`` I/U/D, optional ``seq_col`` ordering) lands through
    :meth:`KeyedTable.apply_changes` as ONE atomic commit — the
    streamed Debezium-envelope sink (q184 drives exactly this shape
    inline). With ``txn_app`` the (app, batch_id) identity makes
    foreachBatch's at-least-once redelivery exactly-once table state.
    The feed must be sequence-ordered across batches (a CDC log's
    binlog/LSN contract): within a batch ``seq_col`` decides, across
    batches the later batch wins. Applies through the optimistic-retry
    loop like :func:`stream_to_keyed_table`."""
    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        import time
        # rebind to the micro-batch's session clone (same hazard
        # versioned_upsert_fold's comment calls out)
        t = table.rebind(batch_df.sparkSession)
        last = None
        for attempt in range(6):
            if attempt:
                time.sleep(0.2 * (2 ** (attempt - 1)))
            try:
                t.apply_changes(
                    batch_df, op_col=op_col, seq_col=seq_col,
                    txn_app=txn_app,
                    txn_version=(int(batch_id)
                                 if txn_app is not None else None))
                return
            except Exception as exc:
                from dataflowtemplates_spark.operators.mutations import (
                    ConcurrentWriteError)
                if not isinstance(exc, ConcurrentWriteError):
                    raise
                last = exc
        raise last

    return (stream.writeStream
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(apply_batch))


def versioned_upsert_fold(tbl_path: str, txn_app: str | None = None):
    """foreachBatch callable that folds event micro-batches
    (event_id, ts, user_id, event_type, value) into the KeyedTable at
    ``tbl_path`` — per user an additive ``n_seen`` counter plus the
    ``last_*`` image of the MAX-(ts, event_id) event. Both folds are
    ASSOCIATIVE (sum / max), so the final table state is independent
    of how the stream is split into batches — the version guard means
    an out-of-order batch can never clobber a newer image with an
    older one (the CDC-apply discipline; blind last-write-wins is
    ``stream_to_keyed_table``). The table must already exist with
    columns (user_id, n_seen, last_ts, last_event_id, last_value,
    last_event_type).

    The additive counter makes this fold NON-idempotent under
    foreachBatch's at-least-once redelivery: pass ``txn_app`` to
    record (txn_app, batch_id) in the table's commit object so a
    redelivered batch no-ops instead of double-counting — the Delta
    txnAppId/txnVersion discipline, required for exactly-once state
    whenever the fold is not naturally idempotent.

    Per batch: one map-side-combined groupBy, then a read-modify-write
    that reads ONLY the buckets the batch keys hash into (the same
    partition-pruned slice the commit rewrites) — O(batch +
    table/n_buckets x touched) per batch, never O(table).
    """
    from pyspark.sql import functions as F

    from dataflowtemplates_spark.operators.mutations import KeyedTable

    def fold(batch, bid: int) -> None:
        from pyspark.sql import Observation

        # re-bind the table to the micro-batch's session clone so
        # every frame in the per-batch plan shares one session
        t = KeyedTable(batch.sparkSession, tbl_path, ["user_id"])
        if txn_app is not None:
            # advisory replay gate BEFORE the per-batch aggregate, so a
            # redelivered batch costs one metadata read and zero Spark
            # jobs; the AUTHORITATIVE gate is apply_mutations' own,
            # which rides the commit CAS
            replayed, _ = t._txn_gate(t._meta(), txn_app, int(bid))
            if replayed:
                return
        agg = (batch.groupBy("user_id")
               .agg(F.count(F.lit(1)).alias("n_b"),
                    F.max(F.struct("ts", "event_id", "value",
                                   "event_type")).alias("s")))
        nb = int(t._meta()["n_buckets"])
        # materialize the per-batch aggregate ONCE, with the touched-
        # bucket set, row count and null-key count riding the same job
        # as Observation metrics — the downstream join and the
        # mutation's staging write then reuse the checkpointed rows
        # instead of re-aggregating the batch twice more (the r10
        # per-commit constant shave), and the three metrics are
        # exactly the mutation's `collapsed` contract (the r16 shave:
        # the commit's annotate job disappears — groupBy output is
        # one-row-per-key by construction, so annotation would find
        # nothing to quarantine)
        obs = Observation()
        agg = agg.observe(
            obs, F.collect_set(t._bucket_expr(nb)).alias("bks"),
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("user_id").isNull(),
                           F.lit(1))).alias("n_null"))
        agg = agg.localCheckpoint(eager=True)
        touched = sorted(int(b) for b in obs.get["bks"])
        n_rows = int(obs.get["n"])
        collapsed = (None if int(obs.get["n_null"])
                     else {"buckets": touched, "n_rows": n_rows,
                           "n_buckets": nb})
        # single-call SQL expressions: the merged-image plan is built
        # fresh per micro-batch, and building it column-op-by-column-op
        # costs ~100 py4j round trips (~0.1s/batch of pure driver
        # chatter — guide §4's Python-boundary constant); selectExpr
        # hands the same expressions to the JVM in ONE call each
        cur = t._read_buckets(touched).selectExpr(
            "user_id", "n_seen",
            "named_struct('ts', last_ts, 'event_id', last_event_id, "
            "'value', last_value, 'event_type', last_event_type) AS cs")
        m = agg.join(cur, "user_id", "left")
        # greatest skips NULL (new key): the version guard
        t.apply_mutations(
            m.selectExpr(
                "user_id",
                "coalesce(n_seen, CAST(0 AS BIGINT)) + n_b AS n_seen",
                "greatest(s, cs).ts AS last_ts",
                "greatest(s, cs).event_id AS last_event_id",
                "greatest(s, cs).value AS last_value",
                "greatest(s, cs).event_type AS last_event_type"),
            "INSERT_OR_UPDATE",
            txn_app=txn_app,
            txn_version=(int(bid) if txn_app is not None else None),
            collapsed=collapsed)

    return fold


def idempotent_jdbc_load(url: str, table: str,
                         options: dict | None = None):
    """foreachBatch callable: EXACTLY-ONCE warehouse load through the
    JDBC sink under Structured Streaming's at-least-once foreachBatch
    contract. Every row lands tagged with its ``_batch_id``; a
    replayed batch (failure/restart redelivery) first clears its own
    slice with ONE warehouse-side ``DELETE WHERE _batch_id = ?`` and
    re-inserts — duplicate delivery collapses to the last write, so
    the loaded table is always exactly the union of distinct batches.
    This is the idempotent-replay discipline CDC loaders use when the
    target lacks a MERGE key (contrast ``versioned_upsert_fold``,
    which gets idempotence from associative keyed folds instead).

    Scale notes: the DELETE is a single indexed statement executed BY
    the database (no data through the driver); the insert's
    parallelism is the batch's partitioning; ``batchsize``/
    ``isolationLevel`` ride ``options`` verbatim. The first delivery
    of each batch pays one no-op DELETE round-trip.
    """
    def fold(batch: DataFrame, batch_id: int) -> None:
        from dataflowtemplates_spark.sources.connectors import write_jdbc
        jvm = batch.sparkSession._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            # existence probe through JDBC metadata (tried verbatim and
            # in the unquoted-identifier fold) — ONLY table-absent may
            # skip the replay DELETE. Any failure of the DELETE itself
            # propagates and fails the batch: swallowing it would
            # append duplicates and silently void exactly-once.
            meta = conn.getMetaData()
            present = False
            for name in (table, table.upper(), table.lower()):
                rs = meta.getTables(None, None, name, None)
                if rs.next():
                    present = True
                rs.close()
                if present:
                    break
            if present:
                st = conn.createStatement()
                st.executeUpdate(
                    f'DELETE FROM {table} WHERE "_batch_id" = '
                    f"{int(batch_id)}")
                st.close()
        finally:
            conn.close()
        write_jdbc(batch.withColumn("_batch_id",
                                    F.lit(int(batch_id)).cast("long")),
                   url, table, mode="append", options=options)

    return fold
