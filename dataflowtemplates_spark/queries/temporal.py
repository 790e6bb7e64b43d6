"""Temporal join operators Spark lacks natively: as-of join, range join.

The reference delegates all join semantics to the pushed-down SQL
string (reference: transforms/SpannerQueryIO.java:127) and implements
none itself; these two are the time-series joins a training-data /
event-analytics pipeline needs that neither vanilla Spark SQL nor the
reference's target engines expose as a first-class operator. Each is
built as a composition of existing DataFrame ops (SURVEY.md §7 stance:
composition > custom physical operator), shaped so the plan scales:

* **as-of join** — the naive formulation (inequality join + argmax per
  left row) is O(N*M) per user and explodes before filtering. The
  scalable form used here is UNION + ORDER-BY window: tag both streams,
  sort within user by time, and carry the most recent right-side row
  forward with ``last(..., ignorenulls=True)``. One shuffle on
  user_id, zero row amplification, and the sort is partition-local —
  the same plan shape survives a 1000-executor cluster.
* **range (band) join** — the naive inequality join is a broadcast
  nested loop. Bucketing the time axis to the band width turns it into
  an equi-join on (user_id, bucket) with exactly 2 candidate buckets
  per probe row, then an exact range filter: hash join, bounded fan-out,
  AQE-handled skew.

Determinism: all comparisons are on raw TIMESTAMP values (integer
microseconds in both engines — no float epoch math in predicates), ties
are broken by (ts, stream-marker, event_id), and money aggregates go
through exact DECIMAL before the final double cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables

#: Band width of the range join, seconds.
_BAND_S = 300


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_cols: dict[str, str], left_marker_last: bool = True,
              tiebreak: str | None = None) -> DataFrame:
    """Generic as-of join: for every `left` row, attach the latest
    `right` row with ``right.ts <= left.ts`` and equal `on` key.

    Implemented as union + running ``last(ignorenulls)`` window — the
    shuffle-once, no-amplification formulation. ``right_cols`` maps
    right column -> output alias. On a ts tie the right row is
    considered visible to the left row (inclusive as-of); `tiebreak`
    (a unique column present in both) makes the winner among equal-ts
    right rows deterministic.
    """
    marker = F.lit(1) if left_marker_last else F.lit(0)
    tb = [tiebreak] if tiebreak else []
    l_tagged = left.withColumn("_m", marker)
    for src, dst in right_cols.items():
        l_tagged = l_tagged.withColumn(dst, F.lit(None).cast(
            dict(right.dtypes)[src]))
    r_tagged = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("_m"),
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
        *[F.col(t) for t in tb if t not in (on, ts)])
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(
                dict(l_tagged.dtypes)[c]))
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    w = (W.partitionBy(on).orderBy(ts, "_m", *tb)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    carried = unioned.select(
        *[c for c in left.columns], "_m",
        *[F.last(dst, ignorenulls=True).over(w).alias(dst)
          for dst in right_cols.values()])
    return carried.filter(F.col("_m") == 1).drop("_m")


def q35_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the most recent prior-or-simultaneous click
    by the same user (classic event-attribution as-of join)."""
    register_tables(spark, sf_dir)
    ev = spark.table("events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.col("value").alias("purchase_value"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on="user_id", ts="ts",
        right_cols={"event_id": "click_id", "value": "click_value"},
        tiebreak="event_id")
    return joined.select(
        "event_id", "user_id", "ts", "purchase_value",
        "click_id", "click_value").orderBy("event_id")


_Q35_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, 1 AS m, event_id, value AS purchase_value,
         NULL::BIGINT AS click_id, NULL::DOUBLE AS click_value,
         event_id AS tb
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 0 AS m, NULL, NULL,
         event_id, value, event_id
  FROM events WHERE event_type = 'click'),
carried AS (
  SELECT event_id, user_id, ts, purchase_value, m,
         LAST_VALUE(click_id IGNORE NULLS) OVER w AS click_id,
         LAST_VALUE(click_value IGNORE NULLS) OVER w AS click_value
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, m, tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_id, user_id, ts, purchase_value, click_id, click_value
FROM carried WHERE m = 1 ORDER BY event_id
"""


def q36_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event: count + exact-sum of the same user's
    clicks in the preceding 5 minutes (bucketed band join).

    The time axis is bucketed to the band width, so each error probes
    exactly 2 candidate buckets via an equi-join on (user_id, bucket);
    the precise half-open range ``[ts-300s, ts)`` is then applied on
    raw timestamps. Zero-match errors are kept by the final left join
    (count 0, sum NULL — SQL aggregate semantics).
    """
    register_tables(spark, sf_dir)
    ev = spark.table("events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
        F.floor(F.unix_timestamp("ts") / _BAND_S).alias("bucket"))
    probes = errors.withColumn(
        "b", F.floor(F.unix_timestamp("ts") / _BAND_S)).select(
        "event_id", "user_id", "ts",
        F.explode(F.array(F.col("b") - 1, F.col("b"))).alias("bucket"))
    matched = (
        probes.join(clicks, (probes.user_id == clicks.c_user)
                    & (probes.bucket == clicks.bucket))
        .filter((F.col("c_ts") >= F.col("ts") - F.expr(
            f"INTERVAL {_BAND_S} SECOND")) & (F.col("c_ts") < F.col("ts")))
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"),
             F.sum(F.col("c_value").cast("decimal(12,2)"))
              .cast("double").alias("click_sum")))
    return (errors.join(matched, "event_id", "left")
            .select("event_id", "user_id", "ts",
                    F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
                    "click_sum")
            .orderBy("event_id"))


_Q36_ORACLE = f"""
SELECT e.event_id, e.user_id, e.ts,
       COUNT(c.c_ts) AS n_clicks,
       CAST(SUM(CAST(c.c_value AS DECIMAL(12,2))) AS DOUBLE) AS click_sum
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT user_id AS c_user, ts AS c_ts, value AS c_value
           FROM events WHERE event_type = 'click') c
  ON c.c_user = e.user_id
 AND c.c_ts >= e.ts - INTERVAL {_BAND_S} SECOND
 AND c.c_ts < e.ts
GROUP BY e.event_id, e.user_id, e.ts
ORDER BY e.event_id
"""


def q97_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: turn a keyed change
    stream into validity intervals — the standard way a warehouse
    tracks attribute history (each state row carries valid_from /
    valid_to, the current row an open end).

    Every user's event stream becomes its interval history: valid_to =
    the NEXT change's timestamp (lead over the per-user time order,
    ties broken by event_id), NULL while current; dwell_us is the
    closed interval's width in microseconds (exact integer arithmetic —
    no float epoch math).

    Scale shape: ONE shuffle on the natural key (user_id) and a
    partition-local sort — the same window topology as sessionization
    (q16); no self-join (the naive from-to pairing is an O(n²) per-key
    inequality join). The presentation filter keeps the driver-side
    result bounded; the full interval table is the unfiltered form.
    """
    register_tables(spark, sf_dir)
    ev = spark.table("events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.filter(F.col("user_id") < 20)
            .select("user_id", "event_id", "event_type",
                    F.col("ts").alias("valid_from"),
                    F.lead("ts").over(w).alias("valid_to"),
                    F.row_number().over(w).alias("seq"))
            .withColumn(
                "dwell_us",
                F.expr("unix_micros(CAST(valid_to AS TIMESTAMP)) "
                       "- unix_micros(CAST(valid_from AS TIMESTAMP))"))
            .withColumn("is_current", F.col("valid_to").isNull())
            .select("user_id", "seq", "event_id", "event_type",
                    "valid_from", "valid_to", "dwell_us", "is_current")
            .orderBy("user_id", "seq"))


_Q97_ORACLE = """
SELECT user_id,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS seq,
       event_id, event_type,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       EPOCH_US(LEAD(ts) OVER w) - EPOCH_US(ts) AS dwell_us,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, seq
"""


def q129_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: how far each user progresses through
    view -> click -> purchase IN TIMESTAMP ORDER — the event-sequence
    pattern query (a "did A happen, then B, then C" state machine, not
    a mere co-occurrence count).

    Scalable one-pass form: per user, the event types sorted by
    (ts, event_id) fold through a 4-state machine with
    ``F.aggregate`` — one shuffle on user_id, no self-joins (the
    textbook 3-way-EXISTS formulation is an O(n^3)-per-user join
    explosion). The same fold runs in DuckDB via LIST(... ORDER BY) +
    list_reduce, so stage_reached is bit-deterministic: the state is a
    pure integer function of the ordered type sequence.
    """
    register_tables(spark, sf_dir)
    ev = spark.table("events")
    ordered = (ev.select("user_id",
                         F.struct(F.col("ts"), F.col("event_id"),
                                  F.col("event_type")).alias("e")))
    per_user = (ordered.groupBy("user_id")
                .agg(F.sort_array(F.collect_list("e")).alias("seq"),
                     F.count(F.lit(1)).alias("n_events")))
    codes = F.transform(
        F.col("seq"),
        lambda s: F.when(s["event_type"] == "view", F.lit(1))
                   .when(s["event_type"] == "click", F.lit(2))
                   .when(s["event_type"] == "purchase", F.lit(3))
                   .otherwise(F.lit(0)))
    stage = F.aggregate(
        codes, F.lit(0),
        lambda acc, x: F.when((acc == 0) & (x == 1), F.lit(1))
                        .when((acc == 1) & (x == 2), F.lit(2))
                        .when((acc == 2) & (x == 3), F.lit(3))
                        .otherwise(acc))
    return (per_user.select("user_id", "n_events",
                            stage.alias("stage_reached"),
                            (stage == 3).alias("converted"))
            .orderBy("user_id"))


_Q129_ORACLE = """
SELECT user_id, n_events, stage_reached, stage_reached = 3 AS converted
FROM (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         list_reduce(
           list_prepend(0, list_transform(
             LIST(event_type ORDER BY ts, event_id),
             t -> CASE t WHEN 'view' THEN 1 WHEN 'click' THEN 2
                         WHEN 'purchase' THEN 3 ELSE 0 END)),
           (acc, x) -> CASE WHEN acc = 0 AND x = 1 THEN 1
                            WHEN acc = 1 AND x = 2 THEN 2
                            WHEN acc = 2 AND x = 3 THEN 3
                            ELSE acc END) AS stage_reached
  FROM events GROUP BY user_id)
ORDER BY user_id
"""


def q130_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time window as a RANGE frame: for every event, the
    count and exact value-sum of the SAME user's events in the
    preceding hour (inclusive) — the time-based window frame (q14/q15
    cover ROWS frames; RANGE over event time is a different physical
    frame: peers enter by VALUE distance, not row position, so
    irregular event spacing changes the frame size per row).

    Spark orders the frame on integer microseconds
    (``rangeBetween(-3600s in µs, 0)``), DuckDB on the timestamp with
    ``RANGE INTERVAL 1 HOUR PRECEDING`` — identical inclusive frames
    on µs-precision data. The rolling sum goes through exact DECIMAL,
    so irregular accumulation order cannot produce float drift.
    One shuffle on user_id; the frame scan is partition-local.
    """
    register_tables(spark, sf_dir)
    ev = spark.table("events")
    # ts arrives TIMESTAMP_NTZ; the cast to TIMESTAMP shifts by the
    # session zone, which cancels in the RANGE frame (membership
    # depends only on µs DIFFERENCES — constant offsets drop out)
    w = (W.partitionBy("user_id")
         .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
         .rangeBetween(-3_600_000_000, 0))
    return (ev.select(
        "user_id", "event_id", "ts",
        F.count(F.lit(1)).over(w).alias("events_1h"),
        F.sum(F.col("value").cast("decimal(12,2)")).over(w)
         .cast("double").alias("value_1h"))
        .orderBy("user_id", "ts", "event_id"))


_Q130_ORACLE = """
SELECT user_id, event_id, ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS events_1h,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts, event_id
"""


def q147_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    in event-time order — the classic user-signal smoothing feature
    (recency-weighted engagement) computed batch-side; alpha = 1/2 so
    every fold step is one IEEE add plus one exact halving, making the
    result bit-identical across engines when folded in the same
    (ts, event_id) order (the shared-fold-order rule).

    Scale shape: ONE aggregation keyed on user_id (map-side combined
    collect), then a map-only fold over each user's own sorted event
    array — no window function, no second shuffle. Per-user state is
    that user's history; at abusive per-key cardinalities the same
    fold runs as a segmented scan (sessionized sub-arrays folded then
    combined via the affine-composition property of EWMA), documented
    rather than needed at this corpus's per-user counts.
    """
    register_tables(spark, sf_dir)
    ev = spark.table("events")
    per_user = (ev.groupBy("user_id")
                .agg(F.sort_array(F.collect_list(
                        F.struct("ts", "event_id", "value"))).alias("h")))
    ewma = F.aggregate(F.col("h"), F.lit(0.0),
                       lambda acc, e: (e["value"] + acc) / F.lit(2.0))
    return (per_user.select(
                "user_id",
                F.size("h").cast("bigint").alias("n_events"),
                ewma.alias("ewma"))
            .orderBy("user_id"))


_Q147_ORACLE = """
WITH h AS (
  SELECT user_id, LIST(value ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(LEN(vals) AS BIGINT) AS n_events,
       LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), vals),
                   (a, b) -> (b + a) / CAST(2 AS DOUBLE)) AS ewma
FROM h ORDER BY user_id
"""

def q151_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with gap fill and forward fill — the dense
    time-series view analytics expect from sparse event data: every
    (event_type, hour) cell of the full span exists, empty hours carry
    n=0, and the per-hour average forward-fills from the last observed
    hour (LOCF). Exactness: values floor to milli-unit BIGINT sums
    (the q150 discipline — bigint->double converts identically
    everywhere, decimal->double does not), the carried average is one
    fixed-order division chain, and the fill itself copies bits (no
    arithmetic).

    Scale shape: one groupBy to hourly cells, a per-type spine built
    with ``sequence`` over the observed min/max (O(hours) rows —
    spine size is time-span-bound, not data-bound), a left join keyed
    (event_type, hour), and one LOCF window per type ordered by hour —
    partitioned by event_type, so window state is O(types x hours).
    """
    register_tables(spark, sf_dir)
    ev = spark.table("events")
    hr = F.date_trunc("hour", F.col("ts"))
    # milli-unit BIGINT sum, not DECIMAL: decimal->double is a
    # two-rounding cast in Java and can land 1 ulp off DuckDB once the
    # unscaled sum grows (the q150 discipline; review finding)
    cells = (ev.groupBy(F.col("event_type"), hr.alias("hour"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.floor(F.col("value") * F.lit(1000.0))
                        .cast("long")).alias("vm")))
    spine = (cells.groupBy("event_type")
             .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
             .select("event_type",
                     F.explode(F.expr(
                         "sequence(h0, h1, interval 1 hour)"))
                     .alias("hour")))
    joined = spine.join(cells, ["event_type", "hour"], "left")
    avg_v = ((F.col("vm").cast("double")
              / F.col("n").cast("double")) / F.lit(1000.0))
    w = (W.partitionBy("event_type").orderBy("hour")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (joined.select(
                "event_type", "hour",
                F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
                F.last(avg_v, ignorenulls=True).over(w)
                 .alias("carried_avg"))
            .orderBy("event_type", "hour"))


_Q151_ORACLE = """
WITH cells AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * CAST(1000 AS DOUBLE)) AS BIGINT))
              AS BIGINT) AS vm
  FROM events GROUP BY 1, 2),
spine AS (
  SELECT event_type, UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR))
           AS hour
  FROM (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
        FROM cells GROUP BY event_type)),
joined AS (
  SELECT s.event_type, s.hour,
         COALESCE(c.n, 0) AS n,
         (CAST(c.vm AS DOUBLE) / CAST(c.n AS DOUBLE))
           / CAST(1000 AS DOUBLE) AS avg_v
  FROM spine s LEFT JOIN cells c
    ON c.event_type = s.event_type AND c.hour = s.hour)
SELECT event_type, hour, CAST(n AS BIGINT) AS n,
       LAST_VALUE(avg_v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS carried_avg
FROM joined ORDER BY event_type, hour
"""

#: Retention horizon (hours after the cohort hour) q156 reports.
RETENTION_HORIZON = 5


def q156_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly cohort retention — the canonical activation analytics
    shape: users are bucketed into the hour they were FIRST seen, and
    each cohort reports how many of its users are active 0..N hours
    later. All-integer outputs (distinct-user counts), so the gate is
    exact with no float discipline needed.

    Scale shape: one min-aggregate per user (map-side combined), one
    (user, hour) distinct, one join keyed on user_id (both sides
    already user-keyed — Catalyst reuses the partitioning), and the
    final (cohort, offset) count-distinct aggregate. The offset is an
    integer division of event-time DIFFERENCES, so the session-zone
    shift on TIMESTAMP_NTZ casts cancels (verify SKILL note).
    """
    register_tables(spark, sf_dir)
    ev = spark.table("events")
    firsts = (ev.groupBy("user_id")
              .agg(F.date_trunc("hour", F.min("ts")).alias("cohort")))
    active = (ev.select("user_id",
                        F.date_trunc("hour", F.col("ts")).alias("hour"))
              .distinct())
    off = F.expr(
        "CAST((unix_micros(CAST(hour AS TIMESTAMP)) - "
        "unix_micros(CAST(cohort AS TIMESTAMP))) DIV 3600000000 "
        "AS BIGINT)")
    return (active.join(firsts, "user_id")
            .select("user_id", "cohort", off.alias("offset_h"))
            .filter(F.col("offset_h") <= RETENTION_HORIZON)
            .groupBy("cohort", "offset_h")
            .agg(F.countDistinct("user_id").cast("bigint")
                 .alias("n_active"))
            .orderBy("cohort", "offset_h"))


_Q156_ORACLE = f"""
WITH firsts AS (
  SELECT user_id, DATE_TRUNC('hour', MIN(ts)) AS cohort
  FROM events GROUP BY user_id),
active AS (
  SELECT DISTINCT user_id, DATE_TRUNC('hour', ts) AS hour
  FROM events)
SELECT f.cohort,
       CAST(DATE_DIFF('hour', f.cohort, a.hour) AS BIGINT) AS offset_h,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM active a JOIN firsts f USING (user_id)
WHERE DATE_DIFF('hour', f.cohort, a.hour) <= {RETENTION_HORIZON}
GROUP BY 1, 2 ORDER BY cohort, offset_h
"""


#: Rolling window width (hours) for q158's sliding MAU.
MAU_WINDOW_H = 24

#: HLL sketch precision (lgk) and accepted relative error for q158.
MAU_LGK = 12
MAU_REL_ERR = 0.05


def q158_rolling_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 24-hour distinct-user counts ("rolling MAU") — computed
    the way it has to be at 100 TB: ONE pass builds a tiny per-hour
    HLL sketch table, then each window is a union of 24 sketches, so
    re-computing the window never re-scans events. The exact rolling
    distinct (a 24x fan-out + count-distinct) is carried alongside as
    the verification yardstick, exactly the q89 pattern: the oracle
    asserts the sketch estimate lands within the declared bound.

    Scale shape: sketch side is per-hour groupBy (map-side combined,
    O(hours) rows after the first agg — everything downstream is
    model-sized). The explode-by-offset window merge shuffles O(hours x
    24) sketch rows, never event rows. The exact side's 24x event
    fan-out is the plan the sketch path replaces; it appears here only
    because the gate needs the exact number.
    """
    register_tables(spark, sf_dir)
    ev = spark.table("events").select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id")
    hours = ev.select("h").distinct()
    offs = F.explode(F.sequence(F.lit(0), F.lit(MAU_WINDOW_H - 1)))
    # sketch path: per-hour sketches, then offset-explode to the
    # windows each hour contributes to, and union per window end
    per_hour = ev.groupBy("h").agg(
        F.expr(f"hll_sketch_agg(user_id, {MAU_LGK})").alias("sk"))
    sk_win = (per_hour
              .select("h", "sk", offs.alias("o"))
              .select(F.expr("h + make_interval(0,0,0,0,o)")
                      .alias("win_end"), "sk")
              .join(hours.withColumnRenamed("h", "win_end"), "win_end")
              .groupBy("win_end")
              .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk, true))")
                   .alias("est")))
    # exact yardstick: same offset-explode over events, count-distinct
    exact = (ev
             .select("user_id", offs.alias("o"), "h")
             .select(F.expr("h + make_interval(0,0,0,0,o)")
                     .alias("win_end"), "user_id")
             .join(hours.withColumnRenamed("h", "win_end"), "win_end")
             .groupBy("win_end")
             .agg(F.countDistinct("user_id").cast("bigint")
                  .alias("exact_mau")))
    return (exact.join(sk_win, "win_end")
            .select("win_end", "exact_mau",
                    (F.abs(F.col("est") - F.col("exact_mau"))
                     <= MAU_REL_ERR * F.col("exact_mau"))
                    .alias("within_bound"))
            .orderBy("win_end"))


_Q158_ORACLE = f"""
WITH hours AS (
  SELECT DISTINCT DATE_TRUNC('hour', ts) AS win_end FROM events)
SELECT h.win_end,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_mau,
       TRUE AS within_bound
FROM hours h
JOIN events e
  ON DATE_TRUNC('hour', e.ts)
     BETWEEN h.win_end - INTERVAL {MAU_WINDOW_H - 1} HOUR AND h.win_end
GROUP BY h.win_end ORDER BY win_end
"""


def q160_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix — the Markov-chain
    counting pass behind behavior modeling and funnel mining: order
    each user's events by time, pair each event with its successor
    (LEAD), and count (from_type, to_type) transitions corpus-wide.
    All-integer outputs, so the gate is exact.

    Scale shape: one shuffle on user_id for the per-user window (the
    partition key IS the window key, so there is exactly one exchange),
    then a map-side-combined count on the tiny (from, to) key space.
    The window's ORDER BY is (ts, event_id) — the id tiebreak makes
    LEAD deterministic under same-timestamp events in both engines.
    """
    register_tables(spark, sf_dir)
    ev = (spark.table("events")
          .select("user_id", "ts", "event_id", "event_type")
          .filter(F.col("ts").isNotNull()))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev
            .withColumn("to_type", F.lead("event_type").over(w))
            .filter(F.col("to_type").isNotNull())
            .groupBy(F.col("event_type").alias("from_type"), "to_type")
            .agg(F.count(F.lit(1)).alias("n_transitions"))
            .orderBy("from_type", "to_type"))


_Q160_ORACLE = """
WITH nxt AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events WHERE ts IS NOT NULL)
SELECT from_type, to_type, COUNT(*) AS n_transitions
FROM nxt WHERE to_type IS NOT NULL
GROUP BY from_type, to_type ORDER BY from_type, to_type
"""


def q162_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type hourly volume anomaly flags — the ops-monitoring
    pass over an event firehose: an hour is anomalous for a type when
    its count deviates from that type's mean by more than 3 sigma.

    The 3-sigma test runs in EXACT integer arithmetic: with per-type
    N (hours), S (sum of counts), SS (sum of squares),
    ``(cnt*N - S)^2 > 9*(N*SS - S^2)`` is the threshold inequality
    cleared of divisions — every term BIGINT, no float/libm anywhere,
    so both engines agree bit-for-bit (the q150 exact-moments stance
    applied to anomaly detection). Magnitude guard: exact up to
    ~3e9 events per type-hour; beyond that promote to DECIMAL.

    Scale shape: one (type, hour) count (map-side combined), one tiny
    per-type moment aggregate joined back broadcast — the fact stream
    shuffles once on the grouping key and never again.
    """
    register_tables(spark, sf_dir)
    ev = spark.table("events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", F.col("ts")).alias("hour"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    moments = (hourly.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n_hours"),
                    F.sum("cnt").alias("s"),
                    F.sum(F.col("cnt") * F.col("cnt")).alias("ss")))
    dev2 = ((F.col("cnt") * F.col("n_hours") - F.col("s"))
            * (F.col("cnt") * F.col("n_hours") - F.col("s")))
    thr = F.lit(9) * (F.col("n_hours") * F.col("ss")
                      - F.col("s") * F.col("s"))
    return (hourly.join(F.broadcast(moments), "event_type")
            .select("event_type", "hour",
                    F.col("cnt").cast("bigint").alias("cnt"),
                    dev2.cast("bigint").alias("dev2"),
                    thr.cast("bigint").alias("thr"),
                    ((F.col("n_hours") > 1) & (dev2 > thr))
                    .alias("is_anomaly"))
            .orderBy("event_type", "hour"))


_Q162_ORACLE = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
moments AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(cnt) AS BIGINT) AS s,
         CAST(SUM(cnt * cnt) AS BIGINT) AS ss
  FROM hourly GROUP BY 1)
SELECT h.event_type, h.hour, h.cnt,
       CAST((h.cnt * m.n_hours - m.s) * (h.cnt * m.n_hours - m.s)
            AS BIGINT) AS dev2,
       CAST(9 * (m.n_hours * m.ss - m.s * m.s) AS BIGINT) AS thr,
       m.n_hours > 1 AND
       (h.cnt * m.n_hours - m.s) * (h.cnt * m.n_hours - m.s)
         > 9 * (m.n_hours * m.ss - m.s * m.s) AS is_anomaly
FROM hourly h JOIN moments m USING (event_type)
ORDER BY event_type, hour
"""


#: q163 session gap (seconds) and path prefix length.
PATH_GAP_S = 1800
PATH_LEN = 8


def q163_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths — sessionize each user's events on a
    30-minute inactivity gap, render each session's first 8 event
    types as a '>'-joined path string, and count sessions per path
    (the path-mining pass behind funnel discovery; q129 checks ONE
    declared funnel, this finds the empirical ones).

    Scale shape: one shuffle on user_id for the gap window (LAG +
    cumulative-sum session ids ride the same exchange), the path
    renders inside the same per-user sort via array_sort over
    (ts, event_id, type) structs — no second shuffle until the final
    tiny path-count aggregate. Determinism: (ts, event_id) total
    order; gap compare on exact integer micros (the NTZ cast note).
    """
    register_tables(spark, sf_dir)
    ev = (spark.table("events")
          .select("user_id", "ts", "event_id", "event_type",
                  F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
                  .alias("us")))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (ev
            .withColumn("new_sess",
                        (F.coalesce(F.col("us") - F.lag("us").over(w),
                                    F.lit(None))
                         > PATH_GAP_S * 1_000_000).cast("int"))
            .withColumn("sess_id",
                        F.sum(F.coalesce("new_sess", F.lit(1))).over(w)))
    paths = (sess
             .groupBy("user_id", "sess_id")
             .agg(F.concat_ws(
                 ">",
                 F.slice(F.expr(
                     "transform(array_sort(collect_list("
                     "struct(ts, event_id, event_type))), x -> x.event_type)"),
                     1, PATH_LEN)).alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_sessions"))
            .orderBy(F.desc("n_sessions"), "path"))


_Q163_ORACLE = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, event_type,
         epoch_us(ts) AS us
  FROM events),
marked AS (
  SELECT *, CAST(us - LAG(us) OVER w > {PATH_GAP_S} * 1000000
                 AS INT) AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, SUM(COALESCE(new_sess, 1))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS sess_id
  FROM marked),
paths AS (
  SELECT user_id, sess_id,
         ARRAY_TO_STRING((LIST(event_type ORDER BY ts, event_id))
                         [1:{PATH_LEN}], '>') AS path
  FROM sess GROUP BY user_id, sess_id)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path ORDER BY n_sessions DESC, path
"""


def q170_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust (median/MAD) outlier summary over event values —
    the heavy-tail-safe twin of q162's mean/sigma bands: one wild value
    drags a mean and explodes a sigma, while the median and the median
    absolute deviation barely move, so the MAD rule is what a real
    data-quality gate runs on money-like columns. Flag rule: a value is
    an outlier when |x - median| > 3 * 1.4826 * MAD (the normal-
    consistent robust z-score).

    EXACT integer arithmetic end-to-end (the q150/q162 stance): values
    land as FLOOR(x*1000) fixed-point BIGINTs; each median is an ORDER
    STATISTIC (row_number selection, ties broken by event_id; even
    counts keep sums-of-two so nothing is halved early); the flag
    inequality is cleared of all constants' float forms —
    ``dev * 20000 > 44478 * mad4`` with dev at 2000x and mad4 at 4000x
    real scale IS ``|x-med| > 4.4478 * MAD`` exactly. The only float
    ops are the two final display divisions, identical in both engines.

    Scale shape: two window passes partitioned by event_type (exact
    order statistics are the yardstick — the production substitute at
    100 TB is the q120 quantile sketch, same trade as q09 vs q39) and
    two broadcast joins of the per-type 1-row stats; the fact table
    shuffles only on event_type.
    """
    from pyspark.sql import Window as W
    register_tables(spark, sf_dir)
    ev = spark.table("events").filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type", "event_id",
        F.floor(F.col("value") * F.lit(1000.0)).cast("bigint")
        .alias("vfp"))

    def _median2(df: DataFrame, col: str, out: str) -> DataFrame:
        """2x the exact median of ``col`` per event_type: select the
        middle order statistic(s), sum-of-two kept unhalved. The DIV
        is always exact (divisor 1 or 2 with an even dividend), so
        truncating vs flooring division cannot diverge on negatives."""
        w = W.partitionBy("event_type").orderBy(col, "event_id")
        ranked = (df.withColumn("rn", F.row_number().over(w))
                  .withColumn("cnt", F.count(F.lit(1)).over(
                      W.partitionBy("event_type"))))
        return (ranked.filter(F.expr("rn = (cnt + 1) DIV 2 "
                                     "OR rn = (cnt + 2) DIV 2"))
                .groupBy("event_type")
                .agg(F.expr(f"CAST((SUM({col}) * 2) DIV COUNT(1) "
                            f"AS BIGINT)").alias(out)))

    med = _median2(base, "vfp", "med2")           # 2000x real median
    devs = (base.join(F.broadcast(med), "event_type")
            .withColumn("dev", F.abs(F.col("vfp") * 2 - F.col("med2"))))
    mad = _median2(devs, "dev", "mad4")           # 4000x real MAD
    return (devs.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 (F.min("med2").cast("double")
                  / F.lit(2000.0)).alias("median_value"),
                 (F.min("mad4").cast("double")
                  / F.lit(4000.0)).alias("mad_value"),
                 F.sum(F.when(F.col("dev") * F.lit(20000)
                              > F.lit(44478) * F.col("mad4"), 1)
                       .otherwise(0)).cast("bigint").alias("n_outliers"))
            .orderBy("event_type"))


_Q170_ORACLE = """
WITH base AS (
  SELECT event_type, event_id,
         CAST(FLOOR(value * CAST(1000 AS DOUBLE)) AS BIGINT) AS vfp
  FROM events WHERE value IS NOT NULL),
r1 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             ORDER BY vfp, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM base),
med AS (
  SELECT event_type,
         CAST((SUM(vfp) * 2) // COUNT(*) AS BIGINT) AS med2
  FROM r1 WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
  GROUP BY event_type),
devs AS (
  SELECT b.event_type, b.event_id, m.med2,
         ABS(b.vfp * 2 - m.med2) AS dev
  FROM base b JOIN med m USING (event_type)),
r2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             ORDER BY dev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM devs),
mad AS (
  SELECT event_type,
         CAST((SUM(dev) * 2) // COUNT(*) AS BIGINT) AS mad4
  FROM r2 WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
  GROUP BY event_type)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(d.med2) AS DOUBLE) / CAST(2000 AS DOUBLE)
         AS median_value,
       CAST(MIN(ma.mad4) AS DOUBLE) / CAST(4000 AS DOUBLE)
         AS mad_value,
       CAST(SUM(CASE WHEN d.dev * 20000 > 44478 * ma.mad4
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM devs d JOIN mad ma USING (event_type)
GROUP BY d.event_type ORDER BY d.event_type
"""


QUERIES = {
    "q35_asof_join": q35_asof_join,
    "q170_robust_outliers": q170_robust_outliers,
    "q36_range_join": q36_range_join,
    "q97_scd2_intervals": q97_scd2_intervals,
    "q129_funnel_conversion": q129_funnel_conversion,
    "q130_time_range_window": q130_time_range_window,
    "q147_user_ewma": q147_user_ewma,
    "q151_gap_fill": q151_gap_fill,
    "q156_cohort_retention": q156_cohort_retention,
    "q158_rolling_mau": q158_rolling_mau,
    "q160_event_transitions": q160_event_transitions,
    "q162_hourly_anomalies": q162_hourly_anomalies,
    "q163_session_paths": q163_session_paths,
}

ORACLES = {
    "q35_asof_join": _Q35_ORACLE,
    "q170_robust_outliers": _Q170_ORACLE,
    "q36_range_join": _Q36_ORACLE,
    "q97_scd2_intervals": _Q97_ORACLE,
    "q129_funnel_conversion": _Q129_ORACLE,
    "q130_time_range_window": _Q130_ORACLE,
    "q147_user_ewma": _Q147_ORACLE,
    "q151_gap_fill": _Q151_ORACLE,
    "q156_cohort_retention": _Q156_ORACLE,
    "q158_rolling_mau": _Q158_ORACLE,
    "q160_event_transitions": _Q160_ORACLE,
    "q162_hourly_anomalies": _Q162_ORACLE,
    "q163_session_paths": _Q163_ORACLE,
}
