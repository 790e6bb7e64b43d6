"""Edge semantics of the as-of join composition (temporal.asof_join).

The oracle sweep covers the bulk data path; these pin the corner cases
a hash-compare can silently get lucky on: inclusive tie handling, rows
with no prior match, and per-key isolation.
"""

from datetime import datetime

from pyspark.sql import functions as F

from dataflowtemplates_spark.queries.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:05:00"), 9.9),
         (2, 10, _ts("2024-01-01T00:00:30"), 1.1),
         (3, 20, _ts("2024-01-01T00:10:00"), 2.2)],
        "event_id long, user_id long, ts timestamp, purchase_value double")
    right = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01T00:01:00"), 5.0),
         (101, 10, _ts("2024-01-01T00:04:00"), 6.0),
         (102, 30, _ts("2024-01-01T00:00:00"), 7.0)],
        "event_id long, user_id long, ts timestamp, value double")
    out = {r["event_id"]: r for r in asof_join(
        left, right, on="user_id", ts="ts",
        right_cols={"event_id": "click_id", "value": "click_value"},
        tiebreak="event_id").collect()}
    assert out[1]["click_id"] == 101          # latest prior click wins
    assert out[2]["click_id"] is None         # purchase before any click
    assert out[3]["click_id"] is None         # other user's clicks invisible


def test_asof_tie_is_inclusive_and_deterministic(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:05:00"), 9.9)],
        "event_id long, user_id long, ts timestamp, purchase_value double")
    right = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01T00:05:00"), 5.0),
         (101, 10, _ts("2024-01-01T00:05:00"), 6.0)],
        "event_id long, user_id long, ts timestamp, value double")
    row = asof_join(
        left, right, on="user_id", ts="ts",
        right_cols={"event_id": "click_id", "value": "click_value"},
        tiebreak="event_id").collect()[0]
    # equal-ts right rows are visible (inclusive as-of); among them the
    # highest tiebreak value is the "latest" and wins deterministically
    assert row["click_id"] == 101
    assert row["click_value"] == 6.0


def test_asof_plan_has_single_shuffle(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:05:00"), 9.9)],
        "event_id long, user_id long, ts timestamp, purchase_value double")
    right = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01T00:01:00"), 5.0)],
        "event_id long, user_id long, ts timestamp, value double")
    plan = asof_join(
        left, right, on="user_id", ts="ts",
        right_cols={"event_id": "click_id"},
        tiebreak="event_id")._jdf.queryExecution().executedPlan().toString()
    # union + window: exactly one exchange (by user_id), no join operator
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
