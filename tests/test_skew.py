"""Skew operators: salted exact distinct-count and salted join must be
bit-identical to their naive forms, with the salt spreading the
shuffle."""

from pyspark.sql import Row, functions as F

from dataflowtemplates_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)


def test_salted_distinct_equals_naive(spark):
    rows = [("hot", i % 97) for i in range(5000)]          # hot key
    rows += [("cold%d" % i, i) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, v long").repartition(8)
    got = {r["k"]: r["n_distinct"]
           for r in salted_distinct_count(df, ["k"], "v").collect()}
    want = {r["k"]: r["n"]
            for r in df.groupBy("k").agg(
                F.countDistinct("v").alias("n")).collect()}
    assert got == want
    assert got["hot"] == 97


def test_salted_distinct_plan_spreads_hot_key(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    plan = (salted_distinct_count(df, ["k"], "v")
            ._jdf.queryExecution().executedPlan().toString())
    # stage 1 shuffles on (k, _salt) — the spread; stage 2 on k alone
    assert "hashpartitioning(k" in plan and "_salt" in plan


def test_salted_join_equals_naive(spark):
    big = spark.createDataFrame(
        [Row(k=1, a=i) for i in range(500)] + [Row(k=2, a=-1)])
    small = spark.createDataFrame(
        [Row(k=1, b="one"), Row(k=2, b="two"), Row(k=3, b="three")])
    got = sorted((r.k, r.a, r.b)
                 for r in salted_join(big, small, "k", buckets=4).collect())
    want = sorted((r.k, r.a, r.b)
                  for r in big.join(small, "k").collect())
    assert got == want
    assert len(got) == 501


def test_salted_join_left_modes_equal_naive(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(200)] + [("lonely", 1)],
        "k string, v long").repartition(4)
    small = spark.createDataFrame(
        [("hot", "H"), ("other", "O")], "k string, tag string")
    for how in ("left", "left_semi"):
        got = sorted(tuple(r) for r in
                     salted_join(big, small, "k", buckets=4, how=how).collect())
        want = sorted(tuple(r) for r in big.join(small, "k", how).collect())
        assert got == want, how


def test_salted_join_rejects_replication_unsafe_modes(spark):
    import pytest

    big = spark.createDataFrame([("a", 1)], "k string, v long")
    small = spark.createDataFrame([("a", "x")], "k string, tag string")
    for how in ("right", "full", "outer", "full_outer", "left_anti", "cross"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(big, small, "k", how=how)
