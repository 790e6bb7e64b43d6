"""topk_per_key: two-phase correctness vs the naive window form, plus
plan-shape assertions that the scale defect it replaces (shuffling all
scored rows into n_keys partitions) stays gone.
"""

import pytest

from pyspark.sql import functions as F

from dataflowtemplates_spark.operators.topk import topk_per_key

SF_DIR = "/root/testdata/sf0.001"


def _scored(spark):
    rows = [
        # key, id, payload, score — includes an exact score tie (ids 3,4)
        ("a", 1, "x", 0.9), ("a", 2, "y", 0.7), ("a", 3, "z", 0.5),
        ("a", 4, "w", 0.5), ("a", 5, "v", 0.1),
        ("b", 9, "p", 0.3), ("b", 8, "q", 0.3), ("b", 7, "r", 0.95),
    ]
    return spark.createDataFrame(
        rows, "k string, cid long, tag string, score double").repartition(4)


def test_matches_naive_window_topk(spark):
    from pyspark.sql import Window as W
    df = _scored(spark)
    got = {(r["k"], r["rk"]): (r["cid"], r["tag"], r["score"])
           for r in topk_per_key(df, "k", "score", "cid", 3,
                                 payload=["tag"]).collect()}
    w = W.partitionBy("k").orderBy(F.desc("score"), F.asc("cid"))
    want = {(r["k"], r["rk"]): (r["cid"], r["tag"], r["score"])
            for r in df.withColumn("rk", F.row_number().over(w))
                       .filter(F.col("rk") <= 3).collect()}
    assert got == want
    # tie at score 0.5 broken by ascending id; tie at 0.3 likewise
    assert got[("a", 3)][0] == 3
    assert got[("b", 2)][0] == 8


def test_k_larger_than_group(spark):
    df = _scored(spark)
    out = topk_per_key(df, "k", "score", "cid", 50).collect()
    assert len(out) == 8  # every row survives, ranked densely
    assert {r["rk"] for r in out if r["k"] == "b"} == {1, 2, 3}


def test_plan_no_window_no_python_two_bounded_exchanges(spark):
    df = _scored(spark)
    plan = (topk_per_key(df, "k", "score", "cid", 3)
            ._jdf.queryExecution().executedPlan().toString())
    # the rank must NOT be a window over the key (that shuffles every
    # scored row into n_keys partitions)...
    assert "Window" not in plan
    # ...and nothing crosses into Python — both phases are JVM exprs
    assert "MapInPandas" not in plan
    assert "ArrowEval" not in plan
    assert "BatchEvalPython" not in plan
    # exactly two hash exchanges: the balanced (key, partition-id)
    # local top-k, then the bounded merge on key alone
    assert plan.count("Exchange hashpartitioning") == 2
    assert "_nondeterministic" in plan  # the spark_partition_id() grain


def test_ann_query_plans_are_python_free_below_topk(spark):
    from dataflowtemplates_spark.queries.similarity import (
        q61_ann_bruteforce, q65_ann_ivf)
    p61 = (q61_ann_bruteforce(spark, SF_DIR)
           ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in p61
    assert "MapInPandas" not in p61
    assert p61.count("Exchange hashpartitioning(q_id") == 2  # local + merge
    p65 = (q65_ann_ivf(spark, SF_DIR)
           ._jdf.queryExecution().executedPlan().toString())
    # cell assignment is map-only: no window, no 8x crossJoin expansion,
    # and — since the chunked-projection rewrite — no Python crossing
    assert "Window" not in p65
    assert "CartesianProduct" not in p65
    assert "MapInPandas" not in p65
    assert "ArrowEval" not in p65
    assert p65.count("Exchange hashpartitioning(q_id") == 2


def test_nan_scores_dropped_both_phases_agree(spark):
    rows = [("a", 1, 0.9), ("a", 2, float("nan")), ("a", 3, 0.5),
            ("b", 4, float("nan")), ("b", 5, float("nan"))]
    df = spark.createDataFrame(rows, "k string, cid long, score double") \
        .repartition(3)
    got = [(r["k"], r["rk"], r["cid"])
           for r in topk_per_key(df, "k", "score", "cid", 2)
           .orderBy("k", "rk").collect()]
    # NaN rows vanish; key b (all NaN) produces no output at all
    assert got == [("a", 1, 1), ("a", 2, 3)]


def test_string_ids_supported(spark):
    rows = [("q", "doc-b", 0.5), ("q", "doc-a", 0.5), ("q", "doc-c", 0.9)]
    df = spark.createDataFrame(rows, "k string, cid string, score double")
    got = [(r["rk"], r["cid"])
           for r in topk_per_key(df, "k", "score", "cid", 3)
           .orderBy("rk").collect()]
    # score desc, then id ASC tiebreak — works without numeric ids
    assert got == [(1, "doc-c"), (2, "doc-a"), (3, "doc-b")]


def test_non_numeric_score_raises(spark):
    df = spark.createDataFrame([("a", 1, "hi")],
                               "k string, cid long, score string")
    with pytest.raises(TypeError, match="must be numeric"):
        topk_per_key(df, "k", "score", "cid", 2)


def test_assign_cells_tiebreak_and_fanout(spark):
    from dataflowtemplates_spark.queries.similarity import (
        assign_cells, _chain_norm)
    # two identical seeds: cosine ties must resolve to the smaller id
    dim = 4
    codebook = [(3, [1.0] * dim), (1, [1.0] * dim), (7, [0.0] * dim + []),
                ]
    codebook[2] = (7, [-1.0] * dim)
    df = spark.createDataFrame(
        [(10, [1.0, 1.0, 1.0, 1.0]), (11, [-1.0, -1.0, -1.0, -1.0])],
        "c_id long, c_vec array<float>")
    df = df.withColumn("c_nrm", F.lit(2.0))
    one = {r["c_id"]: r["cell"]
           for r in assign_cells(df, "c_vec", "c_nrm", codebook, 1).collect()}
    assert one[10] == 1        # tie between seeds 1 and 3 -> smaller id
    assert one[11] == 7
    two = [(r["c_id"], r["cell"])
           for r in assign_cells(df, "c_vec", "c_nrm", codebook, 2).collect()]
    assert len(two) == 4       # nprobe=2 emits two rows per input
    assert (10, 1) in two and (10, 3) in two
