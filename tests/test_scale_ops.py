"""Scale-layout operators: bucketed co-located joins (no runtime
exchange) and the persisted IVF index (partition-pruned probes)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    from dataflowtemplates_spark.catalog import register_tables
    from dataflowtemplates_spark.operators.bucketing import (
        bucketed_join_ready, write_bucketed)
    register_tables(spark, SF)
    try:
        write_bucketed(spark.table("orders"), "b_orders",
                       ["o_orderkey"], 8, sort_cols=["o_orderkey"])
        write_bucketed(spark.table("lineitem"), "b_lineitem",
                       ["l_orderkey"], 8, sort_cols=["l_orderkey"])
        assert bucketed_join_ready(spark, "b_orders", "b_lineitem")
        # at sf0.001 the planner would just broadcast the tiny side;
        # disable that to expose the co-located path a fact-fact join
        # takes at real scale
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (spark.table("b_lineitem")
                      .join(spark.table("b_orders"),
                            F.col("l_orderkey") == F.col("o_orderkey"))
                      .select("l_orderkey", "o_orderdate", "l_quantity"))
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located: the shuffle happened at WRITE time, not now
            assert "Exchange" not in plan
            assert "SortMergeJoin" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # correctness: same row count as the plain shuffle join
        plain = (spark.table("lineitem")
                 .join(spark.table("orders"),
                       F.col("l_orderkey") == F.col("o_orderkey")))
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ivf_index_prunes_partitions(spark, tmp_path):
    from dataflowtemplates_spark.catalog import register_tables
    from dataflowtemplates_spark.operators.ivf import (
        build_ivf_index, search_ivf_index)
    register_tables(spark, SF)
    emb = spark.table("embeddings")
    codebook = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
                    .select("vec_id", "embedding").collect())
    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") >= 20), codebook, path)
    import os
    cells_on_disk = {d for d in os.listdir(path) if d.startswith("cell=")}
    assert len(cells_on_disk) > 2  # multiple inverted lists exist
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 10))
    out = search_ivf_index(spark, path, queries, codebook, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the cell predicate lands in PartitionFilters: unprobed inverted
    # lists are pruned at the scan, not filtered after reading
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1)[1][:200]
    rows = out.collect()
    assert {r["rk"] for r in rows} <= {1, 2, 3}
    assert len({r["q_id"] for r in rows}) == 2
