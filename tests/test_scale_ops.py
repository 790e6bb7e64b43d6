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


def test_q66_hot_bucket_cap_parity_with_oracle(spark, tmp_path):
    """q66's bucket cap must drop the SAME hot bucket on both engines —
    exercised with a binding cap on synthetic vectors (test-SF buckets
    never reach Q66_MAX_BUCKET, so the driver gate can't prove this)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflowtemplates_spark.queries.similarity import (
        _Q66_ORACLE, Q66_MAX_BUCKET, q66_embedding_neardup_lsh)

    # hot bucket: 30 near-identical all-positive vectors (bucket 1111);
    # small bucket: 2 near-dups with dim 1 negative (bucket 0111)
    def vec(seed, flip_first):
        v = [1.0 + 0.001 * seed * ((i % 7) + 1) for i in range(64)]
        if flip_first:
            v[0] = -v[0]
        return [float(x) for x in v]

    rows = [(i, "hot", vec(i, False)) for i in range(30)]
    rows += [(100, "cold", vec(1, True)), (101, "cold", vec(2, True))]
    table = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "label": pa.array([r[1] for r in rows], pa.string()),
        "embedding": pa.array([r[2] for r in rows], pa.list_(pa.float32())),
    })
    sf_dir = str(tmp_path / "sfq66")
    import os
    os.makedirs(sf_dir)
    pq.write_table(table, os.path.join(sf_dir, "embeddings.parquet"))

    got = sorted((r["id_a"], r["id_b"]) for r in q66_embedding_neardup_lsh(
        spark, sf_dir, max_bucket_size=20).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = sorted(
        (r[0], r[1]) for r in con.execute(_Q66_ORACLE.replace(
            f"COUNT(*) <= {Q66_MAX_BUCKET}", "COUNT(*) <= 20")).fetchall())
    assert got == want
    assert got == [(100, 101)]  # hot bucket dropped on BOTH engines


def test_ivf_append_equals_full_rebuild(spark, tmp_path):
    """Incremental index maintenance: appending a batch under a FROZEN
    codebook must yield an index identical to a from-scratch build over
    the union — same inverted-list rows, same search results."""
    from dataflowtemplates_spark.catalog import register_tables
    from dataflowtemplates_spark.operators.ivf import (
        append_ivf_index, build_ivf_index, search_ivf_index)
    register_tables(spark, SF)
    emb = spark.table("embeddings")
    codebook = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
                    .select("vec_id", "embedding").collect())
    base = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") % 3 != 0))
    incr = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") % 3 == 0))

    p_incr = str(tmp_path / "ivf_incr")
    build_ivf_index(base, codebook, p_incr)
    append_ivf_index(incr, codebook, p_incr)
    p_full = str(tmp_path / "ivf_full")
    build_ivf_index(emb.filter(F.col("vec_id") >= 20), codebook, p_full)

    def rows(p):
        return sorted((r["c_id"], r["cell"]) for r in
                      spark.read.parquet(p).select("c_id", "cell").collect())
    assert rows(p_incr) == rows(p_full)

    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 12))
    a = sorted(map(tuple, search_ivf_index(
        spark, p_incr, queries, codebook, k=3, nprobe=2).collect()))
    b = sorted(map(tuple, search_ivf_index(
        spark, p_full, queries, codebook, k=3, nprobe=2).collect()))
    assert a == b
