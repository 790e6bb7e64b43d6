"""Plan-shape guards for scale behavior that correctness sweeps can't
see: broadcast pins must stay off tables that grow with scale factor.
"""

SF_DIR = "/root/testdata/sf0.001"


def test_q03_no_broadcast_pin_at_all(spark):
    from dataflowtemplates_spark.queries.relational import q03_top_unshipped
    analyzed = (q03_top_unshipped(spark, SF_DIR)
                ._jdf.queryExecution().analyzed().toString())
    # customer grows with SF — strategy must be left to AQE/size
    assert "ResolvedHint" not in analyzed


def test_q05_broadcast_pins_only_bounded_dims(spark):
    from dataflowtemplates_spark.queries.relational import q05_regional_revenue
    analyzed = (q05_regional_revenue(spark, SF_DIR)
                ._jdf.queryExecution().analyzed().toString())
    # exactly two pins: nation (25 rows) and region (5 rows)
    assert analyzed.count("ResolvedHint") == 2


def test_merged_scalar_queries_keep_filter_pushdown(spark):
    """q20/q21 absorbed hash/epoch families; their key-range filters
    must still reach the parquet scan."""
    from dataflowtemplates_spark.queries.relational import (
        q20_string_funcs, q21_date_funcs)
    for fn in (q20_string_funcs, q21_date_funcs):
        plan = (fn(spark, SF_DIR)
                ._jdf.queryExecution().executedPlan().toString())
        assert "PushedFilters: [" in plan
        # a populated pushdown list, not the empty "[]"
        pushed = plan.split("PushedFilters: [", 1)[1]
        assert not pushed.startswith("]")


def test_q10_grouping_variants_each_single_expand(spark):
    """rollup/cube/grouping-sets each lower to ONE Expand + hash
    aggregate — the union must not multiply scans per variant."""
    from dataflowtemplates_spark.queries.relational import (
        q10_grouping_analytics)
    plan = (q10_grouping_analytics(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Expand") == 3  # one per variant, none extra


def test_q64_explodes_sliced_array_only(spark):
    """The centroid explode must generate 8 rows per vector (slice
    below the Generate), not 64 rows filtered after the fact."""
    from dataflowtemplates_spark.queries.similarity import (
        q64_label_centroids)
    plan = (q64_label_centroids(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    gen = plan.split("Generate posexplode", 1)[1][:120]
    assert "slice" in gen
