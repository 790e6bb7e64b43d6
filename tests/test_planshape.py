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
