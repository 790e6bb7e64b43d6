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


def test_q105_joinback_reuses_part_key_exchange(spark):
    """The Q2-shaped argmin join-back's reason to exist over a window:
    the per-part MIN and the join back both key on the part key, so the
    physical plan must REUSE the supply aggregate's exchange (or its
    whole subtree) rather than re-shuffling — and no Window may appear."""
    from dataflowtemplates_spark.queries.relational import (
        q105_min_cost_supplier)
    df = q105_min_cost_supplier(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert ("ReusedExchange" in plan) or ("ReusedSubquery" in plan) or (
        plan.count("Scan parquet") <= 4), plan[:2000]


def test_q106_majority_predicate_no_window_no_cartesian(spark):
    from dataflowtemplates_spark.queries.relational import (
        q106_dominant_supplier)
    df = q106_dominant_supplier(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Cartesian" not in plan
    # the shipdate window must reach the lineitem scan
    assert "PushedFilters: [" in plan


def test_q110_topk_is_partial_not_global_sort(spark):
    """The heavy-hitter report must plan as TakeOrderedAndProject (a
    per-partition partial top-N + tiny merge), never a global Sort of
    the per-key table."""
    from dataflowtemplates_spark.queries.relational import (
        q110_key_skew_profile)
    df = q110_key_skew_profile(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_q104_anchor_cap_limits_join_input(spark):
    """Span dedup must filter anchors (the capped HAVING) BEFORE the
    join back to positions — the aggregate-filter-join order is what
    bounds the fan-out at scale."""
    from dataflowtemplates_spark.queries.dedup import q104_span_dedup
    df = q104_span_dedup(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the n_docs >= 2 / n_occ <= cap filter sits above an aggregate,
    # below the join: a Filter mentioning the agg outputs must exist
    assert "n_docs" in plan and "n_occ" in plan
    assert "Cartesian" not in plan


def test_q112_exists_plans_as_semi_join(spark):
    """The Q4-shaped EXISTS must lower to a LeftSemi join (each order
    counted once regardless of matching lines), never an inner join
    feeding a distinct."""
    from dataflowtemplates_spark.queries.relational import (
        q112_order_priority)
    df = q112_order_priority(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # the quarter window must reach the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q114_fact_never_shuffles(spark):
    """The promo-share join must build on the broadcast part dim: the
    lineitem fact flows scan -> broadcast join -> partial agg with no
    hash-partitioned exchange of fact rows (the only exchange is the
    1-partition merge of partial aggregates)."""
    from dataflowtemplates_spark.queries.relational import (
        q114_promo_revenue)
    df = q114_promo_revenue(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" not in plan


def test_q115_max_reuses_revenue_exchange(spark):
    """The join-back-on-max shape must compute the per-supplier revenue
    aggregate ONCE: the MAX side reuses the revenue exchange instead of
    re-scanning and re-shuffling the fact (the explicit isnotnull in
    the query exists to keep the two subtrees identical)."""
    from dataflowtemplates_spark.queries.relational import (
        q115_top_supplier)
    df = q115_top_supplier(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_q117_part_disjuncts_pushed_to_dim_scan(spark):
    """Q19's OR-of-conjuncts: the part-only predicate residue (brand +
    size conjuncts OR'd) must be extracted and pushed to the part scan,
    and the join must stay a single hash join on the extracted common
    key — no cartesian."""
    from dataflowtemplates_spark.queries.relational import (
        q117_disjunctive_revenue)
    df = q117_disjunctive_revenue(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    part_scans = [ln for ln in plan.splitlines()
                  if "part.parquet" in ln and "FileScan" in ln]
    assert part_scans
    assert all("EqualTo(p_brand,Brand#1)" in ln for ln in part_scans)


def test_q108_tokenization_runs_on_distinct_words(spark):
    """BPE packing must apply the merge fold to the DISTINCT word
    table, not the exploded corpus: the fold expression (aggregate
    over the merges literal) must sit above a distinct/aggregate of
    words, never directly on the posexploded stream."""
    from dataflowtemplates_spark.queries.sampling import q108_bpe_packing
    df = q108_bpe_packing(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    fold_lines = [ln for ln in plan.splitlines() if "aggregate([" in ln]
    assert fold_lines, "merge fold missing from optimized plan"
    # Catalyst collapses the distinct + fold into ONE per-word
    # Aggregate whose result expressions evaluate the fold — i.e. the
    # fold line IS the word-grouped aggregate, once per distinct word
    assert any("Aggregate [word" in ln for ln in fold_lines), fold_lines


def test_q136_scoring_is_map_only(spark):
    """NB scoring must be a pure projection over the test scan — the
    weight table rides as a literal map, so the executed plan carries
    NO join and only the final K x K confusion aggregate's exchange
    (plus AQE's read), and zero Python stages."""
    from dataflowtemplates_spark.queries.text import q136_nb_langid
    df = q136_nb_langid(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Python" not in plan
    # AQE's toString repeats the plan (initial + final); count the
    # final section only: confusion agg + 25-row result sort.
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") <= 2


def test_q136_prediction_covers_every_test_doc(spark):
    """Every held-out document classifies to exactly one in-domain
    lang (the fold's empty-token fallback still yields the prior
    argmax, never NULL)."""
    import pyspark.sql.functions as F
    from dataflowtemplates_spark.queries.text import NB_LANGS, q136_nb_langid
    from dataflowtemplates_spark.catalog import register_tables
    df = q136_nb_langid(spark, SF_DIR)
    rows = df.collect()
    assert all(r["pred_lang"] in NB_LANGS for r in rows)
    register_tables(spark, SF_DIR)
    n_test = (spark.table("documents")
              .filter(F.col("doc_id") % 5 == 0).count())
    assert sum(r["n_docs"] for r in rows) == n_test


def test_q137_rerank_joins_embeddings_by_broadcast(spark):
    """The dense re-rank must prune the embeddings scan with a
    BROADCAST join on the 50-key shortlist — a shuffle of the vector
    table to co-locate 50 keys would be the 100 TB scale-killer. The
    64-term cosine chain must also sit ABOVE that join (scored for
    survivors only), which the broadcast-hash-join plan guarantees."""
    from dataflowtemplates_spark.queries.similarity import (
        q137_hybrid_retrieval)
    df = q137_hybrid_retrieval(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    # no SortMergeJoin / ShuffledHashJoin anywhere in the final plan:
    # every join is either broadcast (shortlist, query row, df/stats
    # sides) or a tiny fused-rank join
    for ln in final.splitlines():
        assert "SortMergeJoin" not in ln and "ShuffledHashJoin" not in ln


def test_q140_single_scan_no_second_count_pass(spark):
    """The shard manifest derives the corpus total from the manifest
    itself (N-row window), not a second docs.count() scan — the plan
    must contain exactly ONE parquet scan of documents."""
    from dataflowtemplates_spark.queries.sampling import q140_training_shards
    plan = (q140_training_shards(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan parquet") == 1


def test_q142_chunker_is_map_only(spark):
    """The CDC chunker is one projected expression chain per document:
    no join, no Generate/explode, and no exchange other than the final
    presentation sort."""
    from dataflowtemplates_spark.queries.text import q142_cdc_chunking
    plan = (q142_cdc_chunking(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    assert "Generate" not in plan
    # rangepartitioning for the orderBy is the only exchange
    import re
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e == "rangepartitioning" for e in exchanges), exchanges


def test_q143_lev_runs_on_candidates_not_pairs(spark):
    """levenshtein must appear ABOVE the deletion-key equi-join (on
    candidates), and the join itself must be an equi-join — no
    cartesian/broadcast-nested-loop anywhere."""
    from dataflowtemplates_spark.queries.dedup import q143_fuzzy_match
    df = q143_fuzzy_match(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan


def test_q141_cap_filters_before_pair_join_no_cartesian(spark):
    """SemDeDup's pair stage must stay equi-joined (no cartesian, no
    nested-loop fallback) end to end. Since r12 the cap semi-join and
    the duplicate-collapsed pair join run behind eager localCheckpoints
    (the cosine-once optimization), so they are asserted on the
    UNCHECKPOINTED building blocks the query composes: over-cap cells
    excluded via broadcast LeftSemi BEFORE any pairing, and the group
    pair join an equi-join on cell."""
    from dataflowtemplates_spark.queries.similarity import (
        SEMDEDUP_K,
        SEMDEDUP_MAX_CLUSTER,
        _with_norm,
        assign_cells,
        kmeans_seeds,
        q141_semdedup,
    )
    from pyspark.sql import functions as F

    from dataflowtemplates_spark.catalog import register_tables
    df = q141_semdedup(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # the pre-checkpoint cap + pair shape, composed exactly as q141 does
    register_tables(spark, SF_DIR)
    emb = spark.table("embeddings")
    seeds = kmeans_seeds(emb, SEMDEDUP_K)
    vecs = _with_norm(emb, "vec_id", "v", "nrm")
    assigned = assign_cells(vecs, "v", "nrm", seeds, nprobe=1)
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    capped = sizes.filter(F.col("n") <= SEMDEDUP_MAX_CLUSTER)
    in_scope = assigned.join(
        F.broadcast(capped.select("cell")), "cell", "semi")
    g = (in_scope.groupBy("cell", "v", "nrm")
         .agg(F.min("vec_id").alias("gmin")))
    pair = g.alias("a").join(g.alias("b"), "cell")
    pplan = pair._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in pplan
    assert "CartesianProduct" not in pplan
    assert "BroadcastNestedLoopJoin" not in pplan


def test_q146_scoring_is_map_only_topk(spark):
    """DSIR scoring must be a pure projection (ratio table rides as a
    literal map — no join, no Python) and selection a global top-k
    (TakeOrderedAndProject, never a full Sort+Exchange of the scored
    corpus); the only window runs over the already-selected TOPK rows."""
    from dataflowtemplates_spark.queries.text import q146_dsir_reweight
    df = q146_dsir_reweight(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Python" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q152_threshold_join_is_broadcast(spark):
    """q152's per-source threshold table is O(sources) and must ride a
    broadcast join back onto the scores — a sort-merge join here would
    shuffle the corpus a second time."""
    from dataflowtemplates_spark.queries.text import (
        q152_adaptive_quality_filter)
    df = q152_adaptive_quality_filter(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_q153_band_join_is_broadcast(spark):
    """q153's per-label band table likewise broadcasts; the corpus of
    vectors never shuffles for the outlier comparison."""
    from dataflowtemplates_spark.queries.similarity import (
        q153_norm_outliers)
    df = q153_norm_outliers(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


def test_q159_fingerprint_has_no_data_shuffle(spark):
    """The fingerprint is a map-side hash + one all-combining
    aggregate per table: no Exchange carries data rows (the final
    single-partition exchanges move one partial-agg row per task)."""
    from dataflowtemplates_spark.queries.mutation_queries import (
        q159_table_fingerprint)
    plan = (q159_table_fingerprint(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    # no hashpartitioning of row-level data anywhere: every exchange
    # is the SinglePartition gather of already-aggregated partials
    # (plus the final orderBy's range partition over 3 rows)
    assert "hashpartitioning" not in plan


def test_q160_transitions_single_user_exchange(spark):
    """LEAD window and nothing else shuffles on user_id; the
    (from, to) count aggregate must ride map-side combine, adding
    only its own tiny key exchange."""
    from dataflowtemplates_spark.queries.temporal import (
        q160_event_transitions)
    plan = (q160_event_transitions(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("hashpartitioning(user_id") == 1


def test_q161_keep_rule_is_integer_and_prefilter(spark):
    """The weighted keep rule must stay in exact integer arithmetic
    (no doubles — the cross-engine determinism claim) and run as a
    filter, not a join against anything row-scaled."""
    from dataflowtemplates_spark.queries.sampling import (
        q161_weighted_sample)
    plan = (q161_weighted_sample(spark, SF_DIR)
            ._jdf.queryExecution().optimizedPlan().toString())
    # keep rule evaluated on bigint columns — no double cast of the
    # uniform or the weight anywhere in the optimized comparison
    assert "cast(u#" not in plan and "cast(w#" not in plan
    # the only join is the broadcast of the 1-row global max
    executed = (q161_weighted_sample(spark, SF_DIR)
                ._jdf.queryExecution().executedPlan().toString())
    assert executed.count("BroadcastNestedLoopJoin") == 1


def test_q163_paths_single_user_exchange(spark):
    """Sessionize (LAG + running sum) and the path render share ONE
    user_id exchange; only the final tiny path-count agg adds its
    own."""
    from dataflowtemplates_spark.queries.temporal import (
        q163_session_paths)
    plan = (q163_session_paths(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("hashpartitioning(user_id") <= 2
