"""Query registry: every operator surfaced as (spark, sf_dir) -> DataFrame.

Each submodule exports ``QUERIES`` (name -> callable) and ``ORACLES``
(name -> equivalent DuckDB SQL). ``__spark_entry__.py`` aggregates them
for the driver's correctness harness; ``bench.py`` runs the headline
subset.

Registry order is STATIC and lives entirely in this file
(``REGISTRY_ORDER``): importing the package never reads result
artifacts, environment state, or anything outside source control, so
``all_queries()`` is a pure function of the checkout. An external
harness that scores a fixed-size prefix therefore scores a set that is
(a) reviewable in the diff that changed it and (b) identical for every
clone of the same commit. The order is hand-maintained per development
cycle under two rules, in priority order:

1. Queries whose implementation or oracle changed since their last
   scored run come FIRST — a change must never ship unvalidated behind
   a previously-green score.
2. Then queries by staleness of their last driver score (oldest first),
   so a bounded prefix still sweeps the whole registry across rounds —
   but via explicit, committed edits, not runtime self-rotation.

Full-surface evidence for the queries beyond any prefix comes from
``tools/local_verify.py`` (bit-exact multiset comparison vs DuckDB),
whose machine-readable output is committed per round as
``LOCALVERIFY_r*.json``.

Determinism contract (why the decimal casts everywhere): floating-point
aggregation is order-dependent, and Spark/DuckDB will not sum a parquet
column in the same order. Every money/measure aggregate therefore casts
to an exact DECIMAL first (the data is 2-decimal currency — SURVEY.md
§7.4), aggregates exactly, and casts the final result to DOUBLE. Both
engines then produce bit-identical doubles, so the driver's value-hash
matches without tolerance.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataflowtemplates_spark.queries import (
    corpus_pipeline,
    dedup,
    entity_queries,
    generator_queries,
    graph,
    layout,
    multimodal_queries,
    mutation_queries,
    relational,
    sampling,
    similarity,
    streaming_queries,
    temporal,
    text,
)

_MODULES = (dedup, similarity, generator_queries, multimodal_queries,
            mutation_queries, streaming_queries, sampling, text, temporal,
            relational, corpus_pipeline, entity_queries, layout, graph)

#: The committed registry order. Edited by hand each development cycle
#: per the module-docstring rules; ``tests/test_registry.py`` pins that
#: it covers exactly the registered query set with no duplicates.
REGISTRY_ORDER = (
    # -- changed in the r15 OPTIMIZATION pass: restructured for
    #    performance with oracle-identical output (percentile array
    #    fusion q120/q38; one-pass probe aggregation q73; edge-list
    #    materialization q172; scan spread q174; fused per-step
    #    replication probes q185; fused audit close q186) — re-score
    #    first ----
    "q185_replication_audit",
    "q186_rebucket_audit",
    "q120_histogram_quantiles",
    "q38_percentiles",
    "q73_decontaminate_bloom",
    "q172_pagerank",
    "q174_ngram_novelty",
    # -- changed this cycle (r15): must be inside any scored prefix ----
    # the KeyedTable commit path gained the deterministic part-slicing
    # total order, the read path gained ranged-GET column projection
    # and executor-distributed snapshot listing, and q189's signing
    # module grew the GOOG4 flavor — the storage-engine family
    # re-scores again this round; q190/q191 are NEW (ranged-read
    # economics + Catalyst-inferred DataSource pushdown, both over
    # live signed HTTP)
    "q191_datasource_pushdown_audit",
    "q190_ranged_read_audit",
    "q189_objectstore_lifecycle",
    "q183_cdc_apply_audit",
    "q184_stream_cdc_apply",
    "q78_mutation_audit",
    "q99_snapshot_audit",
    "q122_vacuum_audit",
    "q128_change_data_feed",
    "q139_incremental_rollup",
    "q145_stream_keyed_upsert",
    "q159_table_fingerprint",
    "q171_zorder_layout",
    "q176_optimize_audit",
    "q177_incremental_sync_audit",
    "q180_commit_protocol_audit",
    "q181_orphan_reclaim_audit",
    "q182_txn_replay_audit",
    # -- stalest driver evidence (r11/r12-scored middle), fronted per
    #    the rotation rule: the ANN/pipeline block ... ------------
    "q65_ann_ivf",
    "q66_embedding_neardup_lsh",
    "q67_kmeans",
    "q68_bpe_pairs",
    "q69_ngram_containment",
    "q70_generator_rows",
    "q71_generator_profile",
    "q72_embedding_quantize",
    "q74_incremental_dedup",
    "q75_stratified_split",
    "q76_charlm_coverage",
    "q77_embedding_dup_groups",
    #    ... and the multimodal/streaming block ------------------
    "q80_media_metadata",
    "q81_frame_sample",
    "q82_media_features",
    "q83_media_resize",
    "q84_chunk_overlap",
    "q85_bm25_topk",
    "q86_source_mixture",
    "q87_corpus_pipeline",
    "q88_ann_pq_adc",
    "q89_sketch_rollup",
    "q90_stream_tumbling",
    "q91_stream_sessionize",
    "q92_stream_dedup",
    "q93_stream_user_stats",
    "q94_stream_enrich",
    "q95_stream_neardup_candidates",
    "q96_stream_stream_join",
    "q97_scd2_intervals",
    "q98_stream_corpus_scrub",
    # -- remainder: prior committed order, fronted names removed ----
    "q54_simhash",
    "q55_dedup_pipeline",
    "q56_dup_groups",
    "q57_decontaminate",
    "q58_repetition_stats",
    "q59_tfidf_topterms",
    "q60_vector_norms",
    "q61_ann_bruteforce",
    "q62_ann_lsh_bucketed",
    "q63_embedding_neardup",
    "q64_label_centroids",
    "q142_cdc_chunking",
    "q143_fuzzy_match",
    "q144_stream_heavy_hitters",
    "q146_dsir_reweight",
    "q147_user_ewma",
    "q149_export_roundtrip",
    "q150_grouped_regression",
    "q151_gap_fill",
    "q152_adaptive_quality_filter",
    "q153_norm_outliers",
    "q154_unpivot",
    "q155_set_ops_all",
    "q156_cohort_retention",
    "q157_fk_integrity",
    "q158_rolling_mau",
    "q160_event_transitions",
    "q161_weighted_sample",
    "q162_hourly_anomalies",
    "q163_session_paths",
    "q164_stream_fingerprint",
    "q165_composition_audit",
    "q187_ivf_append_audit",
    "q188_dedup_keep_best",
    "q141_semdedup",
    "q100_blocking_supplier",
    "q101_small_quantity_revenue",
    "q102_bpe_tokenize",
    "q103_ann_recall",
    "q104_span_dedup",
    "q107_span_scrub",
    "q108_bpe_packing",
    "q109_idle_customers",
    "q110_key_skew_profile",
    "q111_bpe_train",
    "q112_order_priority",
    "q113_priority_shipping",
    "q114_promo_revenue",
    "q115_top_supplier",
    "q117_disjunctive_revenue",
    "q118_cms_heavy_hitters",
    "q119_bpe_lang_compression",
    "q121_stream_approx_distinct",
    "q105_min_cost_supplier",
    "q106_dominant_supplier",
    "q39_approx_sketches",
    "q40_token_stats",
    "q41_lang_id",
    "q42_quality_score",
    "q43_fingerprint",
    "q44_source_profile",
    "q45_corpus_filter",
    "q46_text_normalize",
    "q47_hash_sample",
    "q48_sequence_packing",
    "q49_domain_cap",
    "q50_dedup_exact",
    "q51_minhash_signature",
    "q52_lsh_pairs",
    "q53_ngram_jaccard",
    "q148_lsh_recall",
    "q179_jdbc_retry_exactly_once",
    "q175_jdbc_incremental_pull",
    "q166_jdbc_roundtrip",
    "q167_stream_jdbc_sink",
    "q123_png_roundtrip",
    "q18_union_splitter",
    "q19_pivot",
    "q20_string_funcs",
    "q21_date_funcs",
    "q22_math_funcs",
    "q23_scalar_subquery",
    "q24_in_subquery",
    "q25_having_filter",
    "q26_distinct",
    "q29_window_ranks",
    "q31_collect_sorted",
    "q32_exists_correlated",
    "q33_top_customer_per_nation",
    "q34_events_tumbling",
    "q35_asof_join",
    "q36_range_join",
    "q37_salted_distinct",
    "q79_pii_redact",
    "q140_training_shards",
    "q124_big_order_customers",
    "q125_nation_trade_volume",
    "q126_part_value_share",
    "q127_stream_outer_attribution",
    "q129_funnel_conversion",
    "q130_time_range_window",
    "q131_entity_index_audit",
    "q132_market_share",
    "q133_nation_profit",
    "q134_returned_revenue",
    "q135_order_count_distribution",
    "q136_nb_langid",
    "q137_hybrid_retrieval",
    "q138_stream_classify",
    "q116_parts_supplier_relation",
    "q173_cooccurrence_lift",
    "q178_epoch_shuffle",
    "q168_kanon_export",
    "q169_matryoshka_recall",
    "q170_robust_outliers",
    "q01_pricing_summary",
    "q03_top_unshipped",
    "q05_regional_revenue",
    "q06_revenue_delta",
    "q07_left_join",
    "q08_semi_anti",
    "q09_agg_stats",
    "q10_grouping_analytics",
    "q13_window_topk",
    "q14_window_running",
    "q15_window_lag",
    "q16_sessionize",
    "q17_set_ops",
)


def _registered() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = _registered()
    if set(out) != set(REGISTRY_ORDER):
        missing = set(out) - set(REGISTRY_ORDER)
        extra = set(REGISTRY_ORDER) - set(out)
        raise ValueError(
            f"REGISTRY_ORDER out of sync: missing={sorted(missing)} "
            f"extra={sorted(extra)}")
    return {name: out[name] for name in REGISTRY_ORDER}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
