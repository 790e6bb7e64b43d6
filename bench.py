"""Headline benchmark: runs the flagship query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion (collect) and timed wall-clock; a
warmup pass on sf's smallest table primes the JVM so the numbers measure
the plans, not session startup.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The headline set: one per operator family (agg, join-heavy, window,
#: sessionize, dedup, LSH, ANN, text) — the queries a 100 TB pipeline
#: actually spends its time in.
#:
#: Ordering note: the vector/ANN family runs FIRST. Its statically
#: unrolled 64-term dot-product chains are the queries most sensitive
#: to JVM code-cache pressure (each later query adds unique codegen
#: classes; once the cache fills, JIT output degrades and the chains
#: fall back toward the interpreter — measured 2-5x run-to-run swings
#: when they ran late in the session). Running them against a fresh
#: cache measures the plans, not the JVM's memory state.
#:
#: Comparability contract: the set HAS changed across rounds (r6 added
#: q73/q74; r7 added q85/q87/q88/q96/q100 and made per-query numbers
#: median-of-3; r8 added the remaining families — q89/q97/q99/q101 and
#: the new q102–q111; r9 added q121/q124–q126/q129–q160, moved the streaming
#: family early, and left q127 untimed by design — see the inline
#: notes; r11 added q166-q170; r12 added q179-q180), so headline_total is only comparable between runs whose
#: ``query_set`` identity (count + sha256 of the sorted names, emitted
#: in the JSON) matches; for cross-round deltas use
#: ``tools/bench_compare.py``, which diffs the shared subset only.
HEADLINE = (
    "q61_ann_bruteforce",
    "q65_ann_ivf",
    "q88_ann_pq_adc",
    "q103_ann_recall",
    "q137_hybrid_retrieval",
    "q66_embedding_neardup_lsh",
    "q67_kmeans",
    # streaming family second: state-store queries showed the same
    # late-session code-cache sensitivity as the ANN chains (q96
    # measured 6s early/55s late pre-fix) — time them while the JIT
    # is still fully warm, not after 40 codegen-heavy queries
    "q90_stream_tumbling",
    "q96_stream_stream_join",
    "q121_stream_approx_distinct",
    "q138_stream_classify",
    "q144_stream_heavy_hitters",
    "q145_stream_keyed_upsert",
    "q167_stream_jdbc_sink",  # r11: stream -> JDBC warehouse load
    "q164_stream_fingerprint",
    "q52_lsh_pairs",
    "q55_dedup_pipeline",
    "q56_dup_groups",
    "q50_dedup_exact",
    "q104_span_dedup",
    "q107_span_scrub",
    "q74_incremental_dedup",
    "q57_decontaminate",
    "q73_decontaminate_bloom",
    "q87_corpus_pipeline",
    "q59_tfidf_topterms",
    "q85_bm25_topk",
    "q40_token_stats",
    "q102_bpe_tokenize",
    "q111_bpe_train",
    "q48_sequence_packing",
    "q108_bpe_packing",
    "q01_pricing_summary",
    "q03_top_unshipped",
    "q05_regional_revenue",
    "q06_revenue_delta",
    "q09_agg_stats",
    "q112_order_priority",
    "q113_priority_shipping",
    "q114_promo_revenue",
    "q115_top_supplier",
    "q116_parts_supplier_relation",
    "q117_disjunctive_revenue",
    "q124_big_order_customers",
    "q125_nation_trade_volume",
    "q126_part_value_share",
    "q132_market_share",
    "q133_nation_profit",
    "q134_returned_revenue",
    "q135_order_count_distribution",
    "q89_sketch_rollup",
    "q118_cms_heavy_hitters",
    "q119_bpe_lang_compression",
    "q136_nb_langid",
    "q120_histogram_quantiles",
    "q97_scd2_intervals",
    "q99_snapshot_audit",
    "q139_incremental_rollup",
    "q166_jdbc_roundtrip",  # r11: executing JDBC connector roundtrip
    "q175_jdbc_incremental_pull",  # r11: watermark-poll JDBC source
    "q176_optimize_audit",  # r11: OPTIMIZE ZORDER retrofit gate
    "q177_incremental_sync_audit",  # r11: warehouse->keyed-table sync
    "q178_epoch_shuffle",  # r11: deterministic training-order shuffle
    "q179_jdbc_retry_exactly_once",  # r12: fault-injected retry write
    "q180_commit_protocol_audit",
    "q181_orphan_reclaim_audit",
    "q182_txn_replay_audit",
    "q183_cdc_apply_audit",
    "q184_stream_cdc_apply",
    "q185_replication_audit",    # r12: CAS commit log invariants
    "q186_rebucket_audit",       # r13: online rebucket lifecycle
    "q189_objectstore_lifecycle",  # r14: lifecycle over signed HTTP S3
    "q190_ranged_read_audit",    # r15: ranged projection + rg pruning
    "q191_datasource_pushdown_audit",  # r15: Catalyst-inferred pushdown
    "q187_ivf_append_audit",     # r13: incremental IVF maintenance
    "q188_dedup_keep_best",      # r13: quality-aware dup-group pick
    "q168_kanon_export",    # r11: k-anonymity suppression export
    "q169_matryoshka_recall",  # r11: truncated-embedding recall gate
    "q170_robust_outliers",    # r11: exact median/MAD robust bands
    "q171_zorder_layout",      # r11: Z-order file-skip layout audit
    "q172_pagerank",           # r11: scaled-integer iterative PageRank
    "q173_cooccurrence_lift",  # r11: market-basket co-occurrence
    "q174_ngram_novelty",      # r11: per-source corpus novelty
    "q101_small_quantity_revenue",
    "q105_min_cost_supplier",
    "q106_dominant_supplier",
    "q109_idle_customers",
    "q110_key_skew_profile",
    "q100_blocking_supplier",
    "q13_window_topk",
    "q16_sessionize",
    "q34_events_tumbling",
    "q35_asof_join",
    "q36_range_join",
    "q129_funnel_conversion",
    "q130_time_range_window",
    "q131_entity_index_audit",
    "q140_training_shards",
    "q141_semdedup",
    "q142_cdc_chunking",
    "q143_fuzzy_match",
    "q146_dsir_reweight",
    "q147_user_ewma",
    "q148_lsh_recall",
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
    "q159_table_fingerprint",
    "q160_event_transitions",
    "q161_weighted_sample",
    "q162_hourly_anomalies",
    "q163_session_paths",
    "q165_composition_audit",
    # q127 (left-outer variant of q96) is deliberately NOT timed: its
    # sentinel-watermark determinism device doubles the drain with
    # no-data flush batches, so its wall-clock measures the test
    # harness, not the join; q96 times the family's state machinery.
)


def _noop(df) -> None:
    """Evaluate the full plan into the no-op sink (no driver transfer)."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from dataflowtemplates_spark.queries import all_queries
    from dataflowtemplates_spark.session import build_session

    spark = build_session("bench")
    qs = all_queries()

    # Warmup, all off the clock: a thrown-away full query primes JVM/
    # codegen/parquet footers (so the first timed number measures the
    # plan, not session startup), and a trivial mapInPandas spins up
    # the Arrow Python worker pool the ANN/top-k stages reuse.
    from dataflowtemplates_spark.catalog import register_tables
    register_tables(spark, SF_DIR)
    _noop(qs["q06_revenue_delta"](spark, SF_DIR))
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    # Median-of-N per query: this host carries external load with 2-5x
    # run-to-run swings on identical code (measured r4-r6), so a single
    # sample cannot distinguish a plan regression from noise. The
    # median of 3 consecutive runs is robust to one load spike; the
    # raw samples ship in "runs" so any comparison can reconstruct the
    # spread. N=1 (SPARK_GRAFT_BENCH_REPEATS=1) restores the old
    # single-shot behavior.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        samples: list[float] = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            try:
                df = qs[name](spark, SF_DIR)
                # noop sink: the FULL plan runs (projections, windows,
                # sort) — df.count() would let Catalyst prune
                # everything but the count
                _noop(df)
            except Exception as exc:  # one bad query must not zero the bench
                errors[name] = f"{type(exc).__name__}: {exc}"[:400]
                print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
                break
            samples.append(round(time.perf_counter() - t0, 3))
        if name in errors:
            continue
        runs[name] = samples
        timings[name] = round(statistics.median(samples), 3)
        print(f"# {name}: median {timings[name]:.2f}s of "
              f"{[f'{s:.2f}' for s in samples]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    import hashlib
    set_id = hashlib.sha256(
        "\n".join(sorted(HEADLINE)).encode()).hexdigest()[:16]
    out = {
        "metric": "headline_total",
        # identity of the query set this total was measured over —
        # totals are only comparable when these match
        "query_set": {"n": len(HEADLINE), "sha256": set_id},
        # a partially-failed run must never read as a speedup: with any
        # error the headline value is null and valid=false, so consumers
        # comparing `value` across rounds can't mistake a crash for a win
        "value": total if not errors else None,
        "unit": "sec",
        # per-query MEDIAN of `repeats` runs; raw samples go to stderr
        # and BENCH_RUNS_local.json — NOT this line: the recording
        # harness keeps only the TAIL of long stdout lines (observed:
        # 2000 chars, which truncated the r7 record into an unparseable
        # fragment), so the canonical line must stay small. Compact
        # separators for the same reason.
        "repeats": repeats,
        "queries": timings,
        "sf": sf_val,
        "valid": not errors,
    }
    if errors:
        out["errors"] = errors
        out["n_failed"] = len(errors)
        out["partial_total"] = total
    line = json.dumps(out, separators=(",", ":"))
    # The artifact of record must not depend on captured-stdout tails
    # (the r12 driver record lost a third of per-query timings to a
    # 3375-char truncation): the FULL-name line is always written
    # to BENCH_LINE_local.json, and --json=PATH redirects it.
    json_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_LINE_local.json")
    for arg in sys.argv[1:]:
        if arg.startswith("--json="):
            json_path = arg.split("=", 1)[1]
    with open(json_path, "w") as fh:
        fh.write(line + "\n")
    # full raw samples, for spread reconstruction (side channel)
    detail = dict(out)
    detail["runs"] = runs
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_RUNS_local.json"), "w") as fh:
        json.dump(detail, fh)
    # The driver's stdout capture keeps only the TAIL (~2000 chars) of
    # combined output, so r13's 3466-char line lost its head and
    # recorded parsed:null. The stdout line therefore (a) compacts
    # query names to their unique qNN ids and (b) prints LAST with
    # nothing after it on either stream, so the complete object sits
    # inside the captured tail; full names live in the --json artifact.
    # bare qids are reserved for globally unique qNN prefixes: on a
    # collision EVERY collider keeps its full name (a first-wins rule
    # would leave the bare qid ambiguous to a decoder)
    from collections import Counter
    qid_counts = Counter(n.split("_", 1)[0] for n in timings)
    short: dict[str, float] = {}
    for name, v in timings.items():
        qid = name.split("_", 1)[0]
        short[qid if qid_counts[qid] == 1 else name] = v
    compact = dict(out)
    compact["queries"] = short
    cline = json.dumps(compact, separators=(",", ":"))
    print(f"# full line: {len(line)} chars -> {json_path}; "
          f"stdout line: {len(cline)} chars", file=sys.stderr)
    sys.stderr.flush()
    print(cline)
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
