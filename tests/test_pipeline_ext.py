"""Semantic + plan-shape guards for the round-7 pipeline operators:
PII redaction (q79), context-window chunking (q84), BM25 retrieval
(q85), temperature mixture sampling (q86), and the stream-stream
attribution join (q96).

The oracle sweep (tools/local_verify.py) proves bit-exact values;
these tests pin invariants and the scale-relevant plan shapes: the
scrubbing/chunking passes must be map-only, BM25's small sides must be
broadcast with a partial top-k (never a global sort), and the mixture
filter must not shuffle the corpus.
"""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _executed(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_q79_redaction_counts_and_negative_control(spark):
    from dataflowtemplates_spark.queries.text import q79_pii_redact
    df = q79_pii_redact(spark, SF_DIR)
    plan = _executed(df)
    # scrubbing is a map-only scan: no join, no aggregate, no window —
    # the only exchange is the presentation sort
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") <= 1
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows
    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").collect()}
    import hashlib
    for doc_id, r in rows.items():
        assert r["n_emails"] == (1 if doc_id % 3 == 0 else 0)
        assert r["n_ips"] == (1 if doc_id % 5 == 0 else 0)
        if doc_id % 3 and doc_id % 5:
            # negative control: untouched text, hash of the original
            assert r["n_chars_removed"] == 0
            assert r["redacted_hash"] == hashlib.md5(
                docs[doc_id].encode()).hexdigest()


def test_q84_chunk_cover_and_overlap_invariants(spark):
    from dataflowtemplates_spark.queries.text import (
        CHUNK_STRIDE, CHUNK_TOKENS, q84_chunk_overlap)
    df = q84_chunk_overlap(spark, SF_DIR)
    plan = _executed(df)
    assert "Join" not in plan and "Window" not in plan
    n_tokens = {r["doc_id"]: r["n"] for r in
                spark.read.parquet(f"{SF_DIR}/documents.parquet")
                .select("doc_id",
                        F.size(F.split("text", " ")).alias("n")).collect()}
    by_doc: dict[int, list] = {}
    for r in df.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tokens)
    for doc_id, chunks in by_doc.items():
        n = n_tokens[doc_id]
        idxs = sorted(c["chunk_index"] for c in chunks)
        # chunk starts tile [0, n) with the given stride — full cover
        assert idxs == list(range((n - 1) // CHUNK_STRIDE + 1))
        for c in chunks:
            st = c["chunk_index"] * CHUNK_STRIDE
            assert c["n_chunk_tokens"] == min(CHUNK_TOKENS, n - st)


def test_q85_bm25_broadcast_and_partial_topk(spark):
    from dataflowtemplates_spark.queries.text import (
        BM25_TERMS, BM25_TOPK, q85_bm25_topk)
    df = q85_bm25_topk(spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # df-per-term and corpus stats are pinned broadcast sides
    assert analyzed.count("ResolvedHint") == 2
    plan = _executed(df)
    # global top-k must be a partial per-partition top-k + tiny merge
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= BM25_TOPK
    scores = [r["score_total"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r["n_terms_matched"] <= len(BM25_TERMS) for r in rows)
    assert all(s > 0 for s in scores)


def test_q86_mixture_rates_and_map_side_filter(spark):
    from dataflowtemplates_spark.queries.sampling import q86_source_mixture
    df = q86_source_mixture(spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # per-lang rates join back to the corpus broadcast — the corpus
    # itself never shuffles for membership
    assert analyzed.count("ResolvedHint") >= 1
    rows = df.collect()
    assert rows
    min_n = min(r["n_docs"] for r in rows)
    for r in rows:
        assert 0.0 < r["rate"] <= 1.0
        assert 0 <= r["n_kept"] <= r["n_docs"]
        if r["n_docs"] == min_n:
            # the rarest language is kept in full (rate exactly 1.0)
            assert r["rate"] == 1.0 and r["n_kept"] == r["n_docs"]


def test_q87_funnel_monotone_and_single_window(spark):
    from dataflowtemplates_spark.queries.corpus_pipeline import (
        q87_corpus_pipeline)
    df = q87_corpus_pipeline(spark, SF_DIR)
    plan = _executed(df)
    # the whole composed pipeline is: scan -> map-side tags -> ONE
    # window shuffle (dedup rank) -> one agg shuffle -> final sort
    assert plan.count("Window") == 1
    assert plan.count("Exchange") <= 3
    rows = df.collect()
    assert rows
    for r in rows:
        assert (r["n_input"] >= r["n_quality"] >= r["n_canonical"]
                >= r["n_sampled"] >= 0)
    # every stage must actually fire somewhere in the corpus
    assert sum(r["n_input"] for r in rows) > sum(
        r["n_quality"] for r in rows)
    assert sum(r["n_quality"] for r in rows) > sum(
        r["n_canonical"] for r in rows)
    assert sum(r["n_canonical"] for r in rows) > sum(
        r["n_sampled"] for r in rows)


def test_q88_pq_adc_shapes_and_recall(spark):
    from dataflowtemplates_spark.queries.similarity import (
        PQ_TOPK, q88_ann_pq_adc)
    df = q88_ann_pq_adc(spark, SF_DIR)
    plan = _executed(df)
    # the pair phase must touch CODES only: no window (two-phase topk),
    # queries/shortlist/query-vectors all broadcast
    assert "Window" not in plan
    assert plan.count("BroadcastExchange") >= 3
    rows = df.collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert by_q
    for q_id, rs in by_q.items():
        assert [r["rk"] for r in sorted(rs, key=lambda r: r["rk"])] \
            == list(range(1, len(rs) + 1))
        assert len(rs) <= PQ_TOPK
        ex = [r["exact_l2sq"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert ex == sorted(ex)
        assert all(r["exact_l2sq"] >= 0 and r["approx_l2sq"] >= 0
                   for r in rs)
    # ADC recall sanity: the re-ranked top-1 must be a genuinely close
    # neighbor — its exact distance can't exceed the shortlist's worst
    for rs in by_q.values():
        ranked = sorted(rs, key=lambda r: r["rk"])
        assert ranked[0]["exact_l2sq"] <= ranked[-1]["exact_l2sq"]


def test_q89_sketch_rollup_bounds_hold(spark):
    from dataflowtemplates_spark.queries.relational import q89_sketch_rollup
    rows = q89_sketch_rollup(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["groups_within_bound"] and r["union_within_bound"] \
        and r["direct_within_bound"]
    assert r["n_groups"] >= 1 and r["exact_users"] >= 1


def test_q97_scd2_interval_invariants(spark):
    from dataflowtemplates_spark.queries.temporal import q97_scd2_intervals
    df = q97_scd2_intervals(spark, SF_DIR)
    plan = _executed(df)
    assert "Join" not in plan  # lead(), never a from-to self-join
    by_user: dict[int, list] = {}
    for r in df.collect():
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["seq"])
        # intervals tile the user's history: each valid_to = next
        # valid_from; exactly one open (current) interval, at the end
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["dwell_us"] >= 0 and not a["is_current"]
        assert rs[-1]["is_current"] and rs[-1]["valid_to"] is None


def test_q98_stream_scrub_agrees_with_batch_funnel(spark):
    """Stream/batch unification: the streaming scrub's per-source
    (n_input, n_quality) must equal the batch funnel's first two
    stages — same expressions, two execution engines."""
    from dataflowtemplates_spark.queries.corpus_pipeline import (
        q87_corpus_pipeline)
    from dataflowtemplates_spark.queries.streaming_queries import (
        q98_stream_corpus_scrub)
    stream = {r["source"]: (r["n_input"], r["n_quality"])
              for r in q98_stream_corpus_scrub(spark, SF_DIR).collect()}
    batch = {r["source"]: (r["n_input"], r["n_quality"])
             for r in q87_corpus_pipeline(spark, SF_DIR).collect()}
    assert stream == batch and stream


def test_q96_stream_join_equals_batch_join(spark):
    from dataflowtemplates_spark.queries.streaming_queries import (
        q96_stream_stream_join)
    got = sorted(
        tuple(r) for r in q96_stream_stream_join(spark, SF_DIR).collect())
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("ts").alias("vts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
    want = sorted(
        tuple(r) for r in
        v.join(p, (F.col("user_id") == F.col("pu"))
               & (F.col("pts") >= F.col("vts"))
               & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")))
        .select("view_id", "purchase_id", "user_id",
                # the batch read yields TIMESTAMP_NTZ (session parity
                # config); unix_micros needs TIMESTAMP — UTC-locked, so
                # the cast is a pure reinterpretation
                (F.expr("unix_micros(CAST(pts AS TIMESTAMP))")
                 - F.expr("unix_micros(CAST(vts AS TIMESTAMP))"))
                .alias("gap_us"))
        .collect())
    assert got == want and want
    assert all(0 <= g <= 3_600_000_000 for *_, g in got)


def _write_docs_fixture(spark, sf_dir, texts):
    """Minimal documents.parquet a query + its oracle can both read."""
    import os

    os.makedirs(sf_dir)
    rows = [(i, t, "en", "fixt", len(t)) for i, t in enumerate(texts)]
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars int")
     .coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet")))


def _oracle_on_fixture(sf_dir, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')")
    return con.execute(sql).fetchall()


def test_q102_handles_quotes_backslashes_and_empty_words(spark, tmp_path):
    """The merge literals travel as Spark SQL string literals; a corpus
    whose hot pairs contain quotes or backslashes exercises the
    escaping path the shipped testdata never does, and double spaces
    exercise the empty-word filter. Gate: Spark == DuckDB oracle on
    the fixture, same as the sweep."""
    from dataflowtemplates_spark.queries.text import (
        _Q102_ORACLE, q102_bpe_tokenize)

    sf_dir = str(tmp_path / "sfq102")
    # ''ll / \\\\o / o' pairs dominate; double spaces make empty words
    _write_docs_fixture(spark, sf_dir, [
        "it'll  we'll he'll", "o\\o o\\o  o\\o", "a''a a''a", "x"])
    got = [tuple(r) for r in q102_bpe_tokenize(spark, sf_dir)
           .collect()]
    want = [tuple(r) for r in _oracle_on_fixture(sf_dir, _Q102_ORACLE)]
    assert got == want
    toks = {t[1] for t in got}
    assert "'l" in toks or "ll" in toks  # a quote-bearing merge applied


def test_q104_q107_span_semantics_on_crafted_corpus(spark, tmp_path):
    """Hand-computable span fixture: docs 0 and 1 share one 6-word
    run (two overlapping 5-shingles -> ONE merged span of 6 words);
    doc 2 shares nothing. q104 must emit exactly the two merged spans
    and q107 must remove exactly those words."""
    from dataflowtemplates_spark.queries.dedup import (
        q104_span_dedup, q107_span_scrub)

    sf_dir = str(tmp_path / "sfq104")
    shared = "the quick brown fox jumps high"          # 6 shared words
    _write_docs_fixture(spark, sf_dir, [
        f"{shared} alpha beta gamma",                  # span at pos 1..6
        f"prefix words {shared} tail",                 # span at pos 3..8
        "totally different content here now ok",
    ])
    spans = [(r["doc_id"], r["span_start"], r["span_end"],
              r["span_len"], r["n_anchors"])
             for r in q104_span_dedup(spark, sf_dir).collect()]
    assert spans == [(0, 1, 6, 6, 2), (1, 3, 8, 6, 2)]

    scrub = {r["doc_id"]: (r["n_words"], r["n_removed"], r["n_kept"])
             for r in q107_span_scrub(spark, sf_dir).collect()}
    assert scrub[0] == (9, 6, 3)
    assert scrub[1] == (9, 6, 3)
    assert scrub[2] == (6, 0, 6)
    # the kept words are exactly the non-shared ones, order preserved
    import hashlib
    fp = {r["doc_id"]: r["cleaned_fp"]
          for r in q107_span_scrub(spark, sf_dir).collect()}
    assert fp[0] == hashlib.md5(b"alpha beta gamma").hexdigest()
    assert fp[1] == hashlib.md5(b"prefix words tail").hexdigest()


def test_q151_spine_is_dense_and_fill_is_locf(spark):
    """The gap-fill contract: per event_type every hour between its
    observed min and max appears EXACTLY once; empty hours carry n=0;
    carried_avg is non-null from the first observed hour on and equals
    the last observed hour's average (LOCF, no interpolation)."""
    from dataflowtemplates_spark.queries.temporal import q151_gap_fill
    rows = q151_gap_fill(spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for et, rs in by_type.items():
        hours = [r["hour"] for r in rs]
        assert hours == sorted(hours)
        assert len(set(hours)) == len(hours)
        # dense: count matches span in hours
        span = int((hours[-1] - hours[0]).total_seconds() // 3600) + 1
        assert len(hours) == span, (et, len(hours), span)
        # first row is an observed hour by construction (min bound)
        assert rs[0]["n"] > 0 and rs[0]["carried_avg"] is not None
        last_avg = None
        for r in rs:
            if r["n"] > 0:
                last_avg = r["carried_avg"]
            else:
                assert r["carried_avg"] == last_avg  # LOCF copies bits
