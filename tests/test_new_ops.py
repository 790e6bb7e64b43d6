"""Plan-shape and semantic guards for the round-2 corpus-balancing /
tokenizer-training operators (q49, q58, q59, q67, q68).

The oracle sweep proves values; these tests pin the SCALE properties:
rank pushdown on quota sampling, broadcast-only joins on bounded vocab
tables, no vector-table shuffle in the k-means loop, and partial top-N
(TakeOrderedAndProject) instead of a global sort for the BPE counts.
"""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _executed(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_q49_rank_limit_pushdown(spark):
    from dataflowtemplates_spark.queries.sampling import (
        CAP_PER_SOURCE, q49_domain_cap)
    df = q49_domain_cap(spark, SF_DIR)
    plan = _executed(df)
    # row_number() <= K must compile to WindowGroupLimit: the partial
    # top-k that drops to K-per-source-per-partition BEFORE the shuffle
    assert "WindowGroupLimit" in plan
    counts = (df.groupBy("source").count().collect())
    assert counts and all(r["count"] <= CAP_PER_SOURCE for r in counts)


def test_q58_dup_fractions_map_side(spark):
    from dataflowtemplates_spark.queries.text import q58_repetition_stats
    df = q58_repetition_stats(spark, SF_DIR)
    plan = _executed(df)
    # repetition fractions come from array_distinct projections, not a
    # per-doc window
    assert "Window" not in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_bigram_frac"] <= 1.0
        assert 0.0 <= r["top_bigram_frac"] <= 1.0
        assert r["n_distinct_bigrams"] <= r["n_bigrams"]


def test_q59_vocab_joins_are_broadcast(spark):
    from dataflowtemplates_spark.queries.text import TFIDF_K, q59_tfidf_topterms
    df = q59_tfidf_topterms(spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # both small sides (per-term df, corpus count) are pinned broadcast —
    # a vocabulary is bounded at any corpus size
    assert analyzed.count("ResolvedHint") == 2
    plan = _executed(df)
    assert "WindowGroupLimit" in plan  # rank filter pushes partial top-k
    per_doc = df.groupBy("doc_id").count().collect()
    assert all(r["count"] <= TFIDF_K for r in per_doc)


def test_q67_kmeans_no_vector_shuffle(spark):
    from dataflowtemplates_spark.queries.similarity import (
        KMEANS_K, kmeans_seeds, q67_kmeans)
    df = q67_kmeans(spark, SF_DIR)
    plan = _executed(df)
    # assignment is map-only off the checkpointed table; the only join
    # is the K-row centroid broadcast; no hash shuffle of the vectors
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") == 1
    rows = df.collect()
    # cell ids are the hash-sampled seed vec_ids (r11 seeding), all K
    # of them populated after both assignment passes
    seed_ids = {sid for sid, _ in
                kmeans_seeds(spark.table("embeddings"), KMEANS_K)}
    assert len(seed_ids) == KMEANS_K
    assert {r["cell_init"] for r in rows} == seed_ids
    assert {r["cell_final"] for r in rows} == seed_ids
    assert all(-1.0 <= r["cosine_final"] <= 1.0 for r in rows)


def test_q68_partial_topn_not_global_sort(spark):
    from dataflowtemplates_spark.queries.text import BPE_TOP, q68_bpe_pairs
    df = q68_bpe_pairs(spark, SF_DIR)
    plan = _executed(df)
    # orderBy+limit must stay TakeOrderedAndProject (per-partition
    # partial top-N + tiny merge), never a rangepartitioning sort of
    # the full pair table
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    rows = df.collect()
    assert len(rows) == BPE_TOP
    assert all(len(r["pair"]) == 2 for r in rows)
    totals = [r["total_count"] for r in rows]
    assert totals == sorted(totals, reverse=True)
