"""Deterministic sampling and sequence-packing semantics
(queries/sampling.py): reproducibility of the hash-Bernoulli rule and
the greedy token-budget chunking invariants."""

from pyspark.sql import functions as F

from dataflowtemplates_spark.queries.sampling import (
    PACK_BUDGET,
    q47_hash_sample,
    q48_sequence_packing,
)

SF = "/root/testdata/sf0.001"


def test_hash_sample_is_reproducible_and_map_side(spark):
    a = q47_hash_sample(spark, SF).collect()
    b = q47_hash_sample(spark, SF).collect()
    assert a == b  # same seed → bit-identical sample
    # every kept key honors the threshold rule
    assert all(r.sample_key[:2] <= "19" for r in a)
    # kept_rank is dense 1..n per source
    by_src: dict[str, list[int]] = {}
    for r in a:
        by_src.setdefault(r.source, []).append(r.kept_rank)
    for ranks in by_src.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # the membership filter must reach the scan stage (map-side, no
    # pre-filter shuffle): survivors-only window means the plan's first
    # exchange consumes an already-filtered child
    plan = q47_hash_sample(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.index("Filter") > plan.index("Exchange") or \
        "Filter" in plan.split("Exchange")[-1]


def test_sequence_packing_budget_invariants(spark):
    rows = q48_sequence_packing(spark, SF).collect()
    assert rows, "packing produced no sequences"
    from dataflowtemplates_spark.catalog import register_tables
    register_tables(spark, SF)
    docs = (spark.table("documents")
            .select("doc_id", "source",
                    F.size(F.split("text", " ")).alias("n"))
            .collect())
    toks = {(d.source, d.doc_id): d.n for d in docs}
    # rebuild the greedy assignment independently and compare
    expect: dict[tuple, list] = {}
    for (src, doc), n in sorted(toks.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        running = expect.setdefault(src, [0, {}])  # [cum, seq->stats]
        seq_id = running[0] // PACK_BUDGET
        running[0] += n
        st = running[1].setdefault(seq_id, [0, 0])
        st[0] += 1
        st[1] += n
    for r in rows:
        st = expect[r.source][1][r.seq_id]
        assert (r.n_docs, r.seq_tokens) == tuple(st), (r.source, r.seq_id)
    # sequences within a source are contiguous in doc_id order
    for src in {r.source for r in rows}:
        seqs = sorted((r.seq_id, r.first_doc, r.last_doc)
                      for r in rows if r.source == src)
        for (s1, f1, l1), (s2, f2, l2) in zip(seqs, seqs[1:]):
            assert l1 < f2
