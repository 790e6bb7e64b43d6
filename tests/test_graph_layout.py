"""Semantic and plan-shape guards for the layout/graph query families
(q171-q174) — properties the bit-exact oracle sweep can't express:
the z-order pruning GRADIENT, PageRank mass conservation, lift-kernel
invariants, and novelty accounting identities.
"""

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {r["layout"] if "layout" in df.columns else None: r
            for r in df.collect()}


def test_q171_zorder_prunes_strictly_better(spark):
    """The point of the audit: shuffled layout scans ~all files, linear
    prunes one dimension, z-order prunes both — and every layout holds
    the same rows and finds the same matches."""
    from dataflowtemplates_spark.queries.layout import q171_zorder_layout
    out = {r["layout"]: r for r in q171_zorder_layout(spark, SF_DIR).collect()}
    sh, li, zo = out["1_shuffled"], out["2_linear"], out["3_zorder"]
    assert sh["rows_total"] == li["rows_total"] == zo["rows_total"]
    assert sh["rows_matching"] == li["rows_matching"] == zo["rows_matching"]
    assert zo["files_scanned"] < li["files_scanned"] < sh["files_scanned"]
    # no layout may scan fewer rows than actually match (skip soundness)
    for r in (sh, li, zo):
        assert r["rows_scanned"] >= r["rows_matching"] > 0


def test_q171_assignment_is_distributive(spark):
    """File assignment must be value-range math, not a global sort: no
    Window (row_number layout assignment would single-partition the
    fact rows), and the per-file stats aggregate must shuffle on the
    file id. The 1-row per-layout rollups over 64 stats rows DO
    single-partition — that's O(files), allowed."""
    from dataflowtemplates_spark.queries.layout import q171_zorder_layout
    plan = (q171_zorder_layout(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "hashpartitioning(fid" in plan


def test_q172_pagerank_mass_and_shape(spark):
    """Integer PageRank invariants: one rank per node; every rank at
    least the teleport floor; total mass <= PR_SCALE (truncating DIV
    only leaks mass, never creates it) and >= 90% of it (the leak is
    bounded by ~1 unit per integer division)."""
    from dataflowtemplates_spark.queries.graph import (
        PR_SCALE, q172_pagerank)
    rows = q172_pagerank(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 1
    total = sum(r["rank_scaled"] for r in rows)
    assert total <= PR_SCALE
    assert total >= int(PR_SCALE * 0.90)
    floor = (150_000_000_000 // n)
    assert all(r["rank_scaled"] >= floor for r in rows)


def test_q172_pagerank_deterministic_rerun(spark):
    """Scaled-integer arithmetic makes the iteration order-insensitive:
    two independent plan executions agree exactly."""
    from dataflowtemplates_spark.queries.graph import q172_pagerank
    a = [tuple(r) for r in q172_pagerank(spark, SF_DIR).collect()]
    b = [tuple(r) for r in q172_pagerank(spark, SF_DIR).collect()]
    assert a == b


def test_q173_lift_invariants(spark):
    """Co-occurrence can never exceed either marginal, and lift is the
    exact ratio of the reported integers."""
    from dataflowtemplates_spark.queries.graph import q173_cooccurrence_lift
    rows = q173_cooccurrence_lift(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 < r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] == (r["n_ab"] * r["n_users"]) / (r["n_a"] * r["n_b"])


def test_q174_novelty_accounting(spark):
    """Every distinct corpus trigram is novel in exactly ONE document,
    so the per-source novel counts must sum to the global distinct-
    trigram count; rates live in (0, 1]."""
    import pyspark.sql.functions as F

    from dataflowtemplates_spark.catalog import register_tables
    from dataflowtemplates_spark.queries.dedup import q174_ngram_novelty
    rows = q174_ngram_novelty(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_novel"] <= r["n_grams"]
        assert r["novelty_rate"] == r["n_novel"] / r["n_grams"]
    register_tables(spark, SF_DIR)
    n_distinct = (spark.table("documents").select(
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 2), "
            "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))")))
        .alias("gram")).select("gram").distinct().count())
    assert sum(r["n_novel"] for r in rows) == n_distinct


def test_pagerank_matches_pure_python_model_on_adversarial_graphs(spark):
    """The pagerank() operator must agree EXACTLY (scaled-integer
    arithmetic has one right answer) with an independent pure-Python
    implementation of the same update rule, on graphs chosen to hit
    the edge paths: dangling nodes, a cycle, a disconnected pair, and
    a hub. Three seeds of a random digraph plus the handcrafted one."""
    import random

    from dataflowtemplates_spark.queries.graph import (
        PR_SCALE, PR_TELEPORT, pagerank)

    def py_pagerank(edges, iterations=5):
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        n = len(nodes)
        out = {}
        for u, _ in edges:
            out[u] = out.get(u, 0) + 1
        r = {v: PR_SCALE // n for v in nodes}
        for _ in range(iterations):
            contrib = {v: 0 for v in nodes}
            for u, v in edges:
                contrib[v] += r[u] // out[u]
            dm = sum(r[v] for v in nodes if v not in out)
            r = {v: (PR_TELEPORT // n)
                 + ((85 * (contrib[v] + (dm // n))) // 100)
                 for v in nodes}
        return r

    graphs = [
        # handcrafted: hub a->{b,c,d}, cycle b->c->b, dangling d,
        # disconnected pair e->f (f dangling too)
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("c", "b"),
         ("e", "f")],
    ]
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        nodes = [f"n{i}" for i in range(12)]
        es = {(rng.choice(nodes), rng.choice(nodes)) for _ in range(25)}
        graphs.append(sorted((u, v) for u, v in es if u != v))

    for edges in graphs:
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["r"] for r in pagerank(df).collect()}
        assert got == py_pagerank(edges), f"mismatch on {edges[:4]}..."
