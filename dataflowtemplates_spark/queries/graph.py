"""Graph queries: iterative link analysis and co-occurrence mining.

Two operator families the reference's relational surface cannot express
in one pass but a training-data/analytics engine needs:

- q172: fixed-iteration PageRank over a derived trade graph — the
  iterative-join pattern (rank state joined to the edge list K times).
  Spark expresses each iteration as ONE shuffle join + ONE aggregation,
  and the loop lives in the driver as plan construction (Catalyst sees
  K unrolled joins; AQE sizes each round's shuffle at runtime). All
  rank arithmetic is scaled-integer (rank * 10^12, truncating DIV), so
  iteration order and partial-sum order cannot perturb the result —
  the registry's bit-exact determinism contract extended to an
  iterative algorithm.
- q173: market-basket co-occurrence with lift — the "users who did X
  also did Y" kernel (item-item collaborative filtering / token
  co-occurrence statistics). Per-key distinct-set self-join, bounded
  by the per-key set size.

Reference anchors: the reference ships no graph operators; these are
part of the engine's §2-plus analytics surface (SURVEY.md §7.3 "custom
operators as compositions of DataFrame ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables

#: PageRank fixed-point scale: ranks are stored as rank * 10^12 BIGINTs.
PR_SCALE = 1_000_000_000_000
#: Teleport mass at d=0.85: (0.15 * PR_SCALE) as an exact integer.
PR_TELEPORT = 150_000_000_000
PR_ITERATIONS = 5


def q172_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaled-integer PageRank (d=0.85, 5 iterations) over the
    nation-level trade graph.

    Graph: a directed edge supplier-nation -> customer-nation exists
    when any lineitem shipped between them (self-loops excluded). Rank
    update per iteration, all BIGINT::

        contrib(v)  = SUM over in-edges (u,v) of  r(u) DIV outdeg(u)
        dangling    = SUM of r(u) over nodes with no out-edges
        r'(v)       = (PR_TELEPORT DIV n_nodes)
                      + (85 * (contrib(v) + dangling DIV n_nodes)) DIV 100

    Dangling mass is redistributed uniformly (the standard treatment),
    so total rank is conserved up to integer truncation (loss bounded
    by a few units per division, never compounding past ~n per round —
    pinned by ``tests/test_graph_layout.py``). Truncating integer
    division makes every iteration deterministic regardless of join
    order or partial-aggregation order — the float PageRank folklore
    problem (non-associative FP sums across partitions) is designed
    out rather than tolerated.

    100 TB: each iteration is one shuffle join of the edge list against
    the O(nodes) rank table + one groupBy(dst) — O(E) work per round
    with the rank side broadcastable while nodes << executors' memory;
    at web scale both sides hash-partition on the node key and the
    SAME partitioning is reused across iterations (no re-shuffle of
    edges: Catalyst reuses the exchange). Driver state is zero — the
    loop builds the plan, never the data.

    Iterative-lineage discipline: each round reads the rank table
    TWICE (contributions + dangling mass), so carrying the lazy plan
    forward doubles the subtree per iteration — 2^K recompute by K=5.
    The rank table is therefore ``localCheckpoint(eager=True)``-ed
    once per round (the GraphX/ALS pattern): lineage truncates to the
    materialized O(nodes) result, keeping every round O(E) flat. The
    DuckDB oracle needs the same discipline spelled ``AS MATERIALIZED``
    (its CTE inlining otherwise re-evaluates each round's subtree).
    """
    register_tables(spark, sf_dir)
    sup_nat = (spark.table("supplier").alias("s")
               .join(spark.table("nation").alias("sn"),
                     F.col("s.s_nationkey") == F.col("sn.n_nationkey"))
               .select(F.col("s.s_suppkey").alias("suppkey"),
                       F.col("sn.n_name").alias("src")))
    cust_nat = (spark.table("customer").alias("c")
                .join(spark.table("nation").alias("cn"),
                      F.col("c.c_nationkey") == F.col("cn.n_nationkey"))
                .select(F.col("c.c_custkey").alias("custkey"),
                        F.col("cn.n_name").alias("dst")))
    edges = (spark.table("lineitem")
             .join(spark.table("orders"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .join(F.broadcast(sup_nat),
                   F.col("l_suppkey") == F.col("suppkey"))
             .join(F.broadcast(cust_nat),
                   F.col("o_custkey") == F.col("custkey"))
             .select("src", "dst")
             .filter(F.col("src") != F.col("dst"))
             .distinct())

    return (pagerank(edges)
            .select(F.col("node").alias("nation"),
                    F.col("r").alias("rank_scaled"))
            .orderBy(F.desc("rank_scaled"), "nation"))


def pagerank(edges: DataFrame,
             iterations: int = PR_ITERATIONS) -> DataFrame:
    """The reusable operator behind q172: scaled-integer PageRank over
    a distinct (src, dst) edge DataFrame -> (node, r) with r at
    PR_SCALE fixed point. See q172's docstring for the update rule,
    determinism argument, and the per-round lineage-truncation
    rationale; `tests/test_graph_layout.py` pins it against an
    independent pure-Python model on adversarial graphs (dangling
    nodes, cycles, disconnected pieces)."""
    # Materialize the edge list once: every iteration's contribution
    # join re-reads ``edges``, and without truncation each per-round
    # eager checkpoint job would re-run the caller's whole edge
    # derivation (for q172: the lineitem-orders join + distinct) K+1
    # times. The distinct edge list is O(nodes^2) small — for the
    # nation graph, hundreds of rows — so one eager materialization
    # makes every round O(E) over an in-memory table (the same
    # GraphX-style discipline already applied to ``ranks`` below).
    edges = edges.localCheckpoint(eager=True)
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))

    ranks = (nodes.crossJoin(F.broadcast(nn))
             .select("node", "n",
                     F.expr(f"{PR_SCALE} DIV n").alias("r"))
             .localCheckpoint(eager=True))
    for _ in range(iterations):
        contrib = (edges
                   .join(ranks.select(F.col("node").alias("src"), "r"),
                         "src")
                   .join(F.broadcast(outdeg), "src")
                   .select("dst", F.expr("r DIV odeg").alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("s")))
        dangling = (ranks.join(
            F.broadcast(outdeg.select(F.col("src").alias("node"))),
            "node", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("dm")))
        ranks = (nodes.crossJoin(F.broadcast(nn))
                 .crossJoin(F.broadcast(dangling))
                 .join(contrib, F.col("node") == F.col("dst"), "left")
                 .select("node", "n",
                         F.expr(f"({PR_TELEPORT} DIV n) "
                                f"+ ((85 * (coalesce(s, 0) "
                                f"+ (dm DIV n))) DIV 100)")
                         .alias("r"))
                 .localCheckpoint(eager=True))
    return ranks.select("node", "r")


def _q172_oracle() -> str:
    its = []
    prev = "r0"
    for k in range(1, PR_ITERATIONS + 1):
        its.append(f"""
d{k} AS MATERIALIZED (
  SELECT CAST(COALESCE(SUM(p.r), 0) AS BIGINT) AS dm
  FROM {prev} p LEFT JOIN outdeg o ON o.src = p.node
  WHERE o.src IS NULL),
it{k} AS MATERIALIZED (
  SELECT nd.node,
         CAST(({PR_TELEPORT} // nn.n)
           + ((85 * (COALESCE(s.s, 0) + (d{k}.dm // nn.n))) // 100)
           AS BIGINT) AS r
  FROM nodes nd CROSS JOIN nn CROSS JOIN d{k}
  LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(p.r // o.odeg) AS BIGINT) AS s
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = nd.node)""")
        prev = f"it{k}"
    it_sql = ",".join(its)
    return f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT sn.n_name AS src, cn.n_name AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  WHERE sn.n_name <> cn.n_name),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
outdeg AS MATERIALIZED (
  SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src),
r0 AS MATERIALIZED (
  SELECT node, {PR_SCALE} // nn.n AS r FROM nodes CROSS JOIN nn),{it_sql}
SELECT node AS nation, r AS rank_scaled
FROM {prev}
ORDER BY rank_scaled DESC, nation
"""


def q173_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence with lift — the market-basket kernel.

    For every unordered pair of event types (a < b): the number of
    users who performed BOTH, each type's user count, and the lift
    ``P(a,b) / (P(a) * P(b)) = n_ab * n_users / (n_a * n_b)`` — >1
    means the behaviors attract, <1 they repel. The only float op is
    that final division of exact integers, identical in both engines.

    Scale shape: (user, type) distinct is one shuffle on user_id;
    the pair generation is a self-join WITHIN each user's type set,
    bounded by the type vocabulary (here 5; at open-vocabulary scale
    the per-key set is capped the way q52's hot buckets are), then one
    aggregation on the pair key. Item-item co-occurrence over
    billions of interactions is this exact plan with a cap.
    """
    register_tables(spark, sf_dir)
    ut = (spark.table("events")
          .select("user_id", "event_type").distinct())
    nu = ut.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users"))
    per_type = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                    & (F.col("a.event_type") < F.col("b.event_type")))
             .groupBy(F.col("a.event_type").alias("type_a"),
                      F.col("b.event_type").alias("type_b"))
             .agg(F.count(F.lit(1)).alias("n_ab")))
    na = per_type.select(F.col("event_type").alias("type_a"),
                         F.col("n_t").alias("n_a"))
    nb = per_type.select(F.col("event_type").alias("type_b"),
                         F.col("n_t").alias("n_b"))
    return (pairs.join(F.broadcast(na), "type_a")
            .join(F.broadcast(nb), "type_b")
            .crossJoin(F.broadcast(nu))
            .select("type_a", "type_b", "n_ab", "n_a", "n_b", "n_users",
                    ((F.col("n_ab") * F.col("n_users")).cast("double")
                     / (F.col("n_a") * F.col("n_b")).cast("double"))
                    .alias("lift"))
            .orderBy("type_a", "type_b"))


_Q173_ORACLE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
per_type AS (
  SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_ab
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT p.type_a, p.type_b, p.n_ab, na.n_t AS n_a, nb.n_t AS n_b,
       nu.n_users,
       CAST(p.n_ab * nu.n_users AS DOUBLE)
         / CAST(na.n_t * nb.n_t AS DOUBLE) AS lift
FROM pairs p
JOIN per_type na ON na.event_type = p.type_a
JOIN per_type nb ON nb.event_type = p.type_b
CROSS JOIN nu
ORDER BY p.type_a, p.type_b
"""


QUERIES = {
    "q172_pagerank": q172_pagerank,
    "q173_cooccurrence_lift": q173_cooccurrence_lift,
}

ORACLES = {
    "q172_pagerank": _q172_oracle(),
    "q173_cooccurrence_lift": _Q173_ORACLE,
}
