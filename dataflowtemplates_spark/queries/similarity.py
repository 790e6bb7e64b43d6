"""Similarity search over the `embeddings` table (array<float>, 64-dim).

The ANN toolkit for a training-data pipeline: brute-force cosine top-k
as the exact baseline (query side broadcast — the candidate scan stays
partition-local, no shuffle of the big side), a sign-bucket LSH variant
as the scale path (bucket join instead of cross join), plus vector
hygiene ops (norms, per-label centroids, near-dup pairs).

Plan-shape rule learned from measurement: keep the per-pair math inside
WholeStageCodegen. Spark's higher-order array functions
(aggregate/zip_with/transform) are INTERPRETED expressions — they run
outside codegen, cost ~100x a codegen'd arithmetic op, and (measured
here) degrade a further 10-20x in a long-lived JVM as their megamorphic
call sites defeat the JIT (2s fresh -> 30-60s after a mixed-query
session). The embedding dimension is fixed (64), so every dot product
and norm below is a STATICALLY UNROLLED left-associated chain of
element_at()*element_at() terms: fully codegen'd, JIT-stable, and
~10x faster per pair. Norms are per-ROW quantities and are projected
once per row on each join side (below the join, where CollapseProject
cannot inline them into the per-pair cosine).

Determinism contract: the unrolled chain is a fixed left-to-right
IEEE-754 double sequence; the DuckDB oracles spell out the identical
chain (float->double casts are exact, +,*,/ and sqrt are exactly
rounded), so both engines produce bit-identical doubles and the
driver's value hash matches with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables

#: Embedding dimensionality (the testdata contract; see TESTDATA.md).
DIM = 64


def _dot_sql(a: str, b: str, dim: int = DIM) -> str:
    """Statically unrolled left-fold dot product (Spark SQL text)."""
    return " + ".join(
        f"(cast(element_at({a}, {i}) as double) * cast(element_at({b}, {i}) as double))"
        for i in range(1, dim + 1))


def _norm_sql(a: str, dim: int = DIM) -> str:
    return "sqrt(" + " + ".join(
        f"(cast(element_at({a}, {i}) as double) * cast(element_at({a}, {i}) as double))"
        for i in range(1, dim + 1)) + ")"


def _dot_dd(a: str, b: str, dim: int = DIM) -> str:
    """The identical chain in DuckDB SQL (1-based list subscripts)."""
    return " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, dim + 1))


def _norm_dd(a: str, dim: int = DIM) -> str:
    return "sqrt(" + " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE))"
        for i in range(1, dim + 1)) + ")"


def dot_col(a: str, b: str) -> F.Column:
    return F.expr(_dot_sql(a, b))


def norm_col(a: str) -> F.Column:
    return F.expr(_norm_sql(a))


def q60_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector hygiene: dimension check, L2 norm, component peek."""
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    return (
        emb.select(
            "vec_id", "label",
            F.size("embedding").alias("dim"),
            norm_col("embedding").alias("l2_norm"),
            F.element_at("embedding", 1).cast("double").alias("c0"))
        .orderBy("vec_id")
    )


_Q60_ORACLE = f"""
SELECT vec_id, label,
       CAST(LEN(embedding) AS INTEGER) AS dim,
       {_norm_dd('embedding')} AS l2_norm,
       CAST(embedding[1] AS DOUBLE) AS c0
FROM embeddings ORDER BY vec_id
"""


def q153_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA: per-label L2-norm outlier detection — the
    pre-indexing hygiene pass that catches broken encoders (zero or
    exploding vectors) before they poison an ANN index or a cosine
    dedup threshold. A vector is an outlier when its norm falls
    outside mean +/- 2 sigma of its OWN label (per-group moments, not
    one global band — labels with legitimately different norm scales
    keep their own baseline).

    Exactness: the norm's squared-sum folds the unrolled per-dimension
    chain (q60's kernel); the norm is then FLOORED to integer
    micro-units so the per-label first/second moments are exact BIGINT
    sums (the q150 discipline — bigint->double converts identically
    everywhere, decimal->double does not), and the 2-sigma band is
    computed in double with one fixed op order; IEEE sqrt is exact.
    One map-only scoring pass + one per-label aggregate + a broadcast
    join of the O(labels) band table — the corpus never shuffles.
    """
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    nm = F.floor(norm_col("embedding") * F.lit(1e6)).cast("long")
    scored = emb.select("vec_id", "label", nm.alias("nm"))
    m = (scored.groupBy("label")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("nm").alias("s1"),
              F.sum(F.col("nm") * F.col("nm")).alias("s2")))
    n_d = F.col("n").cast("double")
    s1_d = F.col("s1").cast("double")
    s2_d = F.col("s2").cast("double")
    mean = s1_d / n_d
    # clamp: float rounding can push the variance operand slightly
    # NEGATIVE for a degenerate (all-equal-norm) label once the
    # moments round — Spark's sqrt would return NaN silently while
    # DuckDB RAISES on sqrt(negative), so both engines clamp to 0
    # (sd = 0 -> a zero-width band; deterministic either way)
    sd = F.sqrt(F.greatest(s2_d / n_d - (s1_d / n_d) * (s1_d / n_d),
                           F.lit(0.0)))
    bands = m.select("label", "n", mean.alias("mu"), sd.alias("sd"))
    joined = scored.join(F.broadcast(bands), "label")
    is_out = ((F.col("nm").cast("double") < F.col("mu")
               - F.lit(2.0) * F.col("sd"))
              | (F.col("nm").cast("double") > F.col("mu")
                 + F.lit(2.0) * F.col("sd")))
    return (joined.groupBy("label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
                 F.sum(is_out.cast("int")).cast("bigint")
                  .alias("n_outliers"),
                 (F.min("mu") / F.lit(1e6)).alias("mean_norm"),
                 (F.min("sd") / F.lit(1e6)).alias("sd_norm"))
            .orderBy("label"))


_Q153_ORACLE = f"""
WITH scored AS (
  SELECT vec_id, label,
         CAST(FLOOR({_norm_dd('embedding')} * 1e6) AS BIGINT) AS nm
  FROM embeddings),
m AS (
  SELECT label, COUNT(*) AS n,
         CAST(SUM(nm) AS BIGINT) AS s1,
         CAST(SUM(nm * nm) AS BIGINT) AS s2
  FROM scored GROUP BY label),
bands AS (
  SELECT label, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         SQRT(GREATEST(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)),
              CAST(0 AS DOUBLE))) AS sd
  FROM m)
SELECT s.label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(CASE WHEN CAST(s.nm AS DOUBLE) < b.mu - 2.0 * b.sd
                       OR CAST(s.nm AS DOUBLE) > b.mu + 2.0 * b.sd
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       MIN(b.mu) / 1e6 AS mean_norm,
       MIN(b.sd) / 1e6 AS sd_norm
FROM scored s JOIN bands b USING (label)
GROUP BY s.label ORDER BY s.label
"""


def _with_norm(df: DataFrame, id_alias: str, vec_alias: str, nrm_alias: str,
               extra: dict[str, str] | None = None,
               spread: bool = True) -> DataFrame:
    """id + raw vector + its L2 norm (+extras), repartitioned for
    compute balance when the source is a single small file. The norm is
    a per-row projection BELOW the join that consumes it — computed
    once per row, not once per pair. Pass ``spread=False`` for tiny
    query/seed sides that are about to be broadcast: fanning 5 rows
    into defaultParallelism partitions just buys scheduling overhead.
    """
    spark = df.sparkSession
    extra = extra or {}
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return (df.select(F.col("vec_id").alias(id_alias),
                      F.col("embedding").alias(vec_alias),
                      norm_col("embedding").alias(nrm_alias),
                      *[F.col(src).alias(dst) for src, dst in extra.items()]))


def _cosine(q_vec: str, c_vec: str, q_nrm: str, c_nrm: str) -> F.Column:
    """cosine = dot / (|q| * |c|) — one unrolled dot per pair, two
    per-row norms. Association is fixed and mirrored in the oracles."""
    return F.expr(f"({_dot_sql(q_vec, c_vec)}) / ({q_nrm} * {c_nrm})")


def _cosine_dd(q_vec: str, c_vec: str, q_nrm: str, c_nrm: str) -> str:
    return f"({_dot_dd(q_vec, c_vec)}) / ({q_nrm} * {c_nrm})"


def ann_bruteforce_topk(queries_df: DataFrame, candidates: DataFrame,
                        k: int = 5) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    candidate scan; rank per query with a deterministic tiebreak.

    At 100 TB the candidate side is the big table and never shuffles —
    each partition scores locally against the broadcast queries (one
    codegen'd dot chain per pair), and the two-phase ``topk_per_key``
    keeps the rank step shuffle-free too: only n_queries x k x
    n_partitions survivor rows reach the final merge (the window-based
    form shuffled EVERY scored pair into n_queries partitions).
    """
    from dataflowtemplates_spark.operators.topk import topk_per_key
    q = _with_norm(queries_df, "q_id", "q_vec", "q_nrm", spread=False)
    c = _with_norm(candidates, "c_id", "c_vec", "c_nrm", {"label": "c_label"})
    scored = (c.crossJoin(F.broadcast(q))
              .select("q_id", "c_id", "c_label",
                      _cosine("q_vec", "c_vec", "q_nrm", "c_nrm").alias("cosine")))
    return topk_per_key(scored, "q_id", "cosine", "c_id", k,
                        payload=["c_label"])


def q61_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    return (
        ann_bruteforce_topk(emb.filter(F.col("vec_id") < 5),
                            emb.filter(F.col("vec_id") >= 5), k=5)
        .select("q_id", "rk", "c_id", "c_label", "cosine")
        .orderBy("q_id", "rk")
    )


_Q61_ORACLE = f"""
WITH qn AS (
  SELECT vec_id AS q_id, embedding AS q_vec, {_norm_dd('embedding')} AS q_nrm
  FROM embeddings WHERE vec_id < 5),
cn AS (
  SELECT vec_id AS c_id, label AS c_label, embedding AS c_vec,
         {_norm_dd('embedding')} AS c_nrm
  FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q_id, c_id, c_label,
         {_cosine_dd('q_vec', 'c_vec', 'q_nrm', 'c_nrm')} AS cosine
  FROM cn CROSS JOIN qn),
ranked AS (
  SELECT q_id, c_id, c_label, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS INTEGER) AS rk
  FROM scored)
SELECT q_id, rk, c_id, c_label, cosine FROM ranked WHERE rk <= 5 ORDER BY q_id, rk
"""

#: Sign-bucket LSH dims (axis-aligned hyperplanes).
_LSH_DIMS = (1, 9, 17, 25)


def _bucket_col(vec: str) -> F.Column:
    bits = [F.when(F.element_at(vec, d) > 0, F.lit("1")).otherwise(F.lit("0"))
            for d in _LSH_DIMS]
    return F.concat(*bits)


def q62_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: bucket vectors by sign bits, equi-join on bucket,
    rank within bucket. The cross join becomes a hash join on the
    bucket key — candidate count drops 2^bits-fold.
    """
    from dataflowtemplates_spark.operators.topk import topk_per_key
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings").withColumn(
        "bucket", _bucket_col("embedding"))
    q = _with_norm(emb.filter(F.col("vec_id") < 5),
                   "q_id", "q_vec", "q_nrm", {"bucket": "bucket"},
                   spread=False)
    c = _with_norm(emb.filter(F.col("vec_id") >= 5),
                   "c_id", "c_vec", "c_nrm", {"bucket": "bucket"})
    scored = (c.join(F.broadcast(q), "bucket")
              .select("q_id", "c_id", "bucket",
                      _cosine("q_vec", "c_vec", "q_nrm", "c_nrm").alias("cosine")))
    return (topk_per_key(scored, "q_id", "cosine", "c_id", 3,
                         payload=["bucket"])
            .orderBy("q_id", "rk"))


def _bucket_dd(vec: str) -> str:
    return " || ".join(
        f"(CASE WHEN {vec}[{d}] > 0 THEN '1' ELSE '0' END)" for d in _LSH_DIMS)


_Q62_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec, {_norm_dd('embedding')} AS q_nrm,
         {_bucket_dd('embedding')} AS bucket
  FROM embeddings WHERE vec_id < 5),
c AS (
  SELECT vec_id AS c_id, embedding AS c_vec, {_norm_dd('embedding')} AS c_nrm,
         {_bucket_dd('embedding')} AS bucket
  FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q_id, c_id, q.bucket AS bucket,
         {_cosine_dd('q_vec', 'c_vec', 'q_nrm', 'c_nrm')} AS cosine
  FROM q JOIN c USING (bucket)),
ranked AS (
  SELECT q_id, c_id, bucket, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS INTEGER) AS rk
  FROM scored)
SELECT q_id, rk, c_id, bucket, cosine FROM ranked WHERE rk <= 3 ORDER BY q_id, rk
"""


def q63_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over a bounded window (the exact
    verifier; at scale it runs on q62's bucket candidates)."""
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings").filter(F.col("vec_id") < 120)
    a = _with_norm(emb, "id_a", "va", "na")
    b = _with_norm(emb, "id_b", "vb", "nb")
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                _cosine("va", "vb", "na", "nb").alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
        .orderBy("id_a", "id_b")
    )


_Q63_ORACLE = f"""
WITH un AS (
  SELECT vec_id, embedding AS uv, {_norm_dd('embedding')} AS nrm
  FROM embeddings WHERE vec_id < 120)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_cosine_dd('a.uv', 'b.uv', 'a.nrm', 'b.nrm')} AS cosine
FROM un a, un b
WHERE a.vec_id < b.vec_id
  AND {_cosine_dd('a.uv', 'b.uv', 'a.nrm', 'b.nrm')} >= 0.35
ORDER BY id_a, id_b
"""


#: Hot-bucket cap for q66's sign-bucket self-join. A degenerate bucket
#: (e.g. a boilerplate embedding cluster) makes the in-bucket pair count
#: quadratic — AQE's skew handling splits partitions but cannot reduce
#: the O(b^2) candidate count, so oversized buckets are dropped on BOTH
#: engines (the q66 oracle applies the identical HAVING cap). Sized so
#: it never binds at the test SFs (~125 rows/bucket at sf0.1) but kills
#: the quadratic blowup at corpus scale.
Q66_MAX_BUCKET = 2048

#: Adaptive exact-duplicate collapse gate (r13). The group-before-pair
#: plan in q66/q141 (one cosine per DISTINCT-vector group pair, member
#: pairs expanded afterwards) is the only plan that survives a
#: duplicate-heavy corpus — x15-56 at x10 duplication
#: (BENCH_SF1_DEDUP_r12.json) — but at distinct-ratio ~1 its extra
#: groupBy exchange + two-sided list explode costs ~1.6-2.3x for
#: nothing (the r12 q141 solo floor rose 3.6s -> 5.9s at sf0.1). The
#: two plans are OUTPUT-IDENTICAL (group members share the
#: representative's bit-exact cosine), so the choice is pure physics:
#: probe count vs approx_count_distinct(hash(vector)) and engage the
#: collapse only when duplication exceeds this ratio.
#: approx_count_distinct's default rsd is 5%, so the 1.25 floor sits
#: far above estimator noise — and a corpus below it gains little
#: from collapsing anyway.
DUP_COLLAPSE_MIN_RATIO = 1.25


def _dup_ratio_of(n: int, d: int) -> float:
    return (n / d) if d else 1.0


def _dup_ratio(df: DataFrame, vec_col: str) -> float:
    """Rows per distinct vector value — ONE map-side 1-row aggregate
    (HLL++ over a 32-bit vector hash; collisions only nudge the
    estimate, and the gate is a heuristic). The probe the adaptive
    exact-duplicate collapse rides when no existing materialization
    pass can carry it as an Observation."""
    r = df.agg(F.count(F.lit(1)).alias("n"),
               F.approx_count_distinct(F.hash(vec_col)).alias("d")).first()
    return _dup_ratio_of(int(r["n"]), int(r["d"]))


def q66_embedding_neardup_lsh(spark: SparkSession, sf_dir: str,
                              max_bucket_size: int | None = Q66_MAX_BUCKET,
                              drop_metrics=None) -> DataFrame:
    """Corpus-wide embedding near-dup pairs via sign-bucket LSH: the
    SCALE path for what q63 verifies on a bounded window. Both sides
    of the self-join are the full table, equi-joined on the 4-bit sign
    bucket — never an all-pairs cross join. At toy SF AQE broadcasts
    one side; at scale it is a shuffle join on bucket.

    Hot buckets are CAPPED before the join (same contract as
    ``lsh_candidate_pairs``): bucket size comes from a count-over-window
    on the bucket key, rows in buckets above ``max_bucket_size`` are
    dropped pre-join, and the oracle applies the identical HAVING cap,
    so the cap is declared semantics, not divergence. Pass a pyspark
    ``Observation`` as ``drop_metrics`` to count dropped rows on the
    same job. Plan cost of the cap: each join side needs a bucket-key
    exchange + sort for the sort-merge join anyway, and the
    count-over-window computes on exactly that exchange/sort — the cap
    adds no additional shuffle of the big side.

    EXACT-DUPLICATE COLLAPSE (r12, measured; ADAPTIVE since r13):
    when the duplication probe (see ``DUP_COLLAPSE_MIN_RATIO``) finds
    bit-identical vectors, they are grouped BEFORE pairing, one cosine
    runs per distinct-vector group pair, and member pairs are expanded
    afterwards by exploding the id lists — output-identical (members
    of a group share the representative's bit-exact cosine;
    within-group pairs score the same formula on (v, v)), but the
    dot-product work is quadratic in DISTINCT vectors instead of raw
    rows. Web-scale corpora are full of exact duplicates and this is
    the difference between a plan that survives them and one that
    melts: the x10-duplicated scaling corpus (tools/amplify_sf.py)
    measured 423s -> ~9s for the same pair output
    (BENCH_SF1_DEDUP_r12.json). At distinct-ratio ~1 the collapse's
    groupBy + explode stages cost ~2x for nothing, so a deduplicated
    corpus takes the direct per-row pair plan instead. Output SIZE
    still grows quadratically with duplication — that is the query's
    answer, not its work.
    """
    from pyspark.sql import Window as W
    register_tables(spark, sf_dir)
    raw = spark.table("embeddings")
    dup = _dup_ratio(raw, "embedding")
    emb = raw.withColumn("bucket", _bucket_col("embedding"))
    n = _with_norm(emb, "vid", "v", "nrm", {"bucket": "bucket"})
    n = n.withColumn("bs", F.count(F.lit(1)).over(W.partitionBy("bucket")))
    if drop_metrics is not None:
        dropped = (F.sum(F.when(F.col("bs") > max_bucket_size, 1).otherwise(0))
                   if max_bucket_size is not None else F.sum(F.lit(0)))
        n = n.observe(drop_metrics, dropped.alias("dropped_rows"))
    if max_bucket_size is not None:
        n = n.filter(F.col("bs") <= max_bucket_size)
    n = n.drop("bs")
    if dup < DUP_COLLAPSE_MIN_RATIO:
        # low duplication: pair rows directly — no group exchange,
        # no list explode (output-identical to the collapsed plan)
        a = n.select(F.col("vid").alias("id_a"), F.col("v").alias("va"),
                     F.col("nrm").alias("na"), "bucket")
        b = n.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"),
                     F.col("nrm").alias("nb"), "bucket")
        return (a.join(b, "bucket")
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b", "bucket",
                        _cosine("va", "vb", "na", "nb").alias("cosine"))
                .filter(F.col("cosine") >= 0.35)
                .orderBy("id_a", "id_b"))
    g = (n.groupBy("bucket", "v", "nrm")
         .agg(F.sort_array(F.collect_list("vid")).alias("ids"))
         .withColumn("gmin", F.element_at("ids", 1)))
    a = g.select("bucket", F.col("ids").alias("ids_a"),
                 F.col("gmin").alias("ga"),
                 F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = g.select("bucket", F.col("ids").alias("ids_b"),
                 F.col("gmin").alias("gb"),
                 F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    # (1) pairs across distinct-vector groups: ga < gb visits each
    # unordered group pair once; least/greatest restores per-member
    # id ordering (member ids of different groups interleave)
    cross = (a.join(b, "bucket")
             .filter(F.col("ga") < F.col("gb"))
             .withColumn("cosine", _cosine("va", "vb", "na", "nb"))
             .filter(F.col("cosine") >= 0.35)
             .select("bucket", "cosine",
                     F.explode("ids_a").alias("x"), "ids_b")
             .select("bucket", "cosine", "x",
                     F.explode("ids_b").alias("y"))
             .select(F.least("x", "y").alias("id_a"),
                     F.greatest("x", "y").alias("id_b"),
                     "bucket", "cosine"))
    # (2) pairs inside one duplicate group: the pairwise formula on
    # (v, v) — identical doubles to what member-level pairing computed
    within = (g.filter(F.size("ids") >= 2)
              .withColumn("cosine", _cosine("v", "v", "nrm", "nrm"))
              .filter(F.col("cosine") >= 0.35)
              .select("bucket", "cosine",
                      F.explode("ids").alias("x"), "ids")
              .select("bucket", "cosine", "x",
                      F.explode("ids").alias("y"))
              .filter(F.col("x") < F.col("y"))
              .select(F.col("x").alias("id_a"), F.col("y").alias("id_b"),
                      "bucket", "cosine"))
    return (cross.unionByName(within)
            .select("id_a", "id_b", "bucket", "cosine")
            .orderBy("id_a", "id_b"))


_Q66_ORACLE = f"""
WITH n AS (
  SELECT vec_id, embedding AS v, {_norm_dd('embedding')} AS nrm,
         {_bucket_dd('embedding')} AS bucket
  FROM embeddings),
kept AS (
  SELECT bucket FROM n GROUP BY bucket
  HAVING COUNT(*) <= {Q66_MAX_BUCKET}),
k AS (SELECT n.* FROM n JOIN kept USING (bucket))
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket AS bucket,
       {_cosine_dd('a.v', 'b.v', 'a.nrm', 'b.nrm')} AS cosine
FROM k a JOIN k b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_cosine_dd('a.v', 'b.v', 'a.nrm', 'b.nrm')} >= 0.35
ORDER BY id_a, id_b
"""


def q64_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components via posexplode + exact-decimal mean
    (float sums are order-dependent; DECIMAL(20,8) sums are not).

    The slice happens BEFORE the explode: posexplode of the full
    64-dim vector followed by ``pos < 8`` generates 8x the rows only
    to discard them — the filter cannot push through a Generate, so
    the projection must shrink the array instead."""
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    comp = emb.select(
        "label", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "val"))
    return (
        comp.groupBy("label", "pos")
        .agg((F.sum(F.col("val").cast("double").cast("decimal(20,8)")).cast("double")
              / F.count(F.lit(1))).alias("centroid"),
             F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("label", "pos")
    )


_Q64_ORACLE = """
WITH idx AS (SELECT UNNEST(GENERATE_SERIES(1, 8)) AS i),
comp AS (
  SELECT label, CAST(i - 1 AS INTEGER) AS pos,
         embedding[i] AS val
  FROM embeddings CROSS JOIN idx)
SELECT label, pos,
       CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*) AS centroid,
       COUNT(*) AS n_vectors
FROM comp
GROUP BY label, pos ORDER BY label, pos
"""


def _chain_norm(vals: list[float]) -> float:
    """Python mirror of _norm_sql's left-fold: exact IEEE-754 doubles,
    so the result equals what Spark/DuckDB compute for the same vector."""
    import math
    acc = vals[0] * vals[0]
    for x in vals[1:]:
        acc = acc + x * x
    return math.sqrt(acc)


def assign_cells(df: DataFrame, vec_col: str, nrm_col: str,
                 codebook: list[tuple[int, list[float]]],
                 nprobe: int = 1) -> DataFrame:
    """Nearest-cell assignment against a driver-side quantizer codebook:
    emits each input row ``nprobe`` times with a ``cell`` column (the
    ids of its nprobe nearest seeds by cosine, ties broken by smaller
    seed id).

    Plan shape: MAP-ONLY and PURE JVM — no join, no window, no shuffle
    of the big side (the window-over-c_id form this replaces shuffled
    len(codebook) x the candidate set), and no Python crossing (the
    mapInPandas form this replaces moved the full candidate set through
    Arrow once per pass, plus a per-pass Python worker spin-up).

    The whole assignment is ONE projected expression: the codebook
    rides as a literal ``array<struct<sid, nrm, vec>>``, a ``transform``
    lambda computes each seed's cosine with an ``aggregate`` left-fold
    whose accumulator STARTS at the first product and folds dims 2..n —
    the exact IEEE-754 sequence of the unrolled chain the DuckDB oracle
    spells out (a 0-seeded fold would differ on -0.0 products), so bit
    parity holds; ``repr(float)`` + Spark's ``D`` literal round-trips
    every seed bit. ``array_sort`` ascending on (neg cosine, id) IS the
    cosine-DESC/smaller-id tiebreak contract.

    Why THIS form, measured against three alternatives at sf0.1:
    * mapInPandas (replaced): Arrow-ships every column of the full
      candidate set + Python worker spin-up per pass.
    * per-seed unrolled-chain columns in a codegen'd Project: all
      K x dim terms land in one whole-stage consume() method, which
      janino compiles but the JVM JIT refuses (8 KB bytecode ceiling),
      so the hot loop runs in the BYTECODE INTERPRETER; 2-4x slower
      end-to-end, worse in long sessions.
    * K unrolled chains inside this one expression: same eval speed as
      the HOF fold (both interpreted — the top-level array_sort is
      CodegenFallback either way), but a ~50x bigger expression tree
      that AQE re-copies per stage replan — measured 2-3s of extra
      driver time per execution of the composed q65.
    The HOF fold keeps the tree tiny (one literal, one lambda),
    evaluates at the same ~0.5 us/row/seed-dim as the chains, and
    crosses nothing into Python. The module-docstring HOF warning is
    about per-PAIR hot paths under a join; this is a per-ROW pass
    whose alternative is not codegen but the JIT-refused giant method.
    """
    seeds = sorted(codebook)
    s_nrms = [_chain_norm(vec) for _, vec in seeds]

    entries = ", ".join(
        "named_struct('sid', {sid}L, 'nrm', {nrm!r}D, 'vec', array({vs}))"
        .format(sid=sid, nrm=s_nrms[j],
                vs=", ".join(f"{x!r}D" for x in vec))
        for j, (sid, vec) in enumerate(seeds))
    dim = len(seeds[0][1])
    first = (f"cast(element_at({vec_col}, 1) as double) "
             f"* element_at(s.vec, 1)")
    dot = first if dim == 1 else (
        f"aggregate(sequence(2, {dim}), {first}, (acc, i) -> "
        f"acc + cast(element_at({vec_col}, i) as double) "
        f"* element_at(s.vec, i))")
    ranked = (f"array_sort(transform(array({entries}), s -> "
              f"struct(-(({dot}) / ({nrm_col} * s.nrm)) AS neg, "
              f"s.sid AS sid)))")
    if nprobe == 1:
        cell = F.expr(f"element_at({ranked}, 1).sid").alias("cell")
    else:
        cell = F.expr(
            f"explode(slice(transform({ranked}, x -> x.sid), 1, {nprobe}))"
        ).alias("cell")
    return df.select("*", cell)


#: 2^60 — the dyadic divisor turning the 15-nibble md5 prefix into an
#: exact uniform in [0, 1) (a power of two, so the division is exact).
_SEED_HASH_DIV = float(2 ** 60)


def _seed_hash_col() -> F.Column:
    """60-bit deterministic per-vector hash (the portable md5-prefix
    int shared with the table fingerprints, operators/maintenance.py:
    233): independent of row order, partitioning, and id layout."""
    return F.conv(F.substring(F.md5(F.col("vec_id").cast("string")),
                              1, 15), 16, 10).cast("long")


def kmeans_seeds(emb: DataFrame, k: int) -> list[tuple[int, list[float]]]:
    """Deterministic hash-sampled k-means||-style seeding (Bahmani et
    al. 2012, one oversampling round with the random draws replaced by
    the md5-prefix uniform so both engines replay it bit-exactly):

    1. c0 = the vector with the smallest id-hash — a uniform draw that
       no adversarial id layout or file order can bias (the previous
       ``vec_id < k`` Forgy slice picked the first ids, degenerate
       when they are near-duplicates).
    2. The remaining k-1 seeds maximize ``(1 - cos(v, c0)) * u(v)``
       — the k-means|| distance-weighted sampling with u(v) the hash
       uniform: far-from-c0 vectors win, identical duplicates of c0
       score zero and can never be re-picked.

    Scale shape: scoring is one MAP-ONLY pass against the broadcast
    c0 literal; driver state and both collects are O(k * dim). The
    DuckDB twin is ``_seeds_ctes`` — every oracle that consumes these
    seeds splices the same selection into its WITH list.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    h = _seed_hash_col()
    first = (emb.select("vec_id", "embedding", h.alias("h"))
             .orderBy("h", "vec_id").limit(1).collect())
    if not first:
        raise ValueError("cannot seed k-means from an empty table")
    c0_id = int(first[0]["vec_id"])
    c0 = [float(x) for x in first[0]["embedding"]]
    if k == 1:
        return [(c0_id, c0)]
    dim = len(c0)  # unroll to the table's true width, not the module DIM
    c0_nrm = _chain_norm(c0)
    c0_lit = "array(" + ", ".join(f"{x!r}D" for x in c0) + ")"
    scored = (emb.select("vec_id", "embedding", h.alias("h"),
                         F.expr(_norm_sql("embedding", dim)).alias("nrm"))
              .withColumn("c0", F.expr(c0_lit))
              .withColumn(
                  "score",
                  (F.lit(1.0)
                   - F.expr(f"({_dot_sql('embedding', 'c0', dim)}) "
                            f"/ (nrm * {c0_nrm!r}D)"))
                  * (F.col("h").cast("double") / F.lit(_SEED_HASH_DIV))))
    rest = (scored.filter(F.col("vec_id") != c0_id)
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(k - 1)
            .select("vec_id", "embedding").collect())
    if len(rest) < k - 1:
        raise ValueError(f"table has fewer than {k} vectors")
    return sorted([(c0_id, c0)]
                  + [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
                     for r in rest])


def _seeds_ctes(k: int, dim: int = DIM) -> str:
    """DuckDB replay of ``kmeans_seeds`` as spliceable WITH entries;
    the final CTE ``seeds(s_id, s_vec, s_nrm)`` matches the shape the
    consuming oracles select from. ``dim`` must equal the table's true
    vector width — the Spark side unrolls to ``len(c0)``, so an oracle
    spliced with the wrong width would fold a different term count and
    diverge (the registry embeddings are DIM-wide; the property tests
    exercise other widths on the Spark side only)."""
    two60 = "CAST(1152921504606846976 AS DOUBLE)"
    return f"""sd_h AS (
  SELECT vec_id, embedding,
         CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h,
         {_norm_dd('embedding', dim)} AS nrm
  FROM embeddings),
sd_c0 AS (
  SELECT vec_id AS c0_id, embedding AS c0_vec, nrm AS c0_nrm
  FROM sd_h ORDER BY h, vec_id LIMIT 1),
sd_sc AS (
  SELECT sd_h.vec_id, sd_h.embedding, sd_h.nrm,
         (CAST(1 AS DOUBLE)
          - (({_dot_dd('sd_h.embedding', 'sd_c0.c0_vec', dim)})
             / (sd_h.nrm * sd_c0.c0_nrm)))
           * (CAST(sd_h.h AS DOUBLE) / {two60}) AS score
  FROM sd_h CROSS JOIN sd_c0
  WHERE sd_h.vec_id <> sd_c0.c0_id),
sd_rest AS (
  SELECT vec_id, embedding, nrm FROM sd_sc
  ORDER BY score DESC, vec_id ASC LIMIT {k - 1}),
seeds AS (
  SELECT vec_id AS s_id, embedding AS s_vec, nrm AS s_nrm FROM (
    SELECT c0_id AS vec_id, c0_vec AS embedding, c0_nrm AS nrm
    FROM sd_c0
    UNION ALL
    SELECT vec_id, embedding, nrm FROM sd_rest))"""


def q65_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a fixed coarse quantizer (8 seed vectors) assigns
    every candidate to its nearest cell (the inverted lists); each
    query probes its nprobe=2 nearest cells and scores exact cosine
    only within them.

    Plan shape (the part that must survive 100 TB): the codebook is
    DRIVER-SIDE state (8 vectors — any real IVF build trains and holds
    the centroids outside the data path), so cell assignment is the
    MAP-ONLY `assign_cells` pass: vectorized left-fold cosines against
    the codebook and a per-row argmax, no crossJoin row expansion, no
    window, no shuffle of the big side — the earlier window-over-c_id
    form shuffled 8x the candidate set. Query-side probing is the same
    pass with nprobe=2, and the final per-query rank goes through the
    two-phase shuffle-free `topk_per_key`. Training the quantizer
    (kmeans) is deliberately out of band: any fixed centroid set
    works, and a fixed one keeps the operator deterministic and
    oracle-checkable. The in-tree trainer is ``kmeans_seeds`` (hash-
    sampled k-means|| init) + q67's Lloyd rounds — its output plugs
    into this codebook parameter unchanged, and q103 gates the
    resulting recall either way.
    """
    from dataflowtemplates_spark.operators.topk import topk_per_key
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    codebook = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
                    .select("vec_id", "embedding").collect())

    cands = _with_norm(emb.filter(F.col("vec_id") >= 20),
                       "c_id", "c_vec", "c_nrm")
    qrys = _with_norm(emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 13)),
                      "q_id", "q_vec", "q_nrm", spread=False)

    cells = assign_cells(cands, "c_vec", "c_nrm", codebook, nprobe=1)
    probes = assign_cells(qrys, "q_vec", "q_nrm", codebook, nprobe=2)

    scored = (cells.join(F.broadcast(probes), "cell")
              .select("q_id", "c_id", "cell",
                      _cosine("q_vec", "c_vec", "q_nrm", "c_nrm").alias("cosine")))
    return (topk_per_key(scored, "q_id", "cosine", "c_id", 3,
                         payload=["cell"])
            .orderBy("q_id", "rk"))


_Q65_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS s_id, embedding AS s_vec, {_norm_dd('embedding')} AS s_nrm
  FROM embeddings WHERE vec_id < 8),
cands AS (
  SELECT vec_id AS c_id, embedding AS c_vec, {_norm_dd('embedding')} AS c_nrm
  FROM embeddings WHERE vec_id >= 20),
qrys AS (
  SELECT vec_id AS q_id, embedding AS q_vec, {_norm_dd('embedding')} AS q_nrm
  FROM embeddings WHERE vec_id >= 8 AND vec_id < 13),
cell_scored AS (
  SELECT c_id, c_vec, c_nrm, s_id,
         {_cosine_dd('c_vec', 's_vec', 'c_nrm', 's_nrm')} AS s_cos
  FROM cands CROSS JOIN seeds),
cells AS (
  SELECT c_id, c_vec, c_nrm, s_id AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_id
        ORDER BY s_cos DESC, s_id ASC) AS rk
    FROM cell_scored) WHERE rk = 1),
probe_scored AS (
  SELECT q_id, q_vec, q_nrm, s_id,
         {_cosine_dd('q_vec', 's_vec', 'q_nrm', 's_nrm')} AS s_cos
  FROM qrys CROSS JOIN seeds),
probes AS (
  SELECT q_id, q_vec, q_nrm, s_id AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        ORDER BY s_cos DESC, s_id ASC) AS rk
    FROM probe_scored) WHERE rk <= 2),
scored AS (
  SELECT q_id, c_id, cell,
         {_cosine_dd('q_vec', 'c_vec', 'q_nrm', 'c_nrm')} AS cosine
  FROM cells JOIN probes USING (cell))
SELECT q_id, rk, c_id, cell, cosine FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      ORDER BY cosine DESC, c_id ASC) AS INTEGER) AS rk
  FROM scored) WHERE rk <= 3
ORDER BY q_id, rk
"""


#: k-means cluster count (centroids from the hash-sampled kmeans_seeds).
KMEANS_K = 4


def q67_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of cosine k-means over the embedding table:
    seed centroids from the deterministic hash-sampled k-means||-style
    init (``kmeans_seeds`` — uniform-hash first seed + distance-
    weighted rest, immune to adversarial id layouts), one re-centering,
    one re-assignment. The iterative-algorithm representative of the
    ANN toolkit — clustering is how a real corpus map (topic
    balancing, IVF codebook training) is actually built.

    Scale shape — the distributed-kmeans loop structure, per iteration:
    (1) assignment is the MAP-ONLY ``assign_cells`` pass against the
    driver-held codebook (no join, no shuffle of the vectors); (2)
    re-centering is ONE aggregate shuffle keyed (cell, pos) — K*DIM
    cells, combiner-friendly partial sums map-side — whose K*DIM-row
    result returns to the driver and becomes the next broadcast
    codebook. State on the driver is K*DIM doubles; the vector table
    shuffles ZERO times end-to-end (the assignment is checkpointed so
    iteration 2 re-reads it instead of recomputing lineage).

    Determinism (the oracle-gate contract): component means use exact
    DECIMAL(20,8) sums (float addition is order-dependent; decimal is
    not — same trick as q64), divided once into a double; all cosines
    are the fixed left-fold chain shared with the other ANN operators,
    so DuckDB reproduces every bit. Ties in assignment break toward
    the smaller cell id in both engines.
    """
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    seeds = kmeans_seeds(emb, KMEANS_K)

    vecs = _with_norm(emb, "vec_id", "v", "nrm", {"label": "label"})
    a1 = (assign_cells(vecs, "v", "nrm", seeds, nprobe=1)
          .withColumnRenamed("cell", "cell_init")
          .localCheckpoint(eager=True))

    cent = (a1.select("cell_init", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell_init", "pos")
            .agg((F.sum(F.col("val").cast("double").cast("decimal(20,8)"))
                  .cast("double") / F.count(F.lit(1))).alias("c")))
    new_cents: dict[int, list[float]] = {}
    for r in cent.collect():
        new_cents.setdefault(int(r["cell_init"]), [0.0] * DIM)[int(r["pos"])] \
            = float(r["c"])
    assert len(new_cents) == KMEANS_K, "empty k-means cell"
    codebook2 = sorted(new_cents.items())

    a2 = assign_cells(a1, "v", "nrm", codebook2, nprobe=1) \
        .withColumnRenamed("cell", "cell_final")
    cent_df = spark.createDataFrame(
        [(cid, vec, _chain_norm(vec)) for cid, vec in codebook2],
        schema="cell_final long, c_vec array<double>, c_nrm double")
    return (a2.join(F.broadcast(cent_df), "cell_final")
            .select("vec_id", "label", "cell_init", "cell_final",
                    _cosine("v", "c_vec", "nrm", "c_nrm")
                    .alias("cosine_final"))
            .orderBy("vec_id"))


_Q67_ORACLE = f"""
WITH {_seeds_ctes(KMEANS_K)},
vecs AS (
  SELECT vec_id, label, embedding AS v, {_norm_dd('embedding')} AS nrm
  FROM embeddings),
s1 AS (
  SELECT vec_id, label, v, nrm, s_id,
         {_cosine_dd('v', 's_vec', 'nrm', 's_nrm')} AS s_cos
  FROM vecs CROSS JOIN seeds),
a1 AS (
  SELECT vec_id, label, v, nrm, s_id AS cell_init FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        ORDER BY s_cos DESC, s_id ASC) AS rk
    FROM s1) WHERE rk = 1),
idx AS (SELECT UNNEST(GENERATE_SERIES(1, {DIM})) AS i),
cent AS (
  SELECT cell_init, i AS pos,
         CAST(SUM(CAST(CAST(v[i] AS DOUBLE) AS DECIMAL(20,8))) AS DOUBLE)
           / COUNT(*) AS c
  FROM a1 CROSS JOIN idx GROUP BY cell_init, i),
cvec AS (
  SELECT cell_init AS cell_final, LIST(c ORDER BY pos) AS c_vec
  FROM cent GROUP BY cell_init),
cnrm AS (
  SELECT cell_final, c_vec, {_norm_dd('c_vec')} AS c_nrm FROM cvec),
s2 AS (
  SELECT vec_id, label, cell_init, cell_final,
         {_cosine_dd('v', 'c_vec', 'nrm', 'c_nrm')} AS cosine_final
  FROM a1 CROSS JOIN cnrm)
SELECT vec_id, label, cell_init, cell_final, cosine_final FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      ORDER BY cosine_final DESC, cell_final ASC) AS rk
  FROM s2) WHERE rk = 1
ORDER BY vec_id
"""


def _sq8_q(i: int) -> str:
    """Quantized component i (Spark SQL): floor(v_i / m * 127)."""
    return (f"floor(cast(element_at(v, {i}) as double) / m * 127)")


def _sq8_q_dd(i: int) -> str:
    return f"FLOOR(CAST(v[{i}] AS DOUBLE) / m * 127)"


def q72_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization (SQ8) of the embedding table: per-vector
    symmetric scale m = max|v_i|, q_i = floor(v_i/m*127), plus the L2
    reconstruction error — the 4x storage/bandwidth reduction every
    100 TB ANN index applies before building inverted lists.

    MAP-ONLY: zero shuffles, zero joins; the scale, four probe
    components and the error are all codegen'd per-row expressions
    (floor() avoids round()'s engine-specific tie semantics, and the
    error is the same statically-unrolled left-fold chain as the other
    vector ops, so DuckDB reproduces every bit). `m` is its own
    multi-referenced projection, computed once per row (see the HOF
    placement rules on q57/q58).
    """
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    m_expr = "greatest(" + ", ".join(
        f"abs(cast(element_at(embedding, {i}) as double))"
        for i in range(1, DIM + 1)) + ")"
    staged = emb.select("vec_id", F.col("embedding").alias("v"),
                        F.expr(m_expr).alias("m"))
    err_terms = " + ".join(
        f"((cast(element_at(v, {i}) as double) - "
        f"(cast({_sq8_q(i)} as double) * m) / 127) * "
        f"(cast(element_at(v, {i}) as double) - "
        f"(cast({_sq8_q(i)} as double) * m) / 127))"
        for i in range(1, DIM + 1))
    return (staged.select(
        "vec_id", F.col("m").alias("max_abs"),
        *[F.expr(f"cast({_sq8_q(i)} as int)").alias(f"q{i}")
          for i in range(1, 5)],
        F.expr(f"sqrt({err_terms})").alias("recon_err"))
        .orderBy("vec_id"))


_Q72_ORACLE = (
    "WITH staged AS (SELECT vec_id, embedding AS v, GREATEST("
    + ", ".join(f"ABS(CAST(embedding[{i}] AS DOUBLE))"
                for i in range(1, DIM + 1))
    + ") AS m FROM embeddings)\nSELECT vec_id, m AS max_abs, "
    + ", ".join(f"CAST({_sq8_q_dd(i)} AS INTEGER) AS q{i}"
                for i in range(1, 5))
    + ", sqrt("
    + " + ".join(
        f"((CAST(v[{i}] AS DOUBLE) - (CAST({_sq8_q_dd(i)} AS DOUBLE) * m) / 127) * "
        f"(CAST(v[{i}] AS DOUBLE) - (CAST({_sq8_q_dd(i)} AS DOUBLE) * m) / 127))"
        for i in range(1, DIM + 1))
    + ") AS recon_err FROM staged ORDER BY vec_id"
)


def q77_embedding_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding duplicate GROUPS: q66's capped sign-bucket near-dup
    pairs fed through iterative min-label propagation — the
    keep-one-per-cluster decision for the vector side, exactly as q56
    ships it for text. Component count stays distributed; only the
    per-iteration changed-count scalar reaches the driver.
    """
    from dataflowtemplates_spark.queries.dedup import connected_components
    pairs = q66_embedding_neardup_lsh(spark, sf_dir)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("group_size"))
    return (comp.join(sizes, "comp")
            .select(F.col("node").alias("vec_id"),
                    F.col("comp").alias("group_leader"),
                    "group_size",
                    (F.col("node") != F.col("comp")).alias("is_duplicate"))
            .orderBy("vec_id"))


_Q77_ORACLE = f"""
WITH RECURSIVE n AS (
  SELECT vec_id, embedding AS v, {_norm_dd('embedding')} AS nrm,
         {_bucket_dd('embedding')} AS bucket
  FROM embeddings),
kept AS (
  SELECT bucket FROM n GROUP BY bucket
  HAVING COUNT(*) <= {Q66_MAX_BUCKET}),
k AS (SELECT n.* FROM n JOIN kept USING (bucket)),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM k a JOIN k b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {_cosine_dd('a.v', 'b.v', 'a.nrm', 'b.nrm')} >= 0.35),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.node),
labels AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node),
sizes AS (SELECT comp, COUNT(*) AS group_size FROM labels GROUP BY comp)
SELECT l.node AS vec_id, l.comp AS group_leader, s.group_size,
       l.node <> l.comp AS is_duplicate
FROM labels l JOIN sizes s USING (comp)
ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# q88: product-quantization ADC with exact re-rank (the 100 TB ANN shape)
# --------------------------------------------------------------------------

#: PQ geometry: 8 subspaces x 8 dims, 16 centroids per subspace — each
#: vector compresses to 8 one-byte codes (32x smaller than float32).
PQ_M = 8
PQ_SUBDIM = 8
PQ_K = 16
#: ADC shortlist depth and final result depth.
PQ_TOPC = 32
PQ_TOPK = 10


def _pq_codebook(spark: SparkSession, sf_dir: str) -> list[list[list[float]]]:
    """Per-subspace codebooks: subvectors of the first PQ_K candidate
    vectors (by vec_id). Driver-held state like the IVF codebook —
    a real build trains these with k-means out of band; a fixed
    deterministic pick keeps the operator oracle-checkable, and the
    ADC machinery is identical either way."""
    register_tables(spark, sf_dir)
    rows = (spark.table("embeddings").filter(F.col("vec_id") >= 5)
            .orderBy("vec_id").limit(PQ_K).select("embedding").collect())
    return [[[float(r["embedding"][m * PQ_SUBDIM + i])
              for i in range(PQ_SUBDIM)] for r in rows]
            for m in range(PQ_M)]


def _pq_sub_chain(vec_col: str, m: int, elem: str) -> str:
    """Unrolled left-fold squared-L2 between subspace ``m`` of
    ``vec_col`` and a centroid subvector addressed by ``elem(i)``."""
    return " + ".join(
        f"((cast(element_at({vec_col}, {m * PQ_SUBDIM + i}) as double)"
        f" - {elem.format(i=i)})"
        f" * (cast(element_at({vec_col}, {m * PQ_SUBDIM + i}) as double)"
        f" - {elem.format(i=i)}))"
        for i in range(1, PQ_SUBDIM + 1))


def _pq_arrays(cb_m: list[list[float]]) -> str:
    return ", ".join(
        "array(" + ", ".join(f"{x!r}D" for x in v) + ")" for v in cb_m)


def _pq_code_expr(vec_col: str, m: int, cb_m: list[list[float]]) -> str:
    """argmin over the 16 centroids of subspace m (ties -> smaller j):
    index-lambda transform to (distance, j) structs, array_sort, take
    head. Map-only interpreted HOF — the assign_cells trade (see its
    docstring): the alternative unrolled 16x8 codegen chain exceeds
    the JIT method ceiling."""
    chain = _pq_sub_chain(vec_col, m, "element_at(s, {i})")
    return (f"element_at(array_sort(transform(array({_pq_arrays(cb_m)}), "
            f"(s, i) -> struct(({chain}) AS d, i + 1 AS j))), 1).j")


def _pq_lut_expr(vec_col: str, m: int, cb_m: list[list[float]]) -> str:
    """The classic ADC distance table: for one query row, the 16
    subspace-m centroid distances, j-ordered — pair scoring is then a
    single element_at per subspace."""
    chain = _pq_sub_chain(vec_col, m, "element_at(s, {i})")
    return f"transform(array({_pq_arrays(cb_m)}), s -> {chain})"


def _l2sq_sql(a: str, b: str) -> str:
    return " + ".join(
        f"((cast(element_at({a}, {i}) as double) - cast(element_at({b}, {i}) as double))"
        f" * (cast(element_at({a}, {i}) as double) - cast(element_at({b}, {i}) as double)))"
        for i in range(1, DIM + 1))


def _l2sq_dd(a: str, b: str) -> str:
    return " + ".join(
        f"((CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        f" * (CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE)))"
        for i in range(1, DIM + 1))


def q88_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance (ADC) scoring
    and exact re-rank — the index layout real 100 TB vector search
    runs: candidates are stored as 8 one-byte codes (32x compression),
    queries score against precomputed per-subspace distance tables,
    and full vectors are fetched only for the tiny shortlist.

    Three phases, each with the scale-correct shape:
    1. ENCODE (map-only): each candidate row -> 8 codes via per-subspace
       argmin against the driver-held codebook; the full vector is
       DROPPED before any join — the pair phase touches codes only.
    2. ADC (map-only over codes x broadcast queries): each query row
       precomputes its 16-entry distance LUT per subspace once, so a
       pair costs 8 element_at lookups + 7 adds; shortlist = top-C per
       query via the shuffle-free two-phase `topk_per_key`.
    3. RE-RANK: fetch full vectors for the C x |queries| shortlist via
       a broadcast point-lookup join, exact 64-dim squared-L2, top-k.

    Determinism: every distance is an unrolled/folded left-assoc double
    chain mirrored textually in the oracle; argmin and rank ties break
    on the smaller index/id in both engines.
    """
    from dataflowtemplates_spark.operators.topk import topk_per_key

    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    cb = _pq_codebook(spark, sf_dir)
    codes = (emb.filter(F.col("vec_id") >= 5)
             .select(F.col("vec_id").alias("c_id"),
                     *[F.expr(_pq_code_expr("embedding", m, cb[m]))
                       .cast("int").alias(f"code{m + 1}")
                       for m in range(PQ_M)]))
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("q_id"),
                       *[F.expr(_pq_lut_expr("embedding", m, cb[m]))
                         .alias(f"lut{m + 1}") for m in range(PQ_M)]))
    adc = " + ".join(f"(element_at(lut{m + 1}, code{m + 1}))"
                     for m in range(PQ_M))
    pairs = (codes.crossJoin(F.broadcast(queries))
             .select("q_id", "c_id", F.expr(adc).alias("approx_l2sq")))
    shortlist = topk_per_key(
        pairs.withColumn("_neg", -F.col("approx_l2sq")),
        "q_id", "_neg", "c_id", PQ_TOPC, payload=("approx_l2sq",))
    fetched = (emb.select(F.col("vec_id").alias("c_id"),
                          F.col("embedding").alias("c_vec"))
               .join(F.broadcast(
                   shortlist.select("q_id", "c_id", "approx_l2sq")), "c_id"))
    qv = (emb.filter(F.col("vec_id") < 5)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec")))
    rer = (fetched.join(F.broadcast(qv), "q_id")
           .select("q_id", "c_id", "approx_l2sq",
                   F.expr(_l2sq_sql("q_vec", "c_vec")).alias("exact_l2sq")))
    out = topk_per_key(
        rer.withColumn("_neg", -F.col("exact_l2sq")),
        "q_id", "_neg", "c_id", PQ_TOPK,
        payload=("approx_l2sq", "exact_l2sq"))
    return (out.select("q_id", "rk", "c_id", "approx_l2sq", "exact_l2sq")
            .orderBy("q_id", "rk"))


def _q88_oracle() -> str:
    enc_ctes = ",\n".join(
        f"code{m + 1} AS (\n"
        f"  SELECT c_id, j AS code{m + 1} FROM (\n"
        f"    SELECT c.c_id, cb.j, ROW_NUMBER() OVER (PARTITION BY c.c_id\n"
        f"      ORDER BY {_pq_sub_chain_dd('c.c_vec', m, 'cb.v')} ASC, cb.j ASC) AS rn\n"
        f"    FROM cand c CROSS JOIN cb) WHERE rn = 1)"
        for m in range(PQ_M))
    code_joins = "\n    ".join(
        f"JOIN code{m + 1} USING (c_id)" for m in range(PQ_M))
    code_cols = ", ".join(f"code{m + 1}" for m in range(PQ_M))
    cb_joins = "\n    ".join(
        f"JOIN cb cb{m + 1} ON cb{m + 1}.j = c.code{m + 1}"
        for m in range(PQ_M))
    adc = " + ".join(
        f"({_pq_sub_chain_dd('q.q_vec', m, f'cb{m + 1}.v')})"
        for m in range(PQ_M))
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
cand AS (
  SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id >= 5),
cb AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS j, embedding AS v
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5
        ORDER BY vec_id LIMIT {PQ_K})),
{enc_ctes},
coded AS (
  SELECT c_id, {code_cols} FROM cand
    {code_joins}),
approx AS (
  SELECT q.q_id, c.c_id, {adc} AS approx_l2sq
  FROM coded c
    {cb_joins}
  CROSS JOIN q),
shortlist AS (
  SELECT q_id, c_id, approx_l2sq FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
      ORDER BY approx_l2sq ASC, c_id ASC) AS rn
    FROM approx) WHERE rn <= {PQ_TOPC}),
rerank AS (
  SELECT s.q_id, s.c_id, s.approx_l2sq,
         {_l2sq_dd('q.q_vec', 'cv.c_vec')} AS exact_l2sq
  FROM shortlist s
  JOIN cand cv ON cv.c_id = s.c_id
  JOIN q ON q.q_id = s.q_id)
SELECT q_id, CAST(rk AS INTEGER) AS rk, c_id, approx_l2sq, exact_l2sq
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
    ORDER BY exact_l2sq ASC, c_id ASC) AS rk
  FROM rerank)
WHERE rk <= {PQ_TOPK}
ORDER BY q_id, rk
"""


def _pq_sub_chain_dd(vec: str, m: int, cbv: str) -> str:
    """DuckDB twin of _pq_sub_chain (1-based subscripts, CASTs on both
    operands — the Spark side's centroid literal is already double).
    ``cbv`` is the FULL 64-dim centroid vector here (the oracle keeps
    whole rows in its cb CTE), so unlike the Spark literal — which is
    pre-sliced to the subspace — both operands use the m-offset index."""
    return " + ".join(
        f"((CAST({vec}[{m * PQ_SUBDIM + i}] AS DOUBLE)"
        f" - CAST({cbv}[{m * PQ_SUBDIM + i}] AS DOUBLE))"
        f" * (CAST({vec}[{m * PQ_SUBDIM + i}] AS DOUBLE)"
        f" - CAST({cbv}[{m * PQ_SUBDIM + i}] AS DOUBLE)))"
        for i in range(1, PQ_SUBDIM + 1))


# --------------------------------------------------------------------------
# q103: recall@k gate — approximate indexes measured against exact truth
# --------------------------------------------------------------------------


def _recall_per_query(approx: DataFrame, exact: DataFrame, k: int,
                      kind: str) -> DataFrame:
    """Per-query |approx ∩ exact| / k with queries that hit nothing
    kept at 0 (an inner-join-only form would silently drop them)."""
    hits = (approx.select("q_id", "c_id")
            .join(exact.select("q_id", "c_id"), ["q_id", "c_id"])
            .groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hit")))
    universe = exact.select("q_id").distinct()
    return (universe.join(hits, "q_id", "left")
            .select(F.lit(kind).alias("index_kind"),
                    "q_id",
                    F.lit(k).cast("int").alias("k"),
                    F.coalesce("n_hit", F.lit(0)).cast("bigint")
                     .alias("n_hit"),
                    (F.coalesce("n_hit", F.lit(0)).cast("double")
                     / F.lit(float(k))).alias("recall")))


def q103_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the two approximate indexes against exact ground
    truth — the index-QUALITY gate the plumbing-parity oracles (q65,
    q88) cannot provide: those oracles replicate the approximation, so
    a bad codebook or a too-shallow shortlist passes every bit-exact
    check while silently degrading retrieval. Recall of a DETERMINISTIC
    index is itself deterministic, so it oracle-checks like any other
    query and doubles as living documentation of the quality /
    compression trade.

    Two measurements, each on its index's own query/candidate split:
    * ``ivf``     — q65 (IVF, nprobe=2) vs exact cosine top-3 over the
      same candidates (vec_id >= 20, queries 8..12).
    * ``pq_adc``  — q88 (PQ-ADC shortlist + exact re-rank) vs exact
      squared-L2 top-10 over the same candidates (vec_id >= 5,
      queries < 5).

    Scale shape: ground truth is the one genuinely expensive side and
    runs as the broadcast-query brute-force scan (q61's shape — the
    big side never shuffles); the intersection joins are per-query
    k-row sets, trivially broadcastable. At 100 TB this is the standard
    sampled-recall harness: a bounded query panel against the full
    index, exact truth computed once per panel refresh.
    """
    from dataflowtemplates_spark.operators.topk import topk_per_key
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")

    # -- IVF side (q65 geometry) --
    ivf_exact = ann_bruteforce_topk(
        emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 13)),
        emb.filter(F.col("vec_id") >= 20), k=3)
    ivf = _recall_per_query(q65_ann_ivf(spark, sf_dir), ivf_exact, 3, "ivf")

    # -- PQ-ADC side (q88 geometry; truth metric = exact squared L2,
    #    the metric q88's re-rank phase optimizes) --
    cands = (emb.filter(F.col("vec_id") >= 5)
             .repartition(spark.sparkContext.defaultParallelism)
             .select(F.col("vec_id").alias("c_id"),
                     F.col("embedding").alias("c_vec")))
    qrys = (emb.filter(F.col("vec_id") < 5)
            .select(F.col("vec_id").alias("q_id"),
                    F.col("embedding").alias("q_vec")))
    pairs = (cands.crossJoin(F.broadcast(qrys))
             .select("q_id", "c_id",
                     (-F.expr(_l2sq_sql("q_vec", "c_vec"))).alias("_neg")))
    pq_exact = topk_per_key(pairs, "q_id", "_neg", "c_id", PQ_TOPK)
    pq = _recall_per_query(q88_ann_pq_adc(spark, sf_dir), pq_exact,
                           PQ_TOPK, "pq_adc")

    return ivf.unionByName(pq).orderBy("index_kind", "q_id")


def _q103_oracle() -> str:
    return f"""
WITH ivf_approx AS (
  SELECT q_id, c_id FROM ({_Q65_ORACLE})),
ivf_exact AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, c_id ASC) AS rk
    FROM (
      SELECT q.q_id, c.c_id,
             {_cosine_dd('q.q_vec', 'c.c_vec', 'q.q_nrm', 'c.c_nrm')}
               AS cosine
      FROM (SELECT vec_id AS q_id, embedding AS q_vec,
                   {_norm_dd('embedding')} AS q_nrm
            FROM embeddings WHERE vec_id >= 8 AND vec_id < 13) q
      CROSS JOIN (SELECT vec_id AS c_id, embedding AS c_vec,
                         {_norm_dd('embedding')} AS c_nrm
                  FROM embeddings WHERE vec_id >= 20) c))
  WHERE rk <= 3),
pq_approx AS (
  SELECT q_id, c_id FROM ({_q88_oracle()})),
pq_exact AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY l2sq ASC, c_id ASC) AS rk
    FROM (
      SELECT q.q_id, c.c_id,
             {_l2sq_dd('q.q_vec', 'c.c_vec')} AS l2sq
      FROM (SELECT vec_id AS q_id, embedding AS q_vec
            FROM embeddings WHERE vec_id < 5) q
      CROSS JOIN (SELECT vec_id AS c_id, embedding AS c_vec
                  FROM embeddings WHERE vec_id >= 5) c))
  WHERE rk <= {PQ_TOPK}),
ivf_hits AS (
  SELECT a.q_id, COUNT(*) AS n_hit
  FROM ivf_approx a JOIN ivf_exact e USING (q_id, c_id)
  GROUP BY a.q_id),
pq_hits AS (
  SELECT a.q_id, COUNT(*) AS n_hit
  FROM pq_approx a JOIN pq_exact e USING (q_id, c_id)
  GROUP BY a.q_id)
SELECT * FROM (
  SELECT 'ivf' AS index_kind, u.q_id, CAST(3 AS INTEGER) AS k,
         CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
         CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / 3.0 AS recall
  FROM (SELECT DISTINCT q_id FROM ivf_exact) u
  LEFT JOIN ivf_hits h USING (q_id)
  UNION ALL
  SELECT 'pq_adc', u.q_id, {PQ_TOPK},
         CAST(COALESCE(h.n_hit, 0) AS BIGINT),
         CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / {float(PQ_TOPK)}
  FROM (SELECT DISTINCT q_id FROM pq_exact) u
  LEFT JOIN pq_hits h USING (q_id))
ORDER BY index_kind, q_id
"""


# --------------------------------------------------------------------------
# q137: hybrid retrieval — BM25 shortlist + vector re-rank, RRF fusion
# --------------------------------------------------------------------------

#: Lexical shortlist depth, fused result depth, and the standard
#: reciprocal-rank-fusion constant (Cormack et al.'s k=60).
HYBRID_SHORTLIST = 50
HYBRID_TOPK = 10
HYBRID_RRF_K = 60
#: The query's dense representation: the embedding of this vec_id
#: (the corpus is its own query set, the q61/q88 convention).
HYBRID_QVEC_ID = 0


def q137_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid retrieval — the production search shape: a
    cheap LEXICAL pass (BM25 over the inverted term postings) cuts
    the corpus to a small shortlist, the expensive DENSE pass (exact
    cosine against the query embedding) scores ONLY that shortlist,
    and reciprocal-rank fusion merges the two rankings. Documents
    without an embedding row (the corpus has partial vector coverage
    at sf0.1, as real crawls do) keep their lexical rank and simply
    contribute no dense term.

    Scale shape: stage 1 is q85's postings aggregation (term-filtered
    map-side, never |corpus| rows); the shortlist is a global
    TakeOrdered of depth 50. Stage 2 scans embeddings ONCE, filtered
    by a BROADCAST join on the shortlist keys — no shuffle, and the
    64-term cosine chain runs for <= |shortlist| survivors, not the
    table. All windows/joins after that touch <= 50 rows (driver-
    scale, documented single-partition). At 100 TB only the stage-1
    aggregation and the stage-2 scan see data-scale rows.

    Determinism: BM25 totals are the bit-exact q85 fold; cosine is
    the unrolled fixed-order chain over IEEE doubles with sqrt (the
    one exactly-rounded libm-free root); RRF terms are single
    divisions of exact integers summed in a fixed order; every rank
    breaks ties on doc_id.

    Reference: extension beyond DataflowTemplates (north-star scope);
    composition of the q85 + q61 machinery.
    """
    from dataflowtemplates_spark.queries.text import bm25_per_doc
    register_tables(spark, sf_dir)
    per_doc = bm25_per_doc(spark.table("documents"))
    w_lex = Window.orderBy(F.col("score_total").desc(), F.col("doc_id"))
    shortlist = (per_doc.orderBy(F.col("score_total").desc(), "doc_id")
                 .limit(HYBRID_SHORTLIST)
                 .select("doc_id",
                         F.row_number().over(w_lex).cast("int")
                         .alias("r_lex")))

    emb = spark.table("embeddings")
    q = (emb.filter(F.col("vec_id") == HYBRID_QVEC_ID)
         .select(F.col("embedding").alias("q_vec")))
    cand = (emb.join(F.broadcast(shortlist
                                 .select(F.col("doc_id").alias("vec_id"))),
                     "vec_id")
            .select(F.col("vec_id").alias("doc_id"),
                    F.col("embedding").alias("c_vec")))
    cos = _cosine("q_vec", "c_vec",
                  _norm_sql("q_vec"), _norm_sql("c_vec"))
    scored = (cand.crossJoin(F.broadcast(q))
              .select("doc_id", cos.alias("cosine")))
    w_vec = Window.orderBy(F.col("cosine").desc(), F.col("doc_id"))
    vr = scored.select(
        "doc_id", "cosine",
        F.row_number().over(w_vec).cast("int").alias("r_vec"))

    k = F.lit(HYBRID_RRF_K)
    rrf = (F.lit(1.0) / (k + F.col("r_lex"))
           + F.coalesce(F.lit(1.0) / (k + F.col("r_vec")), F.lit(0.0)))
    fused = (shortlist.join(vr, "doc_id", "left")
             .select("doc_id", "r_lex", "r_vec", "cosine",
                     rrf.alias("rrf")))
    w_f = Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (fused.orderBy(F.col("rrf").desc(), "doc_id")
            .limit(HYBRID_TOPK)
            .withColumn("rk", F.row_number().over(w_f).cast("int"))
            .select("rk", "doc_id", "r_lex", "r_vec", "cosine", "rrf")
            .orderBy("rk"))


def _q137_oracle() -> str:
    from dataflowtemplates_spark.queries.text import BM25_PER_DOC_CTES
    cos = _cosine_dd("q_vec", "embedding",
                     _norm_dd("q_vec"), _norm_dd("embedding"))
    k = HYBRID_RRF_K
    return f"""
WITH {BM25_PER_DOC_CTES},
shortlist AS MATERIALIZED (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY score_total DESC, doc_id ASC)
              AS INTEGER) AS r_lex
  FROM per_doc ORDER BY score_total DESC, doc_id ASC
  LIMIT {HYBRID_SHORTLIST}),
qv AS (SELECT embedding AS q_vec FROM embeddings
       WHERE vec_id = {HYBRID_QVEC_ID}),
vr AS (
  SELECT doc_id, cosine,
         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC)
              AS INTEGER) AS r_vec
  FROM (
    SELECT s.doc_id, {cos} AS cosine
    FROM shortlist s
    JOIN embeddings e ON e.vec_id = s.doc_id
    CROSS JOIN qv)),
fused AS (
  SELECT s.doc_id, s.r_lex, vr.r_vec, vr.cosine,
         CAST(1 AS DOUBLE) / ({k} + s.r_lex)
           + COALESCE(CAST(1 AS DOUBLE) / ({k} + vr.r_vec),
                      CAST(0 AS DOUBLE)) AS rrf
  FROM shortlist s LEFT JOIN vr USING (doc_id))
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC)
            AS INTEGER) AS rk,
       doc_id, r_lex, r_vec, cosine, rrf
FROM fused ORDER BY rrf DESC, doc_id ASC
LIMIT {HYBRID_TOPK}
"""


#: SemDeDup configuration: cluster count (seed centroids = first K
#: vectors, like q67), the within-cluster cosine above which the
#: higher-id member is pruned, and the cluster-size cap that bounds the
#: in-cluster pair join (mirrored in the oracle, same contract as
#: Q66_MAX_BUCKET). K here is test-scale; production SemDeDup uses
#: K ~ sqrt(n) clusters so the expected in-cluster pair count stays
#: linear in n.
SEMDEDUP_K = 8
SEMDEDUP_THRESHOLD = 0.3
SEMDEDUP_MAX_CLUSTER = 4096


def q141_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup = cluster the
    embedding space, then prune near-duplicate pairs WITHIN clusters
    only — the trick that turns O(n^2) corpus-wide semantic dedup into
    K independent in-cluster problems.

    Stage shapes, in order: (1) assignment is the MAP-ONLY
    ``assign_cells`` pass against the driver-held seed codebook (no
    vector shuffle); (2) over-cap clusters are excluded by a broadcast
    semi-join on the K-row size table BEFORE any pairing, so a
    degenerate cluster (boilerplate embeddings) can never go quadratic;
    (3) the pair join shuffles each vector ONCE keyed by cell; (4) a
    member is pruned when ANY lower-id in-cluster neighbor exceeds the
    cosine threshold — deterministic keep-lowest-id, no iteration.
    Output is the per-cluster dedup manifest (sizes, pruned counts,
    keep fraction).

    The oracle replays assignment, cap, and prune rule in DuckDB with
    the shared fixed-fold cosine, so the gate covers the whole
    pipeline, cap included. Reference analogue: none — this extends
    the dedup family (SURVEY §2 extension block) with the
    embedding-space equivalent of q52's LSH banding.

    EXACT-DUPLICATE COLLAPSE (r12, measured; ADAPTIVE since r13):
    like q66, when the duplication probe finds bit-identical vectors
    they group BEFORE the in-cluster pairing and the prune rule folds
    at GROUP level — member ``b`` is pruned iff some in-cluster
    vector with a lower id scores >= threshold against it, and for a
    whole duplicate group that reduces to "ids above the MINIMUM
    qualifying neighbor group's lowest id" (a qualifying group's every
    member qualifies, so only its min id matters; the group itself
    qualifies its own later ids when cos(v,v) passes). One cosine per
    distinct-vector group pair instead of per member pair: the
    x10-duplicated scaling corpus measured 108s -> ~7s with
    bit-identical output (BENCH_SF1_DEDUP_r12.json). The probe rides
    the assignment checkpoint as an Observation (ZERO extra jobs);
    at distinct-ratio ~1 the direct per-row prune plan runs instead
    (the r12 collapse cost ~1.6x at sf0.1's deduplicated data for
    identical output).
    """
    from pyspark.sql import Observation
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    seeds = kmeans_seeds(emb, SEMDEDUP_K)
    vecs = _with_norm(emb, "vec_id", "v", "nrm")
    probe = Observation()
    assigned = (assign_cells(vecs, "v", "nrm", seeds, nprobe=1)
                .observe(probe,
                         F.count(F.lit(1)).alias("n"),
                         F.approx_count_distinct(F.hash("v")).alias("d"))
                .localCheckpoint(eager=True))
    stats = probe.get  # the eager checkpoint already ran the pass
    dup = _dup_ratio_of(int(stats["n"]), int(stats["d"]))

    sizes = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs"))
    capped = sizes.filter(F.col("n_vecs") <= SEMDEDUP_MAX_CLUSTER)
    in_scope = assigned.join(
        F.broadcast(capped.select("cell")), "cell", "semi")

    if dup < DUP_COLLAPSE_MIN_RATIO:
        # low duplication: prune on direct per-row pairs — no group
        # exchange, no list filter (output-identical to the collapse)
        a = in_scope.select("cell", F.col("vec_id").alias("id_a"),
                            F.col("v").alias("va"),
                            F.col("nrm").alias("na"))
        b = in_scope.select("cell", F.col("vec_id").alias("id_b"),
                            F.col("v").alias("vb"),
                            F.col("nrm").alias("nb"))
        pruned = (a.join(b, "cell")
                  .where(F.col("id_a") < F.col("id_b"))
                  .where(_cosine("va", "vb", "na", "nb")
                         >= SEMDEDUP_THRESHOLD)
                  .select("cell", F.col("id_b").alias("vec_id"))
                  .distinct())
        pruned_stats = pruned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n_pruned"),
            F.min("vec_id").alias("first_pruned"))
        n_kept = F.col("n_vecs") - F.col("n_pruned")
        return (capped.join(pruned_stats, "cell", "left")
                .withColumn("n_pruned",
                            F.coalesce("n_pruned", F.lit(0).cast("long")))
                .select("cell", "n_vecs", "n_pruned", "first_pruned",
                        (n_kept.cast("double")
                         / F.col("n_vecs").cast("double"))
                        .alias("keep_frac"))
                .orderBy("cell"))

    g = (in_scope.groupBy("cell", "v", "nrm")
         .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
         .withColumn("gmin", F.element_at("ids", 1))
         .localCheckpoint(eager=True))  # feeds three subtrees below
    a = g.select("cell", F.col("gmin").alias("ga"),
                 F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = g.select("cell", F.col("gmin").alias("gb"),
                 F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    # one cosine per unordered group pair, self-pairs included (ga <=
    # gb): the checkpoint pins the QUALIFYING pairs so the
    # two-direction expansion below re-reads a bounded result instead
    # of re-evaluating the dot products (the expensive part)
    cross_q = (a.join(b, "cell")
               .where(F.col("ga") <= F.col("gb"))
               .where(_cosine("va", "vb", "na", "nb")
                      >= SEMDEDUP_THRESHOLD)
               .select("cell", "ga", "gb")
               .localCheckpoint(eager=True))
    # a qualifying (A, B) prunes in BOTH directions (each side's
    # lowest id bounds the other side's members); the self-pair
    # (cos(v, v) >= threshold) is what makes a duplicate group prune
    # its own ids above gmin — min(src) per target group is the rule
    qual = (cross_q.select("cell", F.col("gb").alias("tgt"),
                           F.col("ga").alias("src"))
            .unionByName(cross_q.select("cell", F.col("ga").alias("tgt"),
                                        F.col("gb").alias("src"))))
    m_per_tgt = (qual.groupBy("cell", "tgt")
                 .agg(F.min("src").alias("m"))
                 .withColumnRenamed("cell", "mcell"))
    per_group = (g.join(m_per_tgt,
                        (F.col("cell") == F.col("mcell"))
                        & (F.col("gmin") == F.col("tgt")))
                 .select("cell",
                         F.filter("ids", lambda x: x > F.col("m"))
                         .alias("pruned_ids")))
    pruned_stats = (per_group
                    .filter(F.size("pruned_ids") > 0)
                    .groupBy("cell")
                    .agg(F.sum(F.size("pruned_ids")).alias("n_pruned"),
                         F.min(F.element_at("pruned_ids", 1))
                         .alias("first_pruned")))
    n_kept = F.col("n_vecs") - F.col("n_pruned")
    return (capped.join(pruned_stats, "cell", "left")
            .withColumn("n_pruned",
                        F.coalesce("n_pruned", F.lit(0).cast("long")))
            .select("cell", "n_vecs", "n_pruned", "first_pruned",
                    (n_kept.cast("double") / F.col("n_vecs").cast("double"))
                    .alias("keep_frac"))
            .orderBy("cell"))


_Q141_ORACLE = f"""
WITH {_seeds_ctes(SEMDEDUP_K)},
vecs AS (
  SELECT vec_id, embedding AS v, {_norm_dd('embedding')} AS nrm
  FROM embeddings),
s1 AS (
  SELECT vec_id, v, nrm, s_id,
         {_cosine_dd('v', 's_vec', 'nrm', 's_nrm')} AS s_cos
  FROM vecs CROSS JOIN seeds),
asg AS MATERIALIZED (
  SELECT vec_id, v, nrm, s_id AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        ORDER BY s_cos DESC, s_id ASC) AS rk
    FROM s1) WHERE rk = 1),
sizes AS MATERIALIZED (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
  FROM asg GROUP BY cell
  HAVING COUNT(*) <= {SEMDEDUP_MAX_CLUSTER}),
scoped AS MATERIALIZED (
  SELECT a.* FROM asg a SEMI JOIN sizes s ON a.cell = s.cell),
pruned AS (
  SELECT DISTINCT a.cell, b.vec_id
  FROM scoped a JOIN scoped b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_cosine_dd('a.v', 'b.v', 'a.nrm', 'b.nrm')}
        >= {SEMDEDUP_THRESHOLD}),
ps AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_pruned,
         MIN(vec_id) AS first_pruned
  FROM pruned GROUP BY cell)
SELECT s.cell, s.n_vecs,
       COALESCE(ps.n_pruned, CAST(0 AS BIGINT)) AS n_pruned,
       ps.first_pruned,
       CAST(s.n_vecs - COALESCE(ps.n_pruned, CAST(0 AS BIGINT)) AS DOUBLE)
         / CAST(s.n_vecs AS DOUBLE) AS keep_frac
FROM sizes s LEFT JOIN ps ON s.cell = ps.cell
ORDER BY s.cell
"""


#: Matryoshka truncation width (prefix dims kept) and top-k for q169.
MAT_DIM = 16
MAT_TOPK = 5


def q169_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style embedding truncation gate (Kusupati et al.
    2022: nested representations where a PREFIX of the vector is
    itself a usable embedding): score retrieval with only the first
    MAT_DIM of DIM dims — a 4x memory/bandwidth cut on every ANN
    structure — and measure recall@k against full-dimension exact
    cosine, per query, plus the truncated list's mean full-dim cosine
    (what a user actually loses). The same harness a production system
    runs before committing to a truncation width; pairs with q72's
    int8 scalar quantization as the two compression axes.

    Scale shape: both sides are the q61 broadcast-query brute-force
    scan (candidates never shuffle; two-phase top-k) — the truncated
    pass reads the same column but folds only MAT_DIM terms, which is
    exactly the production saving. The oracle replays both rankings
    with the shared fixed-fold chains, so the recall AND the cosine
    deltas are bit-gated.
    """
    from dataflowtemplates_spark.operators.topk import topk_per_key
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    cs = emb.filter(F.col("vec_id") >= 5)

    # full-dim exact top-k (ground truth) — q61's shape
    exact = ann_bruteforce_topk(qs, cs, k=MAT_TOPK)

    # truncated-cosine top-k: same scan, MAT_DIM-term fold, but carry
    # the FULL-dim cosine alongside so the quality delta is measurable
    q = qs.select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec"),
                  norm_col("embedding").alias("q_nrm"),
                  F.expr(_norm_sql("embedding", MAT_DIM)).alias("q_tnrm"))
    c = cs.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        norm_col("embedding").alias("c_nrm"),
        F.expr(_norm_sql("embedding", MAT_DIM)).alias("c_tnrm"))
    scored = (c.crossJoin(F.broadcast(q))
              .select("q_id", "c_id",
                      F.expr(f"({_dot_sql('q_vec', 'c_vec', MAT_DIM)}) "
                             f"/ (q_tnrm * c_tnrm)").alias("t_cos"),
                      _cosine("q_vec", "c_vec", "q_nrm", "c_nrm")
                      .alias("full_cos")))
    trunc = topk_per_key(scored, "q_id", "t_cos", "c_id", MAT_TOPK,
                         payload=["full_cos"])

    rec = _recall_per_query(trunc, exact, MAT_TOPK,
                            f"matryoshka_{MAT_DIM}")
    # mean full-dim cosine of the truncated list, exact-decimal folded
    # so the mean is order-insensitive cross-engine
    quality = (trunc.groupBy("q_id")
               .agg((F.sum(F.col("full_cos").cast("decimal(20,12)"))
                     .cast("double") / F.lit(float(MAT_TOPK)))
                    .alias("mean_full_cos")))
    return (rec.join(quality, "q_id")
            .select("index_kind", "q_id", "k", "n_hit", "recall",
                    "mean_full_cos")
            .orderBy("q_id"))


def _q169_oracle() -> str:
    return f"""
WITH qn AS (
  SELECT vec_id AS q_id, embedding AS q_vec,
         {_norm_dd('embedding')} AS q_nrm,
         {_norm_dd('embedding', MAT_DIM)} AS q_tnrm
  FROM embeddings WHERE vec_id < 5),
cn AS (
  SELECT vec_id AS c_id, embedding AS c_vec,
         {_norm_dd('embedding')} AS c_nrm,
         {_norm_dd('embedding', MAT_DIM)} AS c_tnrm
  FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q_id, c_id,
         ({_dot_dd('q_vec', 'c_vec', MAT_DIM)}) / (q_tnrm * c_tnrm)
           AS t_cos,
         {_cosine_dd('q_vec', 'c_vec', 'q_nrm', 'c_nrm')} AS full_cos
  FROM cn CROSS JOIN qn),
trunc AS (
  SELECT q_id, c_id, full_cos FROM (
    SELECT q_id, c_id, full_cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY t_cos DESC, c_id ASC) AS rk
    FROM scored) WHERE rk <= {MAT_TOPK}),
exact AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY full_cos DESC, c_id ASC) AS rk
    FROM scored) WHERE rk <= {MAT_TOPK}),
hits AS (
  SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM trunc t JOIN exact e USING (q_id, c_id)
  GROUP BY t.q_id),
quality AS (
  SELECT q_id,
         CAST(SUM(CAST(full_cos AS DECIMAL(20,12))) AS DOUBLE)
           / CAST({MAT_TOPK} AS DOUBLE) AS mean_full_cos
  FROM trunc GROUP BY q_id)
SELECT 'matryoshka_{MAT_DIM}' AS index_kind, u.q_id,
       CAST({MAT_TOPK} AS INTEGER) AS k,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / {float(MAT_TOPK)} AS recall,
       qu.mean_full_cos
FROM (SELECT DISTINCT q_id FROM exact) u
LEFT JOIN hits h USING (q_id)
JOIN quality qu USING (q_id)
ORDER BY u.q_id
"""


def q187_ivf_append_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance under the oracle gate: build
    a PERSISTED IVF index from a base slice, absorb an increment with
    ``append_ivf_index`` (map-only assignment of ONLY the new vectors
    under the frozen codebook — O(batch), the corpus is never
    re-touched), then search it. The DuckDB oracle recomputes the
    search over the UNION from scratch with the shared fixed-fold
    cosine, so a hash match proves the appended index is
    bit-identical to a full rebuild — the contract that lets a 100 TB
    index take a daily increment (codebook refresh stays the declared
    O(table) rebuild, like rebucket for the keyed table).

    Plan shape: build/append are one map-only assignment + one
    cell-partitioned write each; the search reads only the probed
    cells (partition-pruned scan, pinned by tests/test_scale_ops.py)
    and ranks through the two-phase shuffle-free top-k."""
    import shutil
    import tempfile

    from dataflowtemplates_spark.operators.ivf import (
        append_ivf_index, build_ivf_index, search_ivf_index)
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    codebook = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
                    .select("vec_id", "embedding").collect())
    vid = F.col("vec_id")
    base = emb.filter((vid >= 20) & (vid % 3 != 0))
    incr = emb.filter((vid >= 20) & (vid % 3 == 0))
    qrys = emb.filter((vid >= 8) & (vid < 13))

    tmp = tempfile.mkdtemp(prefix="q187_ivf_")
    try:
        path = f"{tmp}/index"
        build_ivf_index(base, codebook, path)
        append_ivf_index(incr, codebook, path)
        out = (search_ivf_index(spark, path, qrys, codebook,
                                k=3, nprobe=2)
               .orderBy("q_id", "rk")
               .localCheckpoint(eager=True))  # pin before teardown
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# the oracle searches a from-scratch index over base UNION increment —
# identical to _Q65_ORACLE's formulas with the q65 candidate filter
# (every vec_id >= 20): append == rebuild is exactly the claim
_Q187_ORACLE = _Q65_ORACLE


QUERIES = {
    "q187_ivf_append_audit": q187_ivf_append_audit,
    "q60_vector_norms": q60_vector_norms,
    "q61_ann_bruteforce": q61_ann_bruteforce,
    "q62_ann_lsh_bucketed": q62_ann_lsh_bucketed,
    "q63_embedding_neardup": q63_embedding_neardup,
    "q64_label_centroids": q64_label_centroids,
    "q65_ann_ivf": q65_ann_ivf,
    "q66_embedding_neardup_lsh": q66_embedding_neardup_lsh,
    "q67_kmeans": q67_kmeans,
    "q88_ann_pq_adc": q88_ann_pq_adc,
    "q72_embedding_quantize": q72_embedding_quantize,
    "q77_embedding_dup_groups": q77_embedding_dup_groups,
    "q103_ann_recall": q103_ann_recall,
    "q169_matryoshka_recall": q169_matryoshka_recall,
    "q137_hybrid_retrieval": q137_hybrid_retrieval,
    "q141_semdedup": q141_semdedup,
    "q153_norm_outliers": q153_norm_outliers,
}

ORACLES = {
    "q187_ivf_append_audit": _Q187_ORACLE,
    "q60_vector_norms": _Q60_ORACLE,
    "q61_ann_bruteforce": _Q61_ORACLE,
    "q62_ann_lsh_bucketed": _Q62_ORACLE,
    "q63_embedding_neardup": _Q63_ORACLE,
    "q64_label_centroids": _Q64_ORACLE,
    "q65_ann_ivf": _Q65_ORACLE,
    "q66_embedding_neardup_lsh": _Q66_ORACLE,
    "q67_kmeans": _Q67_ORACLE,
    "q88_ann_pq_adc": _q88_oracle(),
    "q72_embedding_quantize": _Q72_ORACLE,
    "q77_embedding_dup_groups": _Q77_ORACLE,
    "q103_ann_recall": _q103_oracle(),
    "q169_matryoshka_recall": _q169_oracle(),
    "q137_hybrid_retrieval": _q137_oracle(),
    "q141_semdedup": _Q141_ORACLE,
    "q153_norm_outliers": _Q153_ORACLE,
}
