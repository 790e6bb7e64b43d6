"""Similarity search over the `embeddings` table (array<float>, 64-dim).

The ANN toolkit for a training-data pipeline: brute-force cosine top-k
as the exact baseline (query side broadcast — the candidate scan stays
partition-local, no shuffle of the big side), a sign-bucket LSH variant
as the scale path (bucket join instead of cross join), plus vector
hygiene ops (norms, per-label centroids, near-dup pairs).

Plan-shape rule learned from measurement: per-PAIR work must be a
single fold. Norms are per-ROW quantities — computing them inside the
pair loop (cosine = dot/(|a||b|)) costs 3 interpreted array folds per
pair instead of 1 and measured 20x slower. Every operator here
pre-normalizes vectors once per row, then the join computes only the
dot product of unit vectors.

Determinism contract: dot products are computed as an explicit
left-fold over the array (`aggregate` in Spark, `list_reduce` in
DuckDB) after casting to double, so both engines execute the identical
IEEE operation sequence and produce bit-identical doubles — raw values
hash-match with no rounding or tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables

#: Spark-side exact left-fold dot product of two array<double> columns.
_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "cast(0 as double), (acc, v) -> acc + v)")
_NORM = ("sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
         "cast(0 as double), (acc, v) -> acc + v))")
#: Unit-normalized copy of a float-vector column (one pass per row).
_UNIT = "transform({a}, x -> cast(x as double) / {n})"

#: DuckDB-side identical folds (list_reduce is a left fold too).
_DOT_DD = ("list_reduce(list_transform(range(1, 65), "
           "i -> {a}[i] * {b}[i]), "
           "(acc, v) -> acc + v)")
_NORM_DD = ("sqrt(list_reduce(list_transform(range(1, 65), "
            "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), "
            "(acc, v) -> acc + v))")
_UNIT_DD = "list_transform({a}, x -> CAST(x AS DOUBLE) / {n})"


def dot_col(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def norm_col(a: str) -> F.Column:
    return F.expr(_NORM.format(a=a))


def unit_col(a: str) -> F.Column:
    """Unit-normalize: computes the norm once, then scales each component."""
    return F.expr(_UNIT.format(a=a, n=_NORM.format(a=a)))


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
       {_NORM_DD.format(a='embedding')} AS l2_norm,
       CAST(embedding[1] AS DOUBLE) AS c0
FROM embeddings ORDER BY vec_id
"""


def _prenormalized(df: DataFrame, id_alias: str, vec_alias: str,
                   extra: dict[str, str] | None = None) -> DataFrame:
    """vec_id + unit vector (+extras), repartitioned for compute balance.

    The norm is computed as its own column on the far side of the
    repartition Exchange. The boundary matters twice over: it stops
    CollapseProject from re-inlining the norm fold into the transform
    lambda (interpreted lambdas don't hoist loop-invariant
    subexpressions — inline costs O(dim^2) per row, measured 3.6x),
    and it spreads the fold work across cores when the source is a
    single small file.
    """
    spark = df.sparkSession
    extra = extra or {}
    base = df.select(
        F.col("vec_id").alias(id_alias), "embedding",
        norm_col("embedding").alias("_nrm"),
        *[F.col(src).alias(dst) for src, dst in extra.items()])
    return (base.repartition(spark.sparkContext.defaultParallelism)
            .select(F.col(id_alias),
                    F.expr("transform(embedding, x -> cast(x as double) / _nrm)")
                     .alias(vec_alias),
                    *[F.col(dst) for dst in extra.values()]))


def ann_bruteforce_topk(queries_df: DataFrame, candidates: DataFrame,
                        k: int = 5) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) pre-normalized query
    set against the pre-normalized candidate scan; rank per query with
    a deterministic tiebreak.

    At 100 TB the candidate side is the big table and never shuffles —
    each partition scores locally against the broadcast queries (one
    dot-fold per pair), and only (n_queries x k x n_partitions) rows
    reach the final top-k.
    """
    from pyspark.sql import Window as W
    q = _prenormalized(queries_df, "q_id", "q_vec")
    c = _prenormalized(candidates, "c_id", "c_vec", {"label": "c_label"})
    scored = (c.crossJoin(F.broadcast(q))
              .select("q_id", "c_id", "c_label",
                      dot_col("q_vec", "c_vec").alias("cosine")))
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


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
  SELECT vec_id AS q_id,
         {_UNIT_DD.format(a='embedding', n=_NORM_DD.format(a='embedding'))} AS q_vec
  FROM embeddings WHERE vec_id < 5),
cn AS (
  SELECT vec_id AS c_id, label AS c_label,
         {_UNIT_DD.format(a='embedding', n=_NORM_DD.format(a='embedding'))} AS c_vec
  FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q_id, c_id, c_label,
         {_DOT_DD.format(a='q_vec', b='c_vec')} AS cosine
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
    from pyspark.sql import Window as W
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings").withColumn(
        "bucket", _bucket_col("embedding"))
    q = _prenormalized(emb.filter(F.col("vec_id") < 5),
                       "q_id", "q_vec", {"bucket": "bucket"})
    c = _prenormalized(emb.filter(F.col("vec_id") >= 5),
                       "c_id", "c_vec", {"bucket": "bucket"})
    scored = (c.join(F.broadcast(q), "bucket")
              .select("q_id", "c_id", "bucket",
                      dot_col("q_vec", "c_vec").alias("cosine")))
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("q_id", "rk", "c_id", "bucket", "cosine")
            .orderBy("q_id", "rk"))


def _bucket_dd(vec: str) -> str:
    return " || ".join(
        f"(CASE WHEN {vec}[{d}] > 0 THEN '1' ELSE '0' END)" for d in _LSH_DIMS)


_Q62_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS q_id,
         {_UNIT_DD.format(a='embedding', n=_NORM_DD.format(a='embedding'))} AS q_vec,
         {_bucket_dd('embedding')} AS bucket
  FROM embeddings WHERE vec_id < 5),
c AS (
  SELECT vec_id AS c_id,
         {_UNIT_DD.format(a='embedding', n=_NORM_DD.format(a='embedding'))} AS c_vec,
         {_bucket_dd('embedding')} AS bucket
  FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q_id, c_id, q.bucket AS bucket,
         {_DOT_DD.format(a='q_vec', b='c_vec')} AS cosine
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
    a = _prenormalized(emb, "id_a", "va")
    b = _prenormalized(emb, "id_b", "vb")
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot_col("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
        .orderBy("id_a", "id_b")
    )


_Q63_ORACLE = f"""
WITH un AS (
  SELECT vec_id,
         {_UNIT_DD.format(a='embedding', n=_NORM_DD.format(a='embedding'))} AS uv
  FROM embeddings WHERE vec_id < 120)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_DOT_DD.format(a='a.uv', b='b.uv')} AS cosine
FROM un a, un b
WHERE a.vec_id < b.vec_id
  AND {_DOT_DD.format(a='a.uv', b='b.uv')} >= 0.35
ORDER BY id_a, id_b
"""


def q64_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components via posexplode + exact-decimal mean
    (float sums are order-dependent; DECIMAL(20,8) sums are not)."""
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    comp = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    return (
        comp.filter(F.col("pos") < 8)
        .groupBy("label", "pos")
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


QUERIES = {
    "q60_vector_norms": q60_vector_norms,
    "q61_ann_bruteforce": q61_ann_bruteforce,
    "q62_ann_lsh_bucketed": q62_ann_lsh_bucketed,
    "q63_embedding_neardup": q63_embedding_neardup,
    "q64_label_centroids": q64_label_centroids,
}

ORACLES = {
    "q60_vector_norms": _Q60_ORACLE,
    "q61_ann_bruteforce": _Q61_ORACLE,
    "q62_ann_lsh_bucketed": _Q62_ORACLE,
    "q63_embedding_neardup": _Q63_ORACLE,
    "q64_label_centroids": _Q64_ORACLE,
}
