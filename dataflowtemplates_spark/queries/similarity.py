"""Similarity search over the `embeddings` table (array<float>, 64-dim).

The ANN toolkit for a training-data pipeline: brute-force cosine top-k
as the exact baseline (query side broadcast — the candidate scan stays
partition-local, no shuffle of the big side), a sign-bucket LSH variant
as the scale path (bucket join instead of cross join), plus vector
hygiene ops (norms, per-label centroids, near-dup pairs).

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

#: Spark-side exact left-fold dot product of two array<float> columns.
_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0 as double), (acc, v) -> acc + v)")
_NORM = ("sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
         "cast(0 as double), (acc, v) -> acc + v))")

#: DuckDB-side identical fold (list_reduce is a left fold too).
_DOT_DD = ("list_reduce(list_transform(range(1, 65), "
           "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
           "(acc, v) -> acc + v)")
_NORM_DD = ("sqrt(list_reduce(list_transform(range(1, 65), "
            "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), "
            "(acc, v) -> acc + v))")


def dot_col(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def norm_col(a: str) -> F.Column:
    return F.expr(_NORM.format(a=a))


def cosine_col(a: str, b: str) -> F.Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


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


def ann_bruteforce_topk(queries_df: DataFrame, candidates: DataFrame,
                        k: int = 5) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    candidate scan; rank per query with a deterministic tiebreak.

    At 100 TB the candidate side is the big table and never shuffles —
    each partition scores locally against the broadcast queries, and
    only (n_queries x k x n_partitions) rows reach the final top-k.
    """
    from pyspark.sql import Window as W
    q = queries_df.select(F.col("vec_id").alias("q_id"),
                          F.col("embedding").alias("q_vec"))
    c = candidates.select(F.col("vec_id").alias("c_id"),
                          F.col("embedding").alias("c_vec"),
                          F.col("label").alias("c_label"))
    scored = (c.crossJoin(F.broadcast(q))
              .select("q_id", "c_id", "c_label",
                      cosine_col("q_vec", "c_vec").alias("cosine")))
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
WITH scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label AS c_label,
         {_DOT_DD.format(a='q.embedding', b='c.embedding')}
           / ({_NORM_DD.format(a='q.embedding')} * {_NORM_DD.format(a='c.embedding')}) AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 5 AND c.vec_id >= 5),
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
    emb = spark.table("embeddings")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec"),
                 _bucket_col("embedding").alias("bucket")))
    c = (emb.filter(F.col("vec_id") >= 5)
         .select(F.col("vec_id").alias("c_id"),
                 F.col("embedding").alias("c_vec"),
                 _bucket_col("embedding").alias("bucket")))
    scored = (c.join(F.broadcast(q), "bucket")
              .select("q_id", "c_id", "bucket",
                      cosine_col("q_vec", "c_vec").alias("cosine")))
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
  SELECT vec_id AS q_id, embedding AS q_vec, {_bucket_dd('embedding')} AS bucket
  FROM embeddings WHERE vec_id < 5),
c AS (
  SELECT vec_id AS c_id, embedding AS c_vec, {_bucket_dd('embedding')} AS bucket
  FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q_id, c_id, q.bucket AS bucket,
         {_DOT_DD.format(a='q_vec', b='c_vec')}
           / ({_NORM_DD.format(a='q_vec')} * {_NORM_DD.format(a='c_vec')}) AS cosine
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
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_col("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
        .orderBy("id_a", "id_b")
    )


_Q63_ORACLE = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_DOT_DD.format(a='a.embedding', b='b.embedding')}
         / ({_NORM_DD.format(a='a.embedding')} * {_NORM_DD.format(a='b.embedding')}) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND a.vec_id < 120 AND b.vec_id < 120
  AND {_DOT_DD.format(a='a.embedding', b='b.embedding')}
        / ({_NORM_DD.format(a='a.embedding')} * {_NORM_DD.format(a='b.embedding')}) >= 0.35
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
