"""Skew-resistance operators: salting patterns for hot keys.

Spark already does map-side partial aggregation for algebraic
functions (sum/count/min/max), so those never need salting. The two
places a hot key genuinely breaks a job at 100 TB, and the operators
here that fix them:

* **Exact distinct-count per key** (`salted_distinct_count`): Spark's
  COUNT(DISTINCT x) expands to a two-shuffle plan whose first grouping
  keys every distinct (key, value) pair into the key's reducer — one
  hot key = one giant reducer. Salting by HASH OF THE VALUE keeps
  equal values in the same salt bucket (no double counting, no global
  dedup needed) while spreading a hot key over `buckets` reducers:
  stage 1 counts distinct values within (key, salt), stage 2 sums the
  per-salt counts. Bit-identical to the unsalted result by
  construction.
* **Skewed equi-join** (`salted_join`): the big side gets a RANDOM
  salt in [0, buckets), the small side is exploded once per salt
  value, and the join key becomes (key, salt) — a hot key's rows land
  on `buckets` reducers instead of one. Row multiplication happens
  only on the SMALL side (x buckets). AQE's skew-join split handles
  mild skew automatically; this is the explicit form for extreme keys
  or non-AQE environments.

Reference parity note: mercari/DataflowTemplates delegates shuffling
to Dataflow's liquid sharding; these are the Spark-native equivalents
(engine infrastructure, SURVEY §7 scale plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_distinct_count", "salted_join"]


def salted_distinct_count(df: DataFrame, keys: list[str], value: str,
                          buckets: int = 16,
                          out: str = "n_distinct") -> DataFrame:
    """Exact COUNT(DISTINCT value) GROUP BY keys, skew-spread.

    Salt = hash(value) % buckets: equal values always share a bucket,
    so per-bucket distinct counts partition the distinct set and their
    sum is exact.
    """
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(buckets)).alias("_salt")
    partial = (df.select(*keys, F.col(value), salt)
               .groupBy(*keys, "_salt")
               .agg(F.countDistinct(value).alias("_pc")))
    return (partial.groupBy(*keys)
            .agg(F.sum("_pc").alias(out)))


#: Join types whose semantics survive small-side replication: every
#: big-side row carries exactly one salt, so inner/left/left_semi
#: results are unchanged. right/full outer would emit each UNMATCHED
#: small row once per salt bucket, and left_anti/right variants
#: likewise break — refuse rather than silently multiply rows.
_SALT_SAFE_JOINS = frozenset({
    "inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi",
})


def salted_join(big: DataFrame, small: DataFrame, key: str,
                buckets: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the hot-key shuffle spread over ``buckets``
    reducers. The small side is replicated x buckets (explode of a
    literal range — no extra scan); the big side gets a uniform salt.
    Output columns match ``big.join(small, key, how)``.

    Only ``inner``/``left``/``left_semi`` are accepted: the replicated
    small side makes right/full-outer/anti forms emit each unmatched
    small-side row ``buckets`` times (raises ``ValueError``).
    """
    if how.lower() not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side "
            f"is replicated {buckets}x, so only "
            "inner/left/left_semi joins keep their semantics")
    salted_big = big.withColumn(
        "_salt", (F.rand() * buckets).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
