"""Deduplication operators over the `documents` table.

The 100 TB dedup toolkit: exact (hash over normalized text — ONE
shuffle on the fingerprint, window-based so the hash is computed
once), MinHash+LSH (word-shingle -> minhash signature -> band ->
bucket-join; candidate generation is linear + one shuffle on band
keys, never O(n^2)), SimHash (bitwise near-dup sketch), and n-gram
Jaccard (the exact verifier you run on LSH candidates only).

LSH parameter note (learned from measurement, see BENCH history):
5-char shingles with band_size=2 put every pair of English documents
in a shared bucket — 1.5M candidate pairs from 5k docs, i.e. the
quadratic blowup LSH exists to avoid. 3-word shingles with
band_size=4 (2 bands x 4 hashes) collide only on genuine near-dups;
that is the configuration that survives a 100x scale-up.

Determinism contract: hashes are md5 hex strings (identical in Spark
and DuckDB); "minhash" takes the lexicographic MIN of salted md5 hex
digests, which is engine-independent — no integer-hash portability
problem. Jaccard is int/int double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables

#: MinHash permutations and LSH banding: 8 hashes, 2 bands x 4.
N_HASHES = 8
BAND_SIZE = 4
#: Words per shingle.
SHINGLE_WORDS = 3
#: Default hot-bucket cap for LSH pair generation. The SAME constant is
#: baked into the q52/q55/q56 oracles (HAVING COUNT(*) <= MAX_BUCKET per
#: band_key), so Spark and DuckDB drop exactly the same degenerate
#: buckets — the cap is part of the operator's declared semantics, not a
#: silent divergence from the oracle.
MAX_BUCKET = 256


def _normalized() -> F.Column:
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "))


def q50_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: fingerprint -> keeper = min(doc_id) per group.

    Window over the fingerprint instead of groupBy+self-join: the
    normalization+md5 runs once per row and there is exactly one
    shuffle (on the 32-hex fp). At 100 TB this is the cheapest dedup
    pass and runs first in any pipeline.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    w = W.partitionBy("fp")
    return (
        docs.select("doc_id", F.md5(_normalized().cast("binary")).alias("fp"))
        .select("doc_id",
                F.min("doc_id").over(w).alias("keeper_id"),
                F.count(F.lit(1)).over(w).alias("group_size"))
        .select("doc_id", "keeper_id", "group_size",
                (F.col("doc_id") != F.col("keeper_id")).alias("is_duplicate"))
        .orderBy("doc_id")
    )


_Q50_ORACLE = """
WITH hashed AS (
  SELECT doc_id,
         MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'),
                                 ' +', ' ', 'g'))) AS fp
  FROM documents),
keepers AS (
  SELECT fp, MIN(doc_id) AS keeper_id, COUNT(*) AS group_size
  FROM hashed GROUP BY fp)
SELECT doc_id, keeper_id, group_size, doc_id <> keeper_id AS is_duplicate
FROM hashed JOIN keepers USING (fp)
ORDER BY doc_id
"""

#: Word-shingle set, computed ONCE per document (array column).
_SHINGLES_SPARK = (
    "array_distinct(transform("
    f"sequence(1, greatest(size(split(text, ' ')) - {SHINGLE_WORDS - 1}, 1)), "
    f"i -> concat_ws(' ', slice(split(text, ' '), i, {SHINGLE_WORDS}))))"
)

_SHINGLES_DD = (
    "LIST_DISTINCT(LIST_TRANSFORM("
    f"RANGE(1, GREATEST(LEN(STRING_SPLIT(text, ' ')) - {SHINGLE_WORDS - 1}, 1) + 1), "
    f"i -> ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '), i, i + {SHINGLE_WORDS - 1}), ' ')))"
)


def minhash_signature(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """doc_id + mh_0..mh_{n-1} columns (the reusable operator).

    Each shingle is md5'd ONCE; permutation i is the min over the
    4-hex-char slice [4i, 4i+4) of the digests. One expensive hash +
    n cheap substrings per shingle instead of n hashes (measured 3x
    on the md5-dominated pass). A 16-bit min per permutation is
    plenty for banding: a band of 4 concatenated mins carries 64
    bits, so unrelated docs don't collide.

    Plan shape: the shingle array (a per-row higher-order expression)
    is EXPLODED, so the hot md5 + substring + min path runs on flat
    rows inside WholeStageCodegen rather than as interpreted
    transform() lambdas (interpreted HOFs measured 10-20x slower in a
    long-lived JVM as megamorphic call sites defeat the JIT). min() is
    algebraic, so the groupBy does a map-side partial aggregate —
    the shuffle carries ~one row per document, not per shingle. The
    input is spread over the cluster ONLY when the scan arrived
    narrower than defaultParallelism (a single small file would
    otherwise pin the explode to one core; an at-scale scan already
    has the parallelism and must not pay a corpus-wide shuffle).
    """
    if n_hashes > 8:
        raise ValueError("n_hashes > 8 needs a second digest (32 hex / 4)")
    from dataflowtemplates_spark.operators.partitioning import spread_if_narrow
    docs = spread_if_narrow(docs)
    shingles = docs.select(
        "doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("s"))
    hashed = shingles.select("doc_id", F.md5("s").alias("h"))
    return hashed.groupBy("doc_id").agg(*[
        F.min(F.substring("h", 4 * i + 1, 4)).alias(f"mh_{i}")
        for i in range(n_hashes)
    ])


def q51_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return minhash_signature(spark.table("documents")).orderBy("doc_id")


def _mh_oracle(i: int) -> str:
    return (f"LIST_AGGREGATE(LIST_TRANSFORM(hs, h -> SUBSTRING(h, {4 * i + 1}, 4)), 'min')")


_HASHED_CTE = (f"WITH shingled AS (SELECT doc_id, {_SHINGLES_DD} AS sh FROM documents),\n"
               "hashed AS (SELECT doc_id, LIST_TRANSFORM(sh, s -> MD5(s)) AS hs FROM shingled)")

_Q51_ORACLE = _HASHED_CTE + "\nSELECT doc_id, " + ", ".join(
    f"{_mh_oracle(i)} AS mh_{i}" for i in range(N_HASHES)
) + " FROM hashed ORDER BY doc_id"


def lsh_candidate_pairs(docs: DataFrame,
                        n_hashes: int = N_HASHES,
                        band_size: int = BAND_SIZE,
                        max_bucket_size: int | None = MAX_BUCKET,
                        drop_metrics=None,
                        signature: DataFrame | None = None) -> DataFrame:
    """MinHash-LSH candidate pairs: band the signature, shuffle on the
    band key, generate pairs inside each bucket.

    Single pass over the corpus (the expensive minhash projection runs
    ONCE — a self-join would execute it twice, once per side), one
    shuffle on band_key, and in-bucket pair generation from the
    collected id list. Buckets only hold genuine near-dup candidates,
    so the in-bucket quadratic is tiny; the corpus-level O(n^2) never
    materializes, which is the whole point at 100 TB.

    Degenerate hot buckets (empty/boilerplate near-identical docs — at
    web scale a single band bucket can hold millions of ids, i.e. one
    task with an O(b^2) pair explosion) are CAPPED: bucket size is
    computed with a count-over-window on the SAME band_key shuffle
    (spill-safe; no second exchange) and buckets above
    ``max_bucket_size`` are dropped BEFORE collect_list ever
    materializes an id array. Pass a pyspark Observation as
    ``drop_metrics`` to record how many (rows, buckets-worth of) ids
    were dropped by the cap — it rides the same job, no extra scan.
    Dropped buckets are boilerplate by construction; their members
    still reach exact verification through OTHER, more selective bands.

    The cap is PART OF THE CONTRACT: the driver-gated q52/q55/q56
    oracles apply the identical ``HAVING COUNT(*) <= MAX_BUCKET`` per
    band_key, so both engines agree on hot-bucket data too. Pass
    ``max_bucket_size=None`` for the uncapped form (exact LSH pair
    enumeration, e.g. for recall studies on bounded corpora).
    """
    from pyspark.sql import Window as W
    sig = signature if signature is not None \
        else minhash_signature(docs, n_hashes)
    bands = []
    for b in range(n_hashes // band_size):
        cols = [f"mh_{b * band_size + j}" for j in range(band_size)]
        bands.append(F.md5(F.concat_ws("|", F.lit(str(b)), *cols)).alias("band_key"))
    banded = sig.select(
        "doc_id",
        F.explode(F.array(*bands)).alias("band_key"))
    sized = banded.withColumn(
        "bs", F.count(F.lit(1)).over(W.partitionBy("band_key")))
    if drop_metrics is not None:
        # With no cap nothing is ever dropped; comparing against a NULL
        # literal would silently report 0 *and* a NULL-poisoned filter.
        dropped = (F.sum(F.when(F.col("bs") > max_bucket_size, 1).otherwise(0))
                   if max_bucket_size is not None else
                   F.sum(F.lit(0)))
        sized = sized.observe(drop_metrics, dropped.alias("dropped_ids"))
    cond = F.col("bs") > 1
    if max_bucket_size is not None:
        cond = cond & (F.col("bs") <= max_bucket_size)
    capped = sized.filter(cond)
    buckets = (capped.groupBy("band_key")
               .agg(F.sort_array(F.collect_list("doc_id")).alias("ids")))
    pairs = buckets.select(F.explode(F.expr(
        "flatten(transform(sequence(1, size(ids) - 1), "
        "i -> transform(slice(ids, i + 1, size(ids) - i), "
        "y -> struct(element_at(ids, i) AS doc_a, y AS doc_b))))"
    )).alias("p"))
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def q52_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return (lsh_candidate_pairs(spark.table("documents"))
            .orderBy("doc_a", "doc_b"))


def _band_oracle(b: int) -> str:
    cols = " || '|' || ".join(
        f"{_mh_oracle(b * BAND_SIZE + j)}" for j in range(BAND_SIZE))
    return f"MD5('{b}' || '|' || {cols})"


def _capped_banded_cte() -> str:
    """banded + hot-bucket-cap CTEs shared by the q52/q55/q56 oracles.

    Mirrors ``lsh_candidate_pairs``'s count-over-window cap exactly:
    band keys whose bucket holds more than MAX_BUCKET doc_ids are
    dropped in BOTH engines, so the cap is declared semantics rather
    than a Spark-side divergence.
    """
    union = "\nUNION ALL\n".join(
        f"  SELECT doc_id, {_band_oracle(b)} AS band_key FROM hashed"
        for b in range(N_HASHES // BAND_SIZE))
    return ("banded AS (\n" + union + "\n),\n"
            "kept_buckets AS (\n"
            "  SELECT band_key FROM banded GROUP BY band_key\n"
            f"  HAVING COUNT(*) <= {MAX_BUCKET}),\n"
            "capped AS (\n"
            "  SELECT bd.doc_id, bd.band_key FROM banded bd\n"
            "  JOIN kept_buckets USING (band_key))")


_Q52_ORACLE = _HASHED_CTE + ",\n" + _capped_banded_cte() + """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM capped a JOIN capped b
  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


def _exact_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Exact word-trigram Jaccard for every sharing pair of the given
    (bounded) document set — the verification kernel shared by q53 and
    the q148 recall gate. Returns doc_a, doc_b, n_shared, jaccard."""
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 2), "
            "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"))).alias("gram"))
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (a.join(b, (F.col("a.gram") == F.col("b.gram"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("n_shared")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    return (shared.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", "n_shared",
                    (F.col("n_shared").cast("double")
                     / (F.col("na") + F.col("nb") - F.col("n_shared")))
                    .alias("jaccard")))


def q53_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-shingle Jaccard on a bounded candidate set.

    At scale this runs only on LSH candidates (q52); here it sweeps
    doc_id < 120 pairwise to exercise the exact math. Window/threshold
    chosen so the result is NON-EMPTY at the correctness gate's sf0.01
    (201 pairs) — a 0-row pass proves nothing about the Jaccard math.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents").filter(F.col("doc_id") < 120)
    return (_exact_jaccard_pairs(docs)
            .filter(F.col("jaccard") >= 0.01)
            .orderBy("doc_a", "doc_b"))


_Q53_ORACLE = """
WITH grams AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
           i -> ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '), i, i + 2), ' ')))) AS gram
  FROM documents WHERE doc_id < 120),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, n_shared,
       CAST(n_shared AS DOUBLE) / (sa.n_grams + sb.n_grams - n_shared) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_shared AS DOUBLE) / (sa.n_grams + sb.n_grams - n_shared) >= 0.01
ORDER BY doc_a, doc_b
"""

#: q148 recall-gate knobs: truth = exact trigram-Jaccard >= TRUTH
#: pairs inside the bounded doc_id < SLICE set (exact all-pairs there
#: is affordable in both engines); the gate asserts the production
#: capped-LSH pass recovers >= FLOOR of them.
LSH_RECALL_SLICE = 600
LSH_RECALL_TRUTH = 0.5
LSH_RECALL_FLOOR = 0.9


def q148_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-recall quality gate — the dedup twin of q103's ANN
    recall gate ("measure, don't guess"): run the PRODUCTION MinHash-
    LSH candidate pass (full corpus, hot-bucket cap and all) and score
    its recall against exact trigram-Jaccard ground truth computed on
    a bounded slice where all-pairs verification is affordable.

    Scale shape: truth is exact only over the O(slice^2) bounded set;
    the LSH side is the same single-pass banded pipeline q52 ships.
    One row out: counts, recall, and the floor boolean the oracle
    asserts — at 8 hashes x 2 bands the S-curve gives ~0.9+ hit
    probability at Jaccard 0.9, and corpus near-dups are
    near-identical, so the measured recall sits at 1.0 (floor 0.9
    leaves S-curve headroom without accepting a broken pass).
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    truth = (_exact_jaccard_pairs(
                 docs.filter(F.col("doc_id") < LSH_RECALL_SLICE))
             .filter(F.col("jaccard") >= LSH_RECALL_TRUTH)
             .select("doc_a", "doc_b"))
    cand = (lsh_candidate_pairs(docs)
            .filter((F.col("doc_a") < LSH_RECALL_SLICE)
                    & (F.col("doc_b") < LSH_RECALL_SLICE)))
    hit = truth.join(cand, ["doc_a", "doc_b"], "left_semi")
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    nh = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    recall = F.when(F.col("n_truth") == 0, F.lit(1.0)).otherwise(
        F.col("n_hit").cast("double") / F.col("n_truth").cast("double"))
    return (nt.crossJoin(nc).crossJoin(nh)
            .select("n_truth", "n_candidates", "n_hit",
                    recall.alias("recall"),
                    (recall >= F.lit(LSH_RECALL_FLOOR)).alias("recall_ok")))


_Q148_ORACLE = _HASHED_CTE + ",\n" + _capped_banded_cte() + f""",
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
  WHERE a.doc_id < {LSH_RECALL_SLICE} AND b.doc_id < {LSH_RECALL_SLICE}),
grams AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
           i -> ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '), i, i + 2), ' ')))) AS gram
  FROM documents WHERE doc_id < {LSH_RECALL_SLICE}),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
truth AS (
  SELECT doc_a, doc_b FROM shared
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_shared AS DOUBLE) / (sa.n_grams + sb.n_grams - n_shared)
        >= {LSH_RECALL_TRUTH}),
hit AS (SELECT t.doc_a, t.doc_b FROM truth t JOIN cand USING (doc_a, doc_b)),
agg AS (
  SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
         (SELECT COUNT(*) FROM cand) AS n_candidates,
         (SELECT COUNT(*) FROM hit) AS n_hit)
SELECT n_truth, n_candidates, n_hit,
       CASE WHEN n_truth = 0 THEN CAST(1 AS DOUBLE)
            ELSE CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)
       END AS recall,
       CASE WHEN n_truth = 0 THEN CAST(1 AS DOUBLE)
            ELSE CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)
       END >= {LSH_RECALL_FLOOR} AS recall_ok
FROM agg
"""


def q55_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline END TO END: one minhash pass feeds both the
    LSH candidate generation and the per-pair signature-agreement
    estimate; candidates are then verified with exact shingle Jaccard
    and a keep-smallest-id drop decision.

    Plan notes for 100 TB: the signature feeds THREE consumers (band
    generation, est_a, est_b), and DataFrame reuse re-executes lineage
    — audited with .explain, the naive form scanned documents 12x and
    ran the minhash aggregation 8x. It is therefore MATERIALIZED once
    (eager localCheckpoint — the signature is ~8 shorts/doc, a rounding
    error next to the corpus; at production scale this is "persist the
    signature table", the same state IVF keeps for inverted lists).
    Exact verification joins grams only for documents that appear in
    some candidate pair (a semi-join prune — the corpus-level gram
    self-join never happens), and every stage inherits the bucketed/
    capped shapes of the underlying operators.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    sig = minhash_signature(docs).localCheckpoint(eager=True)
    # pairs also fans out to four consumers (est join, candidate-id
    # prune, shared-gram count, final assembly) — materialize the tiny
    # candidate list too or its banding lineage re-executes per branch
    # (plan audit: 20 exchanges / 6 windows before, 8 / 0 after)
    pairs = lsh_candidate_pairs(docs, signature=sig) \
        .localCheckpoint(eager=True)

    siga = sig.select(F.col("doc_id").alias("doc_a"),
                      *[F.col(f"mh_{i}").alias(f"_a{i}")
                        for i in range(N_HASHES)])
    sigb = sig.select(F.col("doc_id").alias("doc_b"),
                      *[F.col(f"mh_{i}").alias(f"_b{i}")
                        for i in range(N_HASHES)])
    agree = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        for i in range(N_HASHES))

    cand_ids = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")).distinct()
    grams = (docs.join(cand_ids, "doc_id", "left_semi")
             .select("doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("gram")))
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    ga = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    shared = (pairs.join(ga, "doc_a").join(gb, ["doc_b", "gram"])
              .groupBy("doc_a", "doc_b")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_grams").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_grams").alias("_nb"))

    return (pairs
            .join(siga, "doc_a").join(sigb, "doc_b")
            .withColumn("est_jaccard",
                        agree.cast("double") / F.lit(float(N_HASHES)))
            .join(shared, ["doc_a", "doc_b"], "left")
            .join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)))
            .withColumn("jaccard",
                        F.col("n_shared").cast("double")
                        / (F.col("_na") + F.col("_nb") - F.col("n_shared")))
            .withColumn("drop_b", F.col("jaccard") >= 0.5)
            .select("doc_a", "doc_b", "est_jaccard", "jaccard", "drop_b")
            .orderBy("doc_a", "doc_b"))


_Q55_SIG = "SELECT doc_id, " + ", ".join(
    f"{_mh_oracle(i)} AS mh_{i}" for i in range(N_HASHES)) + " FROM hashed"

_Q55_ORACLE = _HASHED_CTE + ",\n" + _capped_banded_cte() + f""",
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
sig AS ({_Q55_SIG}),
cand AS (SELECT doc_a AS doc_id FROM pairs
         UNION SELECT doc_b FROM pairs),
grams AS (
  SELECT doc_id, UNNEST({_SHINGLES_DD}) AS gram
  FROM documents WHERE doc_id IN (SELECT doc_id FROM cand)),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
shared AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_shared
  FROM pairs p
  JOIN grams ga ON ga.doc_id = p.doc_a
  JOIN grams gb ON gb.doc_id = p.doc_b AND gb.gram = ga.gram
  GROUP BY 1, 2)
SELECT p.doc_a AS doc_a, p.doc_b AS doc_b,
       CAST({" + ".join(f"(CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END)"
                        for i in range(N_HASHES))} AS DOUBLE)
         / {float(N_HASHES)} AS est_jaccard,
       CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
         / (sa.n_grams + sb.n_grams - COALESCE(s.n_shared, 0)) AS jaccard,
       CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
         / (sa.n_grams + sb.n_grams - COALESCE(s.n_shared, 0)) >= 0.5 AS drop_b
FROM pairs p
JOIN sig a ON a.doc_id = p.doc_a
JOIN sig b ON b.doc_id = p.doc_b
LEFT JOIN shared s ON s.doc_a = p.doc_a AND s.doc_b = p.doc_b
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
ORDER BY p.doc_a, p.doc_b
"""


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iter: int = 20) -> DataFrame:
    """Connected components by iterative min-label propagation — the
    transitive-closure step that turns pairwise near-dup hits into
    dedup GROUPS (keep one doc per component).

    Each iteration joins current labels across the (symmetrized) edge
    list and takes the min label seen per node; convergence is
    O(component diameter) iterations — near-dup clusters are shallow,
    so typically 2-4. Per-iteration results are localCheckpoint'ed:
    iterative lineage otherwise grows a plan per round (the classic
    Spark iteration trap). The driver-side loop only ever moves ONE
    scalar (the changed-count) — all data stays distributed.

    Output: (node, component) with component = min node id reachable.
    """
    edges = (pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
             .unionByName(pairs.select(F.col(dst).alias("a"),
                                       F.col(src).alias("b")))
             .distinct().localCheckpoint(eager=True))
    labels = (edges.select(F.col("a").alias("node")).distinct()
              .withColumn("comp", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        prop = (edges.join(labels, edges.a == labels.node)
                .select(F.col("b").alias("node"), "comp"))
        # the old label rides the propagation result into ONE
        # checkpointed materialization, so the convergence check is a
        # trivial filter-count over already-materialized rows instead
        # of a second join job per iteration (halves the driver-side
        # job count, which IS the cost of this loop — the data per
        # iteration is label-sized, not corpus-sized)
        merged = (labels.unionByName(prop)
                  .groupBy("node").agg(F.min("comp").alias("comp"))
                  .join(labels.select("node",
                                      F.col("comp").alias("_old")), "node")
                  .localCheckpoint(eager=True))
        changed = merged.filter(F.col("comp") != F.col("_old")).count()
        labels = merged.select("node", "comp")
        if changed == 0:
            break
    return labels


def q56_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup GROUPS: LSH candidate pairs -> connected components ->
    per-doc group leader + group size (the keep-one-per-group decision
    a corpus dedup actually ships). Iterative distributed algorithm on
    the Spark side; the oracle proves it with a recursive-CTE
    transitive closure in DuckDB."""
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    pairs = lsh_candidate_pairs(docs)
    comp = connected_components(pairs)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("group_size"))
    return (comp.join(sizes, "comp")
            .select(F.col("node").alias("doc_id"),
                    F.col("comp").alias("group_leader"),
                    "group_size",
                    (F.col("node") != F.col("comp")).alias("is_duplicate"))
            .orderBy("doc_id"))


_Q56_ORACLE = (
    _HASHED_CTE.replace("WITH shingled AS", "WITH RECURSIVE shingled AS", 1)
    + ",\n" + _capped_banded_cte()
    + """,
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.node),
labels AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node),
sizes AS (SELECT comp, COUNT(*) AS group_size FROM labels GROUP BY comp)
SELECT l.node AS doc_id, l.comp AS group_leader, s.group_size,
       l.node <> l.comp AS is_duplicate
FROM labels l JOIN sizes s USING (comp)
ORDER BY doc_id""")


def q188_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware representative selection per duplicate group —
    the decision q56 stops short of: instead of keeping each group's
    lowest-id member, keep its BEST member (here: the longest text,
    the convention several production dedup pipelines ship — the
    longest near-duplicate usually subsumes the truncated mirrors;
    tiebreak lowest doc_id for determinism). One row per dup group:
    leader label, the kept doc, its length, group size.

    Plan shape: the same bounded label-propagation components as q56
    over the capped LSH candidate pairs (never O(corpus^2)), then ONE
    per-group aggregate — ``max_by`` over a (length, -id) struct, so
    selection is an ordinary partial-aggregable fold, no window over
    the corpus. The oracle replays components with the recursive-CTE
    closure and the pick with a per-group rank."""
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    pairs = lsh_candidate_pairs(docs)
    comp = connected_components(pairs)
    labeled = comp.join(
        docs.select(F.col("doc_id").alias("node"),
                    F.length("text").alias("n_chars")), "node")
    pick = F.struct(F.col("n_chars"), (-F.col("node")).alias("nid"))
    return (labeled.groupBy(F.col("comp").alias("group_leader"))
            .agg(F.max_by("node", pick).alias("kept_doc"),
                 F.max_by("n_chars", pick).alias("kept_chars"),
                 F.count(F.lit(1)).cast("bigint").alias("group_size"))
            .orderBy("group_leader"))


_Q188_ORACLE = (
    _HASHED_CTE.replace("WITH shingled AS", "WITH RECURSIVE shingled AS", 1)
    + ",\n" + _capped_banded_cte()
    + """,
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.node),
labels AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node),
scored AS (
  SELECT l.node, l.comp, CAST(LENGTH(d.text) AS INTEGER) AS n_chars
  FROM labels l JOIN documents d ON d.doc_id = l.node)
SELECT group_leader, kept_doc, kept_chars, group_size FROM (
  SELECT comp AS group_leader, node AS kept_doc, n_chars AS kept_chars,
         CAST(COUNT(*) OVER (PARTITION BY comp) AS BIGINT) AS group_size,
         ROW_NUMBER() OVER (PARTITION BY comp
             ORDER BY n_chars DESC, node ASC) AS rk
  FROM scored) WHERE rk = 1
ORDER BY group_leader""")


#: SimHash width (bits). Each bit is a salted-md5 fair coin per token.
SIMHASH_BITS = 16


def q54_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash sketch: per-bit balance of salted token hashes.

    bit_j(doc) = 1 iff #{tokens with md5('j#'||tok)[0] < '8'} outweighs
    the rest — a portable rendering of the classic +/-1 bit-vote.
    Computed as one pass over exploded tokens + a single groupBy.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    toks = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    votes = [
        F.sum(F.when(F.substring(F.md5(F.concat(F.lit(f"{j}#"), F.col("tok"))), 1, 1)
                     < "8", 1).otherwise(-1)).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    bits = F.concat(*[
        F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(SIMHASH_BITS)
    ])
    return agg.select("doc_id", bits.alias("simhash")).orderBy("doc_id")


_Q54_ORACLE = """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents),
votes AS (
  SELECT doc_id,
""" + ",\n".join(
    f"    SUM(CASE WHEN SUBSTRING(MD5('{j}#' || tok), 1, 1) < '8' "
    f"THEN 1 ELSE -1 END) AS v{j}"
    for j in range(SIMHASH_BITS)
) + """
  FROM toks GROUP BY doc_id)
SELECT doc_id,
""" + " || ".join(
    f"(CASE WHEN v{j} > 0 THEN '1' ELSE '0' END)" for j in range(SIMHASH_BITS)
) + """ AS simhash
FROM votes ORDER BY doc_id
"""


#: decontamination shingle width (words) and the hit threshold above
#: which a document is flagged as contaminated.
DECON_NGRAM = 4
DECON_HITS = 3


def q57_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing
    ≥DECON_HITS distinct DECON_NGRAM-word shingles with a held-out
    eval set (here: doc_id % 50 == 0 stands in for the benchmark).

    Plan for 100 TB: the EVAL side is small by construction (eval
    benchmarks are KBs–MBs), so its distinct shingle set is broadcast;
    the corpus side explodes distinct shingles map-side, hash-joins
    against the broadcast with NO corpus shuffle, and aggregates per
    doc_id — only matching (doc, shingle) rows ever reach the shuffle.
    The corpus is never self-joined.

    Expression-placement notes (measured 25x at sf0.1): the gram
    array NEVER rides the exploded rows. transform() lambdas are
    interpreted, so (a) they operate on a pre-split `toks` column
    (an inline split would re-tokenize per element), and (b) the
    explode takes the expression INLINE so it collapses into the
    Generate and runs once per input row — the naive
    `select(explode(g), size(g))` evaluates size()'s whole lambda
    chain once per EXPLODED row (64s for 2.5s of work), and even an
    explode of a pre-projected array column measures ~8x slower than
    the inline form. n_grams comes from a separate map-only
    projection joined on doc_id at the end, where AQE broadcasts the
    (small) contaminated-hits side.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    n = DECON_NGRAM
    toked = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    gram_expr = F.when(
        F.size("toks") >= n,
        F.array_distinct(F.expr(
            f"transform(sequence(1, size(toks) - {n - 1}), "
            f"i -> concat_ws(' ', slice(toks, i, {n})))"))
    ).otherwise(F.array().cast("array<string>"))
    is_bench = F.col("doc_id") % 50 == 0
    bench_grams = (toked.filter(is_bench)
                   .select(F.explode(gram_expr).alias("gram"))
                   .distinct())
    corpus = (toked.filter(~is_bench)
              .select("doc_id", F.explode(gram_expr).alias("gram")))
    sizes = (toked.filter(~is_bench)
             .select("doc_id", F.size(gram_expr).alias("n_grams")))
    hits = (corpus.join(F.broadcast(bench_grams), "gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
            .join(sizes, "doc_id"))
    return (hits.select(
        "doc_id", "n_grams", "n_hit",
        (F.col("n_hit").cast("double") / F.col("n_grams"))
         .alias("overlap_frac"),
        (F.col("n_hit") >= DECON_HITS).alias("contaminated"))
        .orderBy("doc_id"))


_Q57_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
         LIST_DISTINCT(LIST_TRANSFORM(
           RANGE(1, GREATEST(LEN(STRING_SPLIT(text, ' ')) - {DECON_NGRAM - 2}, 1)),
           i -> ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '),
                                           i, i + {DECON_NGRAM - 1}), ' '))) AS gs
  FROM documents),
bench AS (
  SELECT DISTINCT UNNEST(gs) AS gram FROM grams WHERE doc_id % 50 = 0),
corpus AS (
  SELECT doc_id, LEN(gs) AS n_grams, UNNEST(gs) AS gram
  FROM grams WHERE doc_id % 50 <> 0),
hits AS (
  SELECT doc_id, n_grams, COUNT(*) AS n_hit
  FROM corpus JOIN bench USING (gram)
  GROUP BY 1, 2)
SELECT doc_id, CAST(n_grams AS INTEGER) AS n_grams, n_hit,
       CAST(n_hit AS DOUBLE) / n_grams AS overlap_frac,
       n_hit >= {DECON_HITS} AS contaminated
FROM hits ORDER BY doc_id
"""


#: Bloom decontamination parameters: hash count and bits-per-item.
BLOOM_K = 4
BLOOM_BITS_PER_ITEM = 16

#: Hard ceiling on the sketch-side item count. The bitmap is
#: driver-held by DESIGN (the eval/benchmark side of a decontamination
#: is small); this guard turns that assumption into an enforced
#: contract instead of a silent driver OOM if someone points the build
#: at a corpus. 4M items -> m = 64M bits -> an 8 MB bitmap (1M longs
#: through the driver), still broadcast-friendly.
BLOOM_MAX_ITEMS = 4_000_000


def build_bloom_bitmap(grams: DataFrame, col: str = "gram",
                       max_items: int = BLOOM_MAX_ITEMS) -> tuple[list, int]:
    """Aggregate a distinct-values DataFrame into a Bloom bitmap held as
    a list of int64 words (+ the bit width m).

    The positions are ``pmod(xxhash64(value, seed_j), m)`` for
    BLOOM_K seeds — pure Catalyst expressions, so membership probes on
    the corpus side stay inside whole-stage codegen. The bitmap words
    are built DISTRIBUTED — one shuffle keyed by word index with a
    map-side-combining ``bit_or`` of the single-bit contributions — so
    the driver receives at most m/64 pre-OR'd longs, never the k*n raw
    positions. m is sized at BLOOM_BITS_PER_ITEM x n (k=4 -> ~0.2 %
    false positives), rounded up to whole 64-bit words; ``max_items``
    (default BLOOM_MAX_ITEMS) bounds the driver-held sketch and raises
    on a side too big to be a sketch.
    """
    n = grams.count()
    if n > max_items:
        raise ValueError(
            f"bloom build side has {n} items > max_items={max_items}; "
            "the bitmap is driver-held by design — a side this large "
            "is not a sketchable eval set (use the broadcast-join "
            "decontamination path instead)")
    m = max(1024, ((BLOOM_BITS_PER_ITEM * n + 63) // 64) * 64)
    pos = grams.select(F.explode(F.array(*[
        F.pmod(F.xxhash64(F.col(col), F.lit(j)), F.lit(m))
        for j in range(BLOOM_K)])).alias("p"))
    # bit_or is idempotent on duplicate positions, so no distinct pass;
    # signed-long words come out of the aggregation directly
    word_rows = (pos.groupBy(F.expr("p DIV 64").alias("w"))
                 .agg(F.bit_or(F.expr("shiftleft(1L, cast(p % 64 as int))"))
                      .alias("word"))
                 .collect())
    words = [0] * (m // 64)
    for r in word_rows:
        words[int(r["w"])] = int(r["word"])
    return words, m


def bloom_might_contain(bitmap_lit: F.Column, m: int,
                        col: F.Column) -> F.Column:
    """All-BLOOM_K-bits-set membership probe against the literal bitmap."""
    checks = []
    for j in range(BLOOM_K):
        p = F.pmod(F.xxhash64(col, F.lit(j)), F.lit(m))
        word = F.element_at(bitmap_lit, (p / 64).cast("int") + 1)
        # getbit takes a COLUMN position (shiftright would demand a
        # Python-int shift); works on the two's-complement word
        checks.append(F.getbit(word, p % 64) == 1)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def q73_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via a Bloom filter — the JOIN-FREE
    scale path for q57's broadcast-join form.

    At 100 TB the corpus side should not shuffle OR hash-join at all:
    the eval set's distinct shingles aggregate (distributed, bit_or
    word merge) into a driver-held Bloom bitmap (KBs-MBs, guarded by
    BLOOM_MAX_ITEMS), which ships once per executor as a broadcast
    one-row side; the corpus probe is then a map-only codegen'd
    expression against that row — no shuffle of the corpus, and no
    per-task re-serialization of the bitmap. The price is
    false positives, which is why the output is shaped like q39's
    sketch contract: the exact flagged-document count (oracle-matched
    bit-for-bit, computed via the q57 broadcast join) plus Spark-side
    assertion booleans — a Bloom filter has NO false negatives (every
    exactly-flagged doc is bloom-flagged; checked as a set containment,
    not just counts) and the false-positive overshoot stays under 2 %
    of the corpus (20x slack over the ~0.1 % expected at 16 bits/item).
    The oracle asserts the same booleans as literal TRUE.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    n = DECON_NGRAM
    toked = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    gram_expr = F.when(
        F.size("toks") >= n,
        F.array_distinct(F.expr(
            f"transform(sequence(1, size(toks) - {n - 1}), "
            f"i -> concat_ws(' ', slice(toks, i, {n})))"))
    ).otherwise(F.array().cast("array<string>"))
    is_bench = F.col("doc_id") % 50 == 0
    bench_grams = (toked.filter(is_bench)
                   .select(F.explode(gram_expr).alias("gram"))
                   .distinct())
    corpus = (toked.filter(~is_bench)
              .select("doc_id", F.explode(gram_expr).alias("gram")))

    words, m = build_bloom_bitmap(bench_grams)
    # one broadcast row instead of a per-task literal: the probe is
    # still map-only (BroadcastNestedLoopJoin against a single row, no
    # shuffle of the corpus), but the bitmap crosses the wire once per
    # executor rather than once per task closure
    bloom_df = spark.createDataFrame([(words,)], "bloom array<long>")
    # ONE corpus pass for both probes (guide §1.2/§2.4): the previous
    # form derived bloom_flagged and exact_flagged separately and then
    # counted each plus their anti-join — four actions, each re-running
    # the corpus tokenize+explode and shuffling (doc_id) again. Both
    # probes are per-gram predicates (the bloom test is a map-only
    # expression; bench membership a broadcast lookup), so one
    # aggregate carries both hit counts per document; the three counts
    # then read a checkpointed O(corpus docs) x 3-column frame. Same
    # per-document hit numbers, hence identical flags and counts.
    hits = (corpus
            .crossJoin(F.broadcast(bloom_df))
            .join(F.broadcast(bench_grams.withColumn("_b", F.lit(1))),
                  "gram", "left")
            .groupBy("doc_id")
            .agg(F.sum(bloom_might_contain(F.col("bloom"), m,
                                           F.col("gram")).cast("int"))
                  .alias("n_bloom_hit"),
                 F.sum(F.coalesce(F.col("_b"), F.lit(0)))
                  .alias("n_exact_hit"))
            .localCheckpoint(eager=True))
    n_corpus = toked.filter(~is_bench).count()
    n_exact = hits.filter(F.col("n_exact_hit") >= DECON_HITS).count()
    n_bloom = hits.filter(F.col("n_bloom_hit") >= DECON_HITS).count()
    n_missed = hits.filter((F.col("n_exact_hit") >= DECON_HITS)
                           & (F.col("n_bloom_hit") < DECON_HITS)).count()
    return spark.createDataFrame(
        [(n_corpus, n_exact,
          n_missed == 0,
          (n_bloom - n_exact) <= max(1, int(0.02 * n_corpus)))],
        "n_corpus_docs long, exact_flagged long, "
        "no_false_negatives boolean, fp_overshoot_ok boolean")


_Q73_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
         LIST_DISTINCT(LIST_TRANSFORM(
           RANGE(1, GREATEST(LEN(STRING_SPLIT(text, ' ')) - {DECON_NGRAM - 2}, 1)),
           i -> ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '),
                                           i, i + {DECON_NGRAM - 1}), ' '))) AS gs
  FROM documents),
bench AS (
  SELECT DISTINCT UNNEST(gs) AS gram FROM grams WHERE doc_id % 50 = 0),
corpus AS (
  SELECT doc_id, UNNEST(gs) AS gram FROM grams WHERE doc_id % 50 <> 0),
flagged AS (
  SELECT doc_id FROM corpus JOIN bench USING (gram)
  GROUP BY doc_id HAVING COUNT(*) >= {DECON_HITS})
SELECT (SELECT COUNT(*) FROM grams WHERE doc_id % 50 <> 0) AS n_corpus_docs,
       (SELECT COUNT(*) FROM flagged) AS exact_flagged,
       TRUE AS no_false_negatives,
       TRUE AS fp_overshoot_ok
"""


def banded_capped(sig: DataFrame, id_alias: str,
                  max_bucket: int | None = MAX_BUCKET) -> DataFrame:
    """Band a minhash signature into (id, band_key) rows with q52's
    hot-bucket cap applied to THIS side: band keys holding more than
    ``max_bucket`` ids are dropped via a count-over-window on the same
    band_key shuffle the downstream join reuses (no extra exchange).
    Pass ``max_bucket=None`` for the uncapped form.
    """
    from pyspark.sql import Window as W
    bands = []
    for b in range(N_HASHES // BAND_SIZE):
        cols = [f"mh_{b * BAND_SIZE + j}" for j in range(BAND_SIZE)]
        bands.append(F.md5(F.concat_ws(
            "|", F.lit(str(b)), *cols)).alias("band_key"))
    out = sig.select(F.col("doc_id").alias(id_alias),
                     F.explode(F.array(*bands)).alias("band_key"))
    if max_bucket is None:
        return out
    return (out.withColumn(
        "_bs", F.count(F.lit(1)).over(W.partitionBy("band_key")))
        .filter(F.col("_bs") <= max_bucket).drop("_bs"))


def q74_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: flag a NEW batch against the EXISTING corpus —
    the shape a production pipeline runs per ingest shard, where the
    corpus-wide self-join never happens again after the initial build.

    The split (doc_id % 3 == 0 stands in for the new shard) keeps both
    checks one-sided: exact duplicates via a fingerprint semi-join of
    new against existing (at scale: against the persisted fingerprint
    table), near-duplicates via LSH band keys computed on BOTH sides
    but joined new-x-existing ONLY — the existing corpus never pairs
    with itself, so incremental cost is O(batch), not O(corpus).
    Candidates are verified with exact shingle Jaccard before flagging
    (same verify-then-drop contract as q55). Both sides of the band
    join carry q52's hot-bucket cap (``banded_capped``): a boilerplate
    bucket on EITHER side would otherwise explode the join (a hot new
    shard x a hot corpus bucket is the worst case), so band keys whose
    per-side bucket exceeds MAX_BUCKET are dropped before the join —
    and the oracle applies the identical per-side ``HAVING COUNT(*)``
    cap, keeping the cap declared semantics on both engines.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    is_new = F.col("doc_id") % 3 == 0
    new_docs = docs.filter(is_new)
    old_docs = docs.filter(~is_new)

    fp = F.md5(_normalized().cast("binary")).alias("fp")
    new_fp = new_docs.select("doc_id", fp)
    old_fp = old_docs.select(F.col("doc_id").alias("_o"), fp)
    exact_dup = (new_fp.join(old_fp, "fp", "left_semi")
                 .select("doc_id").withColumn("exact_dup", F.lit(True)))

    sig_new = minhash_signature(new_docs)
    sig_old = minhash_signature(old_docs)

    # the candidate list feeds THREE consumers (new-id prune, old-id
    # prune, shared-gram join); without materialization the whole
    # minhash+banding lineage re-executes per branch — same
    # multi-consumer trap q55 fixed (plan audit: 16 exchanges before,
    # 12 after). The list is pair-sized, a rounding error to hold.
    cand = (banded_capped(sig_new, "doc_id")
            .join(banded_capped(sig_old, "old_id"), "band_key")
            .select("doc_id", "old_id").distinct()
            .localCheckpoint(eager=True))

    grams_of = lambda d: d.select(  # noqa: E731
        "doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("gram"))
    cand_new_ids = cand.select("doc_id").distinct()
    cand_old_ids = cand.select(F.col("old_id").alias("doc_id")).distinct()
    gn = (grams_of(new_docs.join(cand_new_ids, "doc_id", "left_semi")))
    go = (grams_of(old_docs.join(cand_old_ids, "doc_id", "left_semi"))
          .select(F.col("doc_id").alias("old_id"), "gram"))
    sn = gn.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_nn"))
    so = go.groupBy("old_id").agg(F.count(F.lit(1)).alias("_no"))
    shared = (cand.join(gn, "doc_id").join(go, ["old_id", "gram"])
              .groupBy("doc_id", "old_id")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    near = (shared.join(sn, "doc_id").join(so, "old_id")
            .withColumn("jaccard",
                        F.col("n_shared").cast("double")
                        / (F.col("_nn") + F.col("_no") - F.col("n_shared")))
            .filter(F.col("jaccard") >= 0.5)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_near_matches"),
                 F.max("jaccard").alias("best_jaccard")))

    return (new_docs.select("doc_id")
            .join(exact_dup, "doc_id", "left")
            .join(near, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
                    F.coalesce("n_near_matches", F.lit(0))
                     .alias("n_near_matches"),
                    "best_jaccard")
            .withColumn("keep", ~F.col("exact_dup")
                        & (F.col("n_near_matches") == 0))
            .orderBy("doc_id"))


_Q74_ORACLE = _HASHED_CTE + f""",
norm AS (
  SELECT doc_id,
         MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'),
                                 ' +', ' ', 'g'))) AS fp
  FROM documents),
exact_dup AS (
  SELECT DISTINCT n.doc_id FROM norm n
  JOIN norm o ON o.fp = n.fp AND o.doc_id % 3 <> 0
  WHERE n.doc_id % 3 = 0),
banded AS (
""" + "\nUNION ALL\n".join(
    f"  SELECT doc_id, {_band_oracle(b)} AS band_key FROM hashed"
    for b in range(N_HASHES // BAND_SIZE)
) + f"""
),
new_b AS (SELECT doc_id, band_key FROM banded WHERE doc_id % 3 = 0),
old_b AS (SELECT doc_id, band_key FROM banded WHERE doc_id % 3 <> 0),
new_kept AS (
  SELECT band_key FROM new_b GROUP BY band_key
  HAVING COUNT(*) <= {MAX_BUCKET}),
old_kept AS (
  SELECT band_key FROM old_b GROUP BY band_key
  HAVING COUNT(*) <= {MAX_BUCKET}),
cand AS (
  SELECT DISTINCT a.doc_id, b.doc_id AS old_id
  FROM new_b a
  JOIN new_kept nk ON nk.band_key = a.band_key
  JOIN old_b b ON b.band_key = a.band_key
  JOIN old_kept ok ON ok.band_key = a.band_key),
grams AS (
  SELECT doc_id, UNNEST({_SHINGLES_DD}) AS gram FROM documents
  WHERE doc_id IN (SELECT doc_id FROM cand UNION SELECT old_id FROM cand)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
shared AS (
  SELECT c.doc_id, c.old_id, COUNT(*) AS n_shared
  FROM cand c
  JOIN grams gn ON gn.doc_id = c.doc_id
  JOIN grams go ON go.doc_id = c.old_id AND go.gram = gn.gram
  GROUP BY 1, 2),
near AS (
  SELECT s.doc_id, COUNT(*) AS n_near_matches,
         MAX(CAST(s.n_shared AS DOUBLE)
             / (sn.n + so.n - s.n_shared)) AS best_jaccard
  FROM shared s
  JOIN sizes sn ON sn.doc_id = s.doc_id
  JOIN sizes so ON so.doc_id = s.old_id
  WHERE CAST(s.n_shared AS DOUBLE) / (sn.n + so.n - s.n_shared) >= 0.5
  GROUP BY s.doc_id)
SELECT d.doc_id,
       (e.doc_id IS NOT NULL) AS exact_dup,
       COALESCE(nr.n_near_matches, 0) AS n_near_matches,
       nr.best_jaccard,
       (e.doc_id IS NULL AND COALESCE(nr.n_near_matches, 0) = 0) AS keep
FROM documents d
LEFT JOIN exact_dup e ON e.doc_id = d.doc_id
LEFT JOIN near nr ON nr.doc_id = d.doc_id
WHERE d.doc_id % 3 = 0
ORDER BY d.doc_id
"""


def q69_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: shingle CONTAINMENT |A∩B| / min(|A|,|B|)
    on the bounded candidate set. Jaccard misses quote-inclusion (a
    short doc fully embedded in a long one scores low); containment is
    the standard complementary metric a dedup pass runs beside it.

    Same bounded-candidate contract as q53: at scale this verifies LSH
    candidates (q52) only — the pairwise sweep here (doc_id < 40) just
    exercises the exact math.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents").filter(F.col("doc_id") < 40)
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 2), "
            "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"))).alias("gram"))
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (a.join(b, (F.col("a.gram") == F.col("b.gram"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("n_shared")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    return (
        shared.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", "n_shared",
                (F.col("n_shared").cast("double")
                 / F.least("na", "nb")).alias("containment"),
                (F.col("n_shared") == F.least("na", "nb")).alias("subsumed"))
        .filter(F.col("containment") >= 0.05)
        .orderBy("doc_a", "doc_b")
    )


_Q69_ORACLE = """
WITH grams AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           RANGE(1, GREATEST(LEN(STRING_SPLIT(text, ' ')) - 2, 0) + 1),
           i -> ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '), i, i + 2), ' ')
         ))) AS gram
  FROM documents WHERE doc_id < 40),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, n_shared,
       CAST(n_shared AS DOUBLE) / LEAST(sa.n_grams, sb.n_grams) AS containment,
       n_shared = LEAST(sa.n_grams, sb.n_grams) AS subsumed
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_shared AS DOUBLE) / LEAST(sa.n_grams, sb.n_grams) >= 0.05
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# q104: span-level (repeated-substring) dedup — removal lists for spans
# repeated across documents
# --------------------------------------------------------------------------

#: Anchor span length in words (the production form uses ~50 tokens on
#: real crawls; 5 fits the synthetic corpus's short documents while
#: exercising the identical plan).
SPAN_WORDS = 5
#: Hot-anchor cap: shingles occurring more often than this corpus-wide
#: are boilerplate (stop-spans) and are EXCLUDED on both engines — the
#: q52 cap discipline: the cap is part of the operator's declared
#: semantics, mirrored in the oracle's HAVING clause.
SPAN_MAX_OCC = 256


def q104_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup: find word spans repeated ACROSS documents and
    emit per-document removal lists — the within-document form of
    dedup that document-level exact/near-dup (q50–q56) cannot express
    (the 50-token-repeat pass run on real crawls to strip boilerplate
    and templated text without dropping whole documents).

    Algorithm (anchor-shingle grouping, never all-pairs):
    1. Every SPAN_WORDS-word shingle with its 1-based word position.
    2. Anchors = shingles occurring in >= 2 DISTINCT documents, capped
       at SPAN_MAX_OCC total occurrences (ubiquitous boilerplate is a
       stop-span; the cap bounds the join fan-out and is mirrored in
       the oracle).
    3. Per document, overlapping/adjacent anchor intervals
       [pos, pos+SPAN_WORDS-1] merge into maximal removal spans
       (classic gaps-and-islands: running max of interval end marks
       island starts).

    Scale shape: one shuffle on the shingle key (at 100 TB the key
    would be a 64-bit hash of the shingle — md5 here keeps both
    engines' keys identical), the anchor set is capped before the
    join back, and the island merge is one window per document —
    partitioned by doc_id, so no global sort. No self-join of the
    corpus, no pair materialization.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    n = SPAN_WORDS
    wdf = docs.select("doc_id", F.split("text", " ").alias("w"))
    marks = (wdf.select("doc_id", F.explode(F.expr(
        f"case when size(w) >= {n} then transform("
        f"sequence(1, size(w) - {n - 1}), "
        f"i -> named_struct('pos', i, 'sh', "
        f"concat_ws(' ', slice(w, i, {n})))) "
        f"else cast(array() as array<struct<pos:int,sh:string>>) end"
    )).alias("m"))
        .select("doc_id", F.col("m.pos").alias("pos"),
                F.col("m.sh").alias("sh")))
    anchors = (marks.groupBy("sh")
               .agg(F.count_distinct("doc_id").alias("n_docs"),
                    F.count(F.lit(1)).alias("n_occ"))
               .filter((F.col("n_docs") >= 2)
                       & (F.col("n_occ") <= SPAN_MAX_OCC))
               .select("sh"))
    iv = (marks.join(anchors, "sh")
          .select("doc_id", F.col("pos").alias("s"),
                  (F.col("pos") + F.lit(n - 1)).alias("e")))
    wname = W.partitionBy("doc_id").orderBy("s")
    prev_e = F.max("e").over(
        wname.rowsBetween(W.unboundedPreceding, -1))
    isl = iv.select(
        "doc_id", "s", "e",
        F.when(prev_e.isNull() | (F.col("s") > prev_e + 1), 1)
         .otherwise(0).alias("ni"))
    grps = isl.select(
        "doc_id", "s", "e",
        F.sum("ni").over(
            wname.rowsBetween(W.unboundedPreceding, 0)).alias("grp"))
    return (grps.groupBy("doc_id", "grp")
            .agg(F.min("s").cast("int").alias("span_start"),
                 F.max("e").cast("int").alias("span_end"),
                 (F.max("e") - F.min("s") + 1).cast("int")
                 .alias("span_len"),
                 F.count(F.lit(1)).alias("n_anchors"))
            .select("doc_id", "span_start", "span_end", "span_len",
                    "n_anchors")
            .orderBy("doc_id", "span_start"))


_Q104_ORACLE = f"""
WITH w AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
marks AS (
  SELECT doc_id, m.pos AS pos, m.sh AS sh FROM (
    SELECT doc_id, UNNEST(
      CASE WHEN LEN(w) >= {SPAN_WORDS} THEN LIST_TRANSFORM(
        RANGE(1, LEN(w) - {SPAN_WORDS} + 2),
        i -> {{'pos': i, 'sh': ARRAY_TO_STRING(
                w[i:i + {SPAN_WORDS - 1}], ' ')}})
      ELSE [] END) AS m
    FROM w)),
anchors AS (
  SELECT sh FROM marks GROUP BY sh
  HAVING COUNT(DISTINCT doc_id) >= 2 AND COUNT(*) <= {SPAN_MAX_OCC}),
iv AS (
  SELECT doc_id, pos AS s, pos + {SPAN_WORDS - 1} AS e
  FROM marks JOIN anchors USING (sh)),
isl AS (
  SELECT doc_id, s, e,
    CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         OR s > MAX(e) OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
    THEN 1 ELSE 0 END AS ni
  FROM iv),
grps AS (
  SELECT doc_id, s, e,
    SUM(ni) OVER (PARTITION BY doc_id ORDER BY s
      ROWS UNBOUNDED PRECEDING) AS grp
  FROM isl)
SELECT doc_id, CAST(MIN(s) AS INTEGER) AS span_start,
       CAST(MAX(e) AS INTEGER) AS span_end,
       CAST(MAX(e) - MIN(s) + 1 AS INTEGER) AS span_len,
       COUNT(*) AS n_anchors
FROM grps GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


def apply_span_removal(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """Rewrite ``docs.text`` with the word positions covered by
    ``spans`` (doc_id, span_start, span_end — 1-based inclusive)
    excised; returns (doc_id, n_words, n_removed, cleaned).

    The reusable application kernel behind q107 and the pretraining
    template: removal positions explode off the (small) span table,
    the word-level anti-join is a hash join on (doc_id, pos), and the
    rebuild is one per-document aggregate (array_sort of (pos, word)
    structs — in-group sort, no global sort). Docs with every word
    removed come back as the empty string.
    """
    removed = spans.select(
        "doc_id",
        F.explode(F.expr("sequence(span_start, span_end)")).alias("pos"))
    words = (docs.select("doc_id",
                         F.posexplode(F.split("text", " "))
                         .alias("pos0", "word"))
             .select("doc_id", (F.col("pos0") + 1).alias("pos"), "word"))
    kept = words.join(removed, ["doc_id", "pos"], "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.expr(
                   "concat_ws(' ', transform(array_sort("
                   "collect_list(struct(pos, word))), x -> x.word))")
                   .alias("cleaned")))
    n_removed = (removed.groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_removed")))
    base = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_words"))
    return (base
            .join(n_removed, "doc_id", "left")
            .join(rebuilt, "doc_id", "left")
            .select("doc_id", "n_words",
                    F.coalesce("n_removed", F.lit(0)).cast("bigint")
                     .alias("n_removed"),
                    F.coalesce("cleaned", F.lit("")).alias("cleaned")))


def q107_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY q104's removal lists: rewrite each document with its
    repeated spans excised and emit per-document before/after counts
    plus an md5 fingerprint of the cleaned text — the second half of
    span-level dedup (q104 finds, this removes), verified end-to-end
    because any off-by-one in span application changes the fingerprint.

    Scale shape: removal positions explode off the (small) span table
    — bounded by total removed tokens, never O(corpus tokens); the
    word-level anti-join is a hash join on (doc_id, pos); rebuild is
    one per-document aggregate (array_sort of (pos, word) structs —
    sorts WITHIN each doc's collected list, no global sort). Documents
    with nothing to remove pass through with a fingerprint of their
    original layout.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    spans = q104_span_dedup(spark, sf_dir)
    return (apply_span_removal(docs, spans)
            .select("doc_id", "n_words", "n_removed",
                    (F.col("n_words") - F.col("n_removed")).cast("bigint")
                    .alias("n_kept"),
                    F.md5(F.col("cleaned").cast("binary"))
                    .alias("cleaned_fp"))
            .orderBy("doc_id"))


_Q107_ORACLE = f"""
WITH w AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
marks AS (
  SELECT doc_id, m.pos AS pos, m.sh AS sh FROM (
    SELECT doc_id, UNNEST(
      CASE WHEN LEN(w) >= {SPAN_WORDS} THEN LIST_TRANSFORM(
        RANGE(1, LEN(w) - {SPAN_WORDS} + 2),
        i -> {{'pos': i, 'sh': ARRAY_TO_STRING(
                w[i:i + {SPAN_WORDS - 1}], ' ')}})
      ELSE [] END) AS m
    FROM w)),
anchors AS (
  SELECT sh FROM marks GROUP BY sh
  HAVING COUNT(DISTINCT doc_id) >= 2 AND COUNT(*) <= {SPAN_MAX_OCC}),
iv AS (
  SELECT doc_id, pos AS s, pos + {SPAN_WORDS - 1} AS e
  FROM marks JOIN anchors USING (sh)),
isl AS (
  SELECT doc_id, s, e,
    CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         OR s > MAX(e) OVER (PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
    THEN 1 ELSE 0 END AS ni
  FROM iv),
grps AS (
  SELECT doc_id, s, e,
    SUM(ni) OVER (PARTITION BY doc_id ORDER BY s
      ROWS UNBOUNDED PRECEDING) AS grp
  FROM isl),
spans AS (
  SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end
  FROM grps GROUP BY doc_id, grp),
removed AS (
  SELECT doc_id, UNNEST(RANGE(span_start, span_end + 1)) AS pos
  FROM spans),
words AS (
  SELECT doc_id, t.pos AS pos, t.word AS word FROM (
    SELECT doc_id, UNNEST(LIST_TRANSFORM(
      RANGE(1, LEN(w) + 1),
      i -> {{'pos': i, 'word': LIST_EXTRACT(w, i)}})) AS t
    FROM w)),
kept AS (
  SELECT wo.doc_id, wo.pos, wo.word
  FROM words wo LEFT JOIN removed r
    ON r.doc_id = wo.doc_id AND r.pos = wo.pos
  WHERE r.pos IS NULL),
rebuilt AS (
  SELECT doc_id, ARRAY_TO_STRING(LIST(word ORDER BY pos), ' ') AS cleaned
  FROM kept GROUP BY doc_id),
nrem AS (
  SELECT doc_id, COUNT(*) AS n_removed FROM removed GROUP BY doc_id)
SELECT w.doc_id, CAST(LEN(w.w) AS INTEGER) AS n_words,
       CAST(COALESCE(nrem.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(LEN(w.w) - COALESCE(nrem.n_removed, 0) AS BIGINT) AS n_kept,
       MD5(COALESCE(rebuilt.cleaned, '')) AS cleaned_fp
FROM w
LEFT JOIN nrem ON nrem.doc_id = w.doc_id
LEFT JOIN rebuilt ON rebuilt.doc_id = w.doc_id
ORDER BY w.doc_id
"""


def q143_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked fuzzy join: find same-nation
    customer-record pairs whose names are within edit distance 1 —
    the record-linkage / near-duplicate-record operator of a data
    cleaning pipeline.

    The blocking is SymSpell's deletion neighborhood, which is EXACT
    for lev <= 1 (not a recall-lossy prefix block): every record emits
    itself plus each single-character deletion as candidate keys; two
    strings within one edit ALWAYS share a key (substitution -> the
    deletion at the edited position; insert/delete -> the shorter
    string is itself a deletion of the longer), so the equi-join on
    (deletion_key, nation) finds every true pair and ``levenshtein``
    only has to REJECT hash-collision false candidates. Plan shape at
    100 TB: a 1->(len+1) map-only Generate, ONE shuffle keyed by the
    high-cardinality deletion key (unskewable — key count scales with
    the name space), and the edit-distance check runs on candidates
    only, never all pairs. The nation equality rides the same join as
    the domain block every real linkage pipeline adds.

    Oracle: identical neighborhood + join + threshold in DuckDB
    (``levenshtein`` agrees exactly between the engines).
    Reference analogue: none — dedup-family extension (SURVEY §2
    extension block, record-linkage counterpart of doc-level q53).
    """
    register_tables(spark, sf_dir)
    cust = spark.table("customer")
    keyed = cust.selectExpr(
        "c_custkey", "c_nationkey", "c_name",
        """explode(concat(
             array(c_name),
             transform(sequence(0, length(c_name) - 1),
               i -> concat(substring(c_name, 1, i),
                           substring(c_name, i + 2, length(c_name))))))
           AS k""")
    a = keyed.select(F.col("c_nationkey").alias("nation"),
                     F.col("c_custkey").alias("id_a"),
                     F.col("c_name").alias("name_a"), "k")
    b = keyed.select(F.col("c_nationkey").alias("nation"),
                     F.col("c_custkey").alias("id_b"),
                     F.col("c_name").alias("name_b"), "k")
    return (a.join(b, ["k", "nation"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("nation", "id_a", "id_b", "name_a", "name_b")
            .distinct()
            .where(F.levenshtein("name_a", "name_b") <= 1)
            .withColumn("lev",
                        F.levenshtein("name_a", "name_b").cast("int"))
            .orderBy("nation", "id_a", "id_b"))


_Q143_ORACLE = """
WITH keyed AS MATERIALIZED (
  SELECT c_custkey, c_nationkey, c_name,
         UNNEST(LIST_CONCAT(
           [c_name],
           LIST_TRANSFORM(RANGE(0, LEN(c_name)),
             i -> SUBSTRING(c_name, 1, i) || SUBSTRING(c_name, i + 2))))
           AS k
  FROM customer),
cand AS (
  SELECT DISTINCT a.c_nationkey AS nation,
         a.c_custkey AS id_a, b.c_custkey AS id_b,
         a.c_name AS name_a, b.c_name AS name_b
  FROM keyed a JOIN keyed b
    ON a.k = b.k AND a.c_nationkey = b.c_nationkey
   AND a.c_custkey < b.c_custkey)
SELECT nation, id_a, id_b, name_a, name_b,
       CAST(LEVENSHTEIN(name_a, name_b) AS INTEGER) AS lev
FROM cand
WHERE LEVENSHTEIN(name_a, name_b) <= 1
ORDER BY nation, id_a, id_b
"""


def q174_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty — how much NEW text each source adds
    to the corpus in ingestion (doc_id) order. The curation curve data
    engineers read before deciding how hard to deduplicate: a source
    whose novelty rate is low is mostly restating what the corpus
    already holds.

    A trigram is NOVEL for the single document where it first appears
    (minimum doc_id over the whole corpus — ties impossible on a
    total-ordered key). Per source: documents, total distinct-in-doc
    trigrams, trigrams that were corpus-first in one of its docs, and
    the novelty rate (one exact-integer division to double at the end).

    Scale shape: the same machinery as exact dedup (q50) — explode
    distinct-in-doc shingles, ONE shuffle on the shingle key to find
    min(doc_id), one broadcast-back join keyed by (shingle, doc). At
    100 TB the group key is xxhash64(gram) instead of the gram string
    (collision odds ~n^2/2^64; the oracle-portable string key is used
    here so DuckDB can replay it) and the min-doc table stays on the
    shuffle side — never the driver. Novelty is computed in one pass;
    no per-document loop exists anywhere.
    """
    from dataflowtemplates_spark.operators.partitioning import (
        spread_if_narrow)
    register_tables(spark, sf_dir)
    # single-file scan hygiene (guide §2.5 input skew): the trigram
    # explode + per-gram hashing below is the query's compute; on a
    # one-split toy scan it pins to one core without this guard (at
    # scale the scan arrives in many splits and this is a no-op)
    docs = spread_if_narrow(spark.table("documents"))
    # NB: guard, not greatest() — sequence(1, 0) in Spark is the
    # DESCENDING sequence [1, 0], whose slice(arr, 0, 3) throws for
    # documents under 3 words; DuckDB's RANGE(1, 0) is empty, so the
    # oracle-matching behavior for short docs is "no grams" (same
    # guard as text.py's char-pair kernel)
    gram_arr = F.when(
        F.size(F.split("text", " ")) >= 3,
        F.expr("transform(sequence(1, size(split(text, ' ')) - 2), "
               "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))")
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        "doc_id", "source",
        F.explode(F.array_distinct(gram_arr)).alias("gram"))
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    tagged = (grams.join(first, "gram")
              .withColumn("is_novel",
                          (F.col("doc_id") == F.col("first_doc"))
                          .cast("bigint")))
    return (tagged.groupBy("source")
            .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
                 F.count(F.lit(1)).cast("bigint").alias("n_grams"),
                 F.sum("is_novel").cast("bigint").alias("n_novel"))
            .withColumn("novelty_rate",
                        F.col("n_novel").cast("double")
                        / F.col("n_grams").cast("double"))
            .orderBy("source"))


_Q174_ORACLE = """
WITH grams AS (
  SELECT doc_id, source,
         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
           i -> ARRAY_TO_STRING(
                  LIST_SLICE(STRING_SPLIT(text, ' '), i, i + 2), ' '))))
           AS gram
  FROM documents),
first AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram)
SELECT g.source,
       CAST(COUNT(DISTINCT g.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty_rate
FROM grams g JOIN first f ON f.gram = g.gram
GROUP BY g.source
ORDER BY g.source
"""


QUERIES = {
    "q188_dedup_keep_best": q188_dedup_keep_best,
    "q50_dedup_exact": q50_dedup_exact,
    "q51_minhash_signature": q51_minhash_signature,
    "q52_lsh_pairs": q52_lsh_pairs,
    "q53_ngram_jaccard": q53_ngram_jaccard,
    "q54_simhash": q54_simhash,
    "q55_dedup_pipeline": q55_dedup_pipeline,
    "q56_dup_groups": q56_dup_groups,
    "q57_decontaminate": q57_decontaminate,
    "q69_ngram_containment": q69_ngram_containment,
    "q73_decontaminate_bloom": q73_decontaminate_bloom,
    "q74_incremental_dedup": q74_incremental_dedup,
    "q104_span_dedup": q104_span_dedup,
    "q107_span_scrub": q107_span_scrub,
    "q143_fuzzy_match": q143_fuzzy_match,
    "q148_lsh_recall": q148_lsh_recall,
    "q174_ngram_novelty": q174_ngram_novelty,
}

ORACLES = {
    "q188_dedup_keep_best": _Q188_ORACLE,
    "q50_dedup_exact": _Q50_ORACLE,
    "q51_minhash_signature": _Q51_ORACLE,
    "q52_lsh_pairs": _Q52_ORACLE,
    "q53_ngram_jaccard": _Q53_ORACLE,
    "q54_simhash": _Q54_ORACLE,
    "q55_dedup_pipeline": _Q55_ORACLE,
    "q56_dup_groups": _Q56_ORACLE,
    "q57_decontaminate": _Q57_ORACLE,
    "q69_ngram_containment": _Q69_ORACLE,
    "q73_decontaminate_bloom": _Q73_ORACLE,
    "q74_incremental_dedup": _Q74_ORACLE,
    "q104_span_dedup": _Q104_ORACLE,
    "q107_span_scrub": _Q107_ORACLE,
    "q143_fuzzy_match": _Q143_ORACLE,
    "q148_lsh_recall": _Q148_ORACLE,
    "q174_ngram_novelty": _Q174_ORACLE,
}
