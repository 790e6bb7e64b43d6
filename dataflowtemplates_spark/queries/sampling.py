"""Deterministic sampling and sequence-packing operators.

Training-data-pipeline extensions beyond the reference surface: corpus
subsampling and context-window packing are the two operations that sit
between a cleaned corpus and the tokenizer in every pretraining build.

Scale notes (the reason these take the shapes they do):

* Sampling uses a seeded HASH-Bernoulli rule (md5 prefix threshold),
  not ``rand()``: it is reproducible across engines/runs, needs no
  shuffle (pure map-side filter pushed into the scan stage), and any
  worker can re-derive membership — exactly how a 100 TB corpus is
  subsampled in practice. An exact-quota variant would need a
  per-stratum window; the Bernoulli form is the one that scales.
* Packing partitions by ``source`` so each shard packs independently —
  one shuffle on source, then a running-sum window per shard. A single
  GLOBAL ordered cumsum would serialize onto one task at 100 TB; the
  per-shard form is how packing is actually distributed (each input
  shard becomes its own sequence stream).

Reference analogue: none — the reference's closest op is the key-by
routing of `transforms/StructToAvroTransform.java:79-91` (split a
stream by a field value), which is the same partition-by-source idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables

#: Hash-Bernoulli keep threshold: md5 hex prefixes '00'..'19' = 26/256
#: of the keyspace (~10.2%). Lexicographic compare is identical in
#: Spark and DuckDB, so both engines select the same rows.
SAMPLE_PREFIX_MAX = "19"

#: Sequence-packing token budget (context window size stand-in).
PACK_BUDGET = 512

#: Seed folded into the sampling hash — change it to draw an
#: independent sample of the same rate.
SAMPLE_SEED = "s42"


def q47_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample, stratification made auditable.

    Keeps every document whose seeded md5 prefix falls under the
    threshold, and returns the kept rows with their hash key plus the
    per-source running index of the kept row (small window over the
    ~10% survivors only — the full corpus never shuffles).
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    key = F.md5(F.concat(F.lit(SAMPLE_SEED), F.col("doc_id").cast("string")))
    kept = (docs
            .select("doc_id", "source", key.alias("sample_key"))
            .where(F.substring("sample_key", 1, 2) <= SAMPLE_PREFIX_MAX))
    w = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    return (kept
            .withColumn("kept_rank", F.row_number().over(w))
            .orderBy("source", "kept_rank"))


_Q47_ORACLE = f"""
WITH kept AS (
  SELECT doc_id, source,
         MD5('{SAMPLE_SEED}' || CAST(doc_id AS VARCHAR)) AS sample_key
  FROM documents
  WHERE SUBSTRING(MD5('{SAMPLE_SEED}' || CAST(doc_id AS VARCHAR)), 1, 2)
        <= '{SAMPLE_PREFIX_MAX}')
SELECT doc_id, source, sample_key,
       CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY sample_key, doc_id)
            AS INTEGER) AS kept_rank
FROM kept ORDER BY source, kept_rank
"""


def greedy_pack_staged(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """The greedy sequential packing stage shared by q48 and the q149
    export gate: documents in (source, doc_id) order accumulate a
    running token sum; seq_id = (running_before_doc) DIV budget.
    Returns doc_id, source, n_tokens, running, seq_id."""
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs
            .select("doc_id", "source", n_tok.alias("n_tokens"))
            .withColumn("running", F.sum("n_tokens").over(w))
            .withColumn("seq_id",
                        F.floor((F.col("running") - F.col("n_tokens"))
                                / F.lit(budget))))


def q48_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: assign documents, in shard
    order, to fixed token-budget training sequences; report per-sequence
    fill. A doc starts a new sequence when the running token count would
    cross the budget boundary (greedy sequential packing, the standard
    pretraining layout; oversize docs span/overflow their own bin).

    seq_id = (running_total_before_doc) DIV budget — computed from one
    running-sum window per source shard, then one aggregate shuffle.
    """
    register_tables(spark, sf_dir)
    staged = greedy_pack_staged(spark.table("documents"))
    return (staged
            .groupBy("source", "seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"))
            .orderBy("source", "seq_id"))


_Q48_ORACLE = f"""
WITH staged AS (
  SELECT doc_id, source,
         LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
         SUM(LEN(STRING_SPLIT(text, ' '))) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM documents)
SELECT source,
       CAST((running - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM staged
GROUP BY 1, 2 ORDER BY source, seq_id
"""


#: Per-source document quota and the seed for the priority hash.
CAP_PER_SOURCE = 15
CAP_SEED = "c7"


def q49_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling: keep at most CAP_PER_SOURCE documents
    per source, chosen by a seeded hash priority (corpus balancing —
    stop one crawl domain from dominating the training mix).

    Scale shape: the rank filter is a ``row_number() <= K`` predicate,
    which Catalyst rewrites to WindowGroupLimit — a PARTIAL top-k that
    drops rows to K-per-source-per-partition BEFORE the shuffle, so the
    exchange carries at most n_partitions x n_sources x K rows, not the
    corpus. (The plan audit's rank_pushdown column asserts this.)
    Priority is the same seeded-md5 trick as q47: any engine or worker
    re-derives the kept set independently.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    key = F.md5(F.concat(F.lit(CAP_SEED), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy("cap_key", "doc_id")
    return (docs
            .select("doc_id", "source", key.alias("cap_key"))
            .withColumn("cap_rank", F.row_number().over(w))
            .filter(F.col("cap_rank") <= CAP_PER_SOURCE)
            .orderBy("source", "cap_rank"))


_Q49_ORACLE = f"""
SELECT doc_id, source, cap_key, CAST(cap_rank AS INTEGER) AS cap_rank
FROM (
  SELECT doc_id, source,
         MD5('{CAP_SEED}' || CAST(doc_id AS VARCHAR)) AS cap_key,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY MD5('{CAP_SEED}' || CAST(doc_id AS VARCHAR)), doc_id)
           AS cap_rank
  FROM documents)
WHERE cap_rank <= {CAP_PER_SOURCE}
ORDER BY source, cap_rank
"""


#: Train/val/test split fractions in 1/10000ths of the hash keyspace
#: (md5 16-bit prefix): ~90 / ~5 / ~5. Boundaries are hex-prefix
#: thresholds so membership is a pure map-side comparison.
SPLIT_SEED = "sp7"
_VAL_LO, _TEST_LO = "e666", "f333"  # 58982/65536 ~ 90%, 62259/65536 ~ 95%


def q75_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~90/5/5) with per-source
    stratification audit — the manifest a training-data pipeline ships
    with the corpus.

    Membership is the same seeded hash-Bernoulli rule as q47 (a
    16-bit md5 prefix against fixed thresholds): map-side, shuffle-free
    on the corpus, reproducible by any worker at 100 TB. The audit
    aggregate (per source x split counts + observed fraction) is the
    only shuffle and is stratum-sized. Documents never carry a random
    number: re-running on a grown corpus keeps every previous
    assignment stable — the property that makes incremental corpus
    builds possible (a rand() split reshuffles history every run).
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    key = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SEED), F.col("doc_id").cast("string"))),
        1, 4)
    split = (F.when(key < _VAL_LO, "train")
             .when(key < _TEST_LO, "val")
             .otherwise("test"))
    tagged = docs.select("doc_id", "source", key.alias("split_key"),
                         split.alias("split"))
    totals = tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("_n_source"))
    return (tagged.groupBy("source", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("first_doc"))
            .join(totals, "source")
            .select("source", "split", "n_docs", "first_doc",
                    (F.col("n_docs").cast("double") / F.col("_n_source"))
                    .alias("frac"))
            .orderBy("source", "split"))


_Q75_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id, source,
         SUBSTRING(MD5('{SPLIT_SEED}' || CAST(doc_id AS VARCHAR)), 1, 4) AS k
  FROM documents),
split AS (
  SELECT doc_id, source,
         CASE WHEN k < '{_VAL_LO}' THEN 'train'
              WHEN k < '{_TEST_LO}' THEN 'val'
              ELSE 'test' END AS split
  FROM tagged),
totals AS (SELECT source, COUNT(*) AS n_source FROM split GROUP BY source)
SELECT s.source, s.split, COUNT(*) AS n_docs, MIN(s.doc_id) AS first_doc,
       CAST(COUNT(*) AS DOUBLE) / MAX(t.n_source) AS frac
FROM split s JOIN totals t ON t.source = s.source
GROUP BY s.source, s.split
ORDER BY s.source, s.split
"""


#: Temperature-mixture hash resolution: thresholds quantize keep-rates
#: to 1/16^6 of the md5-prefix keyspace.
MIX_HEX_SPACE = 16777216  # 16^6
MIX_SEED = "mix86:"


def q86_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced language mixture (α = 0.5 resampling).

    Multilingual pretraining corpora are rebalanced by sampling group g
    with probability ∝ p_g^α (α<1 upweights rare groups). With α = 0.5
    the per-group keep-rate that equalizes toward the rarest group is
    rate_g = sqrt(min_n / n_g): the rarest language keeps everything,
    a language 4× larger keeps half. sqrt() is IEEE-754
    correctly-rounded in every implementation (unlike pow/ln), so the
    double rates are bit-identical across engines — that is WHY α is
    pinned to 0.5 here rather than the usual 0.7 free parameter.

    Row selection is the same hash-Bernoulli rule as q47, with a
    per-group threshold: keep a doc iff its 6-hex-digit md5 prefix is
    lexicographically below lower(hex(floor(rate * 16^6))) (equal-width
    lowercase hex compares numerically). rate = 1.0 maps to the whole
    keyspace and is kept unconditionally rather than through a 7-digit
    threshold.

    Scale shape: group rates come from a lang-cardinality aggregate
    (tiny) broadcast back; membership is then a pure map-side filter —
    the full corpus never shuffles, matching the q47 scaling argument.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    min_n = counts.agg(F.min("n_lang").alias("min_n"))
    rates = (counts.crossJoin(F.broadcast(min_n))
             .withColumn("rate", F.sqrt(
                 F.col("min_n").cast("double") / F.col("n_lang")))
             .withColumn("thr", F.floor(
                 F.col("rate") * MIX_HEX_SPACE).cast("bigint"))
             .withColumn("thr_hex",
                         F.lpad(F.lower(F.hex(F.col("thr"))), 6, "0")))
    prefix = F.substring(
        F.md5(F.concat(F.lit(MIX_SEED), F.col("doc_id").cast("string"))),
        1, 6)
    tagged = (docs.join(F.broadcast(rates), "lang")
              .withColumn("kept", (F.col("thr") >= MIX_HEX_SPACE)
                          | (prefix < F.col("thr_hex"))))
    return (tagged.groupBy("lang")
            .agg(F.max("n_lang").alias("n_docs"),
                 F.max("rate").alias("rate"),
                 F.sum(F.col("kept").cast("int")).alias("n_kept"))
            .withColumn("kept_frac", F.col("n_kept").cast("double")
                        / F.col("n_docs"))
            .select("lang", "n_docs", "rate", "n_kept", "kept_frac")
            .orderBy("lang"))


_Q86_ORACLE = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
rates AS (
  SELECT lang, n_lang,
         SQRT(CAST((SELECT MIN(n_lang) FROM counts) AS DOUBLE) / n_lang)
           AS rate,
         CAST(FLOOR(SQRT(CAST((SELECT MIN(n_lang) FROM counts) AS DOUBLE)
                         / n_lang) * {MIX_HEX_SPACE}) AS BIGINT) AS thr
  FROM counts),
tagged AS (
  SELECT d.lang, r.n_lang, r.rate, r.thr,
         (r.thr >= {MIX_HEX_SPACE}
          OR SUBSTRING(MD5('{MIX_SEED}' || CAST(d.doc_id AS VARCHAR)), 1, 6)
             < LPAD(LOWER(HEX(r.thr)), 6, '0')) AS kept
  FROM documents d JOIN rates r ON r.lang = d.lang)
SELECT lang,
       MAX(n_lang) AS n_docs,
       MAX(rate) AS rate,
       CAST(SUM(CAST(kept AS INTEGER)) AS BIGINT) AS n_kept,
       CAST(SUM(CAST(kept AS INTEGER)) AS DOUBLE) / MAX(n_lang) AS kept_frac
FROM tagged GROUP BY lang ORDER BY lang
"""


#: Token budget for BPE-counted packing (q108). BPE tokens run several
#: per word, so the budget is wider than q48's whitespace-token budget.
BPE_PACK_BUDGET = 2048


def q108_bpe_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing under REAL tokenizer counts: q48's greedy
    per-shard packing, but budgeted by each document's BPE token count
    (q102's trained merges applied) instead of its whitespace word
    count — the chunk→tokenize→pack integration a pretraining build
    actually runs, where packing against the wrong token count
    silently over/under-fills every context window.

    Scale shape (the composition keeps both parents' shapes): the
    merge fold still runs once per DISTINCT word (vocabulary trick),
    per-word token counts join back to the exploded corpus on the
    word key (max-cardinality, unskewable-ish; AQE handles the rest),
    per-doc counts are one aggregate, and packing is q48's per-shard
    running-sum window — no global ordered cumsum.
    """
    from dataflowtemplates_spark.queries.text import (
        bpe_token_counts, trained_merges)

    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    merges = trained_merges(spark, sf_dir)
    staged = (docs.select("doc_id", "source")
              .join(bpe_token_counts(docs, merges), "doc_id")
              .select("doc_id", "source",
                      F.col("n_bpe").alias("n_tokens")))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = (staged
              .withColumn("running", F.sum("n_tokens").over(w))
              .withColumn("seq_id",
                          F.floor((F.col("running") - F.col("n_tokens"))
                                  / F.lit(BPE_PACK_BUDGET))))
    return (packed
            .groupBy("source", "seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"))
            .orderBy("source", "seq_id"))


def _q108_oracle() -> str:
    from dataflowtemplates_spark.queries.text import _BPE_TOK_CTES
    return f"""
WITH {_BPE_TOK_CTES},
tokcnt AS (
  SELECT word, LEN(toks) AS n_tok FROM tok),
docw AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
    FROM documents)
  WHERE word <> ''),
per_doc AS (
  SELECT doc_id, SUM(n_tok) AS n_bpe
  FROM docw JOIN tokcnt USING (word) GROUP BY doc_id),
staged AS (
  SELECT d.doc_id, d.source,
         CAST(COALESCE(p.n_bpe, 0) AS BIGINT) AS n_tokens
  FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id),
packed AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM staged)
SELECT source,
       CAST((running - n_tokens) // {BPE_PACK_BUDGET} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY 1, 2 ORDER BY source, seq_id
"""


#: Training-shard fan-out and the seed for the placement hash. The
#: shard id is a 32-bit md5 prefix mod N — uniform by construction, so
#: shard sizes concentrate tightly around n/N (see the balance gate).
N_SHARDS = 16
SHARD_SEED = "shard9"

#: Relative size-deviation tolerance for the balance gate. At 100 TB a
#: shard more than 35% off the mean means a broken placement hash (or a
#: pathological doc-size distribution) — the audit is the alarm.
SHARD_TOLERANCE = 0.35


def q140_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + balanced training-shard manifest.

    The last step of every pretraining data build: scatter the corpus
    into N shards in a pseudorandom but REPRODUCIBLE order, and ship a
    manifest proving the shards are balanced. Placement is a seeded
    32-bit md5 prefix mod ``N_SHARDS`` — a pure map-side expression, so
    at 100 TB the "global shuffle" costs exactly one exchange keyed by
    an unskewable uniform hash (and in a real write, ``shard_id``
    becomes the partition directory — `operators/partitioning.py`).
    A ``rand()``-based scatter would be none of reproducible, stable
    under corpus growth, or re-derivable by a reader.

    Output is the shard manifest: per-shard doc count, exact byte/char
    payload, doc-id fences, and the balance-gate boolean
    (|n - mean| <= tolerance * mean; counts are exact ints and mean is
    an exactly-representable division, so both engines agree bitwise).

    Reference analogue: the partition fan-out of the dynamic writers
    (`io/DynamicTextIO.java` sharded sinks); the balance audit is the
    extension a training pipeline needs on top.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    key = F.md5(F.concat(F.lit(SHARD_SEED), F.col("doc_id").cast("string")))
    shard = F.pmod(F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint"),
                   F.lit(N_SHARDS))
    tagged = docs.select(
        F.col("doc_id"), F.col("n_chars"), shard.alias("shard_id"))
    manifest = tagged.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"))
    # The corpus total comes from the manifest itself (an N_SHARDS-row
    # unpartitioned window), NOT a second docs.count() scan — one pass
    # over the data no matter the SF.
    total = F.sum("n_docs").over(Window.partitionBy())
    mean = total.cast("double") / F.lit(float(N_SHARDS))
    return (manifest
            .withColumn("frac",
                        F.col("n_docs").cast("double") / total.cast("double"))
            .withColumn(
                "balanced",
                (F.abs(F.col("n_docs").cast("double") - mean)
                 <= F.lit(SHARD_TOLERANCE) * mean))
            .orderBy("shard_id"))


_Q140_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id, n_chars,
         CAST('0x' || SUBSTRING(
             MD5('{SHARD_SEED}' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % {N_SHARDS} AS shard_id
  FROM documents),
tot AS (SELECT COUNT(*) AS n FROM documents)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc,
       CAST(COUNT(*) AS DOUBLE) / MAX(tot.n) AS frac,
       ABS(CAST(COUNT(*) AS DOUBLE) - CAST(MAX(tot.n) AS DOUBLE) / {N_SHARDS})
         <= {SHARD_TOLERANCE} * (CAST(MAX(tot.n) AS DOUBLE) / {N_SHARDS})
         AS balanced
FROM tagged CROSS JOIN tot
GROUP BY shard_id
ORDER BY shard_id
"""


#: q161: 2^52 — the denominator that makes the md5-13-nibble uniform an
#: EXACT dyadic rational (13 hex nibbles = 52 bits), so the weighted
#: keep rule never touches a rounded value.
U_DENOM = 1 << 52

#: Seed for q161's weighted draw (independent of SAMPLE_SEED's draw).
WSAMPLE_SEED = "w7"


def q161_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sampling — the
    corpus-balancing primitive behind length-weighted / importance-
    weighted subsampling: each document is kept with probability
    ``n_chars / max(n_chars)``, reproducibly.

    The keep rule is INTEGER-exact end to end: the uniform is the
    md5-prefix 52-bit int ``u`` (never divided), and ``u < w * 2^52 /
    w_max`` is evaluated as ``u * w_max < w * 2^52`` — two BIGINT
    multiplies both engines compute identically (no float, no libm).
    ``w <= 2048`` keeps ``w * 2^52`` inside a signed 64; the guard
    raises rather than silently overflow.

    Scale shape: one tiny global max aggregate (2 scalars of driver-
    independent broadcast state), then a pure map-side filter — the
    whole corpus never shuffles, any worker can re-derive membership,
    and the same rule applied to a new batch extends the sample (the
    q47 hash-Bernoulli property, weight-generalized).
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    wmax = docs.agg(F.max("n_chars").alias("w_max"))
    u = F.conv(F.substring(
        F.md5(F.concat(F.lit(WSAMPLE_SEED),
                       F.col("doc_id").cast("string"))), 1, 13),
        16, 10).cast("bigint")
    kept = (docs
            .select("doc_id", "source",
                    F.col("n_chars").cast("bigint").alias("w"),
                    u.alias("u"))
            .crossJoin(F.broadcast(wmax))
            .filter((F.col("w_max") <= 2048)
                    & (F.col("u") * F.col("w_max")
                       < F.col("w") * F.lit(U_DENOM))))
    return (kept
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum("w").cast("bigint").alias("chars_kept"),
                 F.sum(F.col("u") % 97).cast("bigint").alias("u_check"))
            .orderBy("source"))


_Q161_ORACLE = f"""
WITH m AS (SELECT MAX(n_chars) AS w_max FROM documents),
kept AS (
  SELECT source, CAST(n_chars AS BIGINT) AS w,
         CAST(('0x' || SUBSTRING(MD5('{WSAMPLE_SEED}' ||
              CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS u
  FROM documents, m
  WHERE m.w_max <= 2048
    AND CAST(('0x' || SUBSTRING(MD5('{WSAMPLE_SEED}' ||
             CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) * m.w_max
        < CAST(n_chars AS BIGINT) * {U_DENOM})
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(w) AS BIGINT) AS chars_kept,
       CAST(SUM(u % 97) AS BIGINT) AS u_check
FROM kept GROUP BY source ORDER BY source
"""


#: q178 knobs: shards per epoch and the epochs materialized.
EPOCH_SHUFFLE_SHARDS = 8
EPOCH_SHUFFLE_EPOCHS = 2


def q178_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffling — the reproducible-training-order
    kernel: for each epoch, every document gets a seeded pseudo-random
    (shard, position) assignment, so two runs of the same corpus +
    seed feed a trainer IDENTICAL batch order (restart/resume and
    ablation-comparison both depend on this), while different epochs
    get independent permutations.

    Mechanics, all engine-portable exact math: the per-(doc, epoch)
    key is ``md5(doc_id ':' epoch)``; the shard is the key's 60-bit
    prefix mod EPOCH_SHUFFLE_SHARDS (cast to BIGINT BEFORE the modulo
    — string->double coercion would round past 2^53 and diverge); the
    position is the rank of the key within its (epoch, shard). Output
    is the full assignment, so the oracle hash pins every single
    placement, not a summary.

    Scale shape: one map-only pass computes keys and shards; the only
    shuffle is the rank window partitioned by (epoch, shard) — the
    partition IS the shard, sized by the shard-count knob exactly like
    a real training-data writer's output files, so no global sort
    exists at any corpus size. Membership is re-derivable by any
    worker from (doc_id, epoch) alone: resuming epoch N needs no state
    but the seed."""
    register_tables(spark, sf_dir)
    docs = spark.table("documents").select("doc_id")
    epochs = spark.range(EPOCH_SHUFFLE_EPOCHS).select(
        F.col("id").cast("int").alias("epoch"))
    keyed = (docs.crossJoin(F.broadcast(epochs))
             .withColumn("k", F.md5(F.concat(
                 F.col("doc_id").cast("string"), F.lit(":"),
                 F.col("epoch").cast("string"))))
             .withColumn("shard", F.pmod(
                 F.conv(F.substring("k", 1, 15), 16, 10).cast("bigint"),
                 F.lit(EPOCH_SHUFFLE_SHARDS)).cast("int")))
    w = Window.partitionBy("epoch", "shard").orderBy("k", "doc_id")
    return (keyed.select(
        "doc_id", "epoch", "shard",
        F.row_number().over(w).cast("int").alias("pos"))
        .orderBy("epoch", "shard", "pos"))


_Q178_ORACLE = f"""
WITH keyed AS (
  SELECT d.doc_id, e.epoch,
         md5(CAST(d.doc_id AS VARCHAR) || ':'
             || CAST(e.epoch AS VARCHAR)) AS k
  FROM documents d
  CROSS JOIN (SELECT UNNEST(RANGE({EPOCH_SHUFFLE_EPOCHS}))
              AS epoch) e),
sharded AS (
  SELECT doc_id, CAST(epoch AS INTEGER) AS epoch, k,
         CAST(CAST(('0x' || SUBSTRING(k, 1, 15)) AS BIGINT)
              % {EPOCH_SHUFFLE_SHARDS} AS INTEGER) AS shard
  FROM keyed)
SELECT doc_id, epoch, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard
                               ORDER BY k, doc_id) AS INTEGER) AS pos
FROM sharded
ORDER BY epoch, shard, pos
"""


QUERIES = {
    "q47_hash_sample": q47_hash_sample,
    "q178_epoch_shuffle": q178_epoch_shuffle,
    "q48_sequence_packing": q48_sequence_packing,
    "q49_domain_cap": q49_domain_cap,
    "q75_stratified_split": q75_stratified_split,
    "q86_source_mixture": q86_source_mixture,
    "q108_bpe_packing": q108_bpe_packing,
    "q140_training_shards": q140_training_shards,
    "q161_weighted_sample": q161_weighted_sample,
}

ORACLES = {
    "q47_hash_sample": _Q47_ORACLE,
    "q178_epoch_shuffle": _Q178_ORACLE,
    "q48_sequence_packing": _Q48_ORACLE,
    "q49_domain_cap": _Q49_ORACLE,
    "q75_stratified_split": _Q75_ORACLE,
    "q86_source_mixture": _Q86_ORACLE,
    "q108_bpe_packing": _q108_oracle(),
    "q140_training_shards": _Q140_ORACLE,
    "q161_weighted_sample": _Q161_ORACLE,
}
