"""Text-analysis operators over the `documents` table.

Training-data-pipeline extensions beyond the reference surface
(BASELINE.json north star): token counting, language-ID heuristic,
quality scoring, document fingerprinting. All pure Catalyst column
expressions (no Python UDFs) — at 100 TB these run inside whole-stage
codegen and scale linearly with no shuffle except the final aggregates.

Determinism: everything derives from integer counts, string hashing
(md5 — identical hex output in Spark and DuckDB) and int/int double
division, all engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataflowtemplates_spark.catalog import register_tables

#: Tiny english stopword set for the heuristic scores.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

_SW_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def tokens_col(c: str = "text") -> F.Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    return F.split(F.col(c), " ")


def q40_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: counts, distinct counts, word shape."""
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    toks = tokens_col()
    return (
        docs.select(
            "doc_id", "lang",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
            F.length("text").alias("n_chars_actual"),
            # BPE-ish subword proxy: alnum runs + punct marks each count 1
            F.size(F.split(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9]+", " "),
                           " ")).alias("n_alnum_runs"),
            (F.size(F.array_distinct(toks)).cast("double") / F.size(toks))
             .alias("type_token_ratio"))
        .orderBy("doc_id")
    )


_Q40_ORACLE = """
SELECT doc_id, lang,
       CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INTEGER) AS n_distinct_tokens,
       CAST(LENGTH(text) AS INTEGER) AS n_chars_actual,
       CAST(LEN(STRING_SPLIT(TRIM(REGEXP_REPLACE(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' '))
            AS INTEGER) AS n_alnum_runs,
       CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
         / LEN(STRING_SPLIT(text, ' ')) AS type_token_ratio
FROM documents ORDER BY doc_id
"""


def q41_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic + agreement with the lang label."""
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    hits = F.expr(
        f"size(filter(split(text, ' '), t -> t IN ({sw})))")
    n = F.size(tokens_col())
    ratio = hits.cast("double") / n
    pred = F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other"))
    return (
        docs.select("doc_id", "lang",
                    hits.alias("stopword_hits"),
                    ratio.alias("stopword_ratio"),
                    pred.alias("predicted_lang"))
        .orderBy("doc_id")
    )


_Q41_ORACLE = f"""
SELECT doc_id, lang,
       CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN {_SW_SQL})) AS INTEGER)
         AS stopword_hits,
       CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN {_SW_SQL})) AS DOUBLE)
         / LEN(STRING_SPLIT(text, ' ')) AS stopword_ratio,
       CASE WHEN CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN {_SW_SQL})) AS DOUBLE)
                 / LEN(STRING_SPLIT(text, ' ')) >= 0.08
            THEN 'en' ELSE 'other' END AS predicted_lang
FROM documents ORDER BY doc_id
"""


def q42_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length/punct/digit/repetition signals."""
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    n_chars = F.length("text")
    punct = F.length(F.regexp_replace(F.col("text"), "[^.,!?;:]", ""))
    digits = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    toks = tokens_col()
    rep = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    return (
        docs.select(
            "doc_id",
            n_chars.alias("n_chars_actual"),
            (punct.cast("double") / n_chars).alias("punct_ratio"),
            (digits.cast("double") / n_chars).alias("digit_ratio"),
            rep.alias("repetition_ratio"),
            F.when((n_chars >= 50) & (rep < 0.9), F.lit("keep"))
             .otherwise(F.lit("drop")).alias("quality_gate"))
        .orderBy("doc_id")
    )


_Q42_ORACLE = """
SELECT doc_id,
       CAST(LENGTH(text) AS INTEGER) AS n_chars_actual,
       CAST(LENGTH(REGEXP_REPLACE(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
         / LENGTH(text) AS punct_ratio,
       CAST(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS DOUBLE)
         / LENGTH(text) AS digit_ratio,
       1.0 - CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
               / LEN(STRING_SPLIT(text, ' ')) AS repetition_ratio,
       CASE WHEN LENGTH(text) >= 50
                 AND (1.0 - CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
                      / LEN(STRING_SPLIT(text, ' '))) < 0.9
            THEN 'keep' ELSE 'drop' END AS quality_gate
FROM documents ORDER BY doc_id
"""


def q43_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace/punct-normalized text.

    The canonical pre-dedup normalization: lowercase, strip
    non-alphanumerics, collapse whitespace, hash.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    normalized = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "))
    return (
        docs.select("doc_id", "source",
                    F.md5(normalized.cast("binary")).alias("fingerprint"),
                    F.substring(F.md5(normalized.cast("binary")), 1, 8)
                     .alias("fingerprint_short"))
        .orderBy("doc_id")
    )


_Q43_ORACLE = """
SELECT doc_id, source,
       MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g'))) AS fingerprint,
       SUBSTRING(MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'),
                                         ' +', ' ', 'g'))), 1, 8) AS fingerprint_short
FROM documents ORDER BY doc_id
"""


def q44_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling: per (source, lang) size/length distribution."""
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    return (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.min("n_chars").alias("min_chars"),
             F.max("n_chars").alias("max_chars"))
        .orderBy("source", "lang")
    )


_Q44_ORACLE = """
SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY source, lang ORDER BY source, lang
"""


def q45_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning PIPELINE: quality gate + language-ID composed into
    one pass — the filter a pretraining corpus build actually applies.
    Per (source, verdict) survival stats plus exact char volume kept.
    One scan, one aggregate shuffle; every signal is a Catalyst
    expression so the whole filter runs inside codegen at 100 TB."""
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    n_chars = F.length("text")
    toks = tokens_col()
    rep = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    ratio = (F.expr(f"size(filter(split(text, ' '), t -> t IN ({sw})))")
             .cast("double") / F.size(toks))
    keep = ((n_chars >= 50) & (rep < 0.9) & (ratio >= 0.08))
    return (docs.select("source",
                        F.when(keep, F.lit("keep")).otherwise(F.lit("drop"))
                         .alias("verdict"),
                        n_chars.alias("nc"))
            .groupBy("source", "verdict")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("nc").cast("bigint").alias("total_chars"))
            .orderBy("source", "verdict"))


_Q45_ORACLE = f"""
SELECT source,
       CASE WHEN LENGTH(text) >= 50
                 AND (1.0 - CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
                      / LEN(STRING_SPLIT(text, ' '))) < 0.9
                 AND CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN {_SW_SQL})) AS DOUBLE)
                     / LEN(STRING_SPLIT(text, ' ')) >= 0.08
            THEN 'keep' ELSE 'drop' END AS verdict,
       COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2 ORDER BY source, verdict
"""


def q46_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization: the pre-tokenization cleanup pass a
    training pipeline runs on every document (lowercase, URL/email/number
    redaction, whitespace collapse).

    Map-only — zero shuffles; every rule is a Catalyst regexp expression
    inside whole-stage codegen, so at 100 TB this is a pure scan-rewrite
    that scales linearly with input bytes. Patterns are restricted to the
    regex subset Java (Spark) and RE2 (DuckDB) interpret identically.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    norm = F.lower(F.col("text"))
    norm = F.regexp_replace(norm, r"https?://[^ ]+", "<url>")
    norm = F.regexp_replace(norm, r"[^ ]+@[^ ]+\.[a-z]+", "<email>")
    norm = F.regexp_replace(norm, "[0-9]+", "<num>")
    norm = F.trim(F.regexp_replace(norm, " +", " "))
    return (
        docs.select(
            "doc_id",
            norm.alias("text_norm"),
            F.length(norm).alias("n_chars_norm"),
            (F.length(norm) < F.length("text")).alias("shrunk"))
        .orderBy("doc_id")
    )


_Q46_ORACLE = """
WITH n AS (
  SELECT doc_id, text,
         TRIM(REGEXP_REPLACE(
           REGEXP_REPLACE(
             REGEXP_REPLACE(
               REGEXP_REPLACE(LOWER(text), 'https?://[^ ]+', '<url>', 'g'),
               '[^ ]+@[^ ]+\\.[a-z]+', '<email>', 'g'),
             '[0-9]+', '<num>', 'g'),
           ' +', ' ', 'g')) AS text_norm
  FROM documents)
SELECT doc_id, text_norm,
       CAST(LENGTH(text_norm) AS INTEGER) AS n_chars_norm,
       LENGTH(text_norm) < LENGTH(text) AS shrunk
FROM n ORDER BY doc_id
"""


def _grams_spark(width: int) -> F.Column:
    """Word n-grams of the given width as an array column (empty when
    the document is shorter than ``width`` words). Operates on a
    pre-split ``toks`` column, NOT an inline split(text): transform()
    lambdas are interpreted, so a split inside the lambda body would
    re-tokenize the document once per element."""
    return F.when(
        F.size("toks") >= width,
        F.expr(
            f"transform(sequence(1, size(toks) - {width - 1}), "
            f"i -> concat_ws(' ', slice(toks, i, {width})))")
    ).otherwise(F.array().cast("array<string>"))


def _grams_dd(width: int) -> str:
    """The identical n-gram array in DuckDB SQL (RANGE is half-open)."""
    return (
        f"CASE WHEN LEN(STRING_SPLIT(text, ' ')) >= {width} THEN "
        f"LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - {width - 2}), "
        f"i -> ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '), "
        f"i, i + {width - 1}), ' ')) "
        f"ELSE [] END")


def q58_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (Gopher-style quality rules):
    duplicate word-bigram / word-trigram fractions and the share of the
    document taken by its single most-repeated bigram.

    Scale shape: the duplicate fractions are MAP-ONLY (array_distinct
    over per-row gram arrays inside codegen — no shuffle); only the
    top-bigram count needs an aggregate, and its key (doc_id, gram) is
    maximally high-cardinality, so the shuffle is perfectly spread —
    no skew, no low-cardinality window. Reference analogue: none (this
    is a training-pipeline extension; the reference has no text ops).

    Interpreted-HOF placement (measured 12s → ~1.5s at sf0.1): the
    stats projection builds each gram array ONCE in its own projection
    layer (multi-referenced `_bi`/`_tri` columns block CollapseProject
    from re-inlining the transform() into every consumer), while the
    top-bigram branch explodes the expression INLINE — an explode of a
    pre-projected array column measures ~8x slower than letting the
    expression collapse into the Generate. Both operate on a pre-split
    `toks` column so the lambda never re-tokenizes per element.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    toked = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    arrs = toked.select("doc_id", _grams_spark(2).alias("_bi"),
                        _grams_spark(3).alias("_tri"))
    base = arrs.select(
        "doc_id",
        F.size("_bi").alias("n_bigrams"),
        F.size(F.array_distinct("_bi")).alias("n_distinct_bigrams"),
        F.size("_tri").alias("n_trigrams"),
        F.size(F.array_distinct("_tri")).alias("n_distinct_trigrams"))
    top = (toked.select("doc_id", F.explode(_grams_spark(2)).alias("gram"))
           .groupBy("doc_id", "gram")
           .agg(F.count(F.lit(1)).alias("cnt"))
           .groupBy("doc_id")
           .agg(F.max("cnt").alias("top_bigram_n")))
    frac = (lambda n, d: F.when(
        F.col(d) > 0,
        F.lit(1.0) - F.col(n).cast("double") / F.col(d)).otherwise(F.lit(0.0)))
    return (base
            .join(top, "doc_id", "left")
            .withColumn("top_bigram_n",
                        F.coalesce("top_bigram_n", F.lit(0)).cast("bigint"))
            .withColumn("dup_bigram_frac",
                        frac("n_distinct_bigrams", "n_bigrams"))
            .withColumn("dup_trigram_frac",
                        frac("n_distinct_trigrams", "n_trigrams"))
            .withColumn("top_bigram_frac",
                        F.when(F.col("n_bigrams") > 0,
                               F.col("top_bigram_n").cast("double")
                               / F.col("n_bigrams")).otherwise(F.lit(0.0)))
            .select("doc_id", "n_bigrams", "n_distinct_bigrams",
                    "dup_bigram_frac", "n_trigrams", "n_distinct_trigrams",
                    "dup_trigram_frac", "top_bigram_n", "top_bigram_frac")
            .orderBy("doc_id"))


_Q58_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         {_grams_dd(2)} AS bi,
         {_grams_dd(3)} AS tri
  FROM documents),
stats AS (
  SELECT doc_id,
         CAST(LEN(bi) AS INTEGER) AS n_bigrams,
         CAST(LEN(LIST_DISTINCT(bi)) AS INTEGER) AS n_distinct_bigrams,
         CAST(LEN(tri) AS INTEGER) AS n_trigrams,
         CAST(LEN(LIST_DISTINCT(tri)) AS INTEGER) AS n_distinct_trigrams
  FROM base),
top AS (
  SELECT doc_id, MAX(cnt) AS top_bigram_n FROM (
    SELECT doc_id, gram, COUNT(*) AS cnt FROM (
      SELECT doc_id, UNNEST(bi) AS gram FROM base)
    GROUP BY doc_id, gram) GROUP BY doc_id)
SELECT s.doc_id, n_bigrams, n_distinct_bigrams,
       CASE WHEN n_bigrams > 0
            THEN 1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams
            ELSE 0.0 END AS dup_bigram_frac,
       n_trigrams, n_distinct_trigrams,
       CASE WHEN n_trigrams > 0
            THEN 1.0 - CAST(n_distinct_trigrams AS DOUBLE) / n_trigrams
            ELSE 0.0 END AS dup_trigram_frac,
       CAST(COALESCE(top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       CASE WHEN n_bigrams > 0
            THEN CAST(COALESCE(top_bigram_n, 0) AS DOUBLE) / n_bigrams
            ELSE 0.0 END AS top_bigram_frac
FROM stats s LEFT JOIN top USING (doc_id)
ORDER BY s.doc_id
"""


#: TF-IDF top-terms per document.
TFIDF_K = 3


def q59_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TFIDF_K salient terms per document. The "idf" is the exact
    rational form tf/n_tokens * N/df (pure int→double arithmetic — a
    log() would be libm-dependent and break bit-exact oracle compare;
    the RANKING it induces is identical since log is monotonic).

    Scale shape: term frequencies shuffle once on the high-cardinality
    (doc_id, term) key; document frequencies aggregate to a vocab-sized
    table that joins back BROADCAST (a vocabulary is ~10^6 rows at any
    corpus size — genuinely bounded, unlike customer/supplier dims);
    the per-doc rank-filter compiles to WindowGroupLimit (partial top-k
    before the shuffle) and doc_id is maximally high-cardinality, so no
    low-cardinality window pathology.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    n_total = docs.groupBy().agg(F.count(F.lit(1)).alias("n_corpus"))
    # n_tokens is computed BELOW the Generate (so the explode carries a
    # scalar, not a re-evaluated split-per-exploded-row expression)
    tf = (docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
          .select("doc_id", F.size("toks").alias("n_tokens"), F.col("toks"))
          .select("doc_id", "n_tokens", F.explode("toks").alias("term"))
          .groupBy("doc_id", "n_tokens", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_docs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    scored = (tf.join(F.broadcast(df_docs), "term")
              .crossJoin(F.broadcast(n_total))
              .withColumn(
                  "score",
                  (F.col("tf").cast("double") / F.col("n_tokens"))
                  * (F.col("n_corpus").cast("double") / F.col("df_docs"))))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (scored
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TFIDF_K)
            .select("doc_id", "rk", "term", "tf", "df_docs", "score")
            .orderBy("doc_id", "rk"))


_Q59_ORACLE = f"""
WITH tf AS (
  SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
         UNNEST(STRING_SPLIT(text, ' ')) AS term
  FROM documents),
tfc AS (
  SELECT doc_id, n_tokens, term, COUNT(*) AS tf
  FROM tf GROUP BY doc_id, n_tokens, term),
dfc AS (
  SELECT term, COUNT(*) AS df_docs FROM tfc GROUP BY term),
scored AS (
  SELECT doc_id, term, tf, df_docs,
         (CAST(tf AS DOUBLE) / n_tokens)
           * (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df_docs)
           AS score
  FROM tfc JOIN dfc USING (term))
SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, tf, df_docs, score
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
  FROM scored)
WHERE rk <= {TFIDF_K}
ORDER BY doc_id, rk
"""


#: How many top merge-candidate pairs the BPE step reports.
BPE_TOP = 20


def q68_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge step: corpus-wide counts of adjacent
    character pairs inside words, weighted by word frequency — the
    statistic a tokenizer trainer computes to pick its next merge.

    Scale shape: the corpus collapses to its VOCABULARY first (one
    shuffle on word — at 100 TB the vocab is millions of rows, the
    corpus is trillions; all pair work happens on the small side), char
    pairs explode off each distinct word (bounded by word length), and
    the global top-N is orderBy+limit = TakeOrderedAndProject — a
    per-partition partial top-N and a single tiny merge, never a
    global sort of the pair table.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    vocab = (docs.select(F.explode(tokens_col()).alias("word"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("n_uses")))
    # NB: guard, not greatest() — sequence(1, 0) in Spark is the
    # DESCENDING sequence [1, 0], which would fabricate pairs for
    # single-character words
    pair_arr = F.when(
        F.length("word") >= 2,
        F.expr("transform(sequence(1, length(word) - 1), "
               "i -> substring(word, i, 2))")
    ).otherwise(F.array().cast("array<string>"))
    pairs = vocab.select("word", "n_uses", F.explode(pair_arr).alias("pair"))
    return (pairs.groupBy("pair")
            .agg(F.sum("n_uses").cast("bigint").alias("total_count"),
                 F.count(F.lit(1)).alias("n_words"))
            .orderBy(F.col("total_count").desc(), F.col("pair").asc())
            .limit(BPE_TOP)
            .select("pair", "n_words", "total_count"))


_Q68_ORACLE = f"""
WITH vocab AS (
  SELECT word, COUNT(*) AS n_uses FROM (
    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
  GROUP BY word),
pairs AS (
  SELECT word, n_uses, UNNEST(LIST_TRANSFORM(
      RANGE(1, GREATEST(LENGTH(word), 1)),
      i -> SUBSTRING(word, i, 2))) AS pair
  FROM vocab)
SELECT pair, COUNT(*) AS n_words, CAST(SUM(n_uses) AS BIGINT) AS total_count
FROM pairs
GROUP BY pair
ORDER BY total_count DESC, pair ASC
LIMIT {BPE_TOP}
"""


def _sql_str(s: str) -> str:
    """Spark SQL single-quoted string literal (backslash escaping)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_apply_expr(word_col: str, merges: list[str]) -> str:
    """Spark SQL expression applying a ranked 2-char merge list to
    ``word_col``'s character sequence -> array<string> of tokens.

    Each merge is one greedy left-to-right pass: a left fold whose
    accumulator is the output token list; the merge fires when the
    accumulator's last token equals the pair's first char and the
    incoming token its second. Equivalent to the two-pointer scan
    (property-tested in tests/test_kernel_properties.py) because a
    merged token is strictly longer than its left half and can never
    re-fire as the same pair's left side.
    """
    chars = (f"transform(sequence(1, length({word_col})), "
             f"i -> substring({word_col}, i, 1))")
    if not merges:
        return chars
    mlits = ", ".join(_sql_str(m) for m in merges)
    return f"""
        aggregate(
          array({mlits}),
          {chars},
          (toks, m) -> aggregate(
            toks,
            cast(array() as array<string>),
            (acc, t) -> case when size(acc) > 0
                              and element_at(acc, -1) = substring(m, 1, 1)
                              and t = substring(m, 2, 1)
                        then concat(slice(acc, 1, size(acc) - 1),
                                    array(m))
                        else concat(acc, array(t)) end))"""


def trained_merges(spark: SparkSession, sf_dir: str) -> list[str]:
    """The trained merges table: q68's ranked pair list collected as
    driver-side model state (BPE_TOP rows — O(model), like the ANN
    codebooks). Shared by q102 (tokenize) and q108 (token-budget
    packing)."""
    return [r["pair"] for r in q68_bpe_pairs(spark, sf_dir)
            .select("pair").collect()]


def bpe_token_counts(docs: DataFrame, merges: list[str],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document BPE token counts under a trained merges table:
    (id_col, n_bpe). The vocabulary trick made reusable — the merge
    fold runs once per DISTINCT word (Catalyst collapses the distinct
    and the fold into one per-word Aggregate, pinned in
    tests/test_planshape.py), per-word counts join back on the word
    key, and documents whose every token is empty get n_bpe = 0.
    Shared by q108 and the pretraining template."""
    words_all = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"))
    words = words_all.filter(F.col("word") != "")
    vocab_counts = (words.select("word").distinct()
                    .select("word",
                            F.size(F.expr(bpe_apply_expr("word", merges)))
                            .alias("n_tok")))
    per_doc = (words.join(vocab_counts, "word")
               .groupBy("_id")
               .agg(F.sum("n_tok").alias("n_bpe")))
    return (docs.select(F.col(id_col).alias("_id"))
            .join(per_doc, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce("n_bpe", F.lit(0)).cast("bigint")
                    .alias("n_bpe")))


def q102_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE APPLICATION — the pipeline stage between chunking (q84) and
    sequence packing (q48) that q68 (merge-pair statistics) stopped
    short of: apply a trained merges table to the corpus and emit the
    resulting token vocabulary with ids.

    The merges table is a deterministic function of q68's output: its
    BPE_TOP adjacent-pair counts, in rank order (total_count DESC,
    pair ASC), become the merge list — a one-round-trained tokenizer,
    which keeps the table oracle-recomputable in SQL while exercising
    the full APPLY machinery (greedy left-to-right merge per rank, new
    adjacencies from earlier merges feeding later ones). The TRUE
    iterative trainer — per-round stat recomputation over the
    re-tokenized vocabulary — is q111_bpe_train; its merges plug into
    the same ``bpe_apply_expr`` fold.

    Application is a pure fold, identical in both engines: a word's
    character sequence is folded over the ranked merges; each merge is
    one greedy left-to-right pass implemented as a left fold whose
    accumulator is the output token list (merge fires when the
    accumulator's last token is the pair's first char and the incoming
    token its second — equivalent to the two-pointer scan, since a
    merged token is strictly longer than its left half and can never
    re-fire as the same pair's left side).

    Scale shape (the BPE trick that makes tokenization tractable at
    100 TB): tokenize the VOCABULARY, not the corpus — one shuffle
    collapses trillions of corpus tokens to millions of distinct
    words, the fold runs once per distinct word, and corpus-level
    counts come back by weighting with the word's use count. The
    merges table is driver-held O(model) state like the IVF/PQ
    codebooks. Everything is JVM-side HOF expressions — no Python,
    no join, no per-row explosion before the final small aggregate.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    vocab = (docs.select(F.explode(tokens_col()).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count(F.lit(1)).alias("n_uses")))
    merges = trained_merges(spark, sf_dir)

    tok_rows = (vocab
                .select("word", "n_uses",
                        F.explode(F.expr(bpe_apply_expr("word", merges)))
                        .alias("token")))
    agg = (tok_rows.groupBy("token")
           .agg(F.count(F.lit(1)).alias("n_vocab_occ"),
                F.sum("n_uses").cast("bigint").alias("n_corpus_occ")))
    w = Window.orderBy(F.col("n_corpus_occ").desc(), F.col("token").asc())
    return (agg
            .select(F.row_number().over(w).alias("token_id"),
                    "token",
                    (F.length("token") > 1).alias("is_merged"),
                    "n_vocab_occ", "n_corpus_occ")
            .orderBy("token_id"))


#: The vocabulary-tokenization CTE chain shared by the q102 and q108
#: oracles (one definition, so the two gates can't drift): distinct
#: non-empty words, the ranked merge table, and the nested-list_reduce
#: merge application producing ``tok(word, n_uses, toks)``.
_BPE_TOK_CTES = f"""vocab AS (
  SELECT word, COUNT(*) AS n_uses FROM (
    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word),
pair_stats AS (
  SELECT pair, CAST(SUM(n_uses) AS BIGINT) AS total_count FROM (
    SELECT word, n_uses, UNNEST(LIST_TRANSFORM(
        RANGE(1, GREATEST(LENGTH(word), 1)),
        i -> SUBSTRING(word, i, 2))) AS pair
    FROM vocab)
  GROUP BY pair ORDER BY total_count DESC, pair ASC LIMIT {BPE_TOP}),
mlist AS (
  SELECT LIST(pair ORDER BY total_count DESC, pair ASC) AS ms
  FROM pair_stats),
tok AS (
  SELECT word, n_uses,
    list_reduce(
      list_prepend(
        list_transform(range(1, len(word) + 1), i -> word[i:i]),
        list_transform((SELECT ms FROM mlist), m -> [m])),
      (acc, x) -> list_reduce(
        list_transform(acc, t -> [t]),
        (iacc, ix) -> CASE WHEN len(iacc) > 0
                            AND iacc[-1] = x[1][1:1]
                            AND ix[1] = x[1][2:2]
                      THEN iacc[1:len(iacc) - 1] || [x[1]]
                      ELSE iacc || ix END)) AS toks
  FROM vocab)"""


_Q102_ORACLE = f"""
WITH {_BPE_TOK_CTES},
agg AS (
  SELECT token, COUNT(*) AS n_vocab_occ,
         CAST(SUM(n_uses) AS BIGINT) AS n_corpus_occ
  FROM (SELECT word, n_uses, UNNEST(toks) AS token FROM tok)
  GROUP BY token)
SELECT CAST(ROW_NUMBER() OVER (
         ORDER BY n_corpus_occ DESC, token ASC) AS INTEGER) AS token_id,
       token, LEN(token) > 1 AS is_merged, n_vocab_occ, n_corpus_occ
FROM agg ORDER BY token_id
"""


#: Iterative BPE training rounds (q111).
BPE_TRAIN_ROUNDS = 12
#: Training-vocabulary cap: train on the top-N words by use count
#: (ties broken by word ASC), the standard trainer practice that also
#: bounds both engines' per-round cost — mirrored in the oracle's
#: tok0 CTE, so the cap is part of the declared semantics.
BPE_TRAIN_VOCAB = 2000


def q111_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE iterative BPE training: after every merge the pair
    statistics are recomputed over the RE-TOKENIZED vocabulary — the
    real trainer loop, where q68 (single-round pair stats) and q102
    (application of a fixed table) are the two halves this closes.
    Emits the learned merges in training order with each pair's count
    at selection time.

    A merge is a PAIR of tokens (left, right) — after round one these
    are multi-character, so the pair cannot be carried as a single
    concatenated string (("ab","c") and ("a","bc") would collide);
    rank ties break on (count DESC, left ASC, right ASC) in both
    engines.

    Scale shape — the bounded-iteration pattern (connected_components'
    discipline): the corpus collapses to its vocabulary ONCE; each
    round is one pair-stats aggregate over the (bounded) vocab, one
    O(1)-row argmax collected driver-side, and one map-only fold
    re-tokenization, materialized per round (localCheckpoint) so the
    lineage stays flat. Driver state is the merges list — O(rounds),
    never O(data). The DuckDB oracle unrolls the same rounds as CTE
    pairs (stats_r -> argmax_r -> retokenize_r), merging via a LEFT
    JOIN so a dried-up corpus (no pair left) no-ops identically on
    both sides.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    vocab = (docs.select(F.explode(tokens_col()).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count(F.lit(1)).alias("n_uses"))
             .orderBy(F.col("n_uses").desc(), F.col("word").asc())
             .limit(BPE_TRAIN_VOCAB)
             .withColumn("toks", F.expr(
                 "transform(sequence(1, length(word)), "
                 "i -> substring(word, i, 1))"))
             .localCheckpoint(eager=True))

    merges: list[tuple[str, str, int]] = []
    for _ in range(BPE_TRAIN_ROUNDS):
        pairs = (vocab
                 .select("n_uses", F.explode(F.expr(
                     "case when size(toks) >= 2 then transform("
                     "sequence(1, size(toks) - 1), i -> named_struct("
                     "'l', element_at(toks, i), "
                     "'r', element_at(toks, i + 1))) "
                     "else cast(array() as "
                     "array<struct<l:string,r:string>>) end"))
                     .alias("p"))
                 .groupBy("p.l", "p.r")
                 .agg(F.sum("n_uses").cast("bigint").alias("total"))
                 .orderBy(F.col("total").desc(), F.col("l").asc(),
                          F.col("r").asc())
                 .limit(1).collect())
        if not pairs:
            break
        left, right, total = pairs[0]["l"], pairs[0]["r"], pairs[0]["total"]
        merges.append((left, right, int(total)))
        fold = (
            "aggregate(toks, cast(array() as array<string>), "
            "(acc, t) -> case when size(acc) > 0 "
            f"and element_at(acc, -1) = {_sql_str(left)} "
            f"and t = {_sql_str(right)} "
            "then concat(slice(acc, 1, size(acc) - 1), "
            f"array({_sql_str(left + right)})) "
            "else concat(acc, array(t)) end)")
        vocab = (vocab.withColumn("toks", F.expr(fold))
                 .localCheckpoint(eager=True))

    return spark.createDataFrame(
        [(i + 1, l, r, l + r, n) for i, (l, r, n) in enumerate(merges)],
        "rank int, left string, right string, merged string, "
        "pair_count bigint").orderBy("rank")


def _q111_oracle() -> str:
    rounds = []
    for r in range(1, BPE_TRAIN_ROUNDS + 1):
        prev = f"tok{r - 1}"
        rounds.append(f"""p{r} AS MATERIALIZED (
  SELECT s.l, s.r, s.total FROM (
    SELECT pr.l AS l, pr.r AS r,
           CAST(SUM(n_uses) AS BIGINT) AS total
    FROM (
      SELECT n_uses, UNNEST(
        CASE WHEN len(toks) >= 2 THEN LIST_TRANSFORM(
          RANGE(1, len(toks)),
          i -> {{'l': toks[i], 'r': toks[i + 1]}})
        ELSE [] END) AS pr
      FROM {prev})
    GROUP BY pr.l, pr.r
    ORDER BY total DESC, l ASC, r ASC LIMIT 1) s),
tok{r} AS MATERIALIZED (
  SELECT word, n_uses,
    CASE WHEN p.l IS NULL THEN toks
    ELSE list_reduce(
      list_transform(toks, t -> [t]),
      (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = p.l
                        AND x[1] = p.r
                  THEN acc[1:len(acc) - 1] || [p.l || p.r]
                  ELSE acc || x END)
    END AS toks
  FROM {prev} LEFT JOIN p{r} p ON TRUE)""")
    picks = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, l, r, l || r AS merged, total FROM p{r}"
        for r in range(1, BPE_TRAIN_ROUNDS + 1))
    return f"""
WITH tok0 AS (
  SELECT word, n_uses,
         list_transform(range(1, len(word) + 1), i -> word[i:i]) AS toks
  FROM (
    SELECT word, COUNT(*) AS n_uses
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
    WHERE word <> '' GROUP BY word
    ORDER BY n_uses DESC, word ASC LIMIT {BPE_TRAIN_VOCAB})),
{",".join(rounds)}
SELECT CAST(rank AS INTEGER) AS rank, l AS left, r AS right, merged,
       total AS pair_count
FROM ({picks})
ORDER BY rank
"""


def q76_charlm_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram coverage against a reference corpus — the
    integer-exact core of LM-based quality scoring.

    A real pipeline scores documents by perplexity under a small LM
    trained on trusted text; the portable, engine-exact part of that
    signal is VOCABULARY COVERAGE: what fraction of a document's
    distinct char-trigrams appear in the reference corpus at all
    (OOV-rate). Log-prob scoring needs ln(), whose last-bit rounding
    differs across libm builds and would break bit-exact oracle
    comparison, so the query sticks to counts and one exact int/int
    double division — the monotone backbone of the perplexity signal.

    Shape at 100 TB: the reference trigram vocabulary (bounded: even
    web-scale corpora top out at a few million distinct char-trigrams)
    is distinct-aggregated and broadcast; the corpus side explodes
    per-doc DISTINCT trigrams map-side, hash-joins the broadcast with
    no corpus shuffle, and aggregates per doc — q57's decontamination
    topology reused for scoring. Reference here: the even-doc_id half
    of the English subset, so every document (including English ones)
    can carry genuine OOV mass.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    tri = F.array_distinct(F.expr(
        "transform(sequence(1, greatest(length(text) - 2, 1)), "
        "i -> substring(text, i, 3))"))
    is_ref = (F.col("lang") == "en") & (F.col("doc_id") % 2 == 0)
    ref = (docs.filter(is_ref)
           .select(F.explode(tri).alias("g")).distinct())
    grams = docs.select("doc_id", F.explode(tri).alias("g"))
    sizes = docs.select("doc_id", "lang", F.size(tri).alias("n_tri"))
    seen = (grams.join(F.broadcast(ref), "g")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_seen")))
    return (sizes.join(seen, "doc_id", "left")
            .select("doc_id", "lang", "n_tri",
                    F.coalesce("n_seen", F.lit(0)).alias("n_seen"),
                    ((F.col("n_tri") - F.coalesce("n_seen", F.lit(0)))
                     .cast("double") / F.col("n_tri")).alias("oov_frac"),
                    is_ref.alias("is_reference"))
            .orderBy("doc_id"))


_Q76_ORACLE = """
WITH tri AS (
  SELECT doc_id, lang, doc_id % 2 = 0 AND lang = 'en' AS is_reference,
         LIST_DISTINCT(LIST_TRANSFORM(
           RANGE(1, GREATEST(LEN(text) - 2, 1) + 1),
           i -> SUBSTRING(text, i, 3))) AS gs
  FROM documents),
ref AS (SELECT DISTINCT UNNEST(gs) AS g FROM tri WHERE is_reference),
grams AS (SELECT doc_id, UNNEST(gs) AS g FROM tri),
seen AS (
  SELECT doc_id, COUNT(*) AS n_seen
  FROM grams JOIN ref USING (g) GROUP BY doc_id)
SELECT t.doc_id, t.lang, CAST(LEN(t.gs) AS INTEGER) AS n_tri,
       COALESCE(s.n_seen, 0) AS n_seen,
       CAST(LEN(t.gs) - COALESCE(s.n_seen, 0) AS DOUBLE) / LEN(t.gs)
         AS oov_frac,
       t.is_reference
FROM tri t LEFT JOIN seen s ON s.doc_id = t.doc_id
ORDER BY t.doc_id
"""


#: PII patterns, byte-identical in both engines (kept to the regex
#: subset where Java (Spark) and RE2 (DuckDB) agree: character
#: classes, bounded repetition, no backrefs/lookaround).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def q79_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over free text (emails, IPv4).

    A training-data pipeline scrubs PII before anything else touches
    the text. The synthetic corpus contains none (fixed word-salad
    vocabulary), so the query first APPENDS deterministic PII spans to
    a subset of documents (every 3rd gets an email, every 5th an IP —
    documented synthesis, not test-data mutation) and then runs the
    actual operator: match-count per pattern and a two-pass
    regexp_replace redaction, verified via redacted-text hash. The
    unmodified documents double as the negative control (counts 0,
    hash of the original text).

    Scale shape: pure per-row Catalyst expressions (regexp_count /
    regexp_replace run inside whole-stage codegen) — no shuffle at
    all except the final presentation sort; at 100 TB this is a
    map-only scan, exactly what a scrubbing pass must be.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    email = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                 F.lit("@example.com"))).otherwise(F.lit(""))
    ip = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit(" from 10."), (F.col("doc_id") % 200).cast("string"),
                 F.lit(".0."), (F.col("doc_id") % 250).cast("string"))
    ).otherwise(F.lit(""))
    aug = F.concat(F.col("text"), email, ip)
    redacted = F.regexp_replace(
        F.regexp_replace(aug, PII_EMAIL_RE, "<EMAIL>"),
        PII_IP_RE, "<IP>")
    return (docs.select(
        "doc_id",
        F.regexp_count(aug, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(PII_IP_RE)).alias("n_ips"),
        (F.length(aug) - F.length(redacted)).alias("n_chars_removed"),
        F.md5(redacted).alias("redacted_hash"))
        .orderBy("doc_id"))


_Q79_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE '' END
         || CASE WHEN doc_id % 5 = 0
              THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                   || '.0.' || CAST(doc_id % 250 AS VARCHAR)
              ELSE '' END AS t
  FROM documents),
red AS (
  SELECT doc_id, t,
         REGEXP_REPLACE(REGEXP_REPLACE(t,
             '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{PII_IP_RE}', '<IP>', 'g') AS r
  FROM aug)
SELECT doc_id,
       CAST(LEN(REGEXP_EXTRACT_ALL(t, '{PII_EMAIL_RE}')) AS INTEGER)
         AS n_emails,
       CAST(LEN(REGEXP_EXTRACT_ALL(t, '{PII_IP_RE}')) AS INTEGER) AS n_ips,
       CAST(LENGTH(t) - LENGTH(r) AS INTEGER) AS n_chars_removed,
       MD5(r) AS redacted_hash
FROM red ORDER BY doc_id
"""


#: Context-window chunking: token window / stride (overlap = 10).
CHUNK_TOKENS = 40
CHUNK_STRIDE = 30


def q84_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping fixed-token context windows —
    the chunking step ahead of embedding / retrieval indexing.

    Chunk c of a document covers tokens [c*stride, c*stride + window);
    the last chunk is short rather than padded. Verified per-chunk via
    token count + content hash.

    Scale shape: sequence() + explode is a map-side Generate (no
    shuffle; output rows ≈ input tokens / stride), slice() runs below
    the Generate so each chunk row carries only its own tokens, and
    the only exchange is the presentation sort. Chunking 100 TB is a
    map-only pass whose output feeds the embedding UDF stage.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    return (docs
            .select("doc_id", F.split(F.col("text"), " ").alias("toks"))
            .select("doc_id", "toks", F.explode(F.expr(
                f"sequence(0, size(toks) - 1, {CHUNK_STRIDE})")).alias("st"))
            .select(
                "doc_id",
                F.expr(f"CAST(st DIV {CHUNK_STRIDE} AS INT)")
                 .alias("chunk_index"),
                F.expr(f"slice(toks, st + 1, {CHUNK_TOKENS})").alias("chunk"))
            .select("doc_id", "chunk_index",
                    F.size("chunk").alias("n_chunk_tokens"),
                    F.md5(F.concat_ws(" ", "chunk")).alias("chunk_hash"))
            .orderBy("doc_id", "chunk_index"))


_Q84_ORACLE = f"""
WITH t AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         UNNEST(GENERATE_SERIES(0, LEN(toks) - 1, {CHUNK_STRIDE})) AS st
  FROM t)
SELECT doc_id,
       CAST(st // {CHUNK_STRIDE} AS INTEGER) AS chunk_index,
       CAST(LEN(toks[st + 1 : st + {CHUNK_TOKENS}]) AS INTEGER)
         AS n_chunk_tokens,
       MD5(ARRAY_TO_STRING(toks[st + 1 : st + {CHUNK_TOKENS}], ' '))
         AS chunk_hash
FROM s ORDER BY doc_id, chunk_index
"""


#: BM25 keyword retrieval: fixed query terms, result depth.
BM25_TERMS = ("spark", "query", "window", "table")
BM25_TOPK = 10

_BM25_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in BM25_TERMS) + ")"

#: Per-term BM25 score, written ONCE and reused verbatim in both
#: engines so the double-arithmetic expression TREE (not just the
#: math) is identical — both evaluate it left-to-right as parsed,
#: giving bit-identical doubles. ``idf`` is the rational substitute
#: (N - df + 0.5)/(df + 0.5) — same rationale as q59: ln() is
#: libm-dependent and would break bit-exact compare, and the rational
#: form preserves the per-term ordering (monotone in true idf).
#: k1 = 1.2, b = 0.75 (the standard Robertson defaults; 2.2 = k1+1,
#: 0.25 = 1-b).
_BM25_SCORE_EXPR = (
    "((CAST(n_corpus AS DOUBLE) - df_docs + 0.5) / (df_docs + 0.5))"
    " * ((CAST(tf AS DOUBLE) * 2.2)"
    " / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75"
    " * (CAST(dl AS DOUBLE) / (CAST(t_tokens AS DOUBLE) / n_corpus)))))")


def bm25_per_doc(docs: DataFrame) -> DataFrame:
    """Shared BM25 scorer over BM25_TERMS: per-document matched-term
    count and bit-exact summed score (term-sorted fold). Consumed by
    q85 (top-k retrieval) and q137 (hybrid-retrieval shortlist).

    Per-term scores are plain double arithmetic on exact integer
    inputs (tf, dl, df, N, T) via the shared expression above; the
    per-document TOTAL folds the term-sorted score list left-to-right
    in BOTH engines (aggregate(sort_array(...)) vs
    LIST_REDUCE(LIST(... ORDER BY term))), so the sum is bit-exact
    despite float addition being non-associative.

    Scale shape: one shuffle on (doc_id, term) for tf — but only over
    rows matching the term list, which the explode-side filter prunes
    map-side; df and the corpus stats are tiny broadcast sides. At
    100 TB the scored candidate set is |docs containing a query
    term|, not |corpus|.
    """
    stats = docs.select(F.split(F.col("text"), " ").alias("toks")).agg(
        F.count(F.lit(1)).alias("n_corpus"),
        F.sum(F.size("toks")).alias("t_tokens"))
    tf = (docs
          .select("doc_id", F.split(F.col("text"), " ").alias("toks"))
          .select("doc_id", F.size("toks").alias("dl"),
                  F.explode("toks").alias("term"))
          .filter(F.col("term").isin(*BM25_TERMS))
          .groupBy("doc_id", "dl", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_docs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    scored = (tf.join(F.broadcast(df_docs), "term")
              .crossJoin(F.broadcast(stats))
              .withColumn("score", F.expr(_BM25_SCORE_EXPR)))
    return (scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.expr("aggregate(sort_array(collect_list(struct(term, score))), "
               "CAST(0 AS DOUBLE), (a, x) -> a + x.score)")
         .alias("score_total")))


def q85_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval: top-k documents for a fixed term set.

    The classic sparse-retrieval scorer a data pipeline uses to mine
    domain-relevant documents from a crawl; scoring machinery (and
    its determinism/scale rationale) in ``bm25_per_doc``. The final
    top-k is TakeOrderedAndProject (per-partition partial top-k,
    single small merge), never a global sort.
    """
    register_tables(spark, sf_dir)
    per_doc = bm25_per_doc(spark.table("documents"))
    top = (per_doc
           .orderBy(F.col("score_total").desc(), F.col("doc_id").asc())
           .limit(BM25_TOPK))
    w = Window.orderBy(F.col("score_total").desc(), F.col("doc_id").asc())
    return (top.withColumn("rk", F.row_number().over(w))
            .select("rk", "doc_id", "n_terms_matched", "score_total")
            .orderBy("rk"))


#: The bm25_per_doc twin as DuckDB CTEs (ends with ``per_doc``);
#: shared by _Q85_ORACLE and q137's hybrid-retrieval oracle.
BM25_PER_DOC_CTES = f"""tf AS (
  SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl,
         UNNEST(STRING_SPLIT(text, ' ')) AS term
  FROM documents),
tfc AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf
  FROM tf WHERE term IN {_BM25_TERMS_SQL}
  GROUP BY doc_id, dl, term),
dfc AS (SELECT term, COUNT(*) AS df_docs FROM tfc GROUP BY term),
stats AS (
  SELECT COUNT(*) AS n_corpus,
         SUM(LEN(STRING_SPLIT(text, ' '))) AS t_tokens
  FROM documents),
scored AS (
  SELECT doc_id, term,
         {_BM25_SCORE_EXPR} AS score
  FROM tfc JOIN dfc USING (term) CROSS JOIN stats),
per_doc AS (
  SELECT doc_id,
         COUNT(*) AS n_terms_matched,
         LIST_REDUCE(LIST(score ORDER BY term), (a, b) -> a + b)
           AS score_total
  FROM scored GROUP BY doc_id)"""


_Q85_ORACLE = f"""
WITH {BM25_PER_DOC_CTES}
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_total DESC, doc_id ASC)
            AS INTEGER) AS rk,
       doc_id, n_terms_matched, score_total
FROM per_doc
ORDER BY score_total DESC, doc_id ASC
LIMIT {BM25_TOPK}
"""


def q119_bpe_lang_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-quality audit: per-language compression of the
    corpus under the q102-trained merges — characters per BPE token
    and the share of token occurrences that are merged (multi-char)
    tokens. This is the fairness metric a real pretraining build runs
    before committing to a tokenizer: a vocabulary trained on the
    pooled corpus compresses dominant languages better, and this
    query quantifies that spread (languages the merges underserve
    show chars_per_token near 1.0 — pure character fallback).

    Determinism: all aggregates are exact BIGINT sums; the two ratios
    are single IEEE divisions of the same exact values in both
    engines.

    Scale shape: the merge fold runs once per DISTINCT word (the
    vocabulary trick shared with q102/q108 — Catalyst collapses the
    distinct + fold into one per-word Aggregate); per-(lang, word) use
    counts join back on the word key; the final aggregate is one tiny
    per-lang group. The merges table is driver-held O(model) state.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    merges = trained_merges(spark, sf_dir)
    words_all = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("word"))
    lang_vocab = (words_all.filter(F.col("word") != "")
                  .groupBy("lang", "word")
                  .agg(F.count(F.lit(1)).alias("n_uses")))
    word_tok = (lang_vocab.select("word").distinct()
                .select("word",
                        F.expr(bpe_apply_expr("word", merges))
                        .alias("toks"))
                .select("word",
                        F.size("toks").alias("n_tok"),
                        F.size(F.filter("toks",
                                        lambda t: F.length(t) > 1))
                        .alias("n_merged")))
    agg = (lang_vocab.join(word_tok, "word")
           .groupBy("lang")
           .agg(F.sum("n_uses").cast("bigint").alias("n_words"),
                F.sum(F.length("word") * F.col("n_uses")).cast("bigint")
                .alias("n_chars"),
                F.sum(F.col("n_tok") * F.col("n_uses")).cast("bigint")
                .alias("n_bpe"),
                F.sum(F.col("n_merged") * F.col("n_uses")).cast("bigint")
                .alias("n_merged_tok")))
    return (agg.select(
        "lang", "n_words", "n_chars", "n_bpe", "n_merged_tok",
        (F.col("n_chars").cast("double") / F.col("n_bpe").cast("double"))
        .alias("chars_per_token"),
        (F.col("n_merged_tok").cast("double")
         / F.col("n_bpe").cast("double")).alias("merged_share"))
        .orderBy("lang"))


_Q119_ORACLE = f"""
WITH {_BPE_TOK_CTES},
lang_vocab AS (
  SELECT lang, word, COUNT(*) AS n_uses FROM (
    SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY 1, 2),
word_tok AS (
  SELECT word, LEN(toks) AS n_tok,
         LEN(LIST_FILTER(toks, t -> LEN(t) > 1)) AS n_merged
  FROM tok),
agg AS (
  SELECT lang,
         CAST(SUM(lv.n_uses) AS BIGINT) AS n_words,
         CAST(SUM(LEN(lv.word) * lv.n_uses) AS BIGINT) AS n_chars,
         CAST(SUM(wt.n_tok * lv.n_uses) AS BIGINT) AS n_bpe,
         CAST(SUM(wt.n_merged * lv.n_uses) AS BIGINT) AS n_merged_tok
  FROM lang_vocab lv JOIN word_tok wt USING (word)
  GROUP BY lang)
SELECT lang, n_words, n_chars, n_bpe, n_merged_tok,
       CAST(n_chars AS DOUBLE) / CAST(n_bpe AS DOUBLE)
         AS chars_per_token,
       CAST(n_merged_tok AS DOUBLE) / CAST(n_bpe AS DOUBLE)
         AS merged_share
FROM agg ORDER BY lang
"""


# --------------------------------------------------------------------------
# q136: multinomial Naive-Bayes language classifier (train + map-only apply)
# --------------------------------------------------------------------------

#: Class domain for the corpus (all SFs carry exactly these five).
#: Training filters to this set in BOTH engines so an out-of-domain
#: lang can never silently skew the model.
NB_LANGS = ("de", "en", "es", "fr", "zh")

#: Likelihood scale factor — a power of two, so scaling is an EXACT
#: float multiplication: it re-centres per-token likelihoods near 1.0
#: and keeps 100-token products comfortably inside double range
#: without changing the argmax.
NB_SCALE = 64.0

#: Fixed hashed-feature width for the NB model (fastText / DSIR-paper
#: style "hashing trick"). The model is counts per (class, bucket) —
#: O(K x NB_BUCKETS) regardless of corpus vocabulary, so driver state
#: is a CONSTANT: a 100 TB web corpus with billions of distinct tokens
#: trains the same 4096-wide table as sf0.001. Power of two only for
#: hygiene; any fixed width works.
NB_BUCKETS = 4096


def md5_bucket(col, n: int):
    """Engine-portable hash bucket: the first 8 hex digits of md5 as an
    integer, mod ``n``. Spark: ``conv(substring(md5(x),1,8),16,10) % n``;
    DuckDB twin: ``CAST('0x'||SUBSTRING(MD5(x),1,8) AS BIGINT) % n``
    (see `md5_bucket_sql`). The 8-digit value is < 2^32 and nonnegative,
    so ``%`` and ``pmod`` coincide. Same convention as the q47 shard
    hash (`sampling.py:441`) and the LSH band keys (`dedup.py`)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint"),
        F.lit(n))


def md5_bucket_sql(expr: str, n: int) -> str:
    """DuckDB twin of `md5_bucket` — bit-identical bucket ids."""
    return f"CAST(('0x' || SUBSTRING(MD5({expr}), 1, 8)) AS BIGINT) % {n}"


def _nb_train(spark: SparkSession, sf_dir: str):
    """Distributed NB training over a FIXED hashed feature space: one
    explode + md5-bucket projection + (lang, bucket) groupBy shuffle
    with map-side combine. Only the aggregated (lang, bucket) count
    table ever reaches the driver — at most K x NB_BUCKETS rows, a
    CONSTANT independent of corpus size (the hashing trick; vs the
    naive per-token model whose vocabulary — and therefore driver
    state — grows unboundedly with a web corpus).

    Returns ``(bucket_probs, default_probs, priors)``:
    ``bucket_probs[b]`` is the NB_LANGS-ordered list of add-one-smoothed
    scaled likelihoods for each TRAINED bucket, ``default_probs`` the
    same formula at count 0 (tokens hashing to a bucket unseen in
    training), ``priors`` the NB_LANGS-ordered document priors. All
    arithmetic is one IEEE division of exact integers after one exact
    power-of-two multiply, so DuckDB recomputing the same formula lands
    on the identical double.
    """
    register_tables(spark, sf_dir)
    return _nb_train_docs(spark.table("documents"))


def _nb_train_docs(docs: DataFrame):
    """Model arithmetic of `_nb_train` given any documents-shaped
    frame (doc_id, lang, text) — the seam the bounded-driver-state
    property test exercises with synthetic corpora of growing
    vocabulary."""
    train = docs.filter((F.col("doc_id") % 5 != 0)
                        & F.col("lang").isin(*NB_LANGS))
    toks = (train.select("lang",
                         F.explode(F.split(F.col("text"), " "))
                         .alias("token"))
            .filter(F.col("token") != ""))
    buck = toks.select("lang",
                       md5_bucket(F.col("token"), NB_BUCKETS).alias("b"))
    count_rows = (buck.groupBy("lang", "b")
                  .agg(F.count(F.lit(1)).alias("c")).collect())
    ndoc_rows = (train.groupBy("lang")
                 .agg(F.count(F.lit(1)).alias("nd")).collect())

    counts = {(r["lang"], r["b"]): r["c"] for r in count_rows}
    buckets = sorted({b for (_, b) in counts})
    n_tok = {k: sum(c for (lg, _), c in counts.items() if lg == k)
             for k in NB_LANGS}
    ndocs = {r["lang"]: r["nd"] for r in ndoc_rows}
    n_train = sum(ndocs.get(k, 0) for k in NB_LANGS)
    bucket_probs = {
        b: [NB_SCALE * (counts.get((k, b), 0) + 1) / (n_tok[k] + NB_BUCKETS)
            for k in NB_LANGS] for b in buckets}
    default_probs = [NB_SCALE * (0 + 1) / (n_tok[k] + NB_BUCKETS)
                     for k in NB_LANGS]
    priors = [ndocs.get(k, 0) / n_train for k in NB_LANGS]
    return bucket_probs, default_probs, priors


def nb_classified(df: DataFrame, bucket_probs, default_probs, priors,
                  keep: list) -> DataFrame:
    """Append ``pred_lang`` to a (batch OR streaming) document frame
    via the trained NB model — a stateless MAP-ONLY projection: the
    fixed-width hashed weight table (<= NB_BUCKETS entries, a constant
    set by config, NOT by corpus vocabulary) rides into the executors
    as a literal map; each document hashes its own sorted token array
    into bucket space and folds the per-class product, with the exact
    count-0 smoothed likelihood for buckets unseen in training. No
    join, no explode, no Python, no state — a streaming DataFrame
    needs no code fork (q138 proves it).

    Determinism (the bit-exact gate): likelihoods are single IEEE
    divisions of exact integers scaled by a power of two — no libm;
    bucket ids are md5-prefix integers, identical in both engines
    (`md5_bucket` / `md5_bucket_sql`). Per-document scores fold the
    likelihoods in sorted-token order (the shared-fold-order rule,
    see SKILL verify notes), multiply the class prior LAST, and break
    argmax ties by the fixed NB_LANGS order — every operation is
    identically rounded in Spark, CPython, and DuckDB. A production
    build at uncapped document length would score in the log domain
    instead (sum of logs); the scaled product keeps the oracle exact
    at this corpus's <=100 tokens/doc.
    """
    default_arr = F.array(*[F.lit(p) for p in default_probs])
    if bucket_probs:
        lit_entries = []
        for b in sorted(bucket_probs):
            lit_entries.append(F.lit(b))
            lit_entries.append(
                F.array(*[F.lit(p) for p in bucket_probs[b]]))
        model = F.create_map(*lit_entries)

        def _lookup(t):
            return F.coalesce(model[md5_bucket(t, NB_BUCKETS)],
                              default_arr)
    else:  # degenerate empty training set: every token smooths to 0+1
        def _lookup(t):
            return default_arr

    toks = F.array_sort(F.filter(F.split(F.col("text"), " "),
                                 lambda t: t != ""))
    plist = F.transform(toks, _lookup)

    def _fold(i):
        # merge lambda must be exactly binary for F.aggregate
        return lambda acc, x: acc * F.element_at(x, i + 1)

    scores = [
        (F.aggregate(plist, F.lit(1.0), _fold(i))
         * F.lit(priors[i])).alias(f"s_{k}")
        for i, k in enumerate(NB_LANGS)]
    scored = df.select(*keep, *scores)
    best = F.greatest(*[F.col(f"s_{k}") for k in NB_LANGS])
    pred = F.lit(None).cast("string")
    for k in reversed(NB_LANGS):
        pred = F.when(F.col(f"s_{k}") == best, F.lit(k)).otherwise(pred)
    out_cols = [c for c in scored.columns if not c.startswith("s_")]
    return scored.select(*out_cols, pred.alias("pred_lang"))


def q136_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive-Bayes language identification — the
    fastText-shaped train-then-filter classifier real pretraining
    pipelines run (CCNet-style): train on an 80% hash split of the
    corpus, score the held-out 20%, and report the confusion matrix.

    Scale shape: training is ONE (lang, md5-bucket) aggregation
    (map-side combine) over a FIXED NB_BUCKETS-wide hashed feature
    space, so the model — and the only data that ever reaches the
    driver — is <= K x NB_BUCKETS rows no matter the corpus size;
    scoring is the MAP-ONLY ``nb_classified`` projection (determinism
    rationale there), so the only scoring shuffle is the final K x K
    confusion aggregate. q138 applies the SAME model/projection to a
    document STREAM.

    Reference: extension beyond DataflowTemplates (north-star scope:
    training-data pipeline ops); delegated-SQL seam per
    ``SpannerQueryIO.java:41``.
    """
    bucket_probs, default_probs, priors = _nb_train(spark, sf_dir)
    docs = spark.table("documents")
    test = docs.filter(F.col("doc_id") % 5 == 0)
    out = nb_classified(test, bucket_probs, default_probs, priors,
                        [F.col("lang").alias("true_lang")])
    return (out.groupBy("true_lang", "pred_lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
            .orderBy("true_lang", "pred_lang"))


def _nb_langs_sql() -> str:
    return "(" + ", ".join(f"'{k}'" for k in NB_LANGS) + ")"


def nb_scored_ctes(score_filter: str, keep_cols: str) -> str:
    """DuckDB twin of ``_nb_train`` + ``nb_classified``: a WITH-body
    (no leading WITH) that re-derives the identical fixed-width hashed
    model — same splits, same md5-prefix bucket ids, same smoothing
    formula, same scaled-likelihood expression, same count-0 default
    for untrained buckets — and folds per-document products in the
    same sorted-token order, ending in CTE ``predicted`` with columns
    ``{keep_cols}, pred_lang``. ``score_filter`` selects which
    documents get scored; shared by q136 (holdout confusion) and
    q138 (streamed drift monitor)."""
    langs_in = _nb_langs_sql()
    langs_list = "[" + ", ".join(f"'{k}'" for k in NB_LANGS) + "]"
    bexpr = md5_bucket_sql("token", NB_BUCKETS)
    pcols = ", ".join(
        f"MAX(CASE WHEN lang = '{k}' THEN p END) AS p_{k}"
        for k in NB_LANGS)
    mcols = ", ".join(
        f"COALESCE(mw.p_{k}, (SELECT {NB_SCALE!r} * (0 + 1) / "
        f"(n_tok + {NB_BUCKETS}) FROM nk WHERE lang = '{k}')) AS p_{k}"
        for k in NB_LANGS)
    lcols = ", ".join(
        f"LIST(p_{k} ORDER BY token) AS l_{k}" for k in NB_LANGS)
    scols = ", ".join(
        f"LIST_REDUCE(LIST_PREPEND(1.0, COALESCE(li.l_{k}, "
        f"CAST([] AS DOUBLE[]))), (a, b) -> a * b)"
        f" * (SELECT pr FROM prior WHERE lang = '{k}') AS s_{k}"
        for k in NB_LANGS)
    best = "GREATEST(" + ", ".join(f"s_{k}" for k in NB_LANGS) + ")"
    pred = ("CASE " + " ".join(
        f"WHEN s_{k} = best THEN '{k}'" for k in NB_LANGS) + " END")
    return f"""train AS MATERIALIZED (
  SELECT doc_id, lang, text FROM documents
  WHERE doc_id % 5 <> 0 AND lang IN {langs_in}),
ttok AS MATERIALIZED (
  SELECT lang, {bexpr} AS b FROM (
    SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM train)
  WHERE token <> ''),
counts AS (SELECT lang, b, COUNT(*) AS c FROM ttok GROUP BY 1, 2),
nk AS (SELECT lang, COUNT(*) AS n_tok FROM ttok GROUP BY 1),
buckets AS (SELECT DISTINCT b FROM ttok),
model AS MATERIALIZED (
  SELECT bb.b, ll.lang,
         {NB_SCALE!r} * (COALESCE(cc.c, 0) + 1)
           / (nk.n_tok + {NB_BUCKETS}) AS p
  FROM buckets bb
  CROSS JOIN (SELECT UNNEST({langs_list}) AS lang) ll
  JOIN nk ON nk.lang = ll.lang
  LEFT JOIN counts cc ON cc.b = bb.b AND cc.lang = ll.lang),
modelw AS (SELECT b, {pcols} FROM model GROUP BY b),
ndocs AS (SELECT lang, COUNT(*) AS nd FROM train GROUP BY 1),
prior AS (
  SELECT lang, nd / (SELECT CAST(SUM(nd) AS BIGINT) FROM ndocs) AS pr
  FROM ndocs),
test AS MATERIALIZED (
  SELECT doc_id, {keep_cols}, text FROM documents
  WHERE {score_filter}),
matched AS (
  SELECT tt.doc_id, tt.token, {mcols} FROM (
    SELECT doc_id, token, {bexpr} AS b FROM (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
      FROM test)
    WHERE token <> '') tt
  LEFT JOIN modelw mw USING (b)),
lists AS (SELECT doc_id, {lcols} FROM matched GROUP BY doc_id),
scored AS (
  SELECT {', '.join('te.' + c.strip() for c in keep_cols.split(','))},
         {scols}
  FROM test te LEFT JOIN lists li USING (doc_id)),
predicted AS (
  SELECT {keep_cols}, {pred} AS pred_lang
  FROM (SELECT *, {best} AS best FROM scored))"""


def _q136_oracle() -> str:
    return f"""
WITH {nb_scored_ctes("doc_id % 5 = 0", "lang")}
SELECT lang AS true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM predicted GROUP BY 1, 2 ORDER BY 1, 2
"""


#: Content-defined chunking: a token is a cut point when its seeded
#: md5 prefix falls under CDC_PREFIX_MAX ('1f' = 32/256 = 1/8 of the
#: keyspace), giving a mean chunk of ~8 tokens. The decision depends
#: only on the token's own bytes — not its position — which is the
#: CDC property: an insertion re-chunks O(1) neighboring chunks, not
#: the whole document (fixed-size chunking shifts every later chunk).
CDC_SEED = "cdc9"
CDC_PREFIX_MAX = "1f"


def q142_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking of each document (FastCDC/rsync
    family): boundaries fall where a token's content hash dips under a
    threshold, so chunk edges survive edits — the chunking used for
    dedup-friendly storage and for stable RAG/dedup units over a
    drifting corpus (vs q84's fixed-size windows, which shift wholesale
    on any insertion).

    MAP-ONLY: the entire chunker is one projected expression chain per
    document (split -> per-token hash -> boundary filter -> fence
    diffs) — no explode, no shuffle, no Python. At 100 TB this is a
    single scan-stage pass like the q40-q46 scorers. Per-document
    output: chunk count, min/max/mean chunk length (tokens), and the
    md5 fingerprint of the first chunk — the piece a downstream
    dedup store would key on.

    The oracle rebuilds the same chain with DuckDB list functions;
    both engines guard the single-token case explicitly (Spark's
    ``sequence(1, 0)`` counts DOWN, DuckDB's is empty).
    Reference analogue: none — dedup-family extension (SURVEY §2
    extension block).
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    chunked = docs.selectExpr(
        "doc_id", "source",
        "split(text, ' ') AS toks").selectExpr(
        "doc_id", "source", "size(toks) AS n_tokens",
        f"""concat(
              array(0),
              CASE WHEN size(toks) >= 2 THEN
                filter(sequence(1, size(toks) - 1),
                       i -> substring(md5(cast(concat('{CDC_SEED}',
                                element_at(toks, i)) as binary)), 1, 2)
                            <= '{CDC_PREFIX_MAX}')
              ELSE array() END,
              array(size(toks))) AS fences""",
        "toks")
    return (chunked.selectExpr(
        "doc_id", "source", "n_tokens",
        "cast(size(fences) - 1 AS int) AS n_chunks",
        """array_min(transform(sequence(1, size(fences) - 1),
             k -> element_at(fences, k + 1) - element_at(fences, k)))
           AS min_chunk""",
        """array_max(transform(sequence(1, size(fences) - 1),
             k -> element_at(fences, k + 1) - element_at(fences, k)))
           AS max_chunk""",
        """cast(n_tokens AS double) / cast(size(fences) - 1 AS double)
           AS mean_chunk""",
        """md5(cast(array_join(slice(toks, 1, element_at(fences, 2)), ' ')
                    as binary)) AS first_chunk_fp""")
        .orderBy("doc_id"))


_Q142_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, source, STRING_SPLIT(text, ' ') AS toks
  FROM documents),
fenced AS (
  SELECT doc_id, source, toks, LEN(toks) AS n_tokens,
         LIST_CONCAT(LIST_CONCAT(
           [0],
           CASE WHEN LEN(toks) >= 2 THEN
             LIST_FILTER(RANGE(1, LEN(toks)),
               i -> SUBSTRING(MD5('{CDC_SEED}' || toks[i]), 1, 2)
                    <= '{CDC_PREFIX_MAX}')
           ELSE [] END),
           [LEN(toks)]) AS fences
  FROM toked)
SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(LEN(fences) - 1 AS INTEGER) AS n_chunks,
       CAST(LIST_MIN(LIST_TRANSFORM(RANGE(1, LEN(fences)),
            k -> fences[k + 1] - fences[k])) AS INTEGER) AS min_chunk,
       CAST(LIST_MAX(LIST_TRANSFORM(RANGE(1, LEN(fences)),
            k -> fences[k + 1] - fences[k])) AS INTEGER) AS max_chunk,
       CAST(n_tokens AS DOUBLE) / CAST(LEN(fences) - 1 AS DOUBLE)
         AS mean_chunk,
       MD5(ARRAY_TO_STRING(toks[1:fences[2]], ' ')) AS first_chunk_fp
FROM fenced ORDER BY doc_id
"""


def q152_adaptive_quality_filter(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Per-source adaptive quality filtering (the FineWeb-style
    refinement of q42's global gate): each source keeps documents
    above its OWN quality quantile, so a noisy source is trimmed
    aggressively while a clean one is left intact — one global cutoff
    either starves clean sources or admits junk from noisy ones. The
    score is the distinct-token ratio (a single exact division); the
    per-source threshold is the exact p25 (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, the q38-proven mapping).

    Scale shape: one scoring projection (map-only), one per-source
    exact-percentile aggregate (at production scale the declared swap
    is the mergeable histogram sketch, q120's machinery), and a
    broadcast join of the O(sources) threshold table back onto the
    scores — the second pass never shuffles the corpus.
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    toks = tokens_col()
    score = (F.size(F.array_distinct(toks)).cast("double")
             / F.size(toks).cast("double"))
    scored = docs.select("doc_id", "source", score.alias("score"))
    th = (scored.groupBy("source")
          .agg(F.expr("percentile(score, 0.25)").alias("p25")))
    return (scored.join(F.broadcast(th), "source")
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_total"),
                 F.sum((F.col("score") >= F.col("p25")).cast("int"))
                  .cast("bigint").alias("n_kept"),
                 F.min("p25").alias("threshold"))
            .orderBy("source"))


_Q152_ORACLE = """
WITH scored AS (
  SELECT doc_id, source,
         CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
           / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS score
  FROM documents),
th AS (
  SELECT source, QUANTILE_CONT(score, 0.25) AS p25
  FROM scored GROUP BY source)
SELECT s.source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN s.score >= t.p25 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       MIN(t.p25) AS threshold
FROM scored s JOIN th t USING (source)
GROUP BY s.source ORDER BY source
"""


#: DSIR target slice and selection depth (importance-resampled top-k).
DSIR_TARGET_LANG = "en"
DSIR_TOPK = 40

#: Fixed hashed-feature width for the DSIR model — the paper's own
#: device (it hashes n-grams into a fixed 10^4 bucket space) and the
#: reason the model is O(DSIR_BUCKETS) driver state at ANY corpus size.
DSIR_BUCKETS = 4096


def _dsir_train(spark: SparkSession, sf_dir: str):
    """DSIR feature-ratio model (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): one md5-bucket
    aggregate over the corpus yields, per hashed feature bucket, its
    raw-corpus count and its target-slice count; the importance ratio
    is the smoothed target bucket probability over the smoothed raw
    one. The bucket space is FIXED at DSIR_BUCKETS — exactly the
    paper's hashed n-gram device — so the collected model is at most
    DSIR_BUCKETS rows no matter how large the corpus vocabulary grows
    (same bounded-codebook economics as `_nb_train`, IVF centroids,
    and the BPE merge table).

    Returns ``(ratios, default_ratio)`` — per-trained-bucket weights
    plus the count-0 weight for buckets never seen in training.
    Determinism: each ratio is two IEEE divisions of exact integers
    then one division — DuckDB's INT/INT division produces the
    identical double, so the oracle re-derives the model bit-exactly.
    """
    register_tables(spark, sf_dir)
    return _dsir_train_docs(spark.table("documents"))


def _dsir_train_docs(docs: DataFrame):
    """Model arithmetic of `_dsir_train` given any documents-shaped
    frame — the bounded-driver-state property-test seam."""
    toks = (docs.select("lang",
                        F.explode(F.split(F.col("text"), " "))
                        .alias("token"))
            .filter(F.col("token") != ""))
    buck = toks.select("lang",
                       md5_bucket(F.col("token"), DSIR_BUCKETS).alias("b"))
    rows = (buck.groupBy("b")
            .agg(F.count(F.lit(1)).alias("cr"),
                 F.sum((F.col("lang") == DSIR_TARGET_LANG)
                       .cast("long")).alias("ct"))
            .collect())
    r_n = sum(r["cr"] for r in rows)
    t_n = sum(r["ct"] for r in rows)
    ratios = {r["b"]: ((r["ct"] + 1) / (t_n + DSIR_BUCKETS))
              / ((r["cr"] + 1) / (r_n + DSIR_BUCKETS)) for r in rows}
    default_ratio = ((0 + 1) / (t_n + DSIR_BUCKETS)) \
        / ((0 + 1) / (r_n + DSIR_BUCKETS))
    return ratios, default_ratio


def q146_dsir_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance reweighting for training-data selection: score
    every document by the product of its tokens' target/raw unigram
    probability ratios and keep the top-k — the data-mixture operator
    that tilts a raw crawl toward a target domain without training a
    classifier (the classifier-based sibling is q136/q138).

    Scale shape: training is ONE fixed-width hashed-bucket aggregate
    (map-side combine, <= DSIR_BUCKETS rows to the driver at any
    corpus size); scoring is MAP-ONLY (the bounded ratio table rides
    to executors as a literal map, each doc hashes + folds its own
    sorted token array — no join, no explode); selection is a global
    top-k (TakeOrderedAndProject, never a full sort). The fold
    multiplies in sorted-token order so Spark, CPython, and DuckDB
    land on the identical double (the shared-fold-order rule; ratios
    centre on 1 so a <=100-token product stays far inside double
    range — an unbounded-length build would sum logs instead and drop
    to a bounded-error gate).
    """
    w, default_ratio = _dsir_train(spark, sf_dir)
    lit_entries = []
    for b in sorted(w):
        lit_entries.append(F.lit(b))
        lit_entries.append(F.lit(w[b]))
    model = F.create_map(*lit_entries)

    docs = spark.table("documents")
    toks = F.array_sort(F.filter(F.split(F.col("text"), " "),
                                 lambda t: t != ""))
    weight = F.aggregate(
        F.transform(toks, lambda t: F.coalesce(
            model[md5_bucket(t, DSIR_BUCKETS)], F.lit(default_ratio))),
        F.lit(1.0), lambda a, x: a * x)
    top = (docs.select("doc_id", "lang", "source",
                       weight.alias("weight"))
           .orderBy(F.col("weight").desc(), F.col("doc_id").asc())
           .limit(DSIR_TOPK))
    # rank window runs over the already-selected DSIR_TOPK rows only
    rk = F.row_number().over(
        Window.orderBy(F.col("weight").desc(), F.col("doc_id").asc()))
    return top.select(rk.cast("int").alias("rk"), "doc_id", "lang",
                      "source", "weight").orderBy("rk")


_Q146_ORACLE = f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang, token,
         {md5_bucket_sql('token', DSIR_BUCKETS)} AS b FROM (
    SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents)
  WHERE token <> ''),
stats AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS cr,
         CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0
                  END) AS BIGINT) AS ct
  FROM tok GROUP BY b),
tot AS (
  SELECT CAST(SUM(cr) AS BIGINT) AS r_n, CAST(SUM(ct) AS BIGINT) AS t_n
  FROM stats),
model AS MATERIALIZED (
  SELECT b, ((ct + 1) / (t_n + {DSIR_BUCKETS}))
           / ((cr + 1) / (r_n + {DSIR_BUCKETS})) AS w
  FROM stats CROSS JOIN tot),
lists AS (
  SELECT t.doc_id, LIST(m.w ORDER BY t.token) AS ws
  FROM tok t JOIN model m USING (b) GROUP BY t.doc_id),
scored AS (
  SELECT d.doc_id, d.lang, d.source,
         LIST_REDUCE(LIST_PREPEND(CAST(1 AS DOUBLE),
                                  COALESCE(l.ws, CAST([] AS DOUBLE[]))),
                     (a, b) -> a * b) AS weight
  FROM documents d LEFT JOIN lists l USING (doc_id))
SELECT CAST(ROW_NUMBER() OVER (ORDER BY weight DESC, doc_id) AS INTEGER)
         AS rk,
       doc_id, lang, source, weight
FROM scored ORDER BY weight DESC, doc_id LIMIT {DSIR_TOPK}
"""


def q165_composition_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition association audit — the chi-square-style
    independence check between ``source`` and ``lang``: for every
    (source, lang) cell, how far the observed count deviates from the
    independence expectation, computed in EXACT integer arithmetic.

    With N total docs, R the source row total, C the lang column
    total, the independence expectation is R*C/N, and the cell count
    under independence is hypergeometric with variance
    R*C*(N-R)*(N-C) / (N^2*(N-1)). Clearing every division, the
    signed deviation is ``dev = O*N - R*C`` (BIGINT) and the exact
    2-sigma flag is ``dev^2 * (N-1) > 4*R*C*(N-R)*(N-C)`` — all
    BIGINT products. Worst-case magnitude is N^5, inside a signed 64
    for N <= ~6000 (true at the gate's SFs); at larger N the SAME
    inequality runs in DECIMAL(38,0) (N < ~4e7) and beyond that as
    one normalized double division — the q150/q162 exactness ladder.
    No float, no libm at the gate: both engines agree bit-for-bit.

    Why a pipeline needs it: mixture drift (one source silently
    becoming one language) is invisible in the marginals q44/q86
    watch; the contingency deviation is the standard early signal.

    Scale shape: one (source, lang) count (map-side combined), two
    tiny marginal aggregates broadcast back — the corpus shuffles
    once on the pair key, everything after is O(cells).
    """
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    cells = (docs.groupBy("source", "lang")
             .agg(F.count(F.lit(1)).alias("o")))
    rows = cells.groupBy("source").agg(F.sum("o").alias("r"))
    colt = cells.groupBy("lang").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    j = (cells.join(F.broadcast(rows), "source")
         .join(F.broadcast(colt), "lang")
         .crossJoin(F.broadcast(tot)))
    dev = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    lhs = dev * dev * (F.col("n") - F.lit(1))
    rhs = (F.lit(4) * F.col("r") * F.col("c")
           * (F.col("n") - F.col("r")) * (F.col("n") - F.col("c")))
    return (j.select("source", "lang",
                     F.col("o").cast("bigint").alias("o"),
                     dev.cast("bigint").alias("dev"),
                     (lhs > rhs).alias("outside_band"))
            .orderBy("source", "lang"))


_Q165_ORACLE = """
WITH cells AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2),
rows_ AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
cols_ AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
SELECT ce.source, ce.lang, ce.o,
       CAST(ce.o * t.n - r.r * co.c AS BIGINT) AS dev,
       (ce.o * t.n - r.r * co.c) * (ce.o * t.n - r.r * co.c) * (t.n - 1)
         > 4 * r.r * co.c * (t.n - r.r) * (t.n - co.c) AS outside_band
FROM cells ce
JOIN rows_ r USING (source) JOIN cols_ co USING (lang) CROSS JOIN tot t
ORDER BY source, lang
"""


QUERIES = {
    "q40_token_stats": q40_token_stats,
    "q165_composition_audit": q165_composition_audit,
    "q41_lang_id": q41_lang_id,
    "q42_quality_score": q42_quality_score,
    "q43_fingerprint": q43_fingerprint,
    "q44_source_profile": q44_source_profile,
    "q45_corpus_filter": q45_corpus_filter,
    "q46_text_normalize": q46_text_normalize,
    "q58_repetition_stats": q58_repetition_stats,
    "q59_tfidf_topterms": q59_tfidf_topterms,
    "q68_bpe_pairs": q68_bpe_pairs,
    "q102_bpe_tokenize": q102_bpe_tokenize,
    "q111_bpe_train": q111_bpe_train,
    "q119_bpe_lang_compression": q119_bpe_lang_compression,
    "q136_nb_langid": q136_nb_langid,
    "q76_charlm_coverage": q76_charlm_coverage,
    "q79_pii_redact": q79_pii_redact,
    "q84_chunk_overlap": q84_chunk_overlap,
    "q85_bm25_topk": q85_bm25_topk,
    "q142_cdc_chunking": q142_cdc_chunking,
    "q146_dsir_reweight": q146_dsir_reweight,
    "q152_adaptive_quality_filter": q152_adaptive_quality_filter,
}

ORACLES = {
    "q165_composition_audit": _Q165_ORACLE,
    "q40_token_stats": _Q40_ORACLE,
    "q41_lang_id": _Q41_ORACLE,
    "q42_quality_score": _Q42_ORACLE,
    "q43_fingerprint": _Q43_ORACLE,
    "q44_source_profile": _Q44_ORACLE,
    "q45_corpus_filter": _Q45_ORACLE,
    "q46_text_normalize": _Q46_ORACLE,
    "q58_repetition_stats": _Q58_ORACLE,
    "q59_tfidf_topterms": _Q59_ORACLE,
    "q68_bpe_pairs": _Q68_ORACLE,
    "q102_bpe_tokenize": _Q102_ORACLE,
    "q111_bpe_train": _q111_oracle(),
    "q119_bpe_lang_compression": _Q119_ORACLE,
    "q136_nb_langid": _q136_oracle(),
    "q76_charlm_coverage": _Q76_ORACLE,
    "q79_pii_redact": _Q79_ORACLE,
    "q84_chunk_overlap": _Q84_ORACLE,
    "q85_bm25_topk": _Q85_ORACLE,
    "q142_cdc_chunking": _Q142_ORACLE,
    "q146_dsir_reweight": _Q146_ORACLE,
    "q152_adaptive_quality_filter": _Q152_ORACLE,
}
