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

from pyspark.sql import DataFrame, SparkSession
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


QUERIES = {
    "q40_token_stats": q40_token_stats,
    "q41_lang_id": q41_lang_id,
    "q42_quality_score": q42_quality_score,
    "q43_fingerprint": q43_fingerprint,
    "q44_source_profile": q44_source_profile,
    "q45_corpus_filter": q45_corpus_filter,
    "q46_text_normalize": q46_text_normalize,
}

ORACLES = {
    "q40_token_stats": _Q40_ORACLE,
    "q41_lang_id": _Q41_ORACLE,
    "q42_quality_score": _Q42_ORACLE,
    "q43_fingerprint": _Q43_ORACLE,
    "q44_source_profile": _Q44_ORACLE,
    "q45_corpus_filter": _Q45_ORACLE,
    "q46_text_normalize": _Q46_ORACLE,
}
