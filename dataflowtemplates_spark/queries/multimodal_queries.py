"""Multimodal-pipeline queries over the `documents` table (M7 extension).

These surface `operators/multimodal.py` through the driver's DuckDB
correctness gate. The decode stubs are DETERMINISTIC byte math
(payload = UTF-8 bytes of `text`, tiled/split/indexed), so even the
"decoded" statistics — mean intensity of the fake-decoded array, md5 of
a nearest-neighbor-resized payload, per-frame hashes — have exact ANSI
SQL oracles. When a real codec replaces the stub (the `real=True` seam)
the oracle degrades to rows-only, but the Spark-side plumbing checked
here (schema, Arrow batching, metadata-only pushdown) is unchanged.

Scale notes are on the operators themselves; the headline one: every
query here filters/projects on METADATA columns JVM-side before any
payload reaches Python, so at 100 TB the blob column is only scanned by
the stages that decode it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataflowtemplates_spark.catalog import register_tables
from dataflowtemplates_spark.operators.multimodal import (
    FRAME_BYTES,
    attach_media,
    image_features,
    resize_media,
    sample_frames,
)

#: shared oracle fragments: payload byte length and modality assignment
_N = "octet_length(encode(text))"
_MODALITY = ("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
             "ELSE 'video' END")
#: sum of payload byte values over positions [1, hi] (ASCII testdata:
#: char offsets == byte offsets; list_sum of empty range -> NULL -> 0)
def _byte_sum(hi: str) -> str:
    return ("COALESCE(list_sum(list_transform(range(1, CAST(" + hi +
            " AS BIGINT) + 1), i -> ascii(substring(text, CAST(i AS INTEGER), 1)))), 0)")


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return attach_media(spark.table("documents"))


def q80_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata + content fingerprint for every payload.

    Pure JVM-side column expressions — the canonical "query the corpus
    without decoding it" path; at scale Parquet column pruning means the
    blob is read once (for the md5) and the metadata filters are free.
    """
    m = _media(spark, sf_dir)
    return (m.select(
        "doc_id", "source",
        F.col("media_meta.modality").alias("modality"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.sample_rate").alias("sample_rate"),
        F.col("media_meta.n_frames").alias("n_frames"),
        F.length("media").alias("n_bytes"),
        F.md5("media").alias("phash"))
        .orderBy("doc_id"))


_Q80_ORACLE = f"""
SELECT doc_id, source,
       {_MODALITY} AS modality,
       CASE WHEN doc_id % 3 <> 1 THEN CAST(16 + {_N} % 64 AS INTEGER) END AS width,
       CASE WHEN doc_id % 3 <> 1 THEN CAST(16 + {_N} % 48 AS INTEGER) END AS height,
       CASE WHEN doc_id % 3 = 1
            THEN CAST(8000 + ({_N} % 4) * 4000 AS INTEGER) END AS sample_rate,
       CASE WHEN doc_id % 3 = 2
            THEN CAST(GREATEST(1, CAST(CEIL({_N} / {FRAME_BYTES}.0) AS BIGINT))
                 AS INTEGER) END AS n_frames,
       CAST({_N} AS INTEGER) AS n_bytes,
       md5(text) AS phash
FROM documents ORDER BY doc_id
"""


def q81_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling of video payloads (1→N mapInPandas).

    Emits per-frame hashes instead of raw frame bytes so the result is
    oracle-comparable; the JVM-side modality filter runs BEFORE Python.
    """
    m = _media(spark, sf_dir)
    frames = sample_frames(m, every_n=2)
    return (frames.select(
        "doc_id", "frame_idx",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").alias("frame_len"))
        .orderBy("doc_id", "frame_idx"))


_Q81_ORACLE = f"""
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       md5(substring(text, CAST(i * {FRAME_BYTES} + 1 AS INTEGER), {FRAME_BYTES}))
         AS frame_md5,
       CAST(length(substring(text, CAST(i * {FRAME_BYTES} + 1 AS INTEGER), {FRAME_BYTES}))
         AS INTEGER) AS frame_len
FROM (SELECT doc_id, text,
             unnest(range(0, GREATEST(1, CAST(ceil({_N} / {FRAME_BYTES}.0) AS BIGINT)), 2)) AS i
      FROM documents WHERE doc_id % 3 = 2)
ORDER BY doc_id, frame_idx
"""


def q82_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode + feature extraction (mean intensity, phash).

    The fake decode is deterministic byte tiling, so mean_intensity has
    an exact SQL form: image/video = mean over the payload tiled to
    width*height*3 bytes; audio = mean byte value. Exact integer sums in
    both engines, one float division at the end — bit-identical doubles.
    """
    return image_features(_media(spark, sf_dir)).orderBy("doc_id")


_Q82_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, {_MODALITY} AS modality,
         {_N} AS n,
         16 + {_N} % 64 AS w,
         16 + {_N} % 48 AS h,
         {_byte_sum(_N)} AS sum_all
  FROM documents
), sized AS (
  SELECT *, w * h * 3 AS need FROM base
)
SELECT doc_id, modality,
       CAST(n AS BIGINT) AS n_bytes,
       CASE WHEN modality <> 'audio' THEN CAST(w AS INTEGER) END AS width,
       CASE WHEN modality <> 'audio' THEN CAST(h AS INTEGER) END AS height,
       md5(text) AS phash,
       CASE WHEN modality = 'audio'
            THEN CAST(sum_all AS DOUBLE) / n
            ELSE CAST((need // n) * sum_all + {_byte_sum("need % n")} AS DOUBLE) / need
       END AS mean_intensity
FROM sized ORDER BY doc_id
"""


def q83_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize of visual payloads to 32x32 (audio passes
    through), verified byte-exactly via md5 of the re-encoded payload."""
    resized = resize_media(_media(spark, sf_dir), 32, 32)
    return (resized.select(
        "doc_id",
        F.col("media_meta.modality").alias("modality"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.length("media").alias("n_bytes"),
        F.md5("media").alias("payload_md5"))
        .orderBy("doc_id"))


# resized[y, x, c] = tiled[((y*h//32)*w + (x*w//32))*3 + c]; tiled[i] =
# payload[i % n]. Flat output position p -> y = p//96, x = (p%96)//3,
# c = p%3. The string built below is byte-identical to the Spark
# payload (ASCII testdata).
_Q83_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, {_MODALITY} AS modality,
         {_N} AS n,
         16 + {_N} % 64 AS w,
         16 + {_N} % 48 AS h
  FROM documents
)
SELECT doc_id, modality,
       CASE WHEN modality = 'audio' THEN NULL ELSE 32 END AS width,
       CASE WHEN modality = 'audio' THEN NULL ELSE 32 END AS height,
       CAST(CASE WHEN modality = 'audio' THEN n ELSE 3072 END AS INTEGER) AS n_bytes,
       CASE WHEN modality = 'audio' THEN md5(text)
            ELSE md5(array_to_string(list_transform(range(0, 3072),
                 p -> substring(text,
                        CAST((((((p // 96) * h) // 32) * w
                               + (((p % 96) // 3) * w) // 32) * 3 + p % 3) % n + 1
                             AS INTEGER), 1)), ''))
       END AS payload_md5
FROM base ORDER BY doc_id
"""


def q123_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec gate: every visual payload through an actual PNG
    encode→decode cycle inside an Arrow-batched stage.

    Pipeline: attach → nearest-neighbor resize to 32x32 (q83's stage) →
    per row, reinterpret the resized payload as the 32x32x3 array,
    encode it as a real PNG (operators/imagecodec.encode_png), decode
    it back through the ``real=True`` seam (magic-byte sniff + full PNG
    decode), and surface (a) ``png_valid``/``roundtrip_exact`` booleans
    the oracle asserts as literal TRUE — this is the codec correctness
    gate riding the driver's hash compare — and (b) the md5 of the
    DECODED bytes, which must equal the oracle's independent
    reconstruction of the resize from raw text (so a codec that
    "round-trips" by returning its input unread still fails).

    Scale shape: one mapInPandas over visual rows only (metadata filter
    JVM-side first), no shuffle; PNG bytes never leave the stage. The
    pure-Python codec is the correctness tier — swap a C codec into the
    same two calls for 100 TB throughput (operators/imagecodec.py).
    """
    from dataflowtemplates_spark.operators.imagecodec import (
        decode as real_decode,
        encode_png,
        sniff_format,
    )

    resized = resize_media(_media(spark, sf_dir), 32, 32) \
        .where(F.col("media_meta.modality") != "audio")

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("png_valid", T.BooleanType()),
        T.StructField("roundtrip_exact", T.BooleanType()),
        T.StructField("decoded_md5", T.StringType()),
    ])

    def run(batches):
        import hashlib

        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["media"]):
                arr = np.frombuffer(bytes(data), dtype=np.uint8) \
                    .reshape(32, 32, 3)
                png = encode_png(arr)
                back = real_decode(png)
                rows.append((
                    int(doc_id), 32, 32,
                    sniff_format(png) == "png",
                    bool(np.array_equal(back, arr)),
                    hashlib.md5(back.tobytes()).hexdigest()))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "png_valid",
                "roundtrip_exact", "decoded_md5"])

    return resized.mapInPandas(run, schema=out_schema).orderBy("doc_id")


# decoded_md5 must equal q83's independent resize reconstruction from
# raw text; the booleans are literal TRUE — any codec defect flips one
# or changes the md5, and the driver's value hash catches it.
_Q123_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, {_MODALITY} AS modality,
         {_N} AS n,
         16 + {_N} % 64 AS w,
         16 + {_N} % 48 AS h
  FROM documents
)
SELECT doc_id,
       32 AS width, 32 AS height,
       TRUE AS png_valid,
       TRUE AS roundtrip_exact,
       md5(array_to_string(list_transform(range(0, 3072),
            p -> substring(text,
                   CAST((((((p // 96) * h) // 32) * w
                          + (((p % 96) // 3) * w) // 32) * 3 + p % 3) % n + 1
                        AS INTEGER), 1)), '')) AS decoded_md5
FROM base WHERE modality <> 'audio' ORDER BY doc_id
"""


QUERIES = {
    "q80_media_metadata": q80_media_metadata,
    "q81_frame_sample": q81_frame_sample,
    "q82_media_features": q82_media_features,
    "q83_media_resize": q83_media_resize,
    "q123_png_roundtrip": q123_png_roundtrip,
}

ORACLES = {
    "q80_media_metadata": _Q80_ORACLE,
    "q81_frame_sample": _Q81_ORACLE,
    "q82_media_features": _Q82_ORACLE,
    "q83_media_resize": _Q83_ORACLE,
    "q123_png_roundtrip": _Q123_ORACLE,
}
