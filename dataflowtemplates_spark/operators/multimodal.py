"""Multimodal (image/audio/video) column operators.

Design: media is an opaque ``binary`` column plus a typed metadata
struct — the pattern a 100 TB training-data pipeline needs: the engine
never interprets the payload except inside explicitly vectorized
decode/feature stages, so scans, joins and dedup stay columnar and
JVM-side, and only the decode stage pays the Python/Arrow tax.

Scale stance:

* Binary payloads make rows wide. Everything that does not need the
  payload (filters on metadata, joins on doc_id) is expressed on the
  metadata columns FIRST so Parquet column pruning skips the blob
  entirely — at 100 TB the difference between reading `media_meta`
  (bytes) and `media` (the dataset) is the whole job.
* Decode / feature-extract / resize / frame-sample run via
  ``mapInPandas``: Arrow-batched, one Python worker per partition, no
  per-row pickling. Batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (wide rows -> set it
  low, e.g. 64, when payloads are MB-scale).
* `decode_image` / `decode_audio` carry two paths. The default is a
  DETERMINISTIC fake (bytes tiled into the target shape) so the
  oracle-gated queries (q80–q83) are reproducible with zero codec
  dependencies. ``real=True`` decodes actual payloads via the
  pure-Python codecs in operators/imagecodec.py (PNG, baseline JPEG,
  RIFF PCM WAV — stdlib+numpy only); a C-backed codec (PIL /
  turbojpeg / libsndfile) slots into the same seam for production
  throughput. Either way the Spark-side plumbing — schema,
  partitioning, UDF signature, Arrow batch shape — is identical and
  tested end to end.

Reference parity note: mercari/DataflowTemplates has no media handling;
this module is a first-class extension (see SURVEY.md §7.2 M7 /
build-brief "Multimodal columns").
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_TYPE", "attach_media", "decode_image", "decode_audio",
    "image_features", "resize_media", "sample_frames",
]

#: Typed metadata carried alongside every opaque payload. One struct for
#: all modalities; irrelevant fields are null (sparse structs are ~free
#: in Parquet).
MEDIA_META_TYPE = T.StructType([
    T.StructField("modality", T.StringType()),       # image|audio|video
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])

#: bytes per synthetic video "frame" (see sample_frames)
FRAME_BYTES = 64


def attach_media(documents: DataFrame) -> DataFrame:
    """Lift the documents table into multimodal shape: the UTF-8 bytes of
    `text` become the opaque `media` payload, and a deterministic
    metadata struct is derived from the byte length. Entirely JVM-side
    column expressions — no Python in this stage.

    The derivation is fixed (and mirrored in the DuckDB oracles):
      n_bytes      = octet_length(utf8(text))
      modality     = image | audio | video  by  doc_id % 3
      width        = 16 + n_bytes % 64         (image/video)
      height       = 16 + n_bytes % 48         (image/video)
      sample_rate  = 8000 + (n_bytes % 4) * 4000       (audio)
      n_frames     = max(1, ceil(n_bytes / FRAME_BYTES))  (video)

    n_frames uses the SAME formula as sample_frames (max(1, ceil)) so the
    advertised count always equals the number of frames actually emitted.
    """
    data = F.encode(F.col("text"), "UTF-8")
    n = F.length(data)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    is_visual = modality.isin("image", "video")
    meta = F.struct(
        modality.alias("modality"),
        F.when(is_visual, (F.lit(16) + n % 64).cast("int")).alias("width"),
        F.when(is_visual, (F.lit(16) + n % 48).cast("int")).alias("height"),
        F.when(modality == "audio",
               (F.lit(8000) + (n % 4) * 4000).cast("int")).alias("sample_rate"),
        F.when(modality == "video",
               F.greatest(F.lit(1), F.ceil(n / FRAME_BYTES)).cast("int")).alias("n_frames"),
    )
    return (documents
            .select("doc_id", "source",
                    data.alias("media"),
                    meta.alias("media_meta")))


def decode_image(data: bytes, width: int, height: int, *,
                 real: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    real=True decodes an actual PNG or baseline JPEG payload via the
    pure-Python codec (operators/imagecodec.py — zlib+numpy, no
    external libs); dimensions then come from the file itself, and the
    width/height arguments are ignored. The default path is the
    deterministic fake (payload bytes tiled/truncated into the target
    shape) that the oracle-gated queries q80–q83 pin — reproducible
    without any codec. A C-backed codec (PIL/turbojpeg) slots into the
    same seam for 100 TB throughput.
    """
    if real:
        from dataflowtemplates_spark.operators import imagecodec
        return imagecodec.decode(bytes(data))
    need = height * width * 3
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = -(-need // buf.size)  # ceil
    return np.tile(buf, reps)[:need].reshape(height, width, 3)


def decode_audio(data: bytes, sample_rate: int, *,
                 real: bool = False) -> np.ndarray:
    """Decode an audio payload to a float32 waveform in [-1, 1).

    real=True parses an actual RIFF/WAVE PCM payload (8/16/24/32-bit
    int or float32) via operators/imagecodec.decode_wav — the given
    sample_rate argument is ignored in favor of the file's. The
    default path is the stub contract the oracles pin: bytes
    reinterpreted as uint8 samples, centered and scaled —
    deterministic, codec-free. Compressed codecs (mp3/opus) stay
    behind the same seam for a C-backed decoder.
    """
    if real:
        from dataflowtemplates_spark.operators.imagecodec import decode_wav
        return decode_wav(bytes(data))[0]
    buf = np.frombuffer(data, dtype=np.uint8)
    return (buf.astype(np.float32) - 128.0) / 128.0


_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("modality", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("phash", T.StringType()),
    T.StructField("mean_intensity", T.DoubleType()),
])


def image_features(media: DataFrame) -> DataFrame:
    """Per-payload features via mapInPandas (Arrow-batched).

    Output: doc_id, modality, n_bytes, width, height,
    phash (md5 hex of the payload — content fingerprint usable for
    exact media dedup), mean_intensity (mean channel value of the
    decoded array; fake-decode deterministic).

    Plan shape at scale: this is a narrow map — no shuffle; partition
    count is inherited from the scan, so repartition UPSTREAM if blob
    skew makes partitions uneven.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["media_meta"]
            out = {
                "doc_id": pdf["doc_id"],
                "modality": metas.map(lambda m: m["modality"]),
                "n_bytes": pdf["media"].map(len).astype("int64"),
                "width": metas.map(lambda m: m["width"]).astype("Int32"),
                "height": metas.map(lambda m: m["height"]).astype("Int32"),
                "phash": pdf["media"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
            }
            means = []
            for data, meta in zip(pdf["media"], metas):
                # Arrow → pandas renders nullable int struct fields as
                # floats; normalize before they reach shape math
                if meta["modality"] in ("image", "video"):
                    arr = decode_image(bytes(data), int(meta["width"]),
                                       int(meta["height"]))
                else:
                    arr = decode_audio(bytes(data), int(meta["sample_rate"]))
                    arr = arr * 128.0 + 128.0  # back to intensity scale
                # float64 accumulation: byte values are exact in f64, so
                # the mean is bit-identical to the SQL oracle's
                means.append(float(arr.mean(dtype=np.float64)))
            out["mean_intensity"] = pd.Series(means, dtype="float64")
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=_FEATURES_SCHEMA)


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize of visual payloads to target_w x target_h
    (audio passes through). Re-encodes the resized array as the new
    payload, with updated metadata — the canonical \"normalize a 100 TB
    image corpus to one resolution\" stage.
    """
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META_TYPE),
    ])

    def _norm(meta: dict) -> dict:
        # Arrow → pandas renders nullable ints as floats/NaN; emit clean
        # None/int so the struct round-trips through the declared schema
        return {k: (None if v is None or (isinstance(v, float) and np.isnan(v))
                    else int(v) if isinstance(v, float) else v)
                for k, v in meta.items()}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data, meta in zip(pdf["doc_id"], pdf["media"],
                                          pdf["media_meta"]):
                meta = _norm(dict(meta))
                if meta["modality"] in ("image", "video"):
                    w, h = int(meta["width"]), int(meta["height"])
                    arr = decode_image(bytes(data), w, h)
                    ys = np.arange(target_h) * h // target_h
                    xs = np.arange(target_w) * w // target_w
                    resized = arr[ys][:, xs]
                    data = resized.tobytes()
                    meta["width"], meta["height"] = target_w, target_h
                rows.append((doc_id, data, meta))
            yield pd.DataFrame(rows, columns=["doc_id", "media", "media_meta"])

    return media.mapInPandas(run, schema=out_schema)


def sample_frames(media: DataFrame, every_n: int = 2,
                  frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Explode video payloads into sampled frames: the payload is split
    into fixed-size chunks (the stub stand-in for container demuxing)
    and every Nth chunk is emitted as its own row — a 1→N mapInPandas,
    the shape real frame extraction takes.

    Output: doc_id, frame_idx, frame (binary). Non-video rows drop out
    — and that filter runs JVM-side BEFORE Python, on metadata only.
    """
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])
    videos = media.where(F.col("media_meta.modality") == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, data in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(data)
                n_frames = max(1, -(-len(data) // frame_bytes))
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(data[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": frames})

    return videos.mapInPandas(run, schema=out_schema)
