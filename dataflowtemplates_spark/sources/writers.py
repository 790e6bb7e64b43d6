"""Dynamic-destination file writers + finish transform (reference K1, K2, K9).

Reference semantics reproduced:

* **Dynamic destinations** (templates/SpannerToText.java:118-130;
  transforms/sinks/TextDynamicSink.java:36-54): each row routes to a
  file group named after the value of `split_field`; a null split
  value routes to the `""` group (StructToAvroTransform.java:84). In
  Spark this is one `partitionBy` pass — no per-key re-scan.
* **Header line** (TextDynamicSink.java:41-43) for CSV.
* **withoutSharding** (util/FixedFileNaming.java:27-34): exactly one
  shard with a fixed filename `prefix + suffix` — `coalesce(1)` plus a
  post-commit rename.
* **Finish transform** (transforms/WriteFilesFinishTransform.java:39-61):
  - `output_notify`: one manifest file listing every written file path
    (newline-joined, the reference's Combine.globally string concat);
  - `output_empty`: when the result set is empty, still write a single
    output file containing `empty_text` so downstream consumers see a
    file (WriteFilesFinishTransform.java:48-52).

Scale note: everything is a single `df.write` pass; the only
deliberately non-scalable path is `without_sharding` (`coalesce(1)`),
which exists for byte-parity with the reference's fixed-filename mode
and should only be used for small exports — exactly the reference's
own caveat for `withoutSharding`.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflowtemplates_spark.functions.convert import text_line

#: Spark's null-partition directory name, remapped to the reference's "".
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_SPLIT_COL = "_split"
_LINE_COL = "_line"


@dataclass
class WriteResult:
    """What a dynamic write produced (the reference's WriteFilesResult)."""
    files: list[str] = field(default_factory=list)
    row_count: int = 0
    format: str = "text"

    @property
    def empty(self) -> bool:
        return self.row_count == 0


def _list_data_files(root: str, suffix: str | None = None) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if fn.startswith(("_", ".")):
                continue
            if suffix and not fn.endswith(suffix):
                continue
            out.append(os.path.join(dirpath, fn))
    return sorted(out)


def _finalize_partition_dirs(root: str) -> None:
    """Rename `_split=value/` partition dirs to plain `value/`. The Hive
    null dir maps to the reference's empty-string group: its files move
    to the ROOT (the reference names outputs `prefix + key`, so an
    empty key means no subpath — StructToAvroTransform.java:84). A
    leading-underscore dir name would also be invisible to Hadoop-style
    readers, so root placement is doubly right."""
    for entry in sorted(os.listdir(root)):
        full = os.path.join(root, entry)
        if not (os.path.isdir(full) and entry.startswith(f"{_SPLIT_COL}=")):
            continue
        value = entry[len(_SPLIT_COL) + 1:]
        if value == _HIVE_NULL:
            for fn in os.listdir(full):
                os.replace(os.path.join(full, fn), os.path.join(root, fn))
            os.rmdir(full)
        else:
            os.replace(full, os.path.join(root, value))


def write_text_dynamic(df: DataFrame, path: str, fmt: str = "json",
                       split_field: str | None = None,
                       header: bool = False,
                       without_sharding: bool = False,
                       prefix: str = "output",
                       empty_text: str = "",
                       output_empty: bool = False,
                       output_notify: str | None = None) -> WriteResult:
    """K1: dynamic-destination CSV/JSON writer.

    Rows are rendered to single-line strings by the conversion layer
    (C1/C2 semantics: base64 bytes, Zulu timestamps, Java-style nested
    rendering for CSV) and routed by ``split_field``.
    """
    fmt = fmt.lower()
    suffix = f".{fmt}"
    rendered = df.withColumn(_LINE_COL, text_line(df, fmt))
    if header and fmt == "csv":
        head_line = ",".join(df.columns)
    else:
        head_line = None

    n = df.count()
    if n == 0:
        result = WriteResult(files=[], row_count=0, format=fmt)
        if output_empty:
            os.makedirs(path, exist_ok=True)
            target = os.path.join(path, f"{prefix}{suffix}")
            with open(target, "w") as fh:
                if head_line is not None:
                    fh.write(head_line + "\n")
                if empty_text:
                    fh.write(empty_text)
            result.files.append(target)
        _write_notify(result, output_notify)
        return result

    if split_field is not None:
        out = rendered.select(
            F.col(split_field).cast("string").alias(_SPLIT_COL),
            F.col(_LINE_COL).alias("value"))
        writer = out.write.mode("overwrite").partitionBy(_SPLIT_COL)
        writer.text(path)
        _finalize_partition_dirs(path)
        if head_line is not None:
            for f_ in _list_data_files(path):
                _prepend_line(f_, head_line)
        files = _rename_with_suffix(path, prefix, suffix)
    else:
        out = rendered.select(F.col(_LINE_COL).alias("value"))
        if without_sharding:
            out = out.coalesce(1)
        out.write.mode("overwrite").text(path)
        if head_line is not None:
            for f_ in _list_data_files(path):
                _prepend_line(f_, head_line)
        if without_sharding:
            files = _collapse_to_fixed_name(path, f"{prefix}{suffix}")
        else:
            files = _rename_with_suffix(path, prefix, suffix)

    result = WriteResult(files=files, row_count=n, format=fmt)
    _write_notify(result, output_notify)
    return result


def write_columnar_dynamic(df: DataFrame, path: str,
                           split_field: str | None = None,
                           fmt: str = "avro",
                           compression: str = "snappy",
                           output_notify: str | None = None) -> WriteResult:
    """K2: dynamic-destination columnar writer, Avro+snappy per the
    reference (transforms/sinks/AvroDynamicSink.java:33-49).

    `fmt="avro"` always produces real .avro container files: the
    spark-avro datasource when the jar is present, else the pure-Python
    container writer (operators/avro_io.py — deflate codec, since no
    snappy lib ships here). Other formats go through the native
    datasource with a parquet fallback. (Schema handling needs none of
    the reference's per-key sampling: `df.schema` is static.)
    """
    actual = fmt
    try:
        _probe_format(df, fmt)
    except Exception:
        actual = "parquet" if fmt != "avro" else "avro-py"
    if actual == "avro-py":
        from dataflowtemplates_spark.operators.avro_io import write_avro
        if os.path.isdir(path):
            shutil.rmtree(path)
        files = write_avro(df, path, split_field=split_field,
                           codec=compression)
        result = WriteResult(files=files, row_count=df.count(), format="avro")
        _write_notify(result, output_notify)
        return result
    writer = (df.withColumn(_SPLIT_COL,
                            F.coalesce(F.col(split_field).cast("string"), F.lit("")))
              .write.mode("overwrite").partitionBy(_SPLIT_COL)
              if split_field is not None
              else df.write.mode("overwrite"))
    writer.format(actual).option("compression", compression).save(path)
    if split_field is not None:
        _finalize_partition_dirs(path)
    n = df.count()
    result = WriteResult(files=_list_data_files(path), row_count=n, format=actual)
    _write_notify(result, output_notify)
    return result


_FORMAT_OK: dict[str, bool] = {}


def _probe_format(df: DataFrame, fmt: str) -> None:
    """Raise if the session cannot write ``fmt`` (checked once)."""
    if fmt in ("parquet", "json", "csv", "text", "orc"):
        return
    if _FORMAT_OK.get(fmt):
        return
    import tempfile
    probe_dir = tempfile.mkdtemp(prefix="fmt_probe_")
    try:
        df.limit(0).write.mode("overwrite").format(fmt).save(
            os.path.join(probe_dir, "probe"))
        _FORMAT_OK[fmt] = True
    finally:
        shutil.rmtree(probe_dir, ignore_errors=True)


def _prepend_line(file_path: str, line: str) -> None:
    with open(file_path) as fh:
        body = fh.read()
    with open(file_path, "w") as fh:
        fh.write(line + "\n" + body)


def _rename_with_suffix(root: str, prefix: str, suffix: str) -> list[str]:
    """part-00000-... -> {prefix}-{i:05d}{suffix}, per directory —
    the reference's defaultNaming(prefix+key, suffix)."""
    out = []
    for dirpath, _dirs, files in os.walk(root):
        shard = 0
        for fn in sorted(files):
            if fn.startswith(("_", ".")) or not fn.startswith("part-"):
                continue
            target = os.path.join(dirpath, f"{prefix}-{shard:05d}{suffix}")
            os.replace(os.path.join(dirpath, fn), target)
            out.append(target)
            shard += 1
    return sorted(out)


def _collapse_to_fixed_name(root: str, filename: str) -> list[str]:
    """withoutSharding: the single shard gets the exact fixed filename
    (reference: util/FixedFileNaming.java:27-34)."""
    parts = [f for f in os.listdir(root)
             if f.startswith("part-") and not f.endswith(".crc")]
    assert len(parts) == 1, f"expected 1 shard, found {parts}"
    target = os.path.join(root, filename)
    os.replace(os.path.join(root, parts[0]), target)
    return [target]


def _write_notify(result: WriteResult, notify_path: str | None) -> None:
    """K9: newline-joined list of written files -> one manifest file
    (reference: WriteFilesFinishTransform.java:43,53-56)."""
    if not notify_path:
        return
    os.makedirs(os.path.dirname(notify_path) or ".", exist_ok=True)
    with open(notify_path, "w") as fh:
        fh.write("\n".join(result.files))
