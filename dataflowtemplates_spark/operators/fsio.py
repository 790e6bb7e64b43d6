"""Python-side filesystem resolution for the pure-Python sinks/sources.

The repo's JVM-side ``_HadoopFS`` wrapper (sources/writers.py) covers
driver-side finalization (rename/list/delete) for everything written
through Spark datasources. The pure-Python writers (TFRecord K3,
avro-py K2 fallback) instead stream bytes from EXECUTOR tasks, where
py4j access to the JVM Hadoop FileSystem does not exist — so they
resolve the destination through ``pyarrow.fs``, Arrow's C++ filesystem
layer, which handles ``file://``, ``hdfs://`` (libhdfs), ``s3://`` and
``gs://`` natively from Python and ships in the pyarrow build every
executor already carries for pandas UDFs.

Driver-side code imports :func:`resolve_fs` from here; executor
closures inline the same three lines (a closure that referenced this
module by name would require the package on the worker's import path,
which the self-containment contract of those closures avoids).
"""

from __future__ import annotations


def resolve_fs(path: str):
    """Return ``(pyarrow FileSystem, fs-local path)`` for ``path``.

    Paths with a scheme go through ``FileSystem.from_uri``; bare paths
    map to the local filesystem unchanged (relative paths resolve
    against the driver's cwd, same as ``open``).
    """
    import pyarrow.fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def read_bytes(path: str) -> bytes:
    """Whole-file read through pyarrow.fs (scheme-general)."""
    fs, base = resolve_fs(path)
    with fs.open_input_stream(base) as fh:
        return fh.read()


def write_bytes(path: str, data: bytes) -> None:
    """Whole-file write through pyarrow.fs. NOT atomic on its own —
    callers needing atomic metadata swaps write a temp name and
    :func:`move` over (rename-capable filesystems), per their own
    single-writer contract."""
    fs, base = resolve_fs(path)
    with fs.open_output_stream(base, compression=None) as fh:
        fh.write(data)


def create_exclusive(path: str, data: bytes) -> bool:
    """Create ``path`` with ``data`` only if it does not already exist.
    Returns True on success, False if the file was already present —
    the primitive an optimistic commit lock needs.

    Local paths (bare or ``file://``) get true O_EXCL atomicity from
    the OS. Other scheme paths fall back to check-then-write, which is
    best-effort only — NOT exclusive; callers needing a real lock must
    reject those paths (KeyedTable._acquire_commit_lock does) and
    object stores should commit through a log-based table format with
    conditional puts instead (the documented Delta/Iceberg seam)."""
    if path.startswith("file://"):
        path = path[len("file://"):]
    if "://" not in path:
        import os

        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, data)
        finally:
            os.close(fd)
        return True
    if exists(path):
        return False
    write_bytes(path, data)
    return True


def delete_file(path: str) -> None:
    fs, base = resolve_fs(path)
    fs.delete_file(base)


def exists(path: str) -> bool:
    import pyarrow.fs as pafs

    fs, base = resolve_fs(path)
    return fs.get_file_info(base).type != pafs.FileType.NotFound


def is_dir(path: str) -> bool:
    import pyarrow.fs as pafs

    fs, base = resolve_fs(path)
    return fs.get_file_info(base).type == pafs.FileType.Directory


def mkdirs(path: str) -> None:
    fs, base = resolve_fs(path)
    fs.create_dir(base, recursive=True)


def move(src: str, dst: str) -> None:
    """Rename src -> dst (file or directory), replacing a same-type
    dst where the underlying FS allows it. A metadata-only rename on
    local/HDFS; object stores emulate directory moves per object —
    commit protocols that rely on directory renames (the KeyedTable)
    should use a log-based table format there instead (the documented
    Delta/Iceberg seam)."""
    fs, sbase = resolve_fs(src)
    _fs2, dbase = resolve_fs(dst)
    import pyarrow.fs as pafs
    info = fs.get_file_info(dbase)
    if info.type == pafs.FileType.File:
        fs.delete_file(dbase)
    fs.move(sbase, dbase)


def delete_dir(path: str) -> None:
    fs, base = resolve_fs(path)
    fs.delete_dir(base)


def list_dir(path: str) -> list[str]:
    """Immediate child names (files and dirs) of a directory."""
    import pyarrow.fs as pafs

    fs, base = resolve_fs(path)
    return sorted(
        fi.path.rsplit("/", 1)[-1]
        for fi in fs.get_file_info(pafs.FileSelector(base, recursive=False)))


def list_files(path: str, suffix: str | None = None) -> list[str]:
    """Recursive data-file listing via pyarrow (scheme-general).

    Hidden ``_``/``.`` entries are skipped like Spark's file index
    does; ``path`` may be a single file. Results keep the input's
    scheme prefix (``s3://…``) so they resolve back through
    :func:`resolve_fs` unchanged.
    """
    import pyarrow.fs as pafs

    scheme = path.split("://", 1)[0] + "://" if "://" in path else ""
    fs, base = resolve_fs(path)
    info = fs.get_file_info(base)
    if info.type == pafs.FileType.NotFound:
        raise FileNotFoundError(path)
    if info.type == pafs.FileType.File:
        return [scheme + base if scheme else base]
    out = []
    for fi in fs.get_file_info(pafs.FileSelector(base, recursive=True)):
        if fi.type != pafs.FileType.File:
            continue
        name = fi.path.rsplit("/", 1)[-1]
        if name.startswith(("_", ".")):
            continue
        if suffix and not name.endswith(suffix):
            continue
        out.append(scheme + fi.path if scheme else fi.path)
    return sorted(out)
