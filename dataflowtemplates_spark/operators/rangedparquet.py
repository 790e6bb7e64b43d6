"""Ranged-GET parquet reads: fetch only the footer plus the projected
columns' chunk bytes through an object-store backend, instead of the
whole object.

This closes the data plane's one documented scale-economics gap vs a
native connector (objstore_plane.py): a narrow projection over a wide
100 TB table must not pay full-object bytes. Parquet's layout makes
pruning cheap over plain HTTP range requests — the published format
puts a thrift footer at the tail (last 8 bytes = footer length +
``PAR1`` magic) whose column-chunk metadata carries every chunk's
absolute offset and compressed size, the same information the native
readers (parquet-mr, arrow's dataset API, Trino's parquet reader) use
for exactly this pruning:

1. ONE suffix-range GET (``bytes=-N``) fetches the tail; the reply's
   ``Content-Range`` total gives the object size. If the footer is
   longer than the guess, one exact re-fetch follows (rare: footers
   are ~KBs at these row-group counts).
2. The footer names each row group's column chunks; the projected
   top-level columns' chunks become a sorted byte-range list,
   coalesced when the gap between neighbors is under
   ``coalesce_gap`` (two GETs with a small hole between them cost
   more than the hole).
3. One range GET per coalesced run; the pieces back a sparse
   file-like object and pyarrow's ordinary ParquetFile reader decodes
   the projection from it — no second parquet implementation, and a
   read outside the fetched ranges raises loudly instead of silently
   fetching.

When the projection would fetch most of the object anyway
(``whole_fraction``), the read falls back to one whole-object GET —
fewer round trips for the same bytes.

Backends supply ``read_tail(path, n) -> (bytes, total_size)`` and
``read_range(path, start, length) -> bytes``
(operators/httpstore.DerivedObjectOps over S3 ``Range:`` headers /
GCS media downloads; both services publish the same RFC 9110 range
semantics). Used executor-side by objstore_plane.read_parquet when a
column projection is given.
"""

from __future__ import annotations

#: suffix-range size of the first tail fetch — above the footer size
#: of rewrite-granularity objects (a ~50-column file with a handful of
#: row groups footers in the low tens of KB); a longer footer costs
#: exactly one exact-size re-fetch, so the guess errs small
DEFAULT_TAIL_BYTES = 64 * 1024

#: coalesce two chunk ranges when the gap between them is below this:
#: re-fetching a small hole is cheaper than another round trip
DEFAULT_COALESCE_GAP = 64 * 1024

#: above this fraction of the object, ranged fetching loses to one
#: whole-object GET
DEFAULT_WHOLE_FRACTION = 0.8

_MAGIC = b"PAR1"


class _SparseFile:
    """Read-only file-like over fetched (offset, bytes) segments of a
    larger object. pyarrow's ParquetFile drives it through
    read/seek/tell; a read touching an unfetched hole raises — by
    construction the footer and every projected chunk are inside the
    segments, so a hole read is a planner bug, never a fallback."""

    def __init__(self, size: int, segments: list[tuple[int, bytes]]):
        self._size = int(size)
        self._segs = sorted((int(o), b) for o, b in segments)
        self._pos = 0
        self.closed = False

    # pyarrow probes these
    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def seekable(self) -> bool:
        return True

    def size(self) -> int:
        return self._size

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        else:
            raise ValueError(f"bad whence {whence}")
        if self._pos < 0:
            raise OSError("negative seek position")
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        start, end = self._pos, self._pos + n
        out = bytearray()
        pos = start
        for off, buf in self._segs:
            if off + len(buf) <= pos:
                continue
            if off > pos:
                break  # hole before the next segment
            take = min(end, off + len(buf)) - pos
            out += buf[pos - off:pos - off + take]
            pos += take
            if pos >= end:
                break
        if pos < end:
            raise OSError(
                f"read [{start}, {end}) crosses an unfetched hole at "
                f"{pos} — range planner missed a required byte range")
        self._pos = end
        return bytes(out)

    def close(self) -> None:
        self.closed = True


def _footer(backend, path: str, tail_bytes: int):
    """(tail_bytes_fetched, object_size, FileMetaData): one suffix
    GET, plus one exact re-fetch when the footer outgrew the guess."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tail, size = backend.read_tail(path, tail_bytes)
    if len(tail) >= size:
        # the whole object fit in the tail guess
        return tail, size, pq.read_metadata(pa.BufferReader(tail))
    if tail[-4:] != _MAGIC:
        raise OSError(f"{path}: not a parquet object (bad tail magic)")
    flen = int.from_bytes(tail[-8:-4], "little")
    need = flen + 8
    if need > len(tail):
        tail, size = backend.read_tail(path, need)
    return tail, size, pq.read_metadata(pa.BufferReader(tail))


def _chunk_ranges(meta, columns: set[str],
                  row_groups: list[int] | None = None
                  ) -> list[tuple[int, int]]:
    """[start, end) byte ranges of every column chunk whose TOP-LEVEL
    schema path is in ``columns`` (nested projections fetch the whole
    top-level column, matching pq.read_table's column selection),
    restricted to ``row_groups`` when given (predicate skipping)."""
    ranges: list[tuple[int, int]] = []
    for rg in (range(meta.num_row_groups) if row_groups is None
               else row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            if col.path_in_schema.split(".", 1)[0] not in columns:
                continue
            start = col.data_page_offset
            if col.dictionary_page_offset is not None:
                start = min(start, col.dictionary_page_offset)
            ranges.append((start, start + col.total_compressed_size))
    return sorted(ranges)


#: the conjunctive predicate ops row-group statistics can refute
PREDICATE_OPS = ("==", "<=", ">=", "<", ">")


def _rg_may_match(meta, rg: int, predicate) -> bool:
    """False only when the row group's column statistics PROVE no row
    can satisfy the conjunctive predicate — the standard min/max
    refutation every native parquet reader applies. Missing stats, a
    missing column, or a nested path keep the group (never guess)."""
    g = meta.row_group(rg)
    stats = {}
    for ci in range(g.num_columns):
        col = g.column(ci)
        if "." not in col.path_in_schema:  # flat columns only:
            #   nested min/max ordering is not the row's ordering
            stats[col.path_in_schema] = col.statistics
    for name, op, val in predicate:
        st = stats.get(name)
        if st is None or not st.has_min_max:
            continue
        mn, mx = st.min, st.max
        if ((op == "==" and (val < mn or val > mx))
                or (op == "<=" and mn > val)
                or (op == "<" and mn >= val)
                or (op == ">=" and mx < val)
                or (op == ">" and mx <= val)):
            return False
    return True


def select_row_groups(meta, predicate) -> list[int]:
    """Row groups the statistics cannot refute for the conjunctive
    ``predicate`` ([(column, op, value)], op in PREDICATE_OPS). The
    selection is a SUPERSET guarantee: every matching row lives in a
    selected group; selected groups may still hold non-matching rows
    (the caller applies the exact residual filter)."""
    for name, op, _ in predicate:
        if op not in PREDICATE_OPS:
            raise ValueError(f"unsupported predicate op {op!r} on "
                             f"{name!r}; have {PREDICATE_OPS}")
    return [rg for rg in range(meta.num_row_groups)
            if _rg_may_match(meta, rg, predicate)]


def _coalesce(ranges: list[tuple[int, int]],
              gap: int) -> list[tuple[int, int]]:
    merged: list[list[int]] = []
    for s, e in ranges:
        if merged and s - merged[-1][1] <= gap:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [(s, e) for s, e in merged]


def fetch_table(backend, path: str, columns: list[str],
                tail_bytes: int = DEFAULT_TAIL_BYTES,
                coalesce_gap: int = DEFAULT_COALESCE_GAP,
                whole_fraction: float = DEFAULT_WHOLE_FRACTION,
                predicate=None):
    """Read ``columns`` of the parquet object at ``path`` through
    ranged GETs; returns a pyarrow Table holding exactly the projected
    columns that EXIST in the file (a file written before a schema
    evolution simply lacks the new column — the caller null-fills).

    ``predicate`` ([(column, op, value)] conjunction, op in
    :data:`PREDICATE_OPS`) additionally SKIPS row groups whose
    statistics refute it — their chunk bytes are never fetched. The
    result is a superset of the matching rows (statistics prune
    groups, not rows); the caller applies the exact residual filter.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    tail, size, meta = _footer(backend, path, tail_bytes)
    in_file = {meta.schema.column(i).path.split(".", 1)[0]
               for i in range(meta.num_columns)}
    # a file written before a schema evolution simply lacks the new
    # column: project what exists (possibly nothing — a 0-column
    # n-row table still carries the row count the null-fill needs)
    present = [c for c in columns if c in in_file]
    rgs = (None if predicate is None
           else select_row_groups(meta, predicate))
    if len(tail) >= size:
        pf = pq.ParquetFile(pa.BufferReader(tail))
        if rgs is None:
            return pf.read(columns=present, use_threads=False)
        return pf.read_row_groups(rgs, columns=present,
                                  use_threads=False)
    runs = _coalesce(_chunk_ranges(meta, set(present), rgs),
                     coalesce_gap)
    wanted_bytes = sum(e - s for s, e in runs)
    if wanted_bytes >= whole_fraction * size:
        # wide projection: one head range + the already-fetched tail
        # reassemble the whole object — total bytes over the wire ==
        # object size, strictly fewer round trips than per-chunk GETs
        head = backend.read_range(path, 0, size - len(tail))
        pf = pq.ParquetFile(pa.BufferReader(head + tail))
        if rgs is None:
            return pf.read(columns=present, use_threads=False)
        return pf.read_row_groups(rgs, columns=present,
                                  use_threads=False)
    if rgs is not None and not rgs:
        # every group refuted: zero data bytes fetched; an empty
        # table with the projected schema (row count 0)
        empty = meta.schema.to_arrow_schema()
        return pa.table(
            {c: pa.array([], empty.field(c).type) for c in present})
    tail_start = size - len(tail)
    segments = [(tail_start, tail)]
    for s, e in runs:
        # bytes at/past tail_start are already in memory from the
        # suffix GET: clip the run instead of re-fetching them (the
        # sparse read crosses the contiguous segment boundary)
        e = min(e, tail_start)
        if s < e:
            segments.append((s, backend.read_range(path, s, e - s)))
    pf = pq.ParquetFile(_SparseFile(size, segments))
    if rgs is None:
        return pf.read(columns=present, use_threads=False)
    return pf.read_row_groups(rgs, columns=present, use_threads=False)
