"""Shared machinery for HTTP object-store backends (S3 REST, GCS JSON).

Two mixins keep the service-specific backends small and keep their
retry/contract discipline IDENTICAL — the commit protocol's safety
argument (operators/mutations.py) depends on these behaviors, not on
either service's wire format:

:class:`HttpObjectTransport`
    Per-thread keep-alive connections (http.client is not
    thread-safe; the commit protocol races writers from threads), TLS
    via HTTPSConnection, and the one retry rule that matters: a
    failed IDEMPOTENT request (GET/HEAD/DELETE/listing/unconditional
    put) retries once on a fresh socket — a stale keep-alive is
    indistinguishable from a first-contact failure — while a
    NON-idempotent request (the conditional-put CAS) never
    transport-retries and always opens a fresh socket, because
    re-sending one is exactly the ambiguity the caller must arbitrate
    itself. Instances pickle by configuration (sockets never travel),
    so the distributed data plane can ship a backend to executors.

:class:`DerivedObjectOps`
    The whole fsio directory surface (exists/is_dir/list_dir/
    list_files/newest_mtime_under/delete_dir/move) derived from four
    service primitives: ``_list`` (normalized paginated listing),
    ``_head``, ``_get_or_none``, ``_put_object``/``_delete_object``.
    Implementing those plus ``create_exclusive`` is all a new store
    needs; the contract tests (tests/test_s3_backend.py,
    tests/test_gcs_backend.py) then pin the same fsio parity.
"""

from __future__ import annotations

import http.client
import urllib.parse


class HttpObjectTransport:
    """Connection handling + retry discipline shared by the HTTP
    backends. Subclasses call :meth:`_init_transport` from __init__
    and :meth:`_roundtrip` per request."""

    def _init_transport(self, endpoint: str, timeout_s: float) -> None:
        import threading

        u = urllib.parse.urlparse(endpoint)
        if u.scheme not in ("http", "https"):
            raise ValueError(
                f"endpoint must be http:// or https:// (got {endpoint!r})")
        self._tls = u.scheme == "https"
        self._host = u.hostname
        self._port = u.port or (443 if self._tls else 80)
        self._timeout = float(timeout_s)
        self._tl = threading.local()

    # -- pickling (executor shipping) ---------------------------------
    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_tl", None)  # thread-local sockets never travel
        return state

    def __setstate__(self, state):
        import threading

        self.__dict__.update(state)
        self._tl = threading.local()

    @property
    def _wire_host(self) -> str:
        """Host header exactly as sent (port included when not the
        scheme default) — the form request signing must cover."""
        default = 443 if self._tls else 80
        return (self._host if self._port == default
                else f"{self._host}:{self._port}")

    def _conn(self, fresh: bool = False):
        c = getattr(self._tl, "conn", None)
        if fresh or c is None:
            if c is not None:
                c.close()
            cls = (http.client.HTTPSConnection if self._tls
                   else http.client.HTTPConnection)
            c = cls(self._host, self._port, timeout=self._timeout)
            self._tl.conn = c
        return c

    def _roundtrip(self, method: str, target: str,
                   body: bytes | None, headers_for_attempt,
                   idempotent: bool):
        """One request with the retry discipline above; returns
        (status, headers, body). ``headers_for_attempt`` is a callable
        (signing stamps a fresh date per attempt)."""
        attempts = 2 if idempotent else 1
        for i in range(attempts):
            conn = self._conn(fresh=(i > 0 or not idempotent))
            try:
                conn.request(method, target, body=body,
                             headers=headers_for_attempt())
                resp = conn.getresponse()
                data = resp.read()
                if resp.will_close:  # server asked to close: drop it
                    conn.close()
                    self._tl.conn = None
                return resp.status, dict(resp.getheaders()), data
            except (TimeoutError, ConnectionError,
                    http.client.HTTPException, OSError):
                try:
                    conn.close()
                finally:
                    self._tl.conn = None
                if i + 1 >= attempts:
                    raise
        raise AssertionError("unreachable")


class DerivedObjectOps:
    """fsio directory surface over the subclass primitives
    ``_list(bucket, prefix, delimiter)`` (yields ('key', key, mtime,
    size) / ('prefix', p, None, None), fully depaginated), ``_head(bucket, key)``,
    ``_get_or_none(bucket, key)``, ``_put_object(bucket, key, data)``
    and ``_delete_object(bucket, key)`` (missing-key tolerant)."""

    def _split(self, path: str) -> tuple[str, str]:
        rest = path.split("://", 1)[1]
        bucket, _, key = rest.partition("/")
        if not bucket:
            raise ValueError(f"no bucket in {path!r}")
        return bucket, key

    def _kprefix(self, key: str) -> str:
        return key.rstrip("/") + "/" if key else ""

    # -- plain object ops ----------------------------------------------
    def read_bytes(self, path: str) -> bytes:
        bucket, key = self._split(path)
        got = self._get_or_none(bucket, key)
        if got is None:
            raise FileNotFoundError(path)
        return got

    def write_bytes(self, path: str, data: bytes) -> None:
        bucket, key = self._split(path)
        self._put_object(bucket, key, bytes(data))

    def delete_file(self, path: str) -> None:
        bucket, key = self._split(path)
        if not self._head(bucket, key):
            raise FileNotFoundError(path)  # fsio contract (the
            #                      services' own DELETE is idempotent)
        self._delete_object(bucket, key)

    # -- ranged reads (parquet footer/column-chunk pruning) --------------
    # Subclasses provide ``_get_ranged(bucket, key, range_value)`` ->
    # (status, headers, body): one GET carrying an RFC 9110 ``Range``
    # header (S3 object GET / GCS media download — both services
    # publish the same semantics: 206 + Content-Range on a satisfied
    # range, 200 + whole body when the server ignores it).
    def read_tail(self, path: str, n: int) -> tuple[bytes, int]:
        """Last ``n`` bytes and the TOTAL object size (from the 206
        reply's ``Content-Range: bytes a-b/total``) in one suffix
        GET — how a parquet footer is located without a prior HEAD.
        A server that ignores the Range header (200 + whole body —
        e.g. a proxy stripping Range) degrades to the correct slice
        of the full object, never a mis-offset one."""
        bucket, key = self._split(path)
        status, headers, body = self._get_ranged(
            bucket, key, f"bytes=-{int(n)}")
        body, total = self._range_reply(path, status, headers, body)
        if status == 200 and len(body) > int(n):
            body = body[-int(n):]
        return body, total

    def read_range(self, path: str, start: int, length: int) -> bytes:
        if int(length) <= 0:
            raise ValueError("length must be positive")
        bucket, key = self._split(path)
        end = int(start) + int(length) - 1
        status, headers, body = self._get_ranged(
            bucket, key, f"bytes={int(start)}-{end}")
        body, _ = self._range_reply(path, status, headers, body)
        if status == 200:
            # server ignored the range: slice the requested window
            # out of the whole body (returning it verbatim would put
            # these bytes at the WRONG offset in the caller's sparse
            # assembly)
            body = body[int(start):int(start) + int(length)]
        return body

    @staticmethod
    def _range_reply(path, status, headers, body) -> tuple[bytes, int]:
        if status == 404:
            raise FileNotFoundError(path)
        if status == 200:
            # server ignored the range (or it covered the object):
            # the whole body, its own total — CALLERS slice out the
            # window they asked for
            return body, len(body)
        if status != 206:
            raise OSError(f"range GET {path}: HTTP {status}")
        cr = {k.lower(): v for k, v in headers.items()}.get(
            "content-range", "")
        total_s = cr.rsplit("/", 1)[-1] if "/" in cr else ""
        if not total_s.isdigit():
            raise OSError(
                f"range GET {path}: unusable Content-Range {cr!r}")
        return body, int(total_s)

    # -- prefix ("directory") ops ----------------------------------------
    def exists(self, path: str) -> bool:
        bucket, key = self._split(path)
        if key and self._head(bucket, key):
            return True
        for _ in self._list(bucket, self._kprefix(key), None):
            return True
        return False

    def is_dir(self, path: str) -> bool:
        bucket, key = self._split(path)
        for _ in self._list(bucket, self._kprefix(key), None):
            return True
        return False

    def mkdirs(self, path: str) -> None:
        pass  # object stores have no directories

    def list_dir(self, path: str) -> list[str]:
        return [n for n, _ in self.list_dir_typed(path)]

    def list_dir_typed(self, path: str) -> list[tuple[str, bool]]:
        """(child name, is_dir) pairs from ONE delimiter listing — the
        single-round-trip form writer finalization uses (an is_dir
        probe per child would be N+1 LIST requests)."""
        bucket, key = self._split(path)
        p = self._kprefix(key)
        out: dict[str, bool] = {}
        for kind, item, _, _ in self._list(bucket, p, "/"):
            if kind == "key":
                name = item[len(p):]
                if name:
                    out.setdefault(name, False)
            else:  # common prefix 'p/child/' IS a directory
                name = item[len(p):].rstrip("/")
                if name:
                    out[name] = True
        return sorted(out.items())

    def list_files(self, path: str, suffix: str | None = None) -> list[str]:
        bucket, key = self._split(path)
        if key and self._head(bucket, key):
            return [path]
        p = self._kprefix(key)
        out = []
        seen = False
        for kind, item, _, _ in self._list(bucket, p, None):
            if kind != "key":
                continue
            seen = True
            name = item.rsplit("/", 1)[-1]
            if name.startswith(("_", ".")):
                continue
            if suffix and not name.endswith(suffix):
                continue
            out.append(f"{path.split('://', 1)[0]}://{bucket}/{item}")
        if not seen:
            raise FileNotFoundError(path)
        return sorted(out)

    def newest_mtime_under(self, path: str) -> float | None:
        bucket, key = self._split(path)
        ts = []
        if key and self._head(bucket, key):
            # a single object: LIST its exact key for the stamp
            for kind, item, m, _ in self._list(bucket, key, None):
                if kind == "key" and item == key and m is not None:
                    ts.append(m)
        for kind, _, m, _ in self._list(bucket, self._kprefix(key), None):
            if kind == "key" and m is not None:
                ts.append(m)
        return max(ts) if ts else None

    def delete_dir(self, path: str) -> None:
        bucket, key = self._split(path)
        for kind, item, _, _ in list(
                self._list(bucket, self._kprefix(key), None)):
            if kind == "key":
                self._delete_object(bucket, item)

    def move(self, src: str, dst: str) -> None:
        """Copy+delete per object — NOT atomic; the commit protocol
        never relies on it (same contract as MemoryObjectStore)."""
        sb, sk = self._split(src)
        db, dk = self._split(dst)
        scheme = src.split("://", 1)[0]
        if self._head(sb, sk):
            pairs = [(f"{scheme}://{sb}/{sk}", f"{scheme}://{db}/{dk}")]
        else:
            sp = self._kprefix(sk)
            pairs = [(f"{scheme}://{sb}/{item}",
                      f"{scheme}://{db}/{dk.rstrip('/')}/{item[len(sp):]}")
                     for kind, item, _, _ in self._list(sb, sp, None)
                     if kind == "key"]
            if not pairs:
                raise FileNotFoundError(src)
        for s, d in pairs:
            self.write_bytes(d, self.read_bytes(s))
            self.delete_file(s)
