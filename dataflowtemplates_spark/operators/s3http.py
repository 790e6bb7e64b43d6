"""HTTP-level S3-compatible object-store backend for the fsio seam.

``S3HttpBackend`` serves ``s3://bucket/key`` paths over the public S3
REST API using only the standard library — register it with
:func:`fsio.register_object_backend` and the KeyedTable commit
protocol (operators/mutations.py) runs its metadata CAS against a
real HTTP object store:

* **Conditional put** — ``PutObject`` with ``If-None-Match: *``
  (published S3 semantics since 2024-08; MinIO/GCS-XML-compat expose
  the same header): ``200`` means this writer created the object,
  ``412 Precondition Failed`` means it already existed (``409``, the
  concurrent-conditional-writer answer, also reads as a loss — some
  store returns it when two conditional puts race).
* **Ambiguous timeout after put** — if the connection dies AFTER the
  request body was sent, the put may or may not have landed. The
  backend disambiguates by reading the object back: the commit
  protocol's log objects are unique per writer (every entry carries
  its writer's staging-dir UUID), so byte-equality means OUR put
  landed (win), different bytes mean a rival's did (loss), and
  absence means the put never landed (safe to retry the conditional
  put itself).
* **Listing** — ``ListObjectsV2`` with ``prefix``/``delimiter``,
  paginated via ``continuation-token``; ``LastModified`` from the
  listing backs ``newest_mtime_under`` (the reclaim-orphans grace
  clock).

AUTH: pass ``credentials=(access_key, secret_key[, session_token])``
and every request is signed with AWS Signature Version 4
(operators/sigv4.py — pure stdlib, validated against AWS's published
test vectors and botocore), including the payload-hash
``x-amz-content-sha256`` header S3 requires; without credentials,
requests go unsigned (MinIO/localstack-style endpoints or VPC
gateways with IAM-free bucket policies). Both ``http://`` and
``https://`` endpoints are accepted — TLS rides
``http.client.HTTPSConnection`` with default certificate verification.

Tests drive this class against an in-process HTTP emulator
(dataflowtemplates_spark/testing/s3_emulator.py) covering the 412
path, the ambiguous-timeout path, list-after-put visibility, and
server-side SigV4 verification; the protocol property tests in
tests/test_commit_protocol.py parameterize over
{local O_EXCL, MemoryObjectStore, this backend}.

PICKLING: instances serialize by configuration (endpoint, creds,
timeouts) and rebuild their per-thread connection cache on
deserialization — the distributed data plane
(operators/objstore_plane.py) ships the backend to executor tasks so
they stream parquet bytes to the store directly, never through the
driver.
"""

from __future__ import annotations

import http.client
import urllib.parse
import xml.etree.ElementTree as ET
from email.utils import parsedate_to_datetime

from dataflowtemplates_spark.operators import sigv4


class S3HttpBackend:
    """fsio object-store backend speaking the S3 REST API to
    ``endpoint`` (e.g. ``http://127.0.0.1:9000`` or
    ``https://s3.us-east-1.amazonaws.com``). Paths are full
    ``scheme://bucket/key`` URIs; the scheme is whatever the backend
    was registered under."""

    #: executor tasks may construct/use this backend directly (it is
    #: picklable and talks to an external service, not driver memory)
    distributed = True

    def __init__(self, endpoint: str, timeout_s: float = 10.0,
                 put_retries: int = 2,
                 credentials: tuple | None = None,
                 region: str = "us-east-1"):
        import threading

        u = urllib.parse.urlparse(endpoint)
        if u.scheme not in ("http", "https"):
            raise ValueError(
                f"endpoint must be http:// or https:// (got {endpoint!r})")
        self._tls = u.scheme == "https"
        self._host = u.hostname
        self._port = u.port or (443 if self._tls else 80)
        self._timeout = float(timeout_s)
        self._put_retries = int(put_retries)
        if credentials is not None and len(credentials) not in (2, 3):
            raise ValueError("credentials must be (access_key, "
                             "secret_key[, session_token])")
        self._creds = tuple(credentials) if credentials else None
        self._region = region
        # one persistent keep-alive connection PER THREAD (the commit
        # protocol races writers from threads; http.client connections
        # are not thread-safe)
        self._tl = threading.local()

    # -- pickling (executor shipping) -----------------------------------
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
        """Host header exactly as sent (port included when it is not
        the scheme default) — the form SigV4 must sign."""
        default = 443 if self._tls else 80
        return (self._host if self._port == default
                else f"{self._host}:{self._port}")

    # -- transport -----------------------------------------------------
    def _split(self, path: str) -> tuple[str, str]:
        rest = path.split("://", 1)[1]
        bucket, _, key = rest.partition("/")
        if not bucket:
            raise ValueError(f"no bucket in {path!r}")
        return bucket, key

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

    def _signed_headers(self, method: str, path: str, query: dict | None,
                        body: bytes | None,
                        headers: dict | None) -> dict:
        """The header set for one attempt. With credentials, SigV4 is
        computed fresh per attempt (x-amz-date moves) over the wire
        host, the single-encoded path, the decoded query pairs, and
        the payload; semantic caller headers (If-None-Match) are
        signed too, transport framing (Content-Length) is not —
        matching what AWS SDK clients sign."""
        headers = dict(headers or {})
        if self._creds is None:
            return headers
        framing = {k: v for k, v in headers.items()
                   if k.lower() == "content-length"}
        semantic = {k: v for k, v in headers.items()
                    if k.lower() != "content-length"}
        ak, sk = self._creds[0], self._creds[1]
        token = self._creds[2] if len(self._creds) == 3 else None
        signed = sigv4.sign_headers(
            method, self._wire_host, path, list((query or {}).items()),
            body, access_key=ak, secret_key=sk, region=self._region,
            service="s3", session_token=token, extra_headers=semantic)
        signed.update(framing)
        return signed

    def _request(self, method: str, bucket: str, key: str = "",
                 query: dict | None = None, body: bytes | None = None,
                 headers: dict | None = None):
        """One HTTP round trip over the thread's keep-alive connection;
        returns (status, headers, body). A failure retries once on a
        fresh connection for IDEMPOTENT requests — GET/HEAD/DELETE,
        listings, and unconditional PUTs (a full-object overwrite
        re-sent with the same bytes lands the same state), since a
        stale keep-alive socket is indistinguishable from a
        first-contact failure. CONDITIONAL puts never auto-retry at
        this layer: re-sending one is exactly the ambiguity
        ``create_exclusive`` must arbitrate itself."""
        path = "/" + urllib.parse.quote(bucket)
        if key:
            path += "/" + urllib.parse.quote(key)
        target = path
        if query:
            # quote (not quote_plus) so the wire form matches the
            # SigV4 canonical encoding (%20, never '+')
            target += "?" + urllib.parse.urlencode(
                query, quote_via=urllib.parse.quote)
        conditional = bool(headers and headers.get("If-None-Match"))
        cas = method == "PUT" and conditional
        attempts = 1 if cas else 2
        for i in range(attempts):
            # the CAS put always takes a FRESH connection: it cannot
            # transport-retry, so a stale keep-alive socket would turn
            # a healthy endpoint into a spurious ambiguous failure
            conn = self._conn(fresh=(i > 0 or cas))
            try:
                conn.request(method, target, body=body,
                             headers=self._signed_headers(
                                 method, path, query, body, headers))
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

    # -- the CAS primitive ----------------------------------------------
    def create_exclusive(self, path: str, data: bytes) -> bool:
        bucket, key = self._split(path)
        data = bytes(data)
        for _ in range(self._put_retries + 1):
            try:
                status, _, _ = self._request(
                    "PUT", bucket, key, body=data,
                    headers={"If-None-Match": "*",
                             "Content-Length": str(len(data))})
            except (TimeoutError, ConnectionError, http.client.HTTPException,
                    OSError):
                # AMBIGUOUS: the request may have been applied before
                # the response was lost. Log objects are writer-unique,
                # so a read-back settles it.
                current = self._get_or_none(bucket, key)
                if current is None:
                    continue  # never landed: the conditional put is
                    #           still safe to retry verbatim
                return current == data
            if status in (200, 201):
                return True
            if status in (409, 412):
                return False
            raise OSError(f"conditional PUT {path}: HTTP {status}")
        # retries exhausted with the object still absent: surface it —
        # returning False here could make BOTH racing writers believe
        # they lost, wedging the version counter
        raise OSError(f"conditional PUT {path}: endpoint unreachable")

    def _get_or_none(self, bucket: str, key: str) -> bytes | None:
        status, _, body = self._request("GET", bucket, key)
        if status == 404:
            return None
        if status == 200:
            return body
        raise OSError(f"GET s3://{bucket}/{key}: HTTP {status}")

    # -- plain object ops -------------------------------------------------
    def read_bytes(self, path: str) -> bytes:
        bucket, key = self._split(path)
        got = self._get_or_none(bucket, key)
        if got is None:
            raise FileNotFoundError(path)
        return got

    def write_bytes(self, path: str, data: bytes) -> None:
        bucket, key = self._split(path)
        status, _, _ = self._request(
            "PUT", bucket, key, body=bytes(data),
            headers={"Content-Length": str(len(data))})
        if status not in (200, 201):
            raise OSError(f"PUT {path}: HTTP {status}")

    def delete_file(self, path: str) -> None:
        bucket, key = self._split(path)
        if not self._head(bucket, key):
            raise FileNotFoundError(path)  # fsio contract (S3's DELETE
            #                                itself is idempotent-204)
        status, _, _ = self._request("DELETE", bucket, key)
        if status not in (200, 204):
            raise OSError(f"DELETE {path}: HTTP {status}")

    def _head(self, bucket: str, key: str) -> bool:
        status, _, _ = self._request("HEAD", bucket, key)
        if status == 200:
            return True
        if status == 404:
            return False
        raise OSError(f"HEAD s3://{bucket}/{key}: HTTP {status}")

    # -- listings ---------------------------------------------------------
    def _list(self, bucket: str, prefix: str, delimiter: str | None):
        """ListObjectsV2, fully drained across continuation pages.
        Yields ('key', key, mtime_epoch) and ('prefix', common_prefix,
        None) items."""
        token = None
        while True:
            q = {"list-type": "2", "prefix": prefix}
            if delimiter:
                q["delimiter"] = delimiter
            if token:
                q["continuation-token"] = token
            status, _, body = self._request("GET", bucket, query=q)
            if status != 200:
                raise OSError(f"LIST s3://{bucket}?prefix={prefix}: "
                              f"HTTP {status}")
            root = ET.fromstring(body)
            ns = ""
            if root.tag.startswith("{"):
                ns = root.tag.split("}", 1)[0] + "}"
            for c in root.findall(f"{ns}Contents"):
                key = c.findtext(f"{ns}Key")
                lm = c.findtext(f"{ns}LastModified")
                mtime = None
                if lm:
                    try:
                        from datetime import datetime

                        mtime = datetime.fromisoformat(
                            lm.replace("Z", "+00:00")).timestamp()
                    except ValueError:
                        mtime = parsedate_to_datetime(lm).timestamp()
                yield ("key", key, mtime)
            for p in root.findall(f"{ns}CommonPrefixes"):
                yield ("prefix", p.findtext(f"{ns}Prefix"), None)
            if root.findtext(f"{ns}IsTruncated") == "true":
                nxt = root.findtext(f"{ns}NextContinuationToken")
                if not nxt or nxt == token:
                    # a truncated page with no (or a stuck) token
                    # would re-fetch page 1 forever — surface it
                    raise OSError(
                        f"LIST s3://{bucket}?prefix={prefix}: "
                        "IsTruncated without a usable "
                        "NextContinuationToken")
                token = nxt
            else:
                return

    def _kprefix(self, key: str) -> str:
        return key.rstrip("/") + "/" if key else ""

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
        for kind, item, _ in self._list(bucket, p, "/"):
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
        for kind, item, _ in self._list(bucket, p, None):
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
            for kind, item, m in self._list(bucket, key, None):
                if kind == "key" and item == key and m is not None:
                    ts.append(m)
        for kind, _, m in self._list(bucket, self._kprefix(key), None):
            if kind == "key" and m is not None:
                ts.append(m)
        return max(ts) if ts else None

    def delete_dir(self, path: str) -> None:
        bucket, key = self._split(path)
        for kind, item, _ in list(self._list(bucket, self._kprefix(key),
                                             None)):
            if kind == "key":
                status, _, _ = self._request("DELETE", bucket, item)
                if status not in (200, 204):
                    raise OSError(f"DELETE s3://{bucket}/{item}: "
                                  f"HTTP {status}")

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
                     for kind, item, _ in self._list(sb, sp, None)
                     if kind == "key"]
            if not pairs:
                raise FileNotFoundError(src)
        for s, d in pairs:
            self.write_bytes(d, self.read_bytes(s))
            self.delete_file(s)
