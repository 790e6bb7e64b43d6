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

Transport retry discipline, connection pooling, pickling (for the
distributed data plane in operators/objstore_plane.py), and the
derived fsio directory surface live in operators/httpstore.py, shared
with the GCS backend (operators/gcshttp.py).

Tests drive this class against an in-process HTTP emulator
(dataflowtemplates_spark/testing/s3_emulator.py) covering the 412
path, the ambiguous-timeout path, list-after-put visibility, and
server-side SigV4 verification; the protocol property tests in
tests/test_commit_protocol.py parameterize over
{local O_EXCL, MemoryObjectStore, this backend, the GCS backend}.
"""

from __future__ import annotations

import http.client
import urllib.parse
import xml.etree.ElementTree as ET
from email.utils import parsedate_to_datetime

from dataflowtemplates_spark.operators import sigv4
from dataflowtemplates_spark.operators.httpstore import (
    DerivedObjectOps,
    HttpObjectTransport,
)


class S3HttpBackend(HttpObjectTransport, DerivedObjectOps):
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
        self._init_transport(endpoint, timeout_s)
        self._put_retries = int(put_retries)
        if credentials is not None and len(credentials) not in (2, 3):
            raise ValueError("credentials must be (access_key, "
                             "secret_key[, session_token])")
        self._creds = tuple(credentials) if credentials else None
        self._region = region

    # -- transport -----------------------------------------------------
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
                 headers: dict | None = None,
                 idempotent: bool | None = None):
        """One S3 REST call; returns (status, headers, body). A
        CONDITIONAL put (If-None-Match) is non-idempotent: no
        transport retry, always a fresh socket (httpstore discipline);
        everything else — GET/HEAD/DELETE, listings, unconditional
        full-object overwrites — retries once on a fresh connection.
        ``idempotent`` overrides the inference for protocol calls the
        transport must not retransmit (multipart start/complete)."""
        path = "/" + urllib.parse.quote(bucket)
        if key:
            path += "/" + urllib.parse.quote(key)
        target = path
        if query:
            # quote (not quote_plus) so the wire form matches the
            # SigV4 canonical encoding (%20, never '+')
            target += "?" + urllib.parse.urlencode(
                query, quote_via=urllib.parse.quote)
        if idempotent is None:
            idempotent = not (method == "PUT" and bool(
                headers and headers.get("If-None-Match")))
        return self._roundtrip(
            method, target, body,
            lambda: self._signed_headers(method, path, query, body,
                                         headers),
            idempotent=idempotent)

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

    # -- presigned URLs ----------------------------------------------------
    def presign(self, path: str, expires_s: int = 3600,
                method: str = "GET") -> str:
        """A SigV4 QUERY-authenticated URL for ``path``: any plain
        HTTP client can perform ``method`` on it until the grant
        expires, without holding credentials — the standard way to
        hand an exported artifact to a downstream consumer."""
        if self._creds is None:
            raise ValueError("presign requires credentials")
        bucket, key = self._split(path)
        epath = "/" + urllib.parse.quote(bucket)
        if key:
            epath += "/" + urllib.parse.quote(key)
        token = self._creds[2] if len(self._creds) == 3 else None
        qs = sigv4.presign_query(
            method, self._wire_host, epath, [],
            access_key=self._creds[0], secret_key=self._creds[1],
            region=self._region, expires_s=expires_s,
            session_token=token)
        scheme = "https" if self._tls else "http"
        return f"{scheme}://{self._wire_host}{epath}?{qs}"

    # -- multipart upload (the large-object write path) --------------------
    # Public S3 semantics: parts are staged server-side under an
    # UploadId and the COMPLETE call materializes the object
    # atomically (it appears in GETs/LISTs only then, overwriting any
    # previous object of that name like a plain PUT). Each call below
    # is an ordinary signed request; a transport failure during
    # COMPLETE is surfaced, not guessed — the data plane's part names
    # are deterministic, so the caller's task retry re-uploads and
    # re-completes the same object safely, and incomplete uploads are
    # abortable debris (real deployments add a bucket lifecycle rule).
    def multipart_start(self, path: str) -> str:
        bucket, key = self._split(path)
        # a retransmitted initiate would stage an orphan UploadId:
        # one attempt on a fresh socket, like the CAS
        status, _, body = self._request("POST", bucket, key,
                                        query={"uploads": ""},
                                        idempotent=False)
        if status != 200:
            raise OSError(f"CreateMultipartUpload {path}: HTTP {status}")
        root = ET.fromstring(body)
        ns = root.tag.split("}", 1)[0] + "}" if "{" in root.tag else ""
        uid = root.findtext(f"{ns}UploadId")
        if not uid:
            raise OSError(f"CreateMultipartUpload {path}: no UploadId")
        return uid

    def multipart_put_part(self, path: str, upload_id: str,
                           part_number: int, data: bytes) -> str:
        bucket, key = self._split(path)
        status, headers, _ = self._request(
            "PUT", bucket, key,
            query={"partNumber": str(int(part_number)),
                   "uploadId": upload_id},
            body=bytes(data),
            headers={"Content-Length": str(len(data))})
        if status != 200:
            raise OSError(f"UploadPart {path} #{part_number}: "
                          f"HTTP {status}")
        etag = {k.lower(): v for k, v in headers.items()}.get("etag", "")
        if not etag:
            raise OSError(f"UploadPart {path} #{part_number}: no ETag")
        return etag

    def multipart_complete(self, path: str, upload_id: str,
                           parts: list[tuple[int, str]]) -> None:
        bucket, key = self._split(path)
        body = "".join(
            f"<Part><PartNumber>{int(n)}</PartNumber>"
            f"<ETag>{etag}</ETag></Part>"
            for n, etag in sorted(parts))
        payload = (f"<CompleteMultipartUpload>{body}"
                   "</CompleteMultipartUpload>").encode()
        # COMPLETE consumes the UploadId: a transport retransmit of a
        # landed COMPLETE would read 404 NoSuchUpload and turn success
        # into a spurious failure — one attempt, surfaced, and the
        # caller's deterministic naming makes a task-level retry safe
        try:
            status, _, _ = self._request(
                "POST", bucket, key, query={"uploadId": upload_id},
                body=payload,
                headers={"Content-Length": str(len(payload))},
                idempotent=False)
        except (TimeoutError, ConnectionError,
                http.client.HTTPException, OSError) as exc:
            raise OSError(
                f"CompleteMultipartUpload {path}: response lost — the "
                "complete MAY have been applied (object live, UploadId "
                "consumed); abort is 404-tolerant and a task-level "
                "retry overwrites the deterministically named object "
                f"({exc})") from exc
        if status != 200:
            raise OSError(f"CompleteMultipartUpload {path}: "
                          f"HTTP {status}")

    def multipart_abort(self, path: str, upload_id: str) -> None:
        bucket, key = self._split(path)
        status, _, _ = self._request(
            "DELETE", bucket, key, query={"uploadId": upload_id})
        if status not in (200, 204, 404):
            raise OSError(f"AbortMultipartUpload {path}: HTTP {status}")

    #: S3's published minimum size for every part but the last —
    #: smaller intermediate parts fail CompleteMultipartUpload with
    #: EntityTooSmall on the real service
    MIN_PART_BYTES = 5 * 1024 * 1024

    def open_write(self, path: str, part_bytes: int = 8 * 1024 * 1024):
        """File-like streaming sink: buffers up to ``part_bytes``
        (clamped UP to the service's 5 MiB part minimum), then
        switches to a multipart upload so memory stays bounded however
        large the object grows; an object that finishes under one part
        lands as a single plain PUT (1 round trip, not 3)."""
        if int(part_bytes) <= 0:
            raise ValueError("part_bytes must be positive")
        return _MultipartSink(self, path,
                              max(int(part_bytes), self.MIN_PART_BYTES))

    # -- service primitives (DerivedObjectOps contract) -------------------
    def _get_or_none(self, bucket: str, key: str) -> bytes | None:
        status, _, body = self._request("GET", bucket, key)
        if status == 404:
            return None
        if status == 200:
            return body
        raise OSError(f"GET s3://{bucket}/{key}: HTTP {status}")

    def _get_ranged(self, bucket: str, key: str, range_value: str):
        """Object GET with a ``Range`` header (signed like any other
        semantic header) — the primitive behind read_tail/read_range."""
        return self._request("GET", bucket, key,
                             headers={"Range": range_value})

    def _put_object(self, bucket: str, key: str, data: bytes) -> None:
        status, _, _ = self._request(
            "PUT", bucket, key, body=data,
            headers={"Content-Length": str(len(data))})
        if status not in (200, 201):
            raise OSError(f"PUT s3://{bucket}/{key}: HTTP {status}")

    def _delete_object(self, bucket: str, key: str) -> None:
        status, _, _ = self._request("DELETE", bucket, key)
        if status not in (200, 204, 404):
            raise OSError(f"DELETE s3://{bucket}/{key}: HTTP {status}")

    def _head(self, bucket: str, key: str) -> bool:
        status, _, _ = self._request("HEAD", bucket, key)
        if status == 200:
            return True
        if status == 404:
            return False
        raise OSError(f"HEAD s3://{bucket}/{key}: HTTP {status}")

    def _list(self, bucket: str, prefix: str, delimiter: str | None):
        """ListObjectsV2, fully drained across continuation pages.
        Yields ('key', key, mtime_epoch, size_bytes) and
        ('prefix', common_prefix, None, None) items; size comes from
        the response's <Size> (None when a server omits it)."""
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
                sz = c.findtext(f"{ns}Size")
                yield ("key", key, mtime,
                       int(sz) if sz and sz.isdigit() else None)
            for p in root.findall(f"{ns}CommonPrefixes"):
                yield ("prefix", p.findtext(f"{ns}Prefix"), None, None)
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


class _MultipartSink:
    """File-like object (write/tell/close) streaming to
    :meth:`S3HttpBackend.open_write`'s contract. Used by the data
    plane as a ParquetWriter sink: rows stream through bounded memory
    regardless of final object size. ``close()`` finalizes (single
    PUT below one part, CompleteMultipartUpload above); an exception
    path calls :meth:`abandon` to abort the staged upload."""

    def __init__(self, backend: S3HttpBackend, path: str,
                 part_bytes: int):
        if int(part_bytes) <= 0:
            raise ValueError("part_bytes must be positive")
        self._backend = backend
        self._path = path
        self._part_bytes = int(part_bytes)
        self._buf = bytearray()
        self._total = 0
        self._upload_id: str | None = None
        self._parts: list[tuple[int, str]] = []
        self._closed = False

    def write(self, data) -> int:
        mv = memoryview(data)
        self._buf.extend(mv)  # buffer-protocol append, no bytes() copy
        self._total += mv.nbytes
        while len(self._buf) >= self._part_bytes:
            self._flush_part(self._part_bytes)
        return mv.nbytes

    def _flush_part(self, n: int) -> None:
        if self._upload_id is None:
            self._upload_id = self._backend.multipart_start(self._path)
        chunk, self._buf = bytes(self._buf[:n]), self._buf[n:]
        num = len(self._parts) + 1
        self._parts.append(
            (num, self._backend.multipart_put_part(
                self._path, self._upload_id, num, chunk)))

    def tell(self) -> int:
        return self._total

    # file-like protocol bits pyarrow's PythonFile wrapper may probe
    mode = "wb"

    def flush(self) -> None:
        pass

    def readable(self) -> bool:
        return False

    def writable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return False

    @property
    def closed(self) -> bool:
        return self._closed

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self._upload_id is None:
            # never crossed one part: a plain PUT is cheaper and
            # equally atomic
            self._backend.write_bytes(self._path, bytes(self._buf))
            return
        if self._buf:
            self._flush_part(len(self._buf))
        self._backend.multipart_complete(self._path, self._upload_id,
                                         self._parts)

    def abandon(self) -> None:
        """Abort instead of finalize (error-path cleanup)."""
        self._closed = True
        if self._upload_id is not None:
            self._backend.multipart_abort(self._path, self._upload_id)

    # context-manager sugar for direct users; the plane calls
    # close()/abandon() explicitly
    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is not None:
            self.abandon()
        else:
            self.close()
