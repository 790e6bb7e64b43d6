"""HTTP-level GCS-compatible object-store backend for the fsio seam.

``GcsHttpBackend`` serves ``gs://bucket/key`` paths over the public
Google Cloud Storage JSON API using only the standard library —
register it with :func:`fsio.register_object_backend` and the
KeyedTable commit protocol (operators/mutations.py) runs its metadata
CAS against GCS generation preconditions. The CAS shape differs from
S3's in a way the commit protocol can exploit:

* **Conditional create** — media upload
  (``POST /upload/storage/v1/b/{bucket}/o?uploadType=media&name=...``)
  with ``ifGenerationMatch=0``: generation 0 means "no live object",
  so ``200`` = this writer created it, ``412 Precondition Failed`` =
  it already existed. This is the ``create_exclusive`` primitive, the
  exact twin of S3's ``If-None-Match: *``.
* **Conditional OVERWRITE** — ``ifGenerationMatch=<current>``: replace
  the object only if its generation is still the one this writer
  read. S3's If-None-Match cannot express this; GCS's generation
  numbers make read-modify-write CAS-able
  (:meth:`replace_if_generation` / :meth:`generation_of`), which a
  compact-in-place maintenance job can use where S3 deployments must
  round-trip through a fresh object name.
* **Ambiguous timeout after upload** — on the CREATE shape, the same
  read-back disambiguation as the S3 backend (commit-log objects are
  writer-unique, so byte-equality on read-back = our upload landed);
  on the REPLACE shape payloads are not writer-unique, so a lost
  response RAISES for the caller to re-read the generation — never a
  guessed win/loss.
* **Listing** — ``GET /storage/v1/b/{bucket}/o`` with
  ``prefix``/``delimiter``/``pageToken``; ``updated`` stamps back
  ``newest_mtime_under``. The JSON API signals "more pages" only by
  the presence of ``nextPageToken``; a REPEATED token (a misbehaving
  store would loop this client forever) raises.

AUTH: pass ``bearer_token=...`` and every request carries
``Authorization: Bearer <token>`` (the JSON API's OAuth2 scheme; token
acquisition — service-account JWT exchange or metadata-server fetch —
is deployment plumbing outside this module). 401/403 surface as
OSError, never as a CAS loss. :meth:`presign` additionally issues V4
signed URLs from an HMAC service-account key (GCS's published
AWS-interoperable signing) so artifacts can be handed to
credential-less consumers — the S3 backend's ``presign`` twin.

Transport retry discipline, pickling, and the derived fsio directory
surface are shared with the S3 backend via operators/httpstore.py.
Tests drive this class against an in-process emulator
(dataflowtemplates_spark/testing/gcs_emulator.py) with the same fault
injection as the S3 twin; the commit-protocol property tests
parameterize over both HTTP backends.
"""

from __future__ import annotations

import http.client
import json
import urllib.parse
from datetime import datetime

from dataflowtemplates_spark.operators import sigv4
from dataflowtemplates_spark.operators.httpstore import (
    DerivedObjectOps,
    HttpObjectTransport,
)


class GcsHttpBackend(HttpObjectTransport, DerivedObjectOps):
    """fsio object-store backend speaking the GCS JSON API to
    ``endpoint`` (e.g. ``http://127.0.0.1:4443`` for an emulator or
    ``https://storage.googleapis.com``). Paths are full
    ``scheme://bucket/key`` URIs."""

    distributed = True  # picklable; executors may talk to it directly

    def __init__(self, endpoint: str, timeout_s: float = 10.0,
                 put_retries: int = 2, bearer_token: str | None = None,
                 hmac_key: tuple[str, str] | None = None,
                 region: str = "auto"):
        self._init_transport(endpoint, timeout_s)
        self._put_retries = int(put_retries)
        self._token = bearer_token
        #: (access_id, secret) HMAC service-account key — only needed
        #: for :meth:`presign`; day-to-day JSON-API auth is the bearer
        self._hmac_key = hmac_key
        self._region = region

    # -- transport -------------------------------------------------------
    def _headers(self, extra: dict | None = None) -> dict:
        h = dict(extra or {})
        if self._token:
            h["Authorization"] = f"Bearer {self._token}"
        return h

    def _obj_path(self, bucket: str, key: str) -> str:
        return (f"/storage/v1/b/{urllib.parse.quote(bucket, safe='')}"
                f"/o/{urllib.parse.quote(key, safe='')}")

    def _request(self, method: str, target: str,
                 body: bytes | None = None, headers: dict | None = None,
                 idempotent: bool = True):
        return self._roundtrip(
            method, target, body,
            lambda: self._headers(headers), idempotent=idempotent)

    # -- uploads -----------------------------------------------------------
    def _upload_target(self, bucket: str, key: str,
                       generation_match: int | None) -> str:
        q = [("uploadType", "media"), ("name", key)]
        if generation_match is not None:
            q.append(("ifGenerationMatch", str(generation_match)))
        return (f"/upload/storage/v1/b/"
                f"{urllib.parse.quote(bucket, safe='')}/o?"
                + urllib.parse.urlencode(q, quote_via=urllib.parse.quote))

    def _conditional_upload(self, path: str, data: bytes,
                            generation_match: int) -> bool:
        """Shared CAS body for create (generation 0) and replace
        (generation N): True on win, False on a 412 precondition loss,
        OSError on anything that is neither (a 5xx must never read as
        a loss). A LOST RESPONSE is arbitrated differently per shape:

        * create — the commit protocol's objects are writer-unique,
          so a read-back settles it (absent = retry verbatim, our
          bytes = win, other bytes = loss);
        * replace — payloads are NOT writer-unique (two maintenance
          jobs can compute identical bytes), so byte-equality proves
          nothing in either direction: the ambiguity is RAISED for
          the caller to resolve by re-reading the generation, never
          guessed into a false win/loss."""
        bucket, key = self._split(path)
        data = bytes(data)
        target = self._upload_target(bucket, key, generation_match)
        for _ in range(self._put_retries + 1):
            try:
                status, _, _ = self._request(
                    "POST", target, body=data,
                    headers={"Content-Length": str(len(data))},
                    idempotent=False)  # the CAS never transport-retries
            except (TimeoutError, ConnectionError,
                    http.client.HTTPException, OSError) as exc:
                if generation_match != 0:
                    raise OSError(
                        f"conditional replace {path} at generation "
                        f"{generation_match}: response lost and replace "
                        "payloads are not writer-unique — re-read the "
                        f"generation and retry ({exc})") from exc
                current = self._get_or_none(bucket, key)
                if current is None:
                    continue  # never landed: safe to retry verbatim
                return current == data  # writer-unique objects
            if status in (200, 201):
                return True
            if status == 412:
                return False
            raise OSError(f"conditional upload {path}: HTTP {status}")
        raise OSError(f"conditional upload {path}: endpoint unreachable")

    # -- the CAS primitives -------------------------------------------------
    def create_exclusive(self, path: str, data: bytes) -> bool:
        return self._conditional_upload(path, data, 0)

    def generation_of(self, path: str) -> int | None:
        """Current generation number, None if the object is absent —
        the read half of a generation-match read-modify-write."""
        bucket, key = self._split(path)
        status, _, body = self._request(
            "GET", self._obj_path(bucket, key))
        if status == 404:
            return None
        if status != 200:
            raise OSError(f"STAT {path}: HTTP {status}")
        return int(json.loads(body)["generation"])

    def replace_if_generation(self, path: str, data: bytes,
                              generation: int) -> bool:
        """Conditional OVERWRITE: replace ``path`` only if its live
        generation is still ``generation`` (GCS's CAS shape S3's
        If-None-Match cannot express). True = replaced; False = a
        rival moved the generation first."""
        if int(generation) <= 0:
            raise ValueError("generation must be a live (positive) "
                             "generation; use create_exclusive for "
                             "create-if-absent")
        return self._conditional_upload(path, data, int(generation))

    # -- signed URLs --------------------------------------------------------
    def presign(self, path: str, expires_s: int = 3600,
                method: str = "GET") -> str:
        """A GCS V4 signed URL for ``path``: any plain HTTP client can
        perform ``method`` on it until the grant expires, without
        holding credentials — the S3 ``presign`` twin. Uses the
        published V4 signing algorithm with HMAC service-account keys
        (``GOOG4-HMAC-SHA256`` / ``X-Goog-*`` query params) over the
        XML-API path style ``/bucket/object`` — the address form GCS
        documents for signed URLs (the JSON API does not take them)."""
        if self._hmac_key is None:
            raise ValueError("presign requires an HMAC key "
                             "(hmac_key=(access_id, secret))")
        bucket, key = self._split(path)
        epath = "/" + urllib.parse.quote(bucket)
        if key:
            epath += "/" + urllib.parse.quote(key)
        qs = sigv4.presign_query(
            method, self._wire_host, epath, [],
            access_key=self._hmac_key[0], secret_key=self._hmac_key[1],
            region=self._region, service="storage",
            expires_s=expires_s, flavor="goog")
        scheme = "https" if self._tls else "http"
        return f"{scheme}://{self._wire_host}{epath}?{qs}"

    # -- resumable upload (the large-object write path) --------------------
    # Public JSON API semantics: an initiate POST returns a session
    # URI; chunks PUT to it with Content-Range answer 308 until the
    # final chunk (whose range carries the total) materializes the
    # object atomically — GCS's twin of S3 multipart. Intermediate
    # chunks must be 256 KiB multiples per the published contract;
    # :meth:`open_write` rounds part_bytes up accordingly.
    _CHUNK_QUANTUM = 256 * 1024

    def resumable_start(self, path: str) -> str:
        bucket, key = self._split(path)
        target = (f"/upload/storage/v1/b/"
                  f"{urllib.parse.quote(bucket, safe='')}/o?"
                  + urllib.parse.urlencode(
                      [("uploadType", "resumable"), ("name", key)],
                      quote_via=urllib.parse.quote))
        # a retransmitted initiate would leak an orphan session:
        # one attempt on a fresh socket
        status, headers, _ = self._request(
            "POST", target, body=b"",
            headers={"Content-Length": "0"}, idempotent=False)
        if status != 200:
            raise OSError(f"resumable initiate {path}: HTTP {status}")
        loc = {k.lower(): v for k, v in headers.items()}.get("location")
        if not loc:
            raise OSError(f"resumable initiate {path}: no Location")
        u = urllib.parse.urlparse(loc)
        if u.netloc and u.netloc != self._wire_host:
            # chunks are sent over THIS backend's connection — a
            # session homed elsewhere would 404 (or hit a wrong
            # resource); surface it instead of assuming
            raise OSError(
                f"resumable initiate {path}: session Location "
                f"{loc!r} is not on endpoint {self._wire_host!r}")
        return u.path + (f"?{u.query}" if u.query else "")

    def resumable_put_chunk(self, session: str, start: int,
                            data: bytes, total: int | None) -> int:
        """One chunk: ``total`` is None for intermediate chunks
        (``bytes a-b/*``, expect 308) and the object size for the
        final one (expect 200/201). A zero-byte finalize — the object
        size was an exact chunk multiple — uses the contract's
        ``bytes */TOTAL`` form (a dashed range with end < start is
        invalid and real GCS rejects it). One transport attempt: a
        retransmitted chunk after a lost response would no longer
        continue the session and read as a spurious range error."""
        if not data:
            if total is None:
                raise ValueError("zero-byte chunk only as finalize")
            rng = f"bytes */{int(total)}"
        else:
            end = start + len(data) - 1
            rng = (f"bytes {start}-{end}/"
                   f"{'*' if total is None else int(total)}")
        try:
            status, _, _ = self._request(
                "PUT", session, body=bytes(data),
                headers={"Content-Length": str(len(data)),
                         "Content-Range": rng}, idempotent=False)
        except (TimeoutError, ConnectionError,
                http.client.HTTPException, OSError) as exc:
            raise OSError(
                f"resumable chunk {rng}: response lost — a finalize "
                "MAY have been applied (object live, session "
                "consumed); abort is tolerant and a task-level retry "
                "overwrites the deterministically named object "
                f"({exc})") from exc
        expect = (308,) if total is None else (200, 201)
        if status not in expect:
            raise OSError(f"resumable chunk {rng} -> HTTP {status}")
        return status

    def resumable_abort(self, session: str) -> None:
        status, _, _ = self._request("DELETE", session)
        if status not in (200, 204, 404, 499):
            raise OSError(f"resumable abort: HTTP {status}")

    def open_write(self, path: str, part_bytes: int = 8 * 1024 * 1024):
        """File-like streaming sink over the resumable protocol: under
        one chunk it collapses to a single media upload; above, chunks
        stream at ``part_bytes`` (rounded up to the 256 KiB quantum
        the published contract requires of intermediate chunks)."""
        if int(part_bytes) <= 0:
            raise ValueError("part_bytes must be positive")
        q = self._CHUNK_QUANTUM
        return _ResumableSink(self, path, ((int(part_bytes) + q - 1)
                                           // q) * q)

    # -- service primitives (DerivedObjectOps contract) -------------------
    def _get_or_none(self, bucket: str, key: str) -> bytes | None:
        status, _, body = self._request(
            "GET", self._obj_path(bucket, key) + "?alt=media")
        if status == 404:
            return None
        if status == 200:
            return body
        raise OSError(f"GET gs://{bucket}/{key}: HTTP {status}")

    def _get_ranged(self, bucket: str, key: str, range_value: str):
        """Media download with a ``Range`` header — the primitive
        behind read_tail/read_range (same RFC 9110 semantics as S3)."""
        return self._request(
            "GET", self._obj_path(bucket, key) + "?alt=media",
            headers={"Range": range_value})

    def _head(self, bucket: str, key: str) -> bool:
        status, _, _ = self._request("GET", self._obj_path(bucket, key))
        if status == 200:
            return True
        if status == 404:
            return False
        raise OSError(f"STAT gs://{bucket}/{key}: HTTP {status}")

    def _put_object(self, bucket: str, key: str, data: bytes) -> None:
        status, _, _ = self._request(
            "POST", self._upload_target(bucket, key, None), body=data,
            headers={"Content-Length": str(len(data))})
        if status not in (200, 201):
            raise OSError(f"UPLOAD gs://{bucket}/{key}: HTTP {status}")

    def _delete_object(self, bucket: str, key: str) -> None:
        status, _, _ = self._request(
            "DELETE", self._obj_path(bucket, key))
        if status not in (200, 204, 404):
            raise OSError(f"DELETE gs://{bucket}/{key}: HTTP {status}")

    def _list(self, bucket: str, prefix: str, delimiter: str | None):
        """Objects listing, fully depaginated. Yields
        ('key', key, mtime_epoch, size_bytes) and
        ('prefix', p, None, None); size comes from the item's
        ``size`` field (None when a server omits it)."""
        token = None
        seen_tokens = set()
        while True:
            q = [("prefix", prefix)]
            if delimiter:
                q.append(("delimiter", delimiter))
            if token:
                q.append(("pageToken", token))
            target = (f"/storage/v1/b/"
                      f"{urllib.parse.quote(bucket, safe='')}/o?"
                      + urllib.parse.urlencode(
                          q, quote_via=urllib.parse.quote))
            status, _, body = self._request("GET", target)
            if status != 200:
                raise OSError(f"LIST gs://{bucket}?prefix={prefix}: "
                              f"HTTP {status}")
            doc = json.loads(body)
            for item in doc.get("items", []):
                mtime = None
                upd = item.get("updated")
                if upd:
                    mtime = datetime.fromisoformat(
                        upd.replace("Z", "+00:00")).timestamp()
                sz = item.get("size")
                yield ("key", item["name"], mtime,
                       int(sz) if sz is not None else None)
            for p in doc.get("prefixes", []):
                yield ("prefix", p, None, None)
            token = doc.get("nextPageToken")
            if not token:
                return
            if token in seen_tokens:
                # the JSON API has no IsTruncated flag — the only
                # infinite-loop hazard is a REPEATED token; surface it
                raise OSError(
                    f"LIST gs://{bucket}?prefix={prefix}: repeated "
                    f"nextPageToken {token!r}")
            seen_tokens.add(token)


class _ResumableSink:
    """File-like object (write/tell/close) over
    :meth:`GcsHttpBackend.open_write`'s contract — the GCS twin of the
    S3 multipart sink: rows stream through bounded memory; the final
    chunk materializes the object atomically; ``abandon()`` aborts the
    session on the error path."""

    def __init__(self, backend: GcsHttpBackend, path: str,
                 chunk_bytes: int):
        if int(chunk_bytes) <= 0:
            raise ValueError("chunk_bytes must be positive")
        self._backend = backend
        self._path = path
        self._chunk = int(chunk_bytes)
        self._buf = bytearray()
        self._sent = 0
        self._session: str | None = None
        self._closed = False

    def write(self, data) -> int:
        mv = memoryview(data)
        self._buf.extend(mv)  # buffer-protocol append, no bytes() copy
        while len(self._buf) >= self._chunk:
            if self._session is None:
                self._session = self._backend.resumable_start(self._path)
            chunk, self._buf = (bytes(self._buf[:self._chunk]),
                                self._buf[self._chunk:])
            self._backend.resumable_put_chunk(
                self._session, self._sent, chunk, total=None)
            self._sent += len(chunk)
        return mv.nbytes

    def tell(self) -> int:
        return self._sent + len(self._buf)

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
        if self._session is None:
            # never crossed one chunk: one media upload is cheaper
            self._backend.write_bytes(self._path, bytes(self._buf))
            return
        self._backend.resumable_put_chunk(
            self._session, self._sent, bytes(self._buf),
            total=self._sent + len(self._buf))

    def abandon(self) -> None:
        """Abort instead of finalize (error-path cleanup)."""
        self._closed = True
        if self._session is not None:
            self._backend.resumable_abort(self._session)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is not None:
            self.abandon()
        else:
            self.close()
