"""In-process S3 REST emulator (test/audit infrastructure, not a
production component).

A ``ThreadingHTTPServer`` speaking the subset of the S3 API that
``operators/s3http.S3HttpBackend`` uses: PutObject (with the
``If-None-Match: *`` conditional-write header), GetObject,
DeleteObject, HeadObject, and ListObjectsV2 (prefix + delimiter +
2-item pages so pagination is actually exercised). Storage is a flat
key->bytes dict guarded by one lock — conditional puts are atomic the
way the real service's are.

Fault injection for the commit protocol's failure modes:

* ``emu.drop_response_next_put = True`` — the NEXT PUT is fully
  APPLIED server-side, then the socket closes without a response:
  the client sees a timeout/connection error while the put landed
  (the ambiguous-timeout case the backend must disambiguate by
  reading back).
* ``emu.reject_next_put = n`` — the next ``n`` PUTs return 500
  without applying (transient server error).
* ``emu.omit_continuation_token = True`` — a truncated listing page
  without a continuation token (a misbehaving store): the client
  must raise, not loop forever.

AUTH: set ``emu.require_sigv4 = (access_key, secret_key)`` and every
request must carry a valid AWS Signature Version 4 ``Authorization``
header — verified server-side with :func:`operators.sigv4.verify`
(recomputed from the raw request target, the received headers named in
``SignedHeaders``, and the actual body against the signed
``x-amz-content-sha256``). A missing or wrong signature gets the real
service's ``403 SignatureDoesNotMatch``, so the backend tests prove
the signer over live traffic instead of trusting it by construction.

Listing is strongly consistent with puts (list-after-put visibility),
matching S3's documented model since 2020 — a test asserts it, since
the reclaim/fold logic depends on it.
"""

from __future__ import annotations

import threading
import urllib.parse
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from xml.sax.saxutils import escape as _xml

from dataflowtemplates_spark.operators import sigv4
from dataflowtemplates_spark.testing.listing import paginate
from dataflowtemplates_spark.testing.rangeserve import serve_object_get


class S3Emulator:
    def __init__(self):
        self._objects: dict[str, bytes] = {}
        self._mtimes: dict[str, float] = {}
        self._lock = threading.Lock()
        self.drop_response_next_put = False
        #: same ambiguous-timeout fault on the multipart legs: the
        #: NEXT UploadPart / CompleteMultipartUpload is fully APPLIED
        #: (part staged / object materialized + UploadId consumed),
        #: then the socket closes without a response
        self.drop_response_next_part = False
        self.drop_response_next_complete = False
        self.reject_next_put = 0
        self.omit_continuation_token = False
        #: (access_key, secret_key) -> every request must carry a
        #: valid SigV4 signature; None -> unsigned requests accepted
        self.require_sigv4: tuple[str, str] | None = None
        #: staged multipart uploads: (key, upload_id) -> {part_n: bytes}
        self._uploads: dict[tuple[str, str], dict[int, bytes]] = {}
        self._upload_seq = 0
        #: observability for tests: completed multipart object count
        self.multipart_completed = 0
        #: observability: total object-GET payload bytes served (both
        #: whole-object 200s and ranged 206s) — the counter the
        #: column-pruning economics tests assert against
        self.object_get_bytes = 0
        #: the real service's 5 MiB floor for every part but the last
        #: (EntityTooSmall at Complete otherwise); tests exercising
        #: chunk mechanics cheaply may lower it
        self.min_part_bytes = 5 * 1024 * 1024
        emu = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"
            # status+headers and body leave as two small writes; with
            # Nagle on, the body write stalls behind the client's
            # delayed ACK (~40ms per response on loopback — measured
            # 42ms/request on LIST pages). TCP_NODELAY removes a pure
            # measurement artifact; request handling is unchanged.
            disable_nagle_algorithm = True

            def log_message(self, *a):  # keep pytest output clean
                pass

            def _key(self):
                u = urllib.parse.urlparse(self.path)
                # keep_blank_values: flag-style params (?uploads=)
                # must survive parsing, like the real service
                return (urllib.parse.unquote(u.path.lstrip("/")),
                        urllib.parse.parse_qs(u.query,
                                              keep_blank_values=True))

            def _send(self, status, body=b"", ctype="application/xml"):
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _authorized(self, method: str, payload: bytes) -> bool:
                """SigV4 check against the raw request — header auth
                or a presigned query grant; 403 on failure exactly
                like the live service."""
                want = emu.require_sigv4
                if want is None:
                    return True
                if "X-Amz-Signature" in self.path:
                    ok, reason = sigv4.verify_presigned(
                        method, self.path,
                        self.headers.get("Host", ""),
                        secret_key=want[1], access_key=want[0])
                else:
                    ok, reason = sigv4.verify(
                        method, self.path, dict(self.headers.items()),
                        payload, secret_key=want[1],
                        access_key=want[0])
                if not ok:
                    self._send(403, (
                        "<Error><Code>SignatureDoesNotMatch</Code>"
                        f"<Message>{reason}</Message></Error>"
                    ).encode())
                return ok

            def do_POST(self):
                """Multipart: ?uploads = CreateMultipartUpload,
                ?uploadId = CompleteMultipartUpload (atomic
                materialization under the lock, like the service)."""
                key, q = self._key()
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                if not self._authorized("POST", data):
                    return
                if "uploads" in q:
                    with emu._lock:
                        emu._upload_seq += 1
                        uid = f"up-{emu._upload_seq:06d}"
                        emu._uploads[(key, uid)] = {}
                    self._send(200, (
                        "<?xml version='1.0'?>"
                        "<InitiateMultipartUploadResult>"
                        f"<Key>{_xml(key)}</Key><UploadId>{uid}</UploadId>"
                        "</InitiateMultipartUploadResult>").encode())
                    return
                uid = q.get("uploadId", [None])[0]
                if uid is None:
                    self._send(400, b"<Error><Code>InvalidRequest"
                                    b"</Code></Error>")
                    return
                import hashlib
                import re
                import time

                want = [(int(m.group(1)), m.group(2)) for m in re.finditer(
                    r"<PartNumber>(\d+)</PartNumber>\s*"
                    r"<ETag>([^<]*)</ETag>", data.decode())]
                with emu._lock:
                    parts = emu._uploads.get((key, uid))
                    if parts is None:
                        self._send(404, b"<Error><Code>NoSuchUpload"
                                        b"</Code></Error>")
                        return
                    for i, (num, etag) in enumerate(sorted(want)):
                        have = parts.get(num)
                        if have is None or etag.strip('"') != \
                                hashlib.md5(have).hexdigest():
                            self._send(400, b"<Error><Code>InvalidPart"
                                            b"</Code></Error>")
                            return
                        if (i + 1 < len(want)
                                and len(have) < emu.min_part_bytes):
                            self._send(400, b"<Error><Code>"
                                            b"EntityTooSmall</Code>"
                                            b"</Error>")
                            return
                    emu._objects[key] = b"".join(
                        parts[num] for num, _ in sorted(want))
                    emu._mtimes[key] = time.time()
                    del emu._uploads[(key, uid)]
                    emu.multipart_completed += 1
                    drop = emu.drop_response_next_complete
                    if drop:
                        emu.drop_response_next_complete = False
                if drop:
                    # COMPLETE applied (object live, UploadId consumed)
                    # but the response is lost — the ambiguity the
                    # caller must survive via deterministic naming
                    self.close_connection = True
                    self.connection.close()
                    return
                self._send(200, (
                    "<?xml version='1.0'?>"
                    "<CompleteMultipartUploadResult>"
                    f"<Key>{_xml(key)}</Key>"
                    "</CompleteMultipartUploadResult>").encode())

            def do_PUT(self):
                key, q = self._key()
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                if not self._authorized("PUT", data):
                    return
                if "partNumber" in q and "uploadId" in q:
                    import hashlib

                    uid = q["uploadId"][0]
                    num = int(q["partNumber"][0])
                    with emu._lock:
                        parts = emu._uploads.get((key, uid))
                        if parts is None:
                            self._send(404, b"<Error><Code>NoSuchUpload"
                                            b"</Code></Error>")
                            return
                        parts[num] = data
                        drop = emu.drop_response_next_part
                        if drop:
                            emu.drop_response_next_part = False
                    if drop:
                        # part staged, response lost: re-PUTting the
                        # same partNumber is service-idempotent
                        self.close_connection = True
                        self.connection.close()
                        return
                    self.send_response(200)
                    self.send_header(
                        "ETag", f'"{hashlib.md5(data).hexdigest()}"')
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                conditional = self.headers.get("If-None-Match") == "*"
                with emu._lock:
                    if emu.reject_next_put > 0:
                        emu.reject_next_put -= 1
                        self._send(500, b"<Error>transient</Error>")
                        return
                    if conditional and key in emu._objects:
                        self._send(412, b"<Error><Code>PreconditionFailed"
                                        b"</Code></Error>")
                        return
                    import time

                    emu._objects[key] = data
                    emu._mtimes[key] = time.time()
                    drop = emu.drop_response_next_put
                    if drop:
                        emu.drop_response_next_put = False
                if drop:
                    # applied, but the response is lost: hard-close the
                    # socket so the client sees a connection error
                    self.close_connection = True
                    self.connection.close()
                    return
                self._send(200)

            def do_GET(self):
                if not self._authorized("GET", b""):
                    return
                key, q = self._key()
                if "list-type" in q:
                    self._list(key, q)
                    return
                with emu._lock:
                    data = emu._objects.get(key)
                if data is None:
                    self._send(404, b"<Error><Code>NoSuchKey</Code>"
                                    b"</Error>")
                    return
                def count(n):
                    with emu._lock:
                        emu.object_get_bytes += n

                if serve_object_get(self, data, count) == "bad-range":
                    self._send(400, b"<Error><Code>InvalidRange"
                                    b"</Code></Error>")

            def _list(self, bucket_path, q):
                bucket = bucket_path.split("/", 1)[0]
                prefix = q.get("prefix", [""])[0]
                delim = q.get("delimiter", [None])[0]
                token = q.get("continuation-token", [""])[0]
                with emu._lock:
                    keys = sorted(
                        k[len(bucket) + 1:] for k in emu._objects
                        if k.startswith(bucket + "/")
                        and k[len(bucket) + 1:].startswith(prefix))
                    stamps = [
                        (emu._mtimes.get(f"{bucket}/{rel}", 0.0),
                         len(emu._objects.get(f"{bucket}/{rel}", b"")))
                        for rel in keys]
                contents, prefixes, nxt = paginate(
                    keys, stamps, prefix, delim,
                    int(token) if token else 0,
                    page=2)  # tiny pages: pagination always exercised
                parts = ["<?xml version='1.0'?><ListBucketResult>"]
                for rel, (ts, size) in contents:
                    lm = datetime.fromtimestamp(
                        ts, tz=timezone.utc).isoformat().replace(
                        "+00:00", "Z")
                    parts.append(
                        f"<Contents><Key>{_xml(rel)}</Key>"
                        f"<LastModified>{lm}</LastModified>"
                        f"<Size>{size}</Size></Contents>")
                for cp in prefixes:
                    parts.append(f"<CommonPrefixes><Prefix>{_xml(cp)}"
                                 f"</Prefix></CommonPrefixes>")
                parts.append(
                    f"<IsTruncated>{'true' if nxt is not None else 'false'}"
                    f"</IsTruncated>")
                if nxt is not None and not emu.omit_continuation_token:
                    parts.append(f"<NextContinuationToken>{nxt}"
                                 f"</NextContinuationToken>")
                parts.append("</ListBucketResult>")
                self._send(200, "".join(parts).encode())

            def do_HEAD(self):
                # HEAD responses carry no body — including the 403
                if emu.require_sigv4 is not None:
                    ok, _ = sigv4.verify(
                        "HEAD", self.path, dict(self.headers.items()),
                        b"", secret_key=emu.require_sigv4[1],
                        access_key=emu.require_sigv4[0])
                    if not ok:
                        self.send_response(403)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                key, _ = self._key()
                with emu._lock:
                    ok = key in emu._objects
                self.send_response(200 if ok else 404)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_DELETE(self):
                if not self._authorized("DELETE", b""):
                    return
                key, q = self._key()
                uid = q.get("uploadId", [None])[0]
                if uid is not None:  # AbortMultipartUpload
                    with emu._lock:
                        emu._uploads.pop((key, uid), None)
                    self._send(204)
                    return
                with emu._lock:
                    emu._objects.pop(key, None)
                    emu._mtimes.pop(key, None)
                self._send(204)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    @property
    def endpoint(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def start(self) -> "S3Emulator":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
