"""In-process GCS JSON API emulator (test/audit infrastructure).

A ``ThreadingHTTPServer`` speaking the subset of the Cloud Storage
JSON API that ``operators/gcshttp.GcsHttpBackend`` uses: media upload
with ``ifGenerationMatch`` preconditions (0 = create-only, N =
replace-at-generation — evaluated atomically under one lock, the way
the real service's preconditions are), object get (``alt=media``) /
metadata / delete, and objects listing with
``prefix``/``delimiter``/``pageToken`` (2-item pages so pagination is
always exercised). Every object carries a GENERATION number that
bumps on each write — the emulator's whole reason to exist, since
generation-match is the CAS shape the in-memory store cannot
faithfully exhibit over real sockets.

Fault injection mirrors the S3 twin:

* ``emu.drop_response_next_put = True`` — the NEXT upload is fully
  APPLIED, then the socket closes without a response (the ambiguous
  timeout the backend must disambiguate by reading back).
* ``emu.reject_next_put = n`` — the next ``n`` uploads return 500
  without applying.
* ``emu.repeat_page_token = True`` — the listing returns the SAME
  ``nextPageToken`` forever (a misbehaving store): the client must
  raise, not loop.

AUTH: set ``emu.require_bearer = "<token>"`` and every request must
carry ``Authorization: Bearer <token>`` or it is answered 401, like
the real JSON API without OAuth credentials. Set ``emu.hmac_key =
(access_id, secret)`` and XML-API path-style GETs carrying
``X-Goog-Signature`` are verified as V4 signed URLs (GOOG4 flavor of
:mod:`operators.sigv4`) — the bearer-less sharing grant, enforced
server-side with expiry/tamper 403s.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from dataflowtemplates_spark.operators import sigv4
from dataflowtemplates_spark.testing.listing import paginate
from dataflowtemplates_spark.testing.rangeserve import serve_object_get


class GcsEmulator:
    def __init__(self):
        #: key -> (bytes, generation)
        self._objects: dict[str, tuple[bytes, int]] = {}
        self._mtimes: dict[str, float] = {}
        self._gen_counter = 0
        self._lock = threading.Lock()
        self.drop_response_next_put = False
        #: ambiguous-timeout fault on the resumable FINAL chunk: the
        #: NEXT finalizing chunk is fully APPLIED (object materialized,
        #: session consumed), then the socket closes without a response
        self.drop_response_next_final_chunk = False
        self.reject_next_put = 0
        self.repeat_page_token = False
        self.require_bearer: str | None = None
        #: (access_id, secret) HMAC key for V4 signed-URL checks; a
        #: path-style GET carrying X-Goog-Signature verifies against
        #: this (None -> every signed URL is refused 403)
        self.hmac_key: tuple[str, str] | None = None
        #: resumable sessions: sid -> {bucket, name, data: bytearray}
        self._sessions: dict[str, dict] = {}
        self._session_seq = 0
        #: observability for tests: resumable-completed object count
        self.resumable_completed = 0
        #: observability: total media-GET payload bytes served (whole
        #: 200s and ranged 206s) — the column-pruning economics counter
        self.object_get_bytes = 0
        emu = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"
            # see s3_emulator.Handler: TCP_NODELAY removes the ~40ms
            # Nagle/delayed-ACK stall between the header and body
            # writes of every response
            disable_nagle_algorithm = True

            def log_message(self, *a):  # keep pytest output clean
                pass

            def _send(self, status, body=b"", ctype="application/json"):
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _err(self, status, message):
                self._send(status, json.dumps(
                    {"error": {"code": status,
                               "message": message}}).encode())

            def _authorized(self) -> bool:
                want = emu.require_bearer
                if want is None:
                    return True
                got = self.headers.get("Authorization", "")
                if got == f"Bearer {want}":
                    return True
                self._err(401, "Invalid Credentials")
                return False

            def _parse(self):
                u = urllib.parse.urlparse(self.path)
                q = urllib.parse.parse_qs(u.query)
                return u.path, q

            def _meta_json(self, bucket, key, data, gen, ts) -> bytes:
                upd = datetime.fromtimestamp(
                    ts, tz=timezone.utc).isoformat().replace(
                    "+00:00", "Z")
                return json.dumps({
                    "kind": "storage#object", "name": key,
                    "bucket": bucket, "generation": str(gen),
                    "size": str(len(data)), "updated": upd}).encode()

            def do_POST(self):
                """Media upload:
                /upload/storage/v1/b/{bucket}/o?uploadType=media
                &name=...&ifGenerationMatch=N"""
                path, q = self._parse()
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                if not self._authorized():
                    return
                if not path.startswith("/upload/storage/v1/b/"):
                    self._err(404, "unknown upload path")
                    return
                bucket = urllib.parse.unquote(
                    path[len("/upload/storage/v1/b/"):].split("/", 1)[0])
                name = q.get("name", [None])[0]
                if not name:
                    self._err(400, "name required")
                    return
                if q.get("uploadType", [None])[0] == "resumable":
                    with emu._lock:
                        emu._session_seq += 1
                        sid = f"sess-{emu._session_seq:06d}"
                        emu._sessions[sid] = {
                            "bucket": bucket, "name": name,
                            "data": bytearray()}
                    self.send_response(200)
                    self.send_header(
                        "Location",
                        f"{emu.endpoint}/upload/session/{sid}")
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                full = f"{bucket}/{name}"
                gen_match = q.get("ifGenerationMatch", [None])[0]
                with emu._lock:
                    if emu.reject_next_put > 0:
                        emu.reject_next_put -= 1
                        self._err(500, "transient backend error")
                        return
                    current = emu._objects.get(full)
                    if gen_match is not None:
                        want = int(gen_match)
                        live = 0 if current is None else current[1]
                        if live != want:
                            self._err(412, "conditionNotMet")
                            return
                    import time

                    emu._gen_counter += 1
                    gen = emu._gen_counter
                    ts = time.time()
                    emu._objects[full] = (data, gen)
                    emu._mtimes[full] = ts
                    drop = emu.drop_response_next_put
                    if drop:
                        emu.drop_response_next_put = False
                if drop:
                    # applied, response lost: hard-close the socket
                    self.close_connection = True
                    self.connection.close()
                    return
                self._send(200, self._meta_json(bucket, name, data,
                                                gen, ts))

            def do_GET(self):
                path, q = self._parse()
                if ("X-Goog-Signature" in self.path
                        and not path.startswith(("/storage/",
                                                 "/upload/"))):
                    # XML-API path-style signed URL: the V4 query
                    # grant IS the authentication (no bearer needed),
                    # verified server-side like the real service
                    self._signed_get(path)
                    return
                if not self._authorized():
                    return
                if not path.startswith("/storage/v1/b/"):
                    self._err(404, "unknown path")
                    return
                rest = path[len("/storage/v1/b/"):]
                bucket, _, tail = rest.partition("/")
                bucket = urllib.parse.unquote(bucket)
                if tail == "o" or tail == "o/":
                    self._list(bucket, q)
                    return
                if not tail.startswith("o/"):
                    self._err(404, "unknown path")
                    return
                key = urllib.parse.unquote(tail[2:])
                full = f"{bucket}/{key}"
                with emu._lock:
                    hit = emu._objects.get(full)
                    ts = emu._mtimes.get(full, 0.0)
                if hit is None:
                    self._err(404, "No such object")
                    return
                data, gen = hit
                if q.get("alt", [None])[0] == "media":
                    def count(n):
                        with emu._lock:
                            emu.object_get_bytes += n

                    if serve_object_get(self, data,
                                        count) == "bad-range":
                        self._err(400, "bad Range header")
                else:
                    self._send(200, self._meta_json(bucket, key, data,
                                                    gen, ts))

            def _signed_get(self, path):
                """Serve a GCS V4 signed URL (path-style
                ``/bucket/object``): recompute the GOOG4 signature
                over the request's own query params and the expiry
                window; 403 on any mismatch, exactly like the live
                service's SignatureDoesNotMatch / ExpiredToken."""
                key_pair = emu.hmac_key
                if key_pair is None:
                    self._err(403, "signed URLs not configured")
                    return
                ok, reason = sigv4.verify_presigned(
                    "GET", self.path, self.headers.get("Host", ""),
                    secret_key=key_pair[1], access_key=key_pair[0],
                    flavor="goog")
                if not ok:
                    self._err(403, reason)
                    return
                full = urllib.parse.unquote(path.lstrip("/"))
                with emu._lock:
                    hit = emu._objects.get(full)
                if hit is None:
                    self._err(404, "No such object")
                    return
                data, _ = hit

                def count(n):
                    with emu._lock:
                        emu.object_get_bytes += n

                # the grant covers the object; a ranged fetch of it is
                # the same authorization (how a large shared artifact
                # is consumed piecewise)
                if serve_object_get(self, data, count) == "bad-range":
                    self._err(400, "bad Range header")

            def _list(self, bucket, q):
                prefix = q.get("prefix", [""])[0]
                delim = q.get("delimiter", [None])[0]
                token = q.get("pageToken", [""])[0]
                start = int(token) if token else 0
                with emu._lock:
                    keys = sorted(
                        k[len(bucket) + 1:] for k in emu._objects
                        if k.startswith(bucket + "/")
                        and k[len(bucket) + 1:].startswith(prefix))
                    stamps = [
                        (emu._mtimes.get(f"{bucket}/{rel}", 0.0),
                         len(emu._objects.get(f"{bucket}/{rel}", b"")))
                        for rel in keys]
                items, prefixes, nxt = paginate(
                    keys, stamps, prefix, delim, start,
                    page=2)  # tiny pages: pagination always exercised
                doc: dict = {"kind": "storage#objects"}
                if items:
                    doc["items"] = [{
                        "name": rel,
                        "size": str(size),
                        "updated": datetime.fromtimestamp(
                            ts, tz=timezone.utc).isoformat().replace(
                            "+00:00", "Z")} for rel, (ts, size) in items]
                if prefixes:
                    doc["prefixes"] = prefixes
                if nxt is not None:
                    doc["nextPageToken"] = (
                        str(start) if emu.repeat_page_token else str(nxt))
                self._send(200, json.dumps(doc).encode())

            def do_PUT(self):
                """Resumable chunk upload to a session URI."""
                path, _ = self._parse()
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                if not self._authorized():
                    return
                if not path.startswith("/upload/session/"):
                    self._err(404, "unknown path")
                    return
                sid = path[len("/upload/session/"):]
                rng = self.headers.get("Content-Range", "")
                try:
                    spec = rng.split(" ", 1)[1]
                    span, total_s = spec.split("/", 1)
                    total = None if total_s == "*" else int(total_s)
                    if span == "*":
                        # zero-byte finalize: 'bytes */TOTAL' only
                        if total is None or data:
                            raise ValueError("bare * needs a total "
                                             "and no body")
                        start = end = None
                    else:
                        start_s, end_s = span.split("-", 1)
                        start, end = int(start_s), int(end_s)
                        if end < start:  # degenerate dashed range:
                            #   real GCS rejects it
                            raise ValueError("end < start")
                except (IndexError, ValueError) as exc:
                    self._err(400, f"bad Content-Range {rng!r}: {exc}")
                    return
                with emu._lock:
                    sess = emu._sessions.get(sid)
                    if sess is None:
                        self._err(404, "no such session")
                        return
                    if start is not None and (
                            start != len(sess["data"])
                            or end - start + 1 != len(data)):
                        self._err(400, "range does not continue the "
                                       "session")
                        return
                    sess["data"].extend(data)
                    if total is None:
                        self.send_response(308)
                        self.send_header(
                            "Range", f"bytes=0-{len(sess['data']) - 1}")
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    if total != len(sess["data"]):
                        self._err(400, "final range total mismatch")
                        return
                    import time

                    emu._gen_counter += 1
                    gen = emu._gen_counter
                    ts = time.time()
                    full = f"{sess['bucket']}/{sess['name']}"
                    emu._objects[full] = (bytes(sess["data"]), gen)
                    emu._mtimes[full] = ts
                    del emu._sessions[sid]
                    emu.resumable_completed += 1
                    drop = emu.drop_response_next_final_chunk
                    if drop:
                        emu.drop_response_next_final_chunk = False
                if drop:
                    # finalize applied (object live, session consumed)
                    # but the response is lost — the ambiguity the
                    # caller must survive via deterministic naming
                    self.close_connection = True
                    self.connection.close()
                    return
                self._send(200, self._meta_json(
                    sess["bucket"], sess["name"], bytes(sess["data"]),
                    gen, ts))

            def do_DELETE(self):
                path, _ = self._parse()
                if not self._authorized():
                    return
                if path.startswith("/upload/session/"):
                    with emu._lock:
                        emu._sessions.pop(
                            path[len("/upload/session/"):], None)
                    self._send(204)
                    return
                if not path.startswith("/storage/v1/b/"):
                    self._err(404, "unknown path")
                    return
                rest = path[len("/storage/v1/b/"):]
                bucket, _, tail = rest.partition("/")
                if not tail.startswith("o/"):
                    self._err(404, "unknown path")
                    return
                key = urllib.parse.unquote(tail[2:])
                full = f"{urllib.parse.unquote(bucket)}/{key}"
                with emu._lock:
                    emu._objects.pop(full, None)
                    emu._mtimes.pop(full, None)
                self._send(204)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    @property
    def endpoint(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def start(self) -> "GcsEmulator":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
