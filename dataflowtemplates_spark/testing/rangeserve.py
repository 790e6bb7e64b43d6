"""Shared object-GET serving for the test emulators: RFC 9110 single
Range semantics (``bytes=a-b`` / ``bytes=a-`` / ``bytes=-n`` → 206 +
``Content-Range``, unsatisfiable → 416, no header → 200) — both S3
object GET and GCS media download publish exactly these semantics, so
the emulators share one implementation and a range-handling fix can
never drift between them."""

from __future__ import annotations


def serve_object_get(handler, data: bytes, count) -> str | None:
    """Serve ``data`` for ``handler``'s GET, honoring a Range header.
    ``count(n)`` records payload bytes served (the emulators' byte
    counters). Returns None when the response was written, or
    ``"bad-range"`` for a malformed Range header — the caller answers
    its own 400 in its service's error dialect."""
    rng = handler.headers.get("Range", "")
    if rng.startswith("bytes="):
        spec = rng[len("bytes="):]
        try:
            if spec.startswith("-"):
                n = int(spec[1:])
                start = max(0, len(data) - n)
                end = len(data) - 1
            else:
                a, _, b = spec.partition("-")
                start = int(a)
                end = int(b) if b else len(data) - 1
                end = min(end, len(data) - 1)
        except ValueError:
            return "bad-range"
        if start >= len(data) or start > end:
            handler.send_response(416)
            handler.send_header("Content-Range",
                                f"bytes */{len(data)}")
            handler.send_header("Content-Length", "0")
            handler.end_headers()
            return None
        chunk = data[start:end + 1]
        count(len(chunk))
        handler.send_response(206)
        handler.send_header("Content-Type", "application/octet-stream")
        handler.send_header("Content-Range",
                            f"bytes {start}-{end}/{len(data)}")
        handler.send_header("Content-Length", str(len(chunk)))
        handler.end_headers()
        handler.wfile.write(chunk)
        return None
    count(len(data))
    handler._send(200, data, "application/octet-stream")
    return None
