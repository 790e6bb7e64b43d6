"""AWS Signature Version 4 request signing — pure stdlib.

Implements the published SigV4 algorithm (AWS General Reference,
"Signature Version 4 signing process"): canonical request →
string-to-sign → HMAC-chain derived signing key → ``Authorization``
header. Nothing here is service-coupled beyond the two S3-isms the
spec itself calls out:

* the canonical URI is the request path **single-encoded and not
  normalized** (S3 signs the path exactly as sent; other services
  double-encode) — callers pass the already-percent-encoded path they
  put on the wire, and it is signed verbatim;
* the payload hash is surfaced as the ``x-amz-content-sha256`` header
  (S3 requires it on every signed request) and signed with the rest.

Used by :class:`operators.s3http.S3HttpBackend` to sign each REST
call; the test emulator (``dataflowtemplates_spark/testing``) verifies
incoming signatures server-side with :func:`verify`, so the backend
tests exercise real signed traffic end-to-end rather than trusting the
signer by construction. Golden tests pin AWS's published ``get-vanilla``
test vector and cross-check randomized requests against botocore's
independent implementation when it is importable (tests only — this
module and the backend stay stdlib-only).

Reference for the delegated behavior this replaces: the reference
templates hand authentication to client SDKs entirely
(e.g. templates/SpannerQueryIO.java builds a SpannerOptions client);
this engine's object-store path owns the wire protocol, so it owns the
signature too.
"""

from __future__ import annotations

import hashlib
import hmac
import urllib.parse
from datetime import datetime, timezone

_ALGORITHM = "AWS4-HMAC-SHA256"

#: sha256 of an empty payload — the hash every body-less request signs.
EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()

#: The two published flavors of the V4 query-auth algorithm: AWS
#: SigV4 and Google Cloud Storage's V4 signing with HMAC keys (the
#: interoperability path GCS documents alongside RSA service-account
#: signing) differ ONLY in these constants — same canonical request,
#: same HMAC chain, same string-to-sign layout.
#: (algorithm label, secret-key prefix, scope terminal, query-param
#: prefix)
_FLAVORS = {
    "aws": (_ALGORITHM, b"AWS4", "aws4_request", "X-Amz-"),
    "goog": ("GOOG4-HMAC-SHA256", b"GOOG4", "goog4_request",
             "X-Goog-"),
}


def _uri_encode(s: str) -> str:
    """AWS canonical URI-encoding: everything but unreserved chars
    (A-Za-z0-9 ``-._~``) percent-encoded with uppercase hex —
    ``urllib.parse.quote`` with no safe chars produces exactly that."""
    return urllib.parse.quote(s, safe="")


def canonical_query(pairs) -> str:
    """Canonical query string from decoded (key, value) pairs: each
    side URI-encoded, sorted by encoded key then encoded value."""
    enc = sorted((_uri_encode(str(k)), _uri_encode(str(v)))
                 for k, v in pairs)
    return "&".join(f"{k}={v}" for k, v in enc)


def _canonical_headers(headers: dict) -> tuple[str, str]:
    """(canonical_headers_block, signed_headers_list) from the headers
    being signed: lowercase names, values trimmed with internal runs
    of whitespace collapsed, sorted by name."""
    items = sorted((name.lower(), " ".join(str(val).split()))
                   for name, val in headers.items())
    block = "".join(f"{n}:{v}\n" for n, v in items)
    return block, ";".join(n for n, _ in items)


def canonical_request(method: str, encoded_path: str, query_pairs,
                      headers: dict, payload_hash: str) -> tuple[str, str]:
    """The SigV4 canonical request. ``encoded_path`` is the
    percent-encoded path exactly as sent on the wire (S3 semantics:
    single-encoded, never normalized); ``query_pairs`` are DECODED
    (key, value) tuples; ``headers`` are the headers to sign.
    Returns (canonical_request, signed_headers)."""
    hdr_block, signed = _canonical_headers(headers)
    return ("\n".join([
        method.upper(),
        encoded_path or "/",
        canonical_query(query_pairs),
        hdr_block,
        signed,
        payload_hash,
    ]), signed)


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def signing_key(secret_key: str, date: str, region: str,
                service: str, flavor: str = "aws") -> bytes:
    """The derived signing key: HMAC chain over
    prefix+secret → date → region → service → terminal
    (AWS4/aws4_request, or GOOG4/goog4_request for the GCS flavor)."""
    _, prefix, terminal, _ = _FLAVORS[flavor]
    k = _hmac(prefix + secret_key.encode(), date)
    for part in (region, service, terminal):
        k = _hmac(k, part)
    return k


def string_to_sign(amzdate: str, scope: str, canonical: str,
                   flavor: str = "aws") -> str:
    return "\n".join([
        _FLAVORS[flavor][0], amzdate, scope,
        hashlib.sha256(canonical.encode()).hexdigest()])


def amz_date_now() -> str:
    return datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")


def sign_headers(method: str, host: str, encoded_path: str, query_pairs,
                 payload: bytes | None, *, access_key: str,
                 secret_key: str, region: str, service: str = "s3",
                 amzdate: str | None = None,
                 session_token: str | None = None,
                 extra_headers: dict | None = None) -> dict:
    """Produce the signed header set for one request: ``host``,
    ``x-amz-date``, ``x-amz-content-sha256`` (the payload hash S3
    requires on every signed request), optional
    ``x-amz-security-token``, any ``extra_headers`` (also signed —
    e.g. ``If-None-Match``), and the ``Authorization`` header over all
    of them. The caller sends these verbatim; ``host`` must be exactly
    the wire-form Host (including a non-default port)."""
    amzdate = amzdate or amz_date_now()
    payload_hash = (EMPTY_SHA256 if not payload
                    else hashlib.sha256(payload).hexdigest())
    to_sign = {
        "host": host,
        "x-amz-date": amzdate,
        "x-amz-content-sha256": payload_hash,
    }
    if session_token:
        to_sign["x-amz-security-token"] = session_token
    if extra_headers:
        to_sign.update(extra_headers)
    canonical, signed = canonical_request(
        method, encoded_path, query_pairs, to_sign, payload_hash)
    scope = f"{amzdate[:8]}/{region}/{service}/aws4_request"
    sig = hmac.new(
        signing_key(secret_key, amzdate[:8], region, service),
        string_to_sign(amzdate, scope, canonical).encode(),
        hashlib.sha256).hexdigest()
    out = dict(to_sign)
    out["Authorization"] = (
        f"{_ALGORITHM} Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}")
    return out


def presign_query(method: str, host: str, encoded_path: str,
                  query_pairs, *, access_key: str, secret_key: str,
                  region: str, service: str = "s3",
                  expires_s: int = 3600, amzdate: str | None = None,
                  session_token: str | None = None,
                  flavor: str = "aws") -> str:
    """V4 QUERY authentication (presigned URLs): the credential
    rides the query string instead of headers, so any plain HTTP
    client can exercise the grant until it expires — how exported
    artifacts are shared from S3/GCS without distributing keys.
    Returns the encoded query string (append after ``?``). Per the
    published contract the payload hash is ``UNSIGNED-PAYLOAD``, only
    ``host`` is a signed header, and the signature param is computed
    over the OTHER query params sorted canonically. ``flavor="goog"``
    emits GCS V4 signed-URL parameters (``X-Goog-*``,
    ``GOOG4-HMAC-SHA256``) — GCS documents this exact algorithm for
    HMAC service-account keys; everything but the constants is shared
    with AWS."""
    algorithm, _, terminal, pfx = _FLAVORS[flavor]
    amzdate = amzdate or amz_date_now()
    scope = f"{amzdate[:8]}/{region}/{service}/{terminal}"
    params = [(str(k), str(v)) for k, v in query_pairs]
    params += [
        (f"{pfx}Algorithm", algorithm),
        (f"{pfx}Credential", f"{access_key}/{scope}"),
        (f"{pfx}Date", amzdate),
        (f"{pfx}Expires", str(int(expires_s))),
        (f"{pfx}SignedHeaders", "host"),
    ]
    if session_token:
        params.append((f"{pfx}Security-Token", session_token))
    canonical, _ = canonical_request(
        method, encoded_path, params, {"host": host},
        "UNSIGNED-PAYLOAD")
    sig = hmac.new(
        signing_key(secret_key, amzdate[:8], region, service, flavor),
        string_to_sign(amzdate, scope, canonical, flavor).encode(),
        hashlib.sha256).hexdigest()
    params.append((f"{pfx}Signature", sig))
    return "&".join(f"{_uri_encode(k)}={_uri_encode(v)}"
                    for k, v in params)


def verify_presigned(method: str, raw_target: str, host: str, *,
                     secret_key: str, now: str | None = None,
                     access_key: str | None = None,
                     flavor: str = "aws") -> tuple[bool, str]:
    """Server-side check of a presigned request (the emulator's
    half): recompute the signature over the request's own query
    params minus the signature param, and enforce the expiry window
    against ``now`` (an x-amz-date-format stamp; defaults to the
    current UTC time). ``flavor="goog"`` checks GCS V4 signed URLs
    (``X-Goog-*`` params, GOOG4 constants)."""
    algorithm, _, terminal, pfx = _FLAVORS[flavor]
    path, _, query = raw_target.partition("?")
    enc_pairs = [tuple(f.partition("=")[::2])
                 for f in query.split("&") if f]
    dec = {urllib.parse.unquote(k): urllib.parse.unquote(v)
           for k, v in enc_pairs}
    if dec.get(f"{pfx}Algorithm") != algorithm:
        return False, "not a V4 presigned request"
    try:
        ak, date, region, service, term = \
            dec[f"{pfx}Credential"].split("/")
        amzdate = dec[f"{pfx}Date"]
        expires = int(dec[f"{pfx}Expires"])
        claimed = dec[f"{pfx}Signature"]
    except (KeyError, ValueError) as exc:
        return False, f"malformed presigned query: {exc}"
    if term != terminal or amzdate[:8] != date:
        return False, "bad credential scope"
    if access_key is not None and ak != access_key:
        return False, "unknown access key"
    now = now or amz_date_now()
    from datetime import datetime, timedelta

    t0 = datetime.strptime(amzdate, "%Y%m%dT%H%M%SZ")
    tn = datetime.strptime(now, "%Y%m%dT%H%M%SZ")
    if tn < t0 or tn > t0 + timedelta(seconds=expires):
        return False, "presigned grant expired"
    keep = sorted((k, v) for k, v in enc_pairs
                  if urllib.parse.unquote(k) != f"{pfx}Signature")
    cqs = "&".join(f"{k}={v}" for k, v in keep)
    canonical = "\n".join([
        method.upper(), path or "/", cqs, f"host:{host}\n", "host",
        "UNSIGNED-PAYLOAD"])
    scope = f"{date}/{region}/{service}/{terminal}"
    expect = hmac.new(
        signing_key(secret_key, date, region, service, flavor),
        string_to_sign(amzdate, scope, canonical, flavor).encode(),
        hashlib.sha256).hexdigest()
    if not hmac.compare_digest(expect, claimed):
        return False, "signature mismatch"
    return True, "ok"


def parse_authorization(value: str) -> dict:
    """Split an ``Authorization: AWS4-HMAC-SHA256 ...`` header into
    {access_key, date, region, service, signed_headers, signature}.
    Raises ValueError on anything malformed."""
    if not value or not value.startswith(_ALGORITHM + " "):
        raise ValueError("not a SigV4 Authorization header")
    fields = {}
    for part in value[len(_ALGORITHM) + 1:].split(","):
        k, _, v = part.strip().partition("=")
        fields[k] = v
    try:
        cred = fields["Credential"].split("/")
        access_key, date, region, service, terminal = cred
        if terminal != "aws4_request":
            raise ValueError("bad credential scope terminal")
        return {
            "access_key": access_key, "date": date, "region": region,
            "service": service,
            "signed_headers": fields["SignedHeaders"].split(";"),
            "signature": fields["Signature"],
        }
    except (KeyError, ValueError) as exc:
        raise ValueError(f"malformed SigV4 Authorization: {exc}") from exc


def verify(method: str, raw_target: str, headers, payload: bytes, *,
           secret_key: str,
           access_key: str | None = None) -> tuple[bool, str]:
    """Server-side verification (the emulator's check): recompute the
    signature from the request as RECEIVED — raw percent-encoded
    target, the header values actually sent, the body — using the
    request's own x-amz-date and SignedHeaders list, and compare.
    Returns (ok, reason). A PUT/POST payload is additionally checked
    against the signed ``x-amz-content-sha256`` so a tampered body
    cannot ride a valid header signature."""
    hdrs = {k.lower(): v for k, v in dict(headers).items()}
    try:
        auth = parse_authorization(hdrs.get("authorization", ""))
    except ValueError as exc:
        return False, str(exc)
    if access_key is not None and auth["access_key"] != access_key:
        return False, "unknown access key"
    amzdate = hdrs.get("x-amz-date", "")
    if amzdate[:8] != auth["date"]:
        return False, "x-amz-date does not match credential scope date"
    claimed_hash = hdrs.get("x-amz-content-sha256", "")
    if not claimed_hash:
        # the real service rejects header-authenticated requests that
        # omit the payload-hash header outright — skipping the body
        # check here would make the emulator laxer than what it models
        return False, "missing x-amz-content-sha256"
    if claimed_hash != "UNSIGNED-PAYLOAD":
        if hashlib.sha256(payload or b"").hexdigest() != claimed_hash:
            return False, "payload does not match x-amz-content-sha256"
    path, _, query = raw_target.partition("?")
    # re-sort the wire-form fragments without decoding: the canonical
    # string is over encoded pairs, so splitting each fragment at its
    # first '=' preserves the client's exact encoding
    enc_pairs = sorted(tuple(f.partition("=")[::2])
                       for f in query.split("&") if f)
    cqs = "&".join(f"{k}={v}" for k, v in enc_pairs)
    missing = [n for n in auth["signed_headers"] if n not in hdrs]
    if missing:
        return False, f"signed headers absent from request: {missing}"
    hdr_block = "".join(
        f"{n}:{' '.join(str(hdrs[n]).split())}\n"
        for n in sorted(auth["signed_headers"]))
    canonical = "\n".join([
        method.upper(), path or "/", cqs, hdr_block,
        ";".join(sorted(auth["signed_headers"])),
        claimed_hash,
    ])
    scope = (f"{auth['date']}/{auth['region']}/{auth['service']}"
             "/aws4_request")
    expect = hmac.new(
        signing_key(secret_key, auth["date"], auth["region"],
                    auth["service"]),
        string_to_sign(amzdate, scope, canonical).encode(),
        hashlib.sha256).hexdigest()
    if not hmac.compare_digest(expect, auth["signature"]):
        return False, "signature mismatch"
    return True, "ok"
