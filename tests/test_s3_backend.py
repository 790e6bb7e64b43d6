"""S3HttpBackend against a live in-process HTTP S3 emulator: the
conditional-put CAS over real request/response cycles, including the
failure modes an in-memory backend cannot exhibit — 412 precondition
losses, ambiguous timeout-after-put, transient 500s, pagination, and
list-after-put visibility. The KeyedTable metadata protocol then runs
end-to-end over the live endpoint (the same surface
test_commit_protocol.py pins over MemoryObjectStore)."""

import json
import threading

import pytest

from dataflowtemplates_spark.operators import fsio
from dataflowtemplates_spark.operators.s3http import S3HttpBackend
from tests.s3emu import S3Emulator


@pytest.fixture()
def emu():
    with S3Emulator() as e:
        yield e


@pytest.fixture()
def backend(emu):
    b = S3HttpBackend(emu.endpoint, timeout_s=3.0)
    fsio.register_object_backend("s3emu", b)
    try:
        yield b
    finally:
        fsio.unregister_object_backend("s3emu")


def test_conditional_put_race_one_winner(backend):
    """N threads race PutObject If-None-Match:* on one key over real
    HTTP: exactly one 200, the rest 412 — and the stored bytes are
    the winner's."""
    barrier = threading.Barrier(8)
    wins = []

    def attempt(i):
        barrier.wait()
        if backend.create_exclusive("s3emu://b/t/_log/v1.json",
                                    f"w{i}".encode()):
            wins.append(i)

    threads = [threading.Thread(target=attempt, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert backend.read_bytes(
        "s3emu://b/t/_log/v1.json") == f"w{wins[0]}".encode()


def test_ambiguous_timeout_after_put_resolved_by_readback(emu, backend):
    """The put is APPLIED but the response is lost: the backend must
    read back and claim the win (log objects are writer-unique), and
    a rival's conditional put must then lose with 412."""
    emu.drop_response_next_put = True
    assert backend.create_exclusive("s3emu://b/k.json", b"mine") is True
    assert emu.drop_response_next_put is False  # fault actually fired
    assert backend.read_bytes("s3emu://b/k.json") == b"mine"
    # rival: ordinary 412 loss
    assert backend.create_exclusive("s3emu://b/k.json", b"rival") is False
    assert backend.read_bytes("s3emu://b/k.json") == b"mine"


def _flaky_first_conditional_put(backend, side_effect):
    """Wrap backend._request so the FIRST conditional PUT never gets a
    response (ConnectionError), with ``side_effect(orig)`` run while
    the request is 'in flight' — the rival-interleaving the real
    network can produce but an in-memory store cannot."""
    orig = backend._request
    fired = {"done": False}

    def flaky(method, bucket, key="", query=None, body=None, headers=None):
        cond = headers and headers.get("If-None-Match") == "*"
        if method == "PUT" and cond and not fired["done"]:
            fired["done"] = True
            side_effect(orig)
            raise ConnectionError("response lost in transit")
        return orig(method, bucket, key, query=query, body=body,
                    headers=headers)

    backend._request = flaky
    return orig


def test_ambiguous_timeout_when_rival_landed_reads_as_loss(backend):
    """Request lost in transit AND a rival's object exists by the time
    we read back: the CAS must report a loss, never a win."""
    def rival_lands(orig):
        orig("PUT", "b", "k2.json", body=b"rival",
             headers={"Content-Length": "5"})

    orig = _flaky_first_conditional_put(backend, rival_lands)
    try:
        assert backend.create_exclusive("s3emu://b/k2.json",
                                        b"ours") is False
        assert backend.read_bytes("s3emu://b/k2.json") == b"rival"
    finally:
        backend._request = orig


def test_ambiguous_timeout_with_nothing_landed_retries_the_put(backend):
    """Request lost and the read-back finds NO object: the conditional
    put is retried verbatim and wins."""
    orig = _flaky_first_conditional_put(backend, lambda orig: None)
    try:
        assert backend.create_exclusive("s3emu://b/k4.json",
                                        b"ours") is True
        assert backend.read_bytes("s3emu://b/k4.json") == b"ours"
    finally:
        backend._request = orig


def test_transient_500_raises_never_false(emu, backend):
    """A 5xx on the conditional put must RAISE, not read as a loss —
    a false 'loss' on both racers would wedge the version counter."""
    emu.reject_next_put = 1
    with pytest.raises(OSError):
        backend.create_exclusive("s3emu://b/k3.json", b"x")
    assert backend.create_exclusive("s3emu://b/k3.json", b"x") is True


def test_list_after_put_visibility_and_pagination(backend):
    """A put is visible to the very next listing (strong consistency,
    which reclaim/fold logic relies on) — across >2 objects so the
    emulator's 2-item pages force continuation-token paging."""
    for i in range(7):
        backend.write_bytes(f"s3emu://b/t/_log/{i:020d}.json", b"e")
    backend.write_bytes("s3emu://b/t/data/d1/kb=0/part-0", b"p")
    assert backend.list_dir("s3emu://b/t/_log") == \
        [f"{i:020d}.json" for i in range(7)]
    assert backend.list_dir("s3emu://b/t") == ["_log", "data"]
    assert backend.is_dir("s3emu://b/t/data/d1")
    assert backend.newest_mtime_under("s3emu://b/t/data/d1") is not None
    files = backend.list_files("s3emu://b/t/data/d1", suffix=None)
    assert files == ["s3emu://b/t/data/d1/kb=0/part-0"]
    backend.delete_dir("s3emu://b/t/data/d1")
    assert not backend.is_dir("s3emu://b/t/data/d1")


def test_listing_xml_escapes_special_keys(backend):
    """Keys containing XML metacharacters (&, <, >) survive the
    ListObjectsV2 round trip — the emulator must escape them in the
    response body or ET.fromstring in the client raises."""
    keys = ["esc/a&b/x<y.json", "esc/p&q/r>s.json", "esc/plain.json"]
    for k in keys:
        backend.write_bytes(f"s3emu://b/{k}", b"v")
    assert backend.list_files("s3emu://b/esc") == \
        sorted(f"s3emu://b/{k}" for k in keys)
    # delimiter listing: the common prefix itself carries the '&'
    assert backend.list_dir("s3emu://b/esc") == \
        ["a&b", "p&q", "plain.json"]


def test_fsio_contract_parity_with_memory_store(backend):
    """The HTTP backend honors the same fsio contract MemoryObjectStore
    pins: FileNotFoundError on missing reads/deletes, mkdirs no-op,
    move = copy+delete."""
    with pytest.raises(FileNotFoundError):
        backend.read_bytes("s3emu://b/nope")
    with pytest.raises(FileNotFoundError):
        backend.delete_file("s3emu://b/nope")
    backend.mkdirs("s3emu://b/whatever")  # no-op, never an error
    backend.write_bytes("s3emu://b/m/src/a", b"1")
    backend.move("s3emu://b/m/src", "s3emu://b/m/dst")
    assert backend.read_bytes("s3emu://b/m/dst/a") == b"1"
    assert not backend.exists("s3emu://b/m/src")


def test_keyed_table_metadata_protocol_over_live_http(spark, backend):
    """The whole KeyedTable metadata protocol — create, CAS-raced
    commits, checkpoint fold, vacuum, orphan reclaim — over the live
    HTTP endpoint (mirrors the MemoryObjectStore test in
    test_commit_protocol.py, now with real sockets)."""
    from dataflowtemplates_spark.operators.mutations import (
        ConcurrentWriteError, KeyedTable)
    from pyspark.sql import Row

    t = KeyedTable(spark, "s3emu://bucket/tbl", ["id"], n_buckets=4)
    t.create(spark.createDataFrame([Row(id=1, v="a")]))
    assert t.exists()
    barrier = threading.Barrier(2)
    outcomes = []

    def attempt():
        w = KeyedTable(spark, "s3emu://bucket/tbl", ["id"])
        cfg = w._config_at(1)
        barrier.wait()
        try:
            w._commit_entry(2, [], None, [], cfg)
            outcomes.append("win")
        except ConcurrentWriteError:
            outcomes.append("lose")

    threads = [threading.Thread(target=attempt) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert sorted(outcomes) == ["lose", "win"]
    assert t._latest_version() == 2
    raw = json.loads(backend.read_bytes(
        "s3emu://bucket/tbl/_log/" + f"{2:020d}.json"))
    assert raw["version"] == 2 and raw["config"]["n_buckets"] == 4


def test_list_dir_typed_single_pass_and_truncation_guard(emu, backend):
    """list_dir_typed classifies files vs prefixes from ONE delimiter
    listing (across continuation pages), and a truncated page without
    a usable token raises instead of looping forever."""
    backend.write_bytes("s3emu://b/t2/file_a", b"1")
    backend.write_bytes("s3emu://b/t2/file_b", b"2")
    backend.write_bytes("s3emu://b/t2/sub/inner", b"3")
    backend.write_bytes("s3emu://b/t2/zub/inner", b"4")
    assert backend.list_dir_typed("s3emu://b/t2") == [
        ("file_a", False), ("file_b", False),
        ("sub", True), ("zub", True)]
    assert fsio.list_dir_typed("s3emu://b/t2") == [
        ("file_a", False), ("file_b", False),
        ("sub", True), ("zub", True)]
    # memory-store twin honors the same contract
    store = fsio.MemoryObjectStore()
    store.write_bytes("m://b/t/f", b"1")
    store.write_bytes("m://b/t/d/x", b"2")
    assert store.list_dir_typed("m://b/t") == [("d", True), ("f", False)]


def test_truncated_listing_without_token_raises(emu, backend):
    """A store that marks a page truncated but omits the continuation
    token must produce an OSError, not an infinite page-1 loop."""
    for i in range(5):  # > the emulator's 2-item page
        backend.write_bytes(f"s3emu://b/t3/{i}", b"x")
    emu.omit_continuation_token = True
    try:
        with pytest.raises(OSError, match="NextContinuationToken"):
            backend.list_dir("s3emu://b/t3")
    finally:
        emu.omit_continuation_token = False
    assert len(backend.list_dir("s3emu://b/t3")) == 5


#: AWS's published example credentials (docs.aws.amazon.com SigV4
#: test suite) — fine to commit, they authenticate nothing real.
SIGV4_CREDS = ("AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")


@pytest.fixture()
def signed_backend(emu):
    """Backend + emulator both in SigV4 mode: every request must carry
    a valid signature or the emulator answers 403 like the live
    service."""
    emu.require_sigv4 = SIGV4_CREDS
    b = S3HttpBackend(emu.endpoint, timeout_s=3.0,
                      credentials=SIGV4_CREDS)
    fsio.register_object_backend("s3sig", b)
    try:
        yield b
    finally:
        fsio.unregister_object_backend("s3sig")


def test_signed_traffic_end_to_end(emu, signed_backend):
    """The full op surface over an endpoint that REJECTS unsigned
    requests: CAS race, readback, listing with pagination, HEAD,
    DELETE — all signed per-request (fresh x-amz-date each attempt)."""
    b = signed_backend
    barrier = threading.Barrier(4)
    wins = []

    def attempt(i):
        barrier.wait()
        if b.create_exclusive("s3sig://b/t/_log/v1.json",
                              f"w{i}".encode()):
            wins.append(i)

    threads = [threading.Thread(target=attempt, args=(i,))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert b.read_bytes("s3sig://b/t/_log/v1.json") == \
        f"w{wins[0]}".encode()
    for i in range(5):  # > the 2-item page: signed pagination
        b.write_bytes(f"s3sig://b/t/d/{i}", b"x")
    assert len(b.list_dir("s3sig://b/t/d")) == 5
    assert b.exists("s3sig://b/t/d/0")
    b.delete_file("s3sig://b/t/d/0")
    assert not b.exists("s3sig://b/t/d/0")
    # ambiguous timeout path also works signed: the readback GET is
    # a fresh signed request
    emu.drop_response_next_put = True
    assert b.create_exclusive("s3sig://b/amb.json", b"mine") is True
    assert b.read_bytes("s3sig://b/amb.json") == b"mine"


def test_unsigned_and_wrongly_signed_requests_get_403(emu):
    """Against a signature-requiring endpoint: an unsigned backend and
    a wrong-secret backend both surface OSError (HTTP 403) — never a
    silent False that could wedge the CAS."""
    emu.require_sigv4 = SIGV4_CREDS
    unsigned = S3HttpBackend(emu.endpoint, timeout_s=3.0)
    with pytest.raises(OSError, match="403"):
        unsigned.write_bytes("x://b/k", b"d")
    with pytest.raises(OSError, match="403"):
        unsigned.create_exclusive("x://b/k.json", b"d")
    wrong = S3HttpBackend(emu.endpoint, timeout_s=3.0,
                          credentials=(SIGV4_CREDS[0], "not-the-secret"))
    with pytest.raises(OSError, match="403"):
        wrong.read_bytes("x://b/k")
    good = S3HttpBackend(emu.endpoint, timeout_s=3.0,
                         credentials=SIGV4_CREDS)
    assert good.create_exclusive("x://b/k.json", b"d") is True


def test_https_endpoint_selects_tls_connection():
    """https:// endpoints ride HTTPSConnection (default port 443);
    http:// rides HTTPConnection (port 80); other schemes rejected.
    Constructing a connection object never dials, so no TLS endpoint
    is needed to pin the selection."""
    import http.client

    tls = S3HttpBackend("https://s3.example.test")
    assert isinstance(tls._conn(), http.client.HTTPSConnection)
    assert tls._port == 443 and tls._wire_host == "s3.example.test"
    plain = S3HttpBackend("http://s3.example.test")
    assert isinstance(plain._conn(), http.client.HTTPConnection)
    assert not isinstance(plain._conn(), http.client.HTTPSConnection)
    assert plain._port == 80 and plain._wire_host == "s3.example.test"
    nonstd = S3HttpBackend("https://h.example.test:9443")
    assert nonstd._wire_host == "h.example.test:9443"
    with pytest.raises(ValueError, match="http"):
        S3HttpBackend("ftp://nope")
    with pytest.raises(ValueError, match="credentials"):
        S3HttpBackend("http://h", credentials=("only-one",))


def test_backend_pickles_for_executor_shipping(emu, signed_backend):
    """The distributed data plane ships the backend object to executor
    tasks: pickling must carry config (endpoint, creds, region) but
    never sockets, and the clone must do signed I/O immediately."""
    import pickle

    clone = pickle.loads(pickle.dumps(signed_backend))
    assert clone.distributed is True
    assert clone._creds == signed_backend._creds
    clone.write_bytes("s3sig://b/pickled", b"via-clone")
    assert signed_backend.read_bytes("s3sig://b/pickled") == b"via-clone"


def test_multipart_upload_roundtrip_and_atomicity(emu, backend):
    """CreateMultipartUpload / UploadPart / Complete over live HTTP:
    the object is INVISIBLE until Complete (atomic materialization),
    then reads back as the part concatenation; Abort leaves nothing;
    a Complete citing a wrong ETag is rejected."""
    emu.min_part_bytes = 1  # exercise chunk mechanics with tiny parts
    p = "s3emu://b/mp/obj.bin"
    uid = backend.multipart_start(p)
    chunks = [b"a" * 100, b"b" * 50, b"c" * 7]
    parts = [(i + 1, backend.multipart_put_part(p, uid, i + 1, c))
             for i, c in enumerate(chunks)]
    assert not backend.exists(p)  # staged parts are invisible
    backend.multipart_complete(p, uid, parts)
    assert backend.read_bytes(p) == b"".join(chunks)
    assert emu.multipart_completed == 1
    # abort: nothing materializes
    uid2 = backend.multipart_start("s3emu://b/mp/gone.bin")
    backend.multipart_put_part("s3emu://b/mp/gone.bin", uid2, 1, b"x")
    backend.multipart_abort("s3emu://b/mp/gone.bin", uid2)
    with pytest.raises(OSError):
        backend.multipart_complete("s3emu://b/mp/gone.bin", uid2,
                                   [(1, '"deadbeef"')])
    assert not backend.exists("s3emu://b/mp/gone.bin")
    # wrong etag rejected
    uid3 = backend.multipart_start("s3emu://b/mp/bad.bin")
    backend.multipart_put_part("s3emu://b/mp/bad.bin", uid3, 1, b"x")
    with pytest.raises(OSError):
        backend.multipart_complete("s3emu://b/mp/bad.bin", uid3,
                                   [(1, '"not-the-md5"')])


def test_streaming_sink_small_object_single_put(emu, backend):
    """Sink under one part: exactly one plain PUT, no multipart round
    trips; over one part (via the sink class with a small part size —
    open_write itself clamps to the service's 5 MiB floor): streamed
    parts + complete; error path aborts the staged upload."""
    from dataflowtemplates_spark.operators.s3http import _MultipartSink

    emu.min_part_bytes = 1  # opt down to exercise chunking cheaply
    with backend.open_write("s3emu://b/sw/small.bin") as w:
        w.write(b"tiny")
    assert backend.read_bytes("s3emu://b/sw/small.bin") == b"tiny"
    assert emu.multipart_completed == 0
    big = bytes(range(256)) * 40  # 10240 bytes > 3 parts of 4096
    with _MultipartSink(backend, "s3emu://b/sw/big.bin", 4096) as w:
        for i in range(0, len(big), 1000):  # odd write sizes
            w.write(big[i:i + 1000])
    assert backend.read_bytes("s3emu://b/sw/big.bin") == big
    assert emu.multipart_completed == 1
    # error path aborts: nothing materializes
    try:
        with _MultipartSink(backend, "s3emu://b/sw/fail.bin", 64) as w:
            w.write(b"z" * 200)  # multipart already started
            raise RuntimeError("task died")
    except RuntimeError:
        pass
    assert not backend.exists("s3emu://b/sw/fail.bin")
    assert not emu._uploads  # the staged upload was aborted


def test_open_write_enforces_service_part_minimum(emu, backend):
    """open_write clamps part_bytes UP to S3's published 5 MiB floor
    (undersized intermediate parts fail Complete with EntityTooSmall
    on the real service — the emulator enforces it too), and rejects
    nonsensical sizes."""
    sink = backend.open_write("s3emu://b/clamp.bin", part_bytes=1024)
    assert sink._part_bytes == S3HttpBackend.MIN_PART_BYTES
    sink.abandon()
    with pytest.raises(ValueError, match="positive"):
        backend.open_write("s3emu://b/clamp.bin", part_bytes=0)
    # the emulator's default enforcement mirrors the service: an
    # undersized NON-final part is rejected at Complete
    p = "s3emu://b/small-parts.bin"
    uid = backend.multipart_start(p)
    parts = [(1, backend.multipart_put_part(p, uid, 1, b"a" * 10)),
             (2, backend.multipart_put_part(p, uid, 2, b"b" * 10))]
    with pytest.raises(OSError, match="400"):
        backend.multipart_complete(p, uid, parts)
    assert not backend.exists(p)


def test_multipart_requests_are_signed(emu):
    """All four multipart calls ride SigV4 when the endpoint demands
    it (query params like uploadId are part of the canonical form)."""
    from dataflowtemplates_spark.operators.s3http import _MultipartSink

    emu.require_sigv4 = SIGV4_CREDS
    emu.min_part_bytes = 1
    b = S3HttpBackend(emu.endpoint, timeout_s=3.0,
                      credentials=SIGV4_CREDS)
    with _MultipartSink(b, "x://b/signed.bin", 64) as w:
        w.write(b"q" * 200)
    assert b.read_bytes("x://b/signed.bin") == b"q" * 200
    assert emu.multipart_completed == 1
    unsigned = S3HttpBackend(emu.endpoint, timeout_s=3.0)
    with pytest.raises(OSError, match="403"):
        unsigned.multipart_start("x://b/nope.bin")


def test_presigned_url_fetch_against_enforcing_endpoint(emu):
    """A credential-less plain HTTP client (urllib) fetches an object
    through a presigned URL from an endpoint that 403s everything
    unsigned — and a tampered or signature-less URL is refused."""
    import urllib.error
    import urllib.request

    emu.require_sigv4 = SIGV4_CREDS
    b = S3HttpBackend(emu.endpoint, timeout_s=3.0,
                      credentials=SIGV4_CREDS)
    b.write_bytes("x://exports/shard-0.parquet", b"artifact-bytes")
    url = b.presign("x://exports/shard-0.parquet", expires_s=120)
    with urllib.request.urlopen(url, timeout=3) as resp:
        assert resp.read() == b"artifact-bytes"
    # plain GET without the grant: refused
    bare = url.split("?", 1)[0]
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(bare, timeout=3)
    assert exc.value.code == 403
    # tampered object name: the signed path no longer matches
    evil = url.replace("shard-0", "shard-1")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(evil, timeout=3)
    assert exc.value.code == 403
    # presign is a credentialed operation
    with pytest.raises(ValueError, match="credentials"):
        S3HttpBackend(emu.endpoint).presign("x://exports/a")


def test_conditional_put_takes_fresh_socket_after_idle_reuse(emu, backend):
    """A GET warms the thread's keep-alive socket; even if the server
    then closes it, the CAS put must not surface a spurious failure —
    it always opens a fresh connection (a stale-socket error on the
    no-transport-retry CAS path would burn a put_retries round or, at
    put_retries=0, fail a healthy endpoint)."""
    b0 = S3HttpBackend(emu.endpoint, timeout_s=3.0, put_retries=0)
    b0.write_bytes("s3emu://b/warm", b"w")
    assert b0.read_bytes("s3emu://b/warm") == b"w"  # socket warmed
    # kill every server-side connection the emulator holds open
    emu._server.socket.close  # (no-op ref; emulator has no idle-kill)
    # the contract check: CAS requests never reuse the cached socket
    seen = []
    orig = b0._conn

    def spy(fresh=False):
        seen.append(fresh)
        return orig(fresh=fresh)

    b0._conn = spy
    assert b0.create_exclusive("s3emu://b/fresh.json", b"1") is True
    assert seen and seen[0] is True  # first CAS attempt: fresh socket
