"""KeyedTable log-structured commit protocol: conditional-put CAS,
lock-free contention, checkpointed snapshot resolution, and the
object-store backend seam (operators/fsio.py).

The reference delegates this guarantee to Spanner's transactions
(templates/SpannerToSpanner.java:109-114); at object-store scale the
equivalent is a Delta-style versioned commit object published with the
store's conditional-write API — which is exactly what these tests pin,
over OS O_EXCL locally and over MemoryObjectStore for the scheme seam.
"""

import json
import threading

import pytest
from pyspark.sql import Row

from dataflowtemplates_spark.operators import fsio
from dataflowtemplates_spark.operators.mutations import (
    ConcurrentWriteError,
    KeyedTable,
)


def test_memory_object_store_conditional_put_is_atomic():
    """N threads racing create_exclusive on one key: exactly one wins,
    and the stored bytes are the winner's."""
    store = fsio.MemoryObjectStore()
    barrier = threading.Barrier(8)
    wins = []

    def attempt(i):
        barrier.wait()
        if store.create_exclusive("mock://b/x.json", f"w{i}".encode()):
            wins.append(i)

    threads = [threading.Thread(target=attempt, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert store.read_bytes("mock://b/x.json") == f"w{wins[0]}".encode()


def test_memory_object_store_prefix_semantics():
    store = fsio.MemoryObjectStore()
    store.write_bytes("mock://b/t/_log/a.json", b"1")
    store.write_bytes("mock://b/t/_log/b.json", b"2")
    assert store.is_dir("mock://b/t/_log")
    assert store.list_dir("mock://b/t/_log") == ["a.json", "b.json"]
    assert store.exists("mock://b/t") and not store.exists("mock://b/u")
    store.mkdirs("mock://b/whatever")  # no-op, never an error
    store.delete_dir("mock://b/t/_log")
    assert not store.is_dir("mock://b/t/_log")
    with pytest.raises(FileNotFoundError):
        store.read_bytes("mock://b/t/_log/a.json")


def test_unregistered_scheme_raises_not_degrades(tmp_path):
    """Task-3 contract (ADVICE r11): no silent check-then-write for
    scheme paths — the primitive raises, so no caller can accidentally
    rely on a non-exclusive 'lock'."""
    with pytest.raises(fsio.ConditionalPutUnsupported):
        fsio.create_exclusive("gs://bucket/x", b"d")
    # local and file:// keep true O_EXCL
    assert fsio.create_exclusive(str(tmp_path / "a"), b"1") is True
    assert fsio.create_exclusive(str(tmp_path / "a"), b"2") is False
    assert fsio.supports_conditional_put(str(tmp_path / "a"))
    assert not fsio.supports_conditional_put("gs://bucket/x")


def test_mock_scheme_table_commits_through_backend(spark):
    """The whole metadata protocol (create / data-free commits /
    config evolution / CAS) runs over a registered object-store
    backend — the path real S3/GCS deployments take with a
    conditional-put client."""
    store = fsio.MemoryObjectStore()
    fsio.register_object_backend("mock", store)
    try:
        t = KeyedTable(spark, "mock://bucket/tbl", ["id"], n_buckets=4)
        t.create(spark.createDataFrame([Row(id=1, v="a")]))
        assert t.exists()
        # two racing writers for version 2: exactly one CAS win
        barrier = threading.Barrier(2)
        outcomes = []

        def attempt():
            w = KeyedTable(spark, "mock://bucket/tbl", ["id"])
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
        # the log object is real bytes in the store, versioned+dense
        raw = json.loads(store.read_bytes(
            "mock://bucket/tbl/_log/" + f"{2:020d}.json"))
        assert raw["version"] == 2 and raw["config"]["n_buckets"] == 4
    finally:
        fsio.unregister_object_backend("mock")


def test_two_writer_contention_property(spark, tmp_path):
    """The round's 'done' gate: concurrent writers over one table —
    every CAS loser retries; afterwards (a) no update was lost, (b)
    the log is DENSE (versions 1..latest, one object each), (c) every
    retained version's snapshot still resolves, (d) every data dir on
    disk is referenced by exactly one commit (no orphans from losers).
    """
    import os
    path = str(tmp_path / "contend")
    seedt = KeyedTable(spark, path, ["id"], n_buckets=4)
    seedt.apply_mutations(
        spark.createDataFrame([Row(id=i, v=-1, w=0) for i in range(8)]),
        "INSERT")

    errors = []

    def writer(wid, n_ops):
        t = KeyedTable(spark, path, ["id"])
        for op in range(n_ops):
            batch = spark.createDataFrame(
                [Row(id=100 + wid * 10 + op, v=wid, w=op)])
            for _ in range(30):  # bounded optimistic retries
                try:
                    r = t.apply_mutations(batch, "INSERT_OR_UPDATE")
                    assert r.applied == 1
                    break
                except ConcurrentWriteError:
                    continue
            else:
                errors.append((wid, op, "retries exhausted"))

    threads = [threading.Thread(target=writer, args=(w, 2))
               for w in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors

    t = KeyedTable(spark, path, ["id"])
    # (a) nothing lost: seed rows + all 6 writer rows
    got = {r.id for r in t.read().collect()}
    assert got == set(range(8)) | {100 + w * 10 + o
                                   for w in range(3) for o in range(2)}
    # (b) dense log
    commits = t._commits()
    assert [c["version"] for c in commits] == \
        list(range(1, len(commits) + 1))
    # (c) every version's snapshot resolves and row counts are
    # monotonically consistent with the upsert-only history
    counts = [t._snapshot(c["version"]).count() for c in commits]
    assert counts == sorted(counts)
    # (d) no orphaned staging directories
    referenced = {c["dir"] for c in commits if c.get("dir")}
    assert set(os.listdir(os.path.join(path, "data"))) == referenced


def test_checkpoint_fold_matches_full_fold(spark, tmp_path):
    """Snapshot resolution folds from the latest checkpoint object —
    it must equal the from-scratch fold over every entry, before and
    after the checkpoint boundary, and the checkpoint must actually
    exist at the cadence version."""
    path = str(tmp_path / "ckpt")
    t = KeyedTable(spark, path, ["id"], n_buckets=4)
    for i in range(12):  # create + 12 commits -> version 13, ckpt at 10
        t.apply_mutations(
            spark.createDataFrame([Row(id=i % 6, v=i)]),
            "INSERT_OR_UPDATE")
    assert t._latest_version() == 13
    assert fsio.exists(t._ckpt_path(10))

    def brute(version):
        owners = {}
        for e in t._commits():
            if e["version"] > version:
                break
            present = set(e.get("present", []))
            for b in e.get("buckets", []):
                owners[int(b)] = e["dir"] if int(b) in present else None
        return owners

    for v in (5, 9, 10, 11, 13):
        assert t._owners(v) == brute(v), f"fold mismatch at v{v}"
    # and the folded snapshot reads right through the boundary
    assert {(r.id, r.v) for r in t._snapshot(13).collect()} == \
        {(i % 6, max(j for j in range(12) if j % 6 == i % 6))
         for i in range(6)}


def test_vacuum_log_truncation_keeps_retained_reads_exact(spark, tmp_path):
    """truncate_log=True reclaims commit objects the floor made
    unreadable: entries at/below the newest checkpoint <= floor are
    deleted (the checkpoint IS their fold), every retained version
    still reads bit-exactly — including from a FRESH instance with no
    cache — and bounds landing in the reclaimed prefix raise."""
    path = str(tmp_path / "trunc")
    t = KeyedTable(spark, path, ["id"], n_buckets=4)
    rows = {}
    bounds = {}
    for i in range(13):  # create(v1) + 13 data commits -> latest 14
        t.apply_mutations(
            spark.createDataFrame([Row(id=i % 5, v=i)]),
            "INSERT_OR_UPDATE")
        rows[i + 2] = {**rows.get(i + 1, {}), i % 5: i}
        bounds[i + 2] = t._commits()[-1]["time"]
    assert t._latest_version() == 14
    assert fsio.exists(t._ckpt_path(10))

    t.vacuum(keep_last=2, truncate_log=True)  # v15; floor = 13
    kept = [c["version"] for c in t._commits()]
    assert kept == [11, 12, 13, 14, 15]  # <=ckpt-10 prefix reclaimed
    assert fsio.exists(t._ckpt_path(10))  # the fold itself is kept

    fresh = KeyedTable(spark, path, ["id"])  # no warm cache
    assert {(r.id, r.v) for r in fresh.read().collect()} \
        == set(rows[14].items())
    assert {(r.id, r.v) for r in fresh.read_at(bounds[13]).collect()} \
        == set(rows[13].items())
    with pytest.raises(ValueError, match="vacuum"):
        fresh.read_at(bounds[12])     # below the floor
    with pytest.raises(ValueError, match="retained|vacuum"):
        fresh.read_at(bounds[4])      # inside the reclaimed prefix


def test_apply_mutations_with_retry_wins_after_contention(spark, tmp_path):
    """The ergonomic client loop: a rival stealing the version makes
    plain apply_mutations raise; the with_retry variant recomputes
    against the new state and lands, with BOTH writers' rows intact."""
    path = str(tmp_path / "retry")
    rival = KeyedTable(spark, path, ["id"])
    rival.create(spark.createDataFrame([Row(id=0, v=0)]))

    class Contended(KeyedTable):
        fire = 2  # rival commits ahead of our first TWO attempts

        def _commit_entry(self, version, buckets, dirname, present,
                          config):
            if self.fire:
                self.fire -= 1
                rival.apply_mutations(
                    spark.createDataFrame([Row(id=100 + self.fire, v=-1)]),
                    "INSERT_OR_UPDATE")
            super()._commit_entry(version, buckets, dirname, present,
                                  config)

    t = Contended(spark, path, ["id"])
    with pytest.raises(ConcurrentWriteError):
        t.apply_mutations(spark.createDataFrame([Row(id=1, v=1)]),
                          "INSERT")
    r = t.apply_mutations_with_retry(
        spark.createDataFrame([Row(id=2, v=2)]), "INSERT",
        retries=3, backoff_s=0.01)
    assert r.applied == 1
    got = {x.id for x in rival.read().collect()}
    assert got == {2, 100, 101}  # both rival rows + the retried insert


def test_vacuum_safety_property_random_histories():
    """Model-based hypothesis property over the commit-log METADATA
    protocol (no Spark — KeyedTable's fold/vacuum/truncate layers are
    pure metadata on the fsio seam): for ANY random commit history
    (arbitrary touched/present sets, data-free commits included) and
    ANY retention choice,

      1. vacuum never deletes a directory any RETAINED version's
         owner fold still references (the deadness rule is safe);
      2. the checkpoint-accelerated fold equals the from-scratch fold
         at every retained version, before and after log truncation;
      3. truncation never changes what a retained version reads.

    Data directories are simulated as marker objects in a
    MemoryObjectStore, so deletion is observable."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.data())
    def run(data):
        store = fsio.MemoryObjectStore()
        fsio.register_object_backend("hypmock", store)
        try:
            root = "hypmock://b/t"
            t = KeyedTable(None, root, ["id"], n_buckets=4)
            cfg = {"n_buckets": 4, "keys": ["id"],
                   "schema": '{"type":"struct","fields":[]}',
                   "cluster": None, "min_retained_version": 1}
            t._commit_entry(1, [], None, [], cfg)
            n = data.draw(st.integers(4, 24), label="n_commits")
            for v in range(2, n + 2):
                touched = sorted(data.draw(
                    st.sets(st.integers(0, 3), max_size=4),
                    label=f"touched_v{v}"))
                present = (sorted(data.draw(
                    st.sets(st.sampled_from(touched),
                            max_size=len(touched)),
                    label=f"present_v{v}")) if touched else [])
                dirname = f"v{v:05d}-x" if touched else None
                for b in present:
                    store.write_bytes(
                        f"{root}/data/{dirname}/kb={b}/part-0", b"d")
                t._commit_entry(v, touched, dirname, present, cfg)

            entries_before = list(t._commits())

            def brute(version):
                owners = {}
                for e in entries_before:
                    if e["version"] > version:
                        break
                    pres = set(e.get("present", []))
                    for b in e.get("buckets", []):
                        owners[int(b)] = (e["dir"] if int(b) in pres
                                          else None)
                return owners

            keep = data.draw(st.integers(1, 6), label="keep_last")
            truncate = data.draw(st.booleans(), label="truncate_log")
            t.vacuum(keep_last=keep, truncate_log=truncate)

            fresh = KeyedTable(None, root, ["id"])  # cold cache
            latest = fresh._latest_version()
            floor = int(fresh._meta()["min_retained_version"])
            for v in range(floor, latest + 1):
                folded = fresh._owners(v)
                assert folded == brute(v), f"fold drift at v{v}"
                for b, d in folded.items():
                    if d is None:
                        continue
                    leaf = f"{root}/data/{d}/kb={b}"
                    assert store.is_dir(leaf), \
                        f"vacuum deleted retained v{v} owner {leaf}"
        finally:
            fsio.unregister_object_backend("hypmock")

    run()
