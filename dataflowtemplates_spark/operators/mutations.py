"""Keyed-table mutation sink: the upsert/delete write dispositions
(reference K5/K6/K8/K10).

The reference writes Spanner `Mutation`s with an op in {INSERT, UPDATE,
REPLACE, INSERT_OR_UPDATE} plus DELETE-by-key, under REPORT_FAILURES
(failed mutations stream out as an error collection instead of killing
the job) — templates/SpannerToSpanner.java:109-121, op dispatch at
util/converter/StructToMutationConverter.java:152-167, delete-key build
at `:112-150`.

Spark-first equivalent: a parquet-directory-backed keyed table (the
local stand-in for a Spanner table; a Delta/Iceberg MERGE or JDBC
connector slots into the same seam) with join-based conflict detection
*before* the write — that is how per-row failure isolation works
without a transactional store:

* INSERT          — key already present  -> quarantined (AlreadyExists)
* UPDATE          — key absent           -> quarantined (NotFound)
* REPLACE         — delete-then-insert: unspecified target columns
                    become NULL
* INSERT_OR_UPDATE— upsert: unspecified target columns keep their
                    current value
* DELETE          — by composite key, in the user-given field order;
                    a null key field is an error -> quarantined
                    (StructToMutationConverter.java:115-117)

Duplicate keys within one batch mirror Spanner's "multiple mutations
for the same row in one commit" error: one row (deterministically the
first by batch order hash) applies, the rest quarantine.

STORAGE LAYOUT — hash-bucketed, rewrite-pruned. The table directory is
Hive-partitioned on ``kb = pmod(xxhash64(key cols), n_buckets)``::

    table/
      kb=0/part-*.parquet      # bucket 0, current version
      kb=7/part-*.parquet
      _meta.json               # n_buckets, key cols, schema, retention
      _commits.json            # [{version, time, buckets: [..]}, ...]
      _history/v-00003/kb=7/   # bucket 7's files as they stood at v3
                               #   (i.e. commit 4 touched bucket 7)

A key's bucket is a pure function of its value, so a mutation batch
can only ever touch the buckets its keys hash into: conflict detection
reads ONLY those buckets (partition-pruned scan), and the commit
rewrites ONLY those buckets — every other bucket's data files are left
byte-identical on disk. A 1-row upsert into a 100 TB table therefore
costs O(table / n_buckets), not O(table) — the same economics as the
reference's batched Spanner mutations (SpannerToSpanner.java:109-114
never rewrites the table) and as a Delta/Iceberg MERGE, whose commit
log is this seam hardened. Superseded bucket directories move (never
delete) into ``_history/v-NNNNN/``, so `read_at` timestamp bounds stay
honest; `vacuum(keep_last=N)` reclaims history beyond a retention
window with an explicit floor recorded in `_meta.json`.

Every mutation call returns a MutationResult carrying the applied count
and the quarantine DataFrame (K8); `write_failure_count` renders K10's
count notification file.

Scale: conflict detection is one shuffle join on the key columns (AQE
handles skew) against the pruned bucket slice.

CONCURRENCY — optimistic, enforced. Each mutation records the commit
version its reads are based on; the directory swap + log append run
under an exclusive O_EXCL lock sentinel and CAS-check that the log
still sits at that base version. A concurrent second writer fails
cleanly with :class:`ConcurrentWriteError` (no interleaved moves, no
silently lost version) and can retry against the new state — the same
optimistic protocol a Delta/Iceberg commit log provides, which is the
documented seam at object-store scale (the reference delegates this to
Spanner's transactions, SpannerToSpanner.java:109-114). Table CREATION
remains first-writer-wins without the lock (create() is an idempotent
IF NOT EXISTS).
"""

from __future__ import annotations

import json
import posixpath
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataflowtemplates_spark.operators import fsio

VALID_OPS = ("INSERT", "UPDATE", "REPLACE", "INSERT_OR_UPDATE", "DELETE")

_ERR_COL = "_error"
_BUCKET_COL = "kb"  # no underscore: Spark's file index hides _-prefixed dirs


class ConcurrentWriteError(RuntimeError):
    """A second writer raced this commit: either the commit lock was
    held, or the commit log advanced past the version this mutation
    was computed against (lost-update prevention). The mutation did
    NOT apply; retry against the new table state."""


@dataclass
class MutationResult:
    """Applied row count + quarantine stream (reference K8/K10)."""
    applied: int
    quarantine: DataFrame

    @property
    def failed(self) -> int:
        return self.quarantine.count()


def _validate_cluster_spec(cluster_by, cluster_mode: str):
    """Shared ctor/optimize validation -> cluster meta dict or None."""
    if cluster_by is None:
        return None
    if cluster_mode not in ("linear", "zorder"):
        raise ValueError(
            f"cluster_mode must be linear|zorder, got {cluster_mode}")
    if cluster_mode == "zorder" and len(cluster_by) != 2:
        raise ValueError("zorder clustering interleaves exactly 2 columns")
    if not cluster_by:
        raise ValueError("cluster_by must be non-empty when given")
    return {"by": list(cluster_by), "mode": cluster_mode}


def _validate_cluster_columns(cluster: dict, schema: T.StructType) -> None:
    """Cluster columns must exist; zorder needs integer-castable ones."""
    have = {f.name for f in schema.fields}
    missing = [c for c in cluster["by"] if c not in have]
    if missing:
        raise ValueError(
            f"cluster_by columns not in table schema: {missing}")
    if cluster["mode"] == "zorder":
        numeric = (T.ByteType, T.ShortType, T.IntegerType,
                   T.LongType, T.DateType, T.TimestampType,
                   T.TimestampNTZType)
        bad = [f.name for f in schema.fields
               if f.name in cluster["by"]
               and not isinstance(f.dataType, numeric)]
        if bad:
            raise ValueError(
                "zorder clustering needs integer-castable "
                f"columns; got non-numeric: {bad}")


def _zorder_bigint_expr(schema: T.StructType, col: str) -> str:
    """SQL expression reducing a zorder cluster column to BIGINT.

    DATE is whitelisted by `_validate_cluster_columns` but Spark
    rejects a direct DATE->BIGINT cast (DATATYPE_MISMATCH), so dates
    lower to epoch days via datediff — order-preserving, which is all
    the Morton normalization needs. TIMESTAMP casts to epoch seconds
    natively; integral types cast directly."""
    dt = {f.name: f.dataType for f in schema.fields}.get(col)
    if isinstance(dt, T.DateType):
        return f"datediff({col}, DATE '1970-01-01')"
    return f"cast({col} as bigint)"


#: sentinel: _commit_buckets clusters per the live meta unless the
#: caller (optimize) overrides with the layout it is switching TO
_USE_META = object()


class KeyedTable:
    """Hash-bucketed parquet keyed table (local Spanner stand-in).

    ``n_buckets`` sizes the rewrite granularity: a mutation commit
    rewrites only the buckets its keys hash into, so at scale pick
    n_buckets ~ table_bytes / desired_rewrite_bytes (thousands for a
    100 TB table). The value is fixed at table creation and recorded in
    ``_meta.json``; readers always use the stored value.
    """

    def __init__(self, spark: SparkSession, path: str,
                 key_fields: list[str], n_buckets: int = 16,
                 schema_evolution: bool = False,
                 cluster_by: list[str] | None = None,
                 cluster_mode: str = "linear"):
        if not key_fields:
            raise ValueError("key_fields must be non-empty")
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        _validate_cluster_spec(cluster_by, cluster_mode)
        self.spark = spark
        self.path = path
        self.keys = list(key_fields)
        self._default_n_buckets = int(n_buckets)
        #: Within-bucket file clustering, fixed at creation like
        #: n_buckets and recorded in _meta.json: every commit's staged
        #: files come out sorted by the cluster key ("linear": the
        #: columns in order; "zorder": the Morton interleave of two
        #: numeric columns, min/max-normalized per rewritten slice —
        #: Delta OPTIMIZE ZORDER economics). Readers then skip files /
        #: row groups on the clustered columns via parquet min-max
        #: stats; q171 measures what that buys.
        self._default_cluster = (
            {"by": list(cluster_by), "mode": cluster_mode}
            if cluster_by else None)
        #: Delta mergeSchema-style opt-in: with it on, storable batch
        #: columns the table lacks EXTEND the stored schema (existing
        #: rows read NULL for them — parquet's missing-column
        #: semantics); with it off (default) they are dropped at the
        #: boundary, mirroring the STRUCT/nested-array skip.
        self.schema_evolution = bool(schema_evolution)

    # -- metadata --------------------------------------------------------
    # All metadata and directory commits go through pyarrow.fs
    # (operators/fsio.py), so the table works on any rename-capable
    # filesystem (local, file://, hdfs://). Object stores lack atomic
    # directory rename — there the same public API commits through a
    # log-based table format (the documented Delta/Iceberg seam).
    def _meta_path(self) -> str:
        return posixpath.join(self.path, "_meta.json")

    def _meta(self) -> dict:
        return json.loads(fsio.read_bytes(self._meta_path()))

    def _write_meta(self, meta: dict) -> None:
        tmp = posixpath.join(self.path, "._meta.tmp")
        fsio.write_bytes(tmp, json.dumps(meta).encode())
        fsio.move(tmp, self._meta_path())

    def _schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self._meta()["schema"]))

    def _bucket_expr(self, n_buckets: int):
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.keys]),
                      F.lit(n_buckets)).cast("int")

    def _commits(self) -> list[dict]:
        log = posixpath.join(self.path, "_commits.json")
        if not fsio.exists(log):
            return []
        return json.loads(fsio.read_bytes(log))

    def _append_commit(self, buckets: list[int],
                       expected_version: int | None = None) -> None:
        """Append a commit entry with a strictly monotonic timestamp.

        Commit times are the read_at contract's key: two commits landing
        in the same microsecond would make both bounds resolve to the
        later version, so a non-advancing clock is bumped 1µs past the
        prior commit.

        ``expected_version`` is the optimistic-concurrency check (CAS):
        when given, the log's last version must still equal it — a
        mismatch means another writer committed since this mutation
        read its base state, and appending would silently lose that
        writer's commit. Callers hold the commit lock around the
        check+write (see `_commit_buckets`)."""
        from datetime import datetime, timedelta, timezone
        commits = self._commits()
        if expected_version is not None:
            last = commits[-1]["version"] if commits else 0
            if last != expected_version:
                raise ConcurrentWriteError(
                    f"commit log at {self.path} advanced to version "
                    f"{last} while this mutation was computed against "
                    f"version {expected_version}; retry")
        now = datetime.now(timezone.utc)
        if commits:
            prev = datetime.fromisoformat(commits[-1]["time"])
            if now <= prev:
                now = prev + timedelta(microseconds=1)
        commits.append(
            {"version": (commits[-1]["version"] + 1) if commits else 1,
             "time": now.isoformat(),
             "buckets": sorted(int(b) for b in buckets)})
        tmp_log = posixpath.join(self.path, "._commits.tmp")
        fsio.write_bytes(tmp_log, json.dumps(commits).encode())
        fsio.move(tmp_log, posixpath.join(self.path, "_commits.json"))

    # -- single-writer enforcement ----------------------------------------
    def _lock_path(self) -> str:
        return posixpath.join(self.path, "_commit.lock")

    def _require_lockable(self) -> None:
        """Reject object-store paths BEFORE any Spark work runs: the
        commit protocol's single-writer sentinel needs an atomic
        create-exclusive, which pyarrow's object-store layer degrades
        to check-then-write. Called fail-fast at mutation entry (so an
        expensive staging job is never run and discarded) and again by
        the lock itself."""
        if "://" in self.path and not self.path.startswith("file://"):
            raise NotImplementedError(
                "KeyedTable single-writer commit enforcement requires an "
                "atomic create-exclusive, which object-store paths do not "
                f"provide ({self._lock_path()}); use a log-based table "
                "format (Delta/Iceberg) for object-store deployments")

    def _acquire_commit_lock(self) -> None:
        """Take the exclusive commit lock (O_EXCL sentinel). Failing to
        take it means another writer is mid-commit — fail cleanly
        rather than interleave directory moves with theirs.

        Scheme (object-store) paths are rejected outright: pyarrow's
        create-exclusive there degrades to check-then-write, which is
        NOT exclusive — two writers could both "acquire" it and
        interleave history moves. Single-writer enforcement on object
        stores belongs to a log-based table format's conditional-put
        commit (the documented Delta/Iceberg seam), not this
        sentinel."""
        import os
        from datetime import datetime, timezone
        self._require_lockable()
        payload = json.dumps({
            "pid": os.getpid(),
            "time": datetime.now(timezone.utc).isoformat()}).encode()
        if not fsio.create_exclusive(self._lock_path(), payload):
            # best-effort holder info: the winner may release the lock
            # between our failed create and this read
            try:
                held = fsio.read_bytes(
                    self._lock_path()).decode(errors="replace")
            except OSError:
                held = "holder unknown: lock released mid-read"
            raise ConcurrentWriteError(
                f"commit lock already held at {self._lock_path()} "
                f"({held}); a concurrent writer is mid-commit "
                f"(force_unlock() clears a lock orphaned by a crash)")

    def _release_commit_lock(self) -> None:
        if fsio.exists(self._lock_path()):
            fsio.delete_file(self._lock_path())

    def force_unlock(self) -> None:
        """Administrative: clear a commit lock orphaned by a crashed
        writer. Never call while a writer is live."""
        self._release_commit_lock()

    def _base_version(self) -> int:
        """The version this mutation's reads are based on — the CAS
        token `_commit_buckets` later verifies under the lock."""
        commits = self._commits()
        return commits[-1]["version"] if commits else 0

    # -- read ------------------------------------------------------------
    def exists(self) -> bool:
        return fsio.exists(self._meta_path())

    def _bucket_dirs(self) -> list[str]:
        if not fsio.is_dir(self.path):
            return []
        return [fn for fn in fsio.list_dir(self.path)
                if fn.startswith(f"{_BUCKET_COL}=")]

    def read(self) -> DataFrame:
        if not self.exists():
            raise FileNotFoundError(f"table not initialized: {self.path}")
        schema = self._schema()
        if not self._bucket_dirs():
            return self.spark.createDataFrame([], schema)
        full = T.StructType(
            list(schema.fields)
            + [T.StructField(_BUCKET_COL, T.IntegerType())])
        return (self.spark.read.schema(full).parquet(self.path)
                .drop(_BUCKET_COL))

    def _read_buckets(self, buckets: list[int]) -> DataFrame:
        """Current state of the given buckets only — the partition-
        pruned slice a mutation batch joins against."""
        schema = self._schema()
        if not buckets or not self._bucket_dirs():
            return self.spark.createDataFrame([], schema)
        full = T.StructType(
            list(schema.fields)
            + [T.StructField(_BUCKET_COL, T.IntegerType())])
        return (self.spark.read.schema(full).parquet(self.path)
                .filter(F.col(_BUCKET_COL).isin([int(b) for b in buckets]))
                .drop(_BUCKET_COL))

    def _resolve_version(self, timestamp_bound: str) -> int:
        """Timestamp bound -> version id (last commit at or before the
        bound), with the first-commit and vacuum-floor guards."""
        ts = _parse_bound(timestamp_bound)
        commits = self._commits()
        if not commits:
            raise FileNotFoundError(f"table not initialized: {self.path}")
        visible = [c for c in commits if _parse_bound(c["time"]) <= ts]
        if not visible:
            raise ValueError(
                f"timestamp bound {timestamp_bound!r} precedes the "
                f"table's first commit at {commits[0]['time']}")
        version = visible[-1]["version"]
        if version < commits[-1]["version"]:
            floor = int(self._meta().get("min_retained_version", 1))
            if version < floor:
                raise ValueError(
                    f"timestamp bound {timestamp_bound!r} resolves to "
                    f"version {version}, which was vacuumed (retention "
                    f"floor: version {floor})")
        return version

    def _snapshot(self, version: int,
                  only_buckets: list[int] | None = None) -> DataFrame:
        """The table state at ``version``, optionally restricted to a
        bucket subset. Resolution is commit-log metadata only: bucket
        ``k``'s content at version N was written by the last commit
        T <= N that touched k; those files sit in the current directory
        if no later commit touched k, else in ``_history/v-{T'-1}``
        where T' is the first touch after N. No data is scanned to
        resolve a snapshot."""
        commits = self._commits()
        if version == commits[-1]["version"]:
            return (self.read() if only_buckets is None
                    else self._read_buckets(only_buckets))
        only = None if only_buckets is None else {int(b)
                                                 for b in only_buckets}
        touches: dict[int, list[int]] = {}
        for c in commits:
            for b in c.get("buckets", []):
                touches.setdefault(int(b), []).append(c["version"])
        leaf_dirs = []
        for b, ts_list in touches.items():
            if only is not None and b not in only:
                continue
            if not any(v <= version for v in ts_list):
                continue  # bucket did not exist yet at this version
            later = [v for v in ts_list if v > version]
            if later:
                d = posixpath.join(self.path, "_history",
                                   f"v-{min(later) - 1:05d}",
                                   f"{_BUCKET_COL}={b}")
            else:
                d = posixpath.join(self.path, f"{_BUCKET_COL}={b}")
            if fsio.is_dir(d):
                leaf_dirs.append(d)
        schema = self._schema()
        if not leaf_dirs:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*leaf_dirs)

    def read_at(self, timestamp_bound: str) -> DataFrame:
        """Snapshot read at an exact-staleness timestamp bound — the
        reference's TimestampBound.ofReadTimestamp semantics
        (SpannerQueryIO.java:129-136): the state produced by the last
        commit at or before the bound, regardless of later mutations.
        """
        return self._snapshot(self._resolve_version(timestamp_bound))

    def changes_between(self, bound_from: str, bound_to: str) -> DataFrame:
        """Change-data-feed between two timestamp bounds: every row
        inserted, deleted, or updated in ``(from, to]``, tagged with a
        ``_change_type`` column in Delta CDF's convention (``insert`` /
        ``delete`` / ``update_preimage`` / ``update_postimage``).
        Semantics are NET row differences between the two snapshots: an
        upsert that leaves a row value-identical is not a change.

        Scale shape: the commit log names the buckets touched between
        the two versions, so BOTH snapshots are read partition-pruned
        to that subset — a CDC pull after a small mutation window reads
        O(changed buckets), never O(table). The diff itself is one
        full-outer key join between the two pruned slices (AQE handles
        skew); the four change classes are selects over that single
        join (Catalyst reuses the exchange across the union branches).
        """
        v0 = self._resolve_version(bound_from)
        v1 = self._resolve_version(bound_to)
        if v1 < v0:
            raise ValueError(
                f"bound_to resolves to version {v1}, before bound_from "
                f"(version {v0})")
        touched = sorted({int(b)
                          for c in self._commits()
                          if v0 < c["version"] <= v1
                          for b in c.get("buckets", [])})
        schema = self._schema()
        data_cols = [f.name for f in schema.fields]
        if not touched or v0 == v1:
            return (self.spark.createDataFrame([], schema)
                    .withColumn("_change_type", F.lit(None).cast("string")))
        old = self._snapshot(v0, touched)
        new = self._snapshot(v1, touched)
        o = old.select(*[F.col(c).alias(f"_o_{c}") for c in data_cols])
        n = new.select(*[F.col(c).alias(f"_n_{c}") for c in data_cols])
        cond = None
        for k in self.keys:
            p = F.col(f"_o_{k}") == F.col(f"_n_{k}")
            cond = p if cond is None else (cond & p)
        j = o.join(n, cond, "full_outer")
        ok = F.col(f"_o_{self.keys[0]}")
        nk = F.col(f"_n_{self.keys[0]}")
        non_keys = [c for c in data_cols if c not in self.keys]
        differs = F.lit(False)
        for c in non_keys:
            differs = differs | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))

        def project(frame: DataFrame, prefix: str, tag: str) -> DataFrame:
            return frame.select(
                *[F.col(f"{prefix}{c}").alias(c) for c in data_cols],
                F.lit(tag).alias("_change_type"))

        inserts = project(j.filter(ok.isNull()), "_n_", "insert")
        deletes = project(j.filter(nk.isNull()), "_o_", "delete")
        upd = j.filter(ok.isNotNull() & nk.isNotNull() & differs)
        pre = project(upd, "_o_", "update_preimage")
        post = project(upd, "_n_", "update_postimage")
        return inserts.unionByName(deletes).unionByName(pre) \
            .unionByName(post)

    def register(self, name: str,
                 timestamp_bound: str | None = None) -> None:
        """Expose the table (optionally a snapshot) to spark.sql."""
        df = self.read_at(timestamp_bound) if timestamp_bound else self.read()
        df.createOrReplaceTempView(name)

    # -- DDL -------------------------------------------------------------
    def create(self, df_schema_source: DataFrame) -> None:
        """CREATE TABLE IF NOT EXISTS from a DataFrame's schema
        (reference R12: auto-create before first write,
        SpannerTablePrepareDoFn.java:44-159)."""
        if self.exists():
            return
        src = df_schema_source
        skipped = self._unstorable_columns(src)
        if skipped:
            src = src.drop(*skipped)
        meta = {
            "n_buckets": self._default_n_buckets,
            "keys": self.keys,
            "schema": src.schema.json(),
            "min_retained_version": 1,
        }
        if self._default_cluster:
            _validate_cluster_columns(self._default_cluster, src.schema)
            meta["cluster"] = self._default_cluster
        fsio.mkdirs(self.path)
        self._write_meta(meta)
        self._append_commit([])

    def _evolve_schema(self, batch: DataFrame) -> None:
        """Extend the stored schema with storable batch columns it
        lacks (schema_evolution=True). Metadata-only: no data files are
        rewritten — existing files simply read NULL for the new columns
        under the explicit read schema, exactly Delta's mergeSchema
        economics.

        The read-modify-write of the schema runs under the commit lock:
        two concurrent writers evolving DIFFERENT columns would
        otherwise each union against the same base and the second write
        would drop the first's column — and since the column-dropping
        writer can be the one that LOSES the commit CAS, the winner's
        committed data could end up with a column the stored schema no
        longer projects (invisible data). Lock-serialized unions make
        every evolution additive over the latest state."""
        # cheap unlocked pre-check: the common no-new-columns case
        # must not pay a lock round-trip per mutation
        have = {f.name for f in self._schema().fields}
        if all(f.name in have for f in batch.schema.fields):
            return
        self._acquire_commit_lock()
        try:
            stored = self._schema()
            have = {f.name for f in stored.fields}
            new = [f for f in batch.schema.fields if f.name not in have]
            if not new:
                return
            meta = self._meta()
            meta["schema"] = T.StructType(
                list(stored.fields) + new).json()
            self._write_meta(meta)
        finally:
            self._release_commit_lock()

    # -- mutations -------------------------------------------------------
    def apply_mutations(self, batch: DataFrame, op: str) -> MutationResult:
        op = op.upper()
        if op not in VALID_OPS:
            raise ValueError(f"op must be one of {VALID_OPS}, got {op!r}")
        if op == "DELETE":
            return self._delete(batch)
        return self._write(batch, op)

    def _dedupe_batch(self, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Split a batch into one-mutation-per-key + quarantined extras
        (Spanner rejects multiple mutations for one row per commit)."""
        from pyspark.sql import Window as W
        # materialize the batch-order id in a projection first: window
        # orderBy rejects nondeterministic expressions directly
        batch = batch.withColumn("_mid", F.monotonically_increasing_id())
        w = W.partitionBy(*self.keys).orderBy("_mid")
        marked = batch.withColumn("_rn", F.row_number().over(w)).drop("_mid")
        keep = marked.filter(F.col("_rn") == 1).drop("_rn")
        dups = (marked.filter(F.col("_rn") > 1).drop("_rn")
                .withColumn(_ERR_COL, F.lit("DUPLICATE_KEY_IN_BATCH")))
        return keep, dups

    def _null_key_split(self, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Null in any key field is an error (reference:
        StructToMutationConverter.java:115-117)."""
        null_pred = None
        for k in self.keys:
            p = F.col(k).isNull()
            null_pred = p if null_pred is None else (null_pred | p)
        bad = (batch.filter(null_pred)
               .withColumn(_ERR_COL, F.lit("NULL_KEY_FIELD")))
        good = batch.filter(~null_pred)
        return good, bad

    def _unstorable_columns(self, batch: DataFrame) -> list[str]:
        """C4 boundary rule: Spanner cannot store STRUCT columns, and
        ARRAY<ARRAY>/ARRAY<STRUCT> are rejected — the reference's
        converter silently skips them when building mutations
        (StructToMutationConverter.java:59-62,89-96)."""
        out = []
        for f in batch.schema.fields:
            dt = f.dataType
            if isinstance(dt, T.StructType):
                out.append(f.name)
            elif isinstance(dt, T.ArrayType) and isinstance(
                    dt.elementType, (T.ArrayType, T.StructType)):
                out.append(f.name)
        return out

    def _touched_buckets(self, keyed: DataFrame, n_buckets: int) -> list[int]:
        """Distinct buckets a batch's keys hash into — bounded by
        n_buckets, so the collect is O(bucket count) driver state, never
        O(rows)."""
        rows = (keyed.select(self._bucket_expr(n_buckets).alias("b"))
                .distinct().collect())
        return sorted(int(r["b"]) for r in rows)

    def _write(self, batch: DataFrame, op: str) -> MutationResult:
        """Job economics (the per-commit constant, shaved round 10):
        the batch checkpoint carries the touched-bucket set and batch
        size as riding Observation metrics (no separate distinct job);
        INSERT/UPDATE fold applied-count + actually-rewritten-bucket
        set into ONE aggregate job on ``applies``, then rewrite ONLY
        the buckets an applying row hashes into — a bucket whose batch
        rows all quarantined is never rewritten nor history-moved, and
        an all-conflict batch commits as a data-free log entry with no
        staging write at all. REPLACE/INSERT_OR_UPDATE apply every
        kept row by definition, so their applied count is the
        checkpoint metric and no extra job runs."""
        from pyspark.sql import Observation
        skipped = self._unstorable_columns(batch)
        if skipped:
            import logging
            logging.getLogger(__name__).warning(
                "skipping non-storable mutation columns %s "
                "(STRUCT / nested ARRAY at the keyed-table boundary)",
                skipped)
            batch = batch.drop(*skipped)
        self._require_lockable()  # fail BEFORE any Spark job runs
        self.create(batch)
        if self.schema_evolution:
            self._evolve_schema(batch)
        # base_version BEFORE n_buckets: rebucket appends its commit and
        # THEN updates _meta (both under the lock), so "meta shows new
        # n_buckets" implies "version advanced". Reading in this order
        # makes any interleaving with a rebucket either consistent or a
        # clean CAS failure — never a stale-layout write that passes.
        base_version = self._base_version()
        n_buckets = int(self._meta()["n_buckets"])
        good, null_q = self._null_key_split(batch)
        keep, dup_q = self._dedupe_batch(good)
        # materialize once: the window over monotonically_increasing_id
        # is nondeterministic under re-evaluation, and `keep` feeds both
        # conflict detection and the merge. The touched-bucket set and
        # batch size ride the checkpoint job as Observation metrics.
        keep_obs = Observation()
        keep = keep.observe(
            keep_obs,
            F.collect_set(self._bucket_expr(n_buckets)).alias("bks"),
            F.count(F.lit(1)).alias("n"))
        keep = keep.localCheckpoint(eager=True)
        touched = sorted(int(b) for b in keep_obs.get["bks"])
        keep_n = int(keep_obs.get["n"])
        target = self._read_buckets(touched)

        key_cols = [F.col(k) for k in self.keys]
        existing_keys = target.select(*key_cols).distinct()

        if op in ("INSERT", "UPDATE"):
            if op == "INSERT":
                conflicts = (keep.join(existing_keys, self.keys, "left_semi")
                             .withColumn(_ERR_COL, F.lit("ALREADY_EXISTS")))
                applies = keep.join(existing_keys, self.keys, "left_anti")
            else:
                conflicts = (keep.join(existing_keys, self.keys, "left_anti")
                             .withColumn(_ERR_COL, F.lit("NOT_FOUND")))
                applies = keep.join(existing_keys, self.keys, "left_semi")
            # one job: applied count + the buckets that actually change
            row = (applies
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.collect_set(self._bucket_expr(n_buckets))
                        .alias("bks"))
                   .collect()[0])
            applied_n = int(row["n"])
            rewrite = sorted(int(b) for b in row["bks"])
            # conflict-only buckets are untouched; re-plan the merge
            # against the pruned slice so their files never rewrite.
            # keep must be pre-filtered to the rewrite buckets: a
            # conflict row's key is absent from the PRUNED slice, so
            # an unfiltered anti-join would wrongly admit it.
            if rewrite != touched:
                target = self._read_buckets(rewrite)
                existing_keys = target.select(*key_cols).distinct()
                keep_rw = keep.filter(
                    self._bucket_expr(n_buckets)
                    .isin([int(b) for b in rewrite]))
                applies = (keep_rw.join(existing_keys, self.keys,
                                        "left_anti")
                           if op == "INSERT" else
                           keep_rw.join(existing_keys, self.keys,
                                        "left_semi"))
            if op == "INSERT":
                new_slice = target.unionByName(
                    _conform(applies, target), allowMissingColumns=False)
            else:
                new_slice = self._merge(target, applies,
                                        keep_unspecified=True)
        else:  # REPLACE / INSERT_OR_UPDATE: every kept row applies
            conflicts = _empty_with_error(keep)
            applies = keep
            applied_n = keep_n
            rewrite = touched
            new_slice = self._merge(
                target, applies, keep_unspecified=(op != "REPLACE"))

        # Materialize the quarantine BEFORE the commit: its lineage reads
        # the pre-mutation bucket files, which the commit moves aside.
        quarantine = (null_q.unionByName(dup_q).unionByName(conflicts)
                      .localCheckpoint(eager=True))
        if applied_n == 0:
            # nothing changed: data-free commit, no staging write, no
            # history move — the no-op fast path
            self._commit_buckets(self._read_buckets([]), [], n_buckets,
                                 base_version)
        else:
            self._commit_buckets(new_slice, rewrite, n_buckets,
                                 base_version)
        return MutationResult(applied=applied_n, quarantine=quarantine)

    def _merge(self, target: DataFrame, batch: DataFrame,
               keep_unspecified: bool) -> DataFrame:
        """Upsert batch into target. Columns present in the target but
        not in the batch: kept (INSERT_OR_UPDATE/UPDATE) or nulled
        (REPLACE = delete-then-insert, Spanner semantics)."""
        tcols = target.columns
        bcols = set(batch.columns)
        survivors = target.join(batch.select(*self.keys), self.keys, "left_anti")
        if keep_unspecified and not bcols.issuperset(tcols):
            # pull unspecified columns' current values via join on key
            current = target.select(
                *self.keys,
                *[c for c in tcols if c not in bcols])
            enriched = batch.join(current, self.keys, "left")
        else:
            enriched = batch
        return survivors.unionByName(_conform(enriched, target))

    def _delete(self, batch: DataFrame) -> MutationResult:
        """K6: delete by composite key, key fields in the given order
        (reference: templates/SpannerToSpannerDelete.java:78-91).

        One bounded agg job over the (bucket-pruned) touched slice
        counts matched rows and the buckets that actually lose rows;
        untouched and miss-only buckets are never rewritten. The
        applied count deliberately does NOT ride the commit write's
        Observation — that pattern crashed `Observation.get`
        (toPyRow AssertionError) on small result sets, the exact
        shape of the reference template (key-columns-only batch
        against a few-row table)."""
        if not self.exists():
            raise FileNotFoundError(f"table not initialized: {self.path}")
        self._require_lockable()  # fail BEFORE any Spark job runs
        # base_version before n_buckets — same rebucket-race ordering
        # argument as _write
        base_version = self._base_version()
        n_buckets = int(self._meta()["n_buckets"])
        keyed = batch.select(*self.keys)
        good, null_q = self._null_key_split(keyed)
        # hits is bounded by the batch's distinct keys; checkpointing it
        # eagerly (a) cuts the batch lineage (which may itself read this
        # table's live files — the template's query does) and (b) lets
        # one frame feed the touched-bucket probe, the applied-count
        # agg, and the survivor anti-join without recomputation.
        hits = good.distinct().localCheckpoint(eager=True)
        touched = self._touched_buckets(hits, n_buckets)
        null_q = null_q.localCheckpoint(eager=True)
        if not touched:  # nothing to delete: data-free commit
            self._commit_buckets(self._read_buckets([]), [], n_buckets,
                                 base_version)
            return MutationResult(applied=0, quarantine=null_q)
        target = self._read_buckets(touched)
        # one job: deleted-row count + the buckets that actually change
        # (mirrors _write's applies aggregate, mutations.py:556-563)
        row = (target.join(hits, self.keys, "left_semi")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.collect_set(self._bucket_expr(n_buckets))
                    .alias("bks"))
               .collect()[0])
        applied_n = int(row["n"])
        rewrite = sorted(int(b) for b in row["bks"])
        if applied_n == 0:
            # every key missed: no bucket changes — data-free commit
            self._commit_buckets(self._read_buckets([]), [], n_buckets,
                                 base_version)
            return MutationResult(applied=0, quarantine=null_q)
        # join strategy left to AQE: hits is checkpointed with a known
        # size, so small delete batches broadcast and large ones shuffle
        survivors = (self._read_buckets(rewrite)
                     .join(hits, self.keys, "left_anti"))
        self._commit_buckets(survivors, rewrite, n_buckets, base_version)
        return MutationResult(applied=applied_n, quarantine=null_q)

    # -- storage ---------------------------------------------------------
    def _apply_clustering(self, staged: DataFrame,
                          cluster_override=_USE_META) -> DataFrame:
        """Sort the staged slice within each bucket partition by the
        table's cluster key (meta ``cluster``, fixed at creation), so
        every committed file carries tight parquet min/max stats on the
        clustered columns — the write-time purchase of read-time file
        and row-group skipping that q171 measures.

        linear: sortWithinPartitions on the columns in order. zorder:
        min/max-normalize the two columns over THIS slice (a broadcast
        1-row aggregate — per-rewrite scaling, exactly Delta's
        OPTIMIZE ZORDER) and sort by their Morton interleave. Both are
        map-side only: no exchange is added after the bucket
        repartition, and the helper columns are projected away before
        the write (a projection preserves per-partition sort order).
        NULL cluster values sort first, deterministically."""
        cluster = (self._meta().get("cluster")
                   if cluster_override is _USE_META else cluster_override)
        if not cluster:
            return staged
        if cluster["mode"] == "linear":
            return staged.sortWithinPartitions(
                _BUCKET_COL, *cluster["by"])
        from dataflowtemplates_spark.functions.zorder import (
            normalized_zorder_spark)
        c1, c2 = cluster["by"]
        e1 = _zorder_bigint_expr(staged.schema, c1)
        e2 = _zorder_bigint_expr(staged.schema, c2)
        bounds = staged.agg(
            F.min(F.expr(e1)).alias("__zlo1"),
            F.max(F.expr(e1)).alias("__zhi1"),
            F.min(F.expr(e2)).alias("__zlo2"),
            F.max(F.expr(e2)).alias("__zhi2"))
        z = normalized_zorder_spark(
            e1, e2, "__zlo1", "__zhi1", "__zlo2", "__zhi2")
        return (staged.crossJoin(F.broadcast(bounds))
                .withColumn("__zval", F.expr(z))
                .sortWithinPartitions(_BUCKET_COL, "__zval")
                .drop("__zlo1", "__zhi1", "__zlo2", "__zhi2", "__zval"))

    def _commit_buckets(self, new_slice: DataFrame, touched: list[int],
                        n_buckets: int,
                        expected_version: int | None = None,
                        on_commit=None, verify_layout: bool = True,
                        cluster_override=_USE_META) -> None:
        """Commit the rewritten slice: stage the new files for the
        touched buckets, then — under the exclusive commit lock, with
        the commit log CAS-checked against ``expected_version`` — move
        the superseded bucket directories into ``_history/v-{prev}/``
        (never delete — `read_at`'s contract), swap the staged
        directories in, and append the commit-log entry. Buckets
        outside ``touched`` are not read, moved, or rewritten — their
        files stay byte-identical (`tests/test_mutations.py` pins
        this). A concurrent second writer either fails to take the
        lock or fails the CAS; it never interleaves moves or silently
        drops a version. At real scale this seam is a Delta/Iceberg
        commit (whose log provides the same CAS).

        ``verify_layout`` (all callers except rebucket itself): under
        the lock, the meta ``n_buckets`` must still equal the layout
        this slice was hashed with. The read-order discipline alone
        (base_version before n_buckets) is NOT sufficient — a writer
        whose two unlocked reads BOTH land inside rebucket's locked
        window (after its commit append, before its meta swap) sees
        the advanced version with the old layout and would pass the
        CAS; this in-lock check is what actually closes the race."""
        if not touched:
            self._acquire_commit_lock()
            try:
                self._append_commit([], expected_version)
                if on_commit is not None:
                    on_commit()
            finally:
                self._release_commit_lock()
            return
        staging = posixpath.join(
            posixpath.dirname(self.path) or ".",
            f".staging-{uuid.uuid4().hex[:8]}")
        try:
            # the staging write (the expensive Spark job) runs OUTSIDE
            # the lock: it touches only the private staging directory
            try:
                staged = (new_slice
                          .withColumn(_BUCKET_COL,
                                      self._bucket_expr(n_buckets))
                          .repartition(len(touched), F.col(_BUCKET_COL)))
                staged = self._apply_clustering(staged, cluster_override)
                (staged.write.mode("overwrite")
                 .partitionBy(_BUCKET_COL).parquet(staging))
            except Exception as exc:
                # the slice's lineage lazily re-reads live bucket files;
                # a rival commit mid-job moves those into _history, so
                # the losing writer surfaces an opaque FileNotFound
                # instead of the retry contract. Re-check the log and
                # name the real cause.
                if expected_version is not None:
                    try:
                        commits = self._commits()
                        cur = commits[-1]["version"] if commits else 0
                    except Exception:
                        raise exc
                    if cur != expected_version:
                        raise ConcurrentWriteError(
                            f"commit log at {self.path} advanced to "
                            f"version {cur} during this mutation's "
                            f"staging write (base version "
                            f"{expected_version}); retry") from exc
                raise
            self._acquire_commit_lock()
            try:
                commits = self._commits()
                prev_version = commits[-1]["version"]
                if (expected_version is not None
                        and prev_version != expected_version):
                    raise ConcurrentWriteError(
                        f"commit log at {self.path} advanced to version "
                        f"{prev_version} while this mutation was computed "
                        f"against version {expected_version}; retry")
                if verify_layout:
                    live_nb = int(self._meta()["n_buckets"])
                    if live_nb != n_buckets:
                        raise ConcurrentWriteError(
                            f"table at {self.path} was rebucketed to "
                            f"{live_nb} buckets while this mutation was "
                            f"staged against {n_buckets}; retry")
                hist = posixpath.join(self.path, "_history",
                                      f"v-{prev_version:05d}")
                for b in touched:
                    cur = posixpath.join(self.path, f"{_BUCKET_COL}={b}")
                    if fsio.is_dir(cur):
                        fsio.mkdirs(hist)
                        fsio.move(cur, posixpath.join(
                            hist, f"{_BUCKET_COL}={b}"))
                for fn in fsio.list_dir(staging):
                    if fn.startswith(f"{_BUCKET_COL}="):
                        fsio.move(posixpath.join(staging, fn),
                                  posixpath.join(self.path, fn))
                self._append_commit(touched, expected_version)
                if on_commit is not None:
                    on_commit()
            finally:
                self._release_commit_lock()
        finally:
            if fsio.exists(staging):
                fsio.delete_dir(staging)

    # -- maintenance -----------------------------------------------------
    def optimize(self, cluster_by: list[str] | None = None,
                 cluster_mode: str = "linear") -> None:
        """Delta ``OPTIMIZE [ZORDER BY]`` for this table: one O(table)
        rewrite commit that re-lays every bucket's files out under the
        given clustering (or UN-clusters with ``cluster_by=None``) and
        records the new layout in ``_meta.json`` so every subsequent
        mutation commit keeps it. Retrofit path for tables created
        without ``cluster_by`` — the amortization argument is
        rebucket's: one table-scan rewrite buys tight parquet min/max
        stats on every read thereafter.

        Protocol economics are rebucket's too: the staged slice is
        clustered per the TARGET layout (``cluster_override``) while
        meta still records the old one; the meta swap runs under the
        commit lock after the log append (``on_commit``), and
        ``verify_layout`` stays ON — a concurrent rebucket fails this
        commit's CAS rather than interleaving. History stays
        resolvable: pre-optimize ``read_at`` bounds land in
        ``_history/v-{prev}`` as for any commit, and a pure layout
        change contributes no ``changes_between`` rows (values are
        untouched)."""
        new_cluster = _validate_cluster_spec(cluster_by, cluster_mode)
        if new_cluster:
            _validate_cluster_columns(new_cluster, self._schema())
        self._require_lockable()  # fail BEFORE the O(table) rewrite
        base_version = self._base_version()
        n_buckets = int(self._meta()["n_buckets"])
        touched = sorted(range(n_buckets))

        def _swap_meta():
            m = self._meta()
            if new_cluster:
                m["cluster"] = new_cluster
            else:
                m.pop("cluster", None)
            self._write_meta(m)

        self._commit_buckets(self.read(), touched, n_buckets,
                             base_version, on_commit=_swap_meta,
                             cluster_override=new_cluster)

    def rebucket(self, n_buckets_new: int) -> None:
        """Change the hash-bucket layout — the grow path for a table
        that has outgrown its creation-time ``n_buckets`` (rewrite
        granularity sizing: n_buckets ~ table_bytes /
        desired_rewrite_bytes, so a growing table periodically doubles
        it). One O(table) rewrite commit — inherent for a layout
        change and amortized over every subsequent O(table/n_buckets)
        mutation.

        Snapshot history stays resolvable across the boundary because
        the rebucket commit records the UNION of old and new bucket
        ids: every old id's pre-rebucket directory gets the rebucket
        as its "first touch after", so pre-boundary ``read_at`` bounds
        resolve into ``_history/v-{prev}`` exactly as for any other
        commit, while old-only ids (a shrink) resolve to no current
        directory post-boundary and drop out. ``changes_between``
        across the boundary diffs VALUES, so a pure layout change
        contributes no change rows (pinned in test_mutations.py).

        The ``_meta.json`` bucket-count update happens under the same
        commit lock, AFTER the commit-log append (the ``on_commit``
        hook) — so a concurrent writer observing the new n_buckets is
        guaranteed to also observe the advanced version and fail its
        CAS; writers read base_version before n_buckets for exactly
        this ordering. Under a log-based table format (the documented
        Delta/Iceberg seam) both land in one metadata commit.
        """
        if n_buckets_new < 1:
            raise ValueError("n_buckets must be >= 1")
        self._require_lockable()  # fail BEFORE the O(table) rewrite
        base_version = self._base_version()
        meta = self._meta()
        old_n = int(meta["n_buckets"])
        if n_buckets_new == old_n:
            return
        touched = sorted(set(range(old_n)) | set(range(n_buckets_new)))

        def _swap_meta():
            m = self._meta()
            m["n_buckets"] = int(n_buckets_new)
            self._write_meta(m)

        # staging write executes the read() plan while the old bucket
        # directories are still in place; the swap happens after.
        # verify_layout=False: rebucket IS the layout change — its
        # slice is deliberately hashed with the NEW n_buckets while
        # meta still records the old one until _swap_meta runs.
        self._commit_buckets(self.read(), touched, n_buckets_new,
                             base_version, on_commit=_swap_meta,
                             verify_layout=False)

    def vacuum(self, keep_last: int = 1) -> int:
        """Reclaim history older than the last ``keep_last`` versions
        (the current version always counts as one of them), mirroring
        Delta's VACUUM retention contract: ``read_at`` bounds resolving
        to a retained version keep working bit-exactly; earlier bounds
        raise with the recorded retention floor instead of silently
        reading a half-present snapshot. Returns the number of history
        version directories removed.

        Runs under the commit lock: vacuum's read-modify-write of
        ``_meta.json`` would otherwise race a concurrent rebucket's
        locked meta update and could write back a STALE ``n_buckets``
        (a layout-corrupting lost update), and holding the lock also
        keeps the history scan consistent with any in-flight commit's
        directory moves."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        # initialized-check BEFORE the lock: an uninitialized table must
        # raise the documented error, not ENOENT on the lock sentinel
        if not self.exists() or not self._commits():
            raise FileNotFoundError(f"table not initialized: {self.path}")
        self._acquire_commit_lock()
        try:
            commits = self._commits()
            if not commits:
                raise FileNotFoundError(
                    f"table not initialized: {self.path}")
            meta = self._meta()
            floor = max(int(meta.get("min_retained_version", 1)),
                        commits[-1]["version"] - keep_last + 1)
            hist_root = posixpath.join(self.path, "_history")
            removed = 0
            if fsio.is_dir(hist_root):
                for fn in fsio.list_dir(hist_root):
                    if not fn.startswith("v-"):
                        continue
                    # _history/v-W is only needed by snapshots at
                    # version N <= W (see read_at resolution); W <
                    # floor can no longer be resolved, so the
                    # directory is dead.
                    if int(fn[2:]) < floor:
                        fsio.delete_dir(posixpath.join(hist_root, fn))
                        removed += 1
            meta["min_retained_version"] = floor
            self._write_meta(meta)
        finally:
            self._release_commit_lock()
        return removed


def _parse_bound(s: str):
    """ISO timestamp (naive treated as UTC, trailing Z accepted)."""
    from datetime import datetime, timezone
    dt = datetime.fromisoformat(s.strip().replace(" ", "T")
                                .replace("Z", "+00:00"))
    return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)


def _conform(df: DataFrame, target: DataFrame) -> DataFrame:
    """Project df to the target's column set/order, nulling missing ones."""
    cols = []
    for f in target.schema.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def _empty_with_error(like: DataFrame) -> DataFrame:
    return (like.limit(0)
            .withColumn(_ERR_COL, F.lit(None).cast("string")))


def write_failure_count(result: MutationResult, path: str) -> int:
    """K10: failed-mutation count -> text notification file
    (reference: templates/BigQueryToSpanner.java:134-145)."""
    n = result.failed
    parent = posixpath.dirname(path)
    if parent:
        fsio.mkdirs(parent)
    fsio.write_bytes(path, str(n).encode())
    return n


def write_quarantine(result: MutationResult, path: str,
                     fmt: str = "avro") -> int:
    """K8: failed mutations -> Avro files, matching the reference
    (templates/SpannerToSpanner.java:116-121); other formats remain a
    seam. The Avro path uses the container writer in
    operators/avro_io.py, so it works without the spark-avro jar."""
    q = result.quarantine
    if fmt == "avro":
        from dataflowtemplates_spark.operators.avro_io import write_avro
        return write_avro(q, path).row_count  # count rides the write pass
    n = q.count()
    if n:
        q.write.mode("overwrite").format(fmt).save(path)
    return n
