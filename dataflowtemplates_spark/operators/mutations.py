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

Every call returns a MutationResult carrying the applied count and the
quarantine DataFrame (K8); `write_failure_count` renders K10's count
notification file.

Scale: conflict detection is one shuffle join on the key columns (AQE
handles skew); the rewrite writes only new files and swaps the
directory atomically. At real scale the same logic is a Delta MERGE —
the public `apply_mutations` signature is the seam.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VALID_OPS = ("INSERT", "UPDATE", "REPLACE", "INSERT_OR_UPDATE", "DELETE")

_ERR_COL = "_error"


@dataclass
class MutationResult:
    """Applied row count + quarantine stream (reference K8/K10)."""
    applied: int
    quarantine: DataFrame

    @property
    def failed(self) -> int:
        return self.quarantine.count()


class KeyedTable:
    """Parquet-directory-backed keyed table (local Spanner stand-in)."""

    def __init__(self, spark: SparkSession, path: str, key_fields: list[str]):
        if not key_fields:
            raise ValueError("key_fields must be non-empty")
        self.spark = spark
        self.path = path
        self.keys = list(key_fields)

    # -- read ------------------------------------------------------------
    def exists(self) -> bool:
        return os.path.isdir(self.path) and bool(
            [f for f in os.listdir(self.path) if f.endswith(".parquet")])

    def read(self) -> DataFrame:
        if not self.exists():
            raise FileNotFoundError(f"table not initialized: {self.path}")
        return self.spark.read.parquet(self.path)

    def read_at(self, timestamp_bound: str) -> DataFrame:
        """Snapshot read at an exact-staleness timestamp bound — the
        reference's TimestampBound.ofReadTimestamp semantics
        (SpannerQueryIO.java:129-136): the state produced by the last
        commit at or before the bound, regardless of later mutations.
        """
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
        if version == commits[-1]["version"]:
            return self.read()
        return self.spark.read.parquet(
            os.path.join(self.path, "_history", f"v-{version:05d}"))

    def register(self, name: str,
                 timestamp_bound: str | None = None) -> None:
        """Expose the table (optionally a snapshot) to spark.sql."""
        df = self.read_at(timestamp_bound) if timestamp_bound else self.read()
        df.createOrReplaceTempView(name)

    def _commits(self) -> list[dict]:
        log = os.path.join(self.path, "_commits.json")
        if not os.path.isfile(log):
            return []
        import json
        with open(log) as fh:
            return json.load(fh)

    # -- DDL -------------------------------------------------------------
    def create(self, df_schema_source: DataFrame) -> None:
        """CREATE TABLE IF NOT EXISTS from a DataFrame's schema
        (reference R12: auto-create before first write,
        SpannerTablePrepareDoFn.java:44-159)."""
        if self.exists():
            return
        self._swap_in(df_schema_source.limit(0))

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
        from pyspark.sql import types as T
        out = []
        for f in batch.schema.fields:
            dt = f.dataType
            if isinstance(dt, T.StructType):
                out.append(f.name)
            elif isinstance(dt, T.ArrayType) and isinstance(
                    dt.elementType, (T.ArrayType, T.StructType)):
                out.append(f.name)
        return out

    def _write(self, batch: DataFrame, op: str) -> MutationResult:
        skipped = self._unstorable_columns(batch)
        if skipped:
            import logging
            logging.getLogger(__name__).warning(
                "skipping non-storable mutation columns %s "
                "(STRUCT / nested ARRAY at the keyed-table boundary)",
                skipped)
            batch = batch.drop(*skipped)
        self.create(batch)
        target = self.read()
        batch = batch.select(*[c for c in batch.columns])  # stable projection
        good, null_q = self._null_key_split(batch)
        keep, dup_q = self._dedupe_batch(good)

        key_cols = [F.col(k) for k in self.keys]
        existing_keys = target.select(*key_cols).distinct()

        if op == "INSERT":
            conflicts = (keep.join(existing_keys, self.keys, "left_semi")
                         .withColumn(_ERR_COL, F.lit("ALREADY_EXISTS")))
            applies = keep.join(existing_keys, self.keys, "left_anti")
            new_target = target.unionByName(
                _conform(applies, target), allowMissingColumns=False)
        elif op == "UPDATE":
            conflicts = (keep.join(existing_keys, self.keys, "left_anti")
                         .withColumn(_ERR_COL, F.lit("NOT_FOUND")))
            applies = keep.join(existing_keys, self.keys, "left_semi")
            new_target = self._merge(target, applies, keep_unspecified=True)
        elif op == "REPLACE":
            conflicts = _empty_with_error(keep)
            applies = keep
            new_target = self._merge(target, applies, keep_unspecified=False)
        else:  # INSERT_OR_UPDATE
            conflicts = _empty_with_error(keep)
            applies = keep
            new_target = self._merge(target, applies, keep_unspecified=True)

        applied_n = applies.count()
        # Materialize the quarantine BEFORE the swap: its lineage reads
        # the pre-mutation table files, which the swap deletes.
        quarantine = (null_q.unionByName(dup_q).unionByName(conflicts)
                      .localCheckpoint(eager=True))
        self._swap_in(new_target)
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

        One pass over the target: matched-key rows are flagged by a
        left join and the applied count rides the rewrite job via
        Observation metrics (the earlier form cost two extra full
        scans: target.count() - survivors.count())."""
        from pyspark.sql import Observation
        target = self.read()
        keyed = batch.select(*self.keys)
        good, null_q = self._null_key_split(keyed)
        hits = good.distinct().withColumn("_hit", F.lit(1))
        marked = target.join(hits, self.keys, "left")
        obs = Observation()
        marked = marked.observe(
            obs, F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("applied"))
        survivors = marked.filter(F.col("_hit").isNull()).drop("_hit")
        null_q = null_q.localCheckpoint(eager=True)  # lineage may read old files
        self._swap_in(survivors)
        return MutationResult(applied=int(obs.get["applied"] or 0),
                              quarantine=null_q)

    # -- storage ---------------------------------------------------------
    def _swap_in(self, df: DataFrame) -> None:
        """Write-new-then-swap with VERSIONED history: the parquet
        stand-in for a transactional commit. Superseded data files move
        (not delete) into `_history/v-NNNNN/` and every commit appends
        to `_commits.json`, which is what makes `read_at` timestamp
        bounds honest against a mutating table. Underscore-prefixed
        entries are invisible to the plain parquet reader, so `read()`
        still sees only the current version. At real scale this seam is
        a Delta/Iceberg commit (their logs ARE this, hardened)."""
        from datetime import datetime, timezone
        staging = tempfile.mkdtemp(
            prefix=f".staging-{uuid.uuid4().hex[:8]}-",
            dir=os.path.dirname(self.path) or ".")
        try:
            df.write.mode("overwrite").parquet(staging)
            commits = self._commits() if os.path.isdir(self.path) else []
            if os.path.isdir(self.path):
                keep = {"_history", "_commits.json"}
                current = [fn for fn in os.listdir(self.path)
                           if fn not in keep]
                if commits:
                    vdir = os.path.join(
                        self.path, "_history",
                        f"v-{commits[-1]['version']:05d}")
                    os.makedirs(vdir, exist_ok=True)
                    for fn in current:
                        os.replace(os.path.join(self.path, fn),
                                   os.path.join(vdir, fn))
                else:  # legacy unversioned files: overwrite in place
                    for fn in current:
                        fp = os.path.join(self.path, fn)
                        shutil.rmtree(fp) if os.path.isdir(fp) \
                            else os.remove(fp)
            else:
                os.makedirs(self.path)
            for fn in os.listdir(staging):
                os.replace(os.path.join(staging, fn),
                           os.path.join(self.path, fn))
            os.rmdir(staging)
            # Commit times are the read_at contract's key: two commits
            # landing in the same microsecond would make both bounds
            # resolve to the later version. Enforce strict monotonicity
            # by bumping a non-advancing clock 1µs past the prior commit.
            now = datetime.now(timezone.utc)
            if commits:
                prev = datetime.fromisoformat(commits[-1]["time"])
                if now <= prev:
                    from datetime import timedelta
                    now = prev + timedelta(microseconds=1)
            commits.append(
                {"version": (commits[-1]["version"] + 1) if commits else 1,
                 "time": now.isoformat()})
            import json
            tmp_log = os.path.join(self.path, "._commits.tmp")
            with open(tmp_log, "w") as fh:
                json.dump(commits, fh)
            os.replace(tmp_log, os.path.join(self.path, "_commits.json"))
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise


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
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write(str(n))
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
