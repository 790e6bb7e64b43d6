"""Table catalog: register parquet/avro/csv/json paths as temp views.

Replaces the reference's runtime schema discovery (sample-1-element +
side-input broadcast, reference: templates/SpannerToBigQuery.java:84-89,
transforms/StructToAvroTransform.java:95-97): a Spark DataFrame carries
its schema statically, so registration is just `createOrReplaceTempView`
and every downstream operator reads `df.schema`.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflowtemplates_spark.session import ensure_engine_confs

#: The driver-generated test tables (TESTDATA.md).
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Footer-only inspection (no data read)."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    probe = path
    if os.path.isdir(path):
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not parts:
            return []
        probe = os.path.join(path, parts[0])
    schema = pq.read_schema(probe)
    return [f.name for f in schema
            if pat.is_timestamp(f.type) and f.type.unit == "ns"]


#: Per-session memo of loaded table DataFrames, keyed by (path, stat
#: signature). A DataFrame is an immutable PLAN over a snapshot of the
#: path's file listing — pure metadata, no data or results are held —
#: so reusing it is exactly equivalent to rebuilding it while skipping
#: the parquet footer reads and the schema-inference Spark job that
#: `spark.read.parquet` pays on every call (measured 0.2-0.8s per
#: register_tables invocation, which every query path performs on
#: entry). The stat signature (mtime_ns, size, file count for dirs)
#: invalidates the memo whenever the path's contents change, so
#: regenerated fixture dirs reload; WeakKeyDictionary drops the memo
#: with its session.
_DF_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary())


def _path_sig(path: str) -> tuple:
    st = os.stat(path)
    if os.path.isdir(path):
        # Every member's (name, mtime_ns, size) folds into the
        # signature: rewriting a part file IN PLACE (same name) does
        # not bump the directory's own mtime, so the dir stat alone
        # would serve a stale plan with stale file lengths. O(entries)
        # stat calls — microseconds against the 0.2-0.8s rebuild this
        # memo exists to skip.
        members = []
        for name in sorted(os.listdir(path)):
            try:
                m = os.stat(os.path.join(path, name))
                members.append((name, m.st_mtime_ns, m.st_size))
            except OSError:
                members.append((name, -1, -1))
        return (st.st_mtime_ns, tuple(members))
    return (st.st_mtime_ns, st.st_size)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table from a scale-factor directory.

    TIMESTAMP(NANOS) columns (illegal for Spark's parquet reader) are
    read as raw nanos longs and truncated to microsecond timestamps —
    the same truncation DuckDB applies natively.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        memo = _DF_MEMO.setdefault(spark, {})
    except TypeError:  # un-weakref-able session stand-in (tests)
        memo = {}
    sig = _path_sig(path)
    hit = memo.get(path)
    if hit is not None and hit[0] == sig:
        return hit[1]
    df = _load_table_uncached(spark, path)
    memo[path] = (sig, df)
    return df


def _load_table_uncached(spark: SparkSession, path: str) -> DataFrame:
    from pyspark.sql.types import LongType

    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # nanosAsLong only applies to files WITHOUT Spark writer
        # metadata (the driver's pyarrow-written tables). Spark reads
        # its OWN nanos files as proper timestamps via the footer
        # schema — only convert when the column actually arrived long.
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(
                c, F.expr(f"timestamp_micros(CAST({c} DIV 1000 AS LONG))"))
    return df


def register_tables(spark: SparkSession, sf_dir: str,
                    tables: tuple[str, ...] = TABLES) -> SparkSession:
    """Register every table in ``sf_dir`` as a temp view named after it.

    Idempotent and cheap (no data read — parquet footer only), so query
    functions call it on entry.
    """
    if not os.path.isdir(sf_dir):
        raise FileNotFoundError(
            f"scale-factor directory does not exist: {sf_dir!r} "
            "(would silently keep previously-registered views)")
    ensure_engine_confs(spark)
    try:
        memo = _DF_MEMO.setdefault(spark, {})
    except TypeError:
        memo = {}
    views = memo.setdefault("_views", {})
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            # Re-registering the identical plan is a no-op by
            # definition (and nothing else in the repo ever binds these
            # view names — verified), so skip the py4j round trip when
            # this session already holds exactly this registration.
            key = (path, memo.get(path, (None,))[0])
            if views.get(name) != key:
                df.createOrReplaceTempView(name)
                views[name] = key
    return spark


def register_path(spark: SparkSession, name: str, path: str,
                  fmt: str = "parquet", **options) -> DataFrame:
    """Register an arbitrary file path as a named view (any format)."""
    df = spark.read.format(fmt).options(**options).load(path)
    df.createOrReplaceTempView(name)
    return df
