"""Synthetic-data generator source (reference S6, the largest single
component: transforms/DummyToMutation.java, 752 LoC).

Reference behavior reproduced:

* table spec `"t1:1000,t2:20000"` -> name -> row-count map
  (DummyToMutation.java:128-129);
* per-table YAML config: `randomRate` null-injection percent
  (default 20, `:50`) and per-field `range: [min, max]` value pools
  (`:323-368`; shape compatible with the reference's
  dummy_table_example.yaml);
* per-type generators (`:450-751`):
  - STRING: choice from range list else UUID+UUID, truncated to the
    column max length (`:472-475`);
  - BYTES: PK -> decimal-string bytes of the sequence number, else
    SHA-512 of the sequence (`:510`);
  - INT64: PK -> sequence value; else uniform in [min, max) (`:545-550`);
  - FLOAT64: uniform in [min, max) (`:562-598`);
  - BOOL: fair coin (`:600-630`);
  - DATE: start + seq days for PK, random days otherwise (`:632-672`);
  - TIMESTAMP: start + seq/random seconds (`:674-719`);
  - ARRAY<T>: always exactly 10 elements (`:433-440`); nested arrays
    rejected (`:748`);
* null injection on non-PK nullable fields with prob randomRate%
  (`:429-431`);
* parallelism: the reference fans out seq ranges via
  AddSeqNumber x parallelNum -> GroupByKey (`:234-289`);
  `spark.range(0, n, 1, parallelism)` IS that pattern natively — each
  partition generates its own [start, end) slice, no shuffle at all.

Determinism: the reference draws from java.util.Random / UUID. Here
every draw is a pure function of (seed, table, field, row id) via
md5 — so generated data is reproducible across runs and cluster
layouts, and the DuckDB oracle can recompute it exactly (the
q70/q71 entries in queries/generator_queries.py do).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

try:
    import yaml  # noqa: F401
    _HAS_YAML = True
except Exception:  # pragma: no cover - sandbox may lack pyyaml
    _HAS_YAML = False

SUPPORTED_TYPES = ("STRING", "BYTES", "INT64", "FLOAT64", "BOOL",
                   "DATE", "TIMESTAMP")
#: reference: arrays always generate exactly 10 elements
ARRAY_LEN = 10
DEFAULT_RANDOM_RATE = 20  # percent, reference DummyToMutation.java:50

_EPOCH_START = "2000-01-01 00:00:00"  # generation origin for date/timestamp


@dataclass
class FieldSpec:
    name: str
    type: str              # one of SUPPORTED_TYPES or ARRAY<T>
    is_primary: bool = False
    nullable: bool = True
    max_length: int | None = None      # STRING(n)/BYTES(n)
    range: list | None = None          # value pool / [min, max]


@dataclass
class TableSpec:
    name: str
    count: int
    fields: list[FieldSpec] = field(default_factory=list)
    random_rate: int = DEFAULT_RANDOM_RATE

    @classmethod
    def from_table(cls, spark: SparkSession, table: str,
                   primary_keys: list[str], count: int = 1000,
                   random_rate: int = DEFAULT_RANDOM_RATE) -> "TableSpec":
        """Build the spec from an existing catalog table's schema — the
        reference reads column/PK/nullability from INFORMATION_SCHEMA
        (DummyToMutation.java:105-111,143-158); Spark's catalog carries
        the same facts, with primary keys supplied by the caller
        (Spark has no PK metadata).
        """
        from pyspark.sql import types as T
        to_gen = {
            T.StringType: "STRING", T.BinaryType: "BYTES",
            T.LongType: "INT64", T.IntegerType: "INT64",
            T.ShortType: "INT64", T.ByteType: "INT64",
            T.DoubleType: "FLOAT64", T.FloatType: "FLOAT64",
            T.BooleanType: "BOOL", T.DateType: "DATE",
            T.TimestampType: "TIMESTAMP", T.TimestampNTZType: "TIMESTAMP",
        }

        def lower(dt) -> str:
            if isinstance(dt, T.ArrayType):
                return f"ARRAY<{lower(dt.elementType)}>"
            if isinstance(dt, T.DecimalType):
                return "FLOAT64"  # generator draws; NUMERIC cast at sink
            for klass, name in to_gen.items():
                if isinstance(dt, klass):
                    return name
            raise ValueError(f"no generator lowering for {dt}")

        missing = [k for k in primary_keys
                   if k not in spark.table(table).columns]
        if missing:
            raise ValueError(f"primary keys {missing} not in {table}")
        fields = [
            FieldSpec(f.name, lower(f.dataType),
                      is_primary=f.name in primary_keys,
                      nullable=bool(f.nullable) and f.name not in primary_keys)
            for f in spark.table(table).schema.fields]
        return cls(name=table, count=count, fields=fields,
                   random_rate=random_rate)


def parse_tables_arg(arg: str) -> dict[str, int]:
    """`"t1:1000,t2:20000"` -> {"t1": 1000, "t2": 20000}."""
    out: dict[str, int] = {}
    for part in arg.split(","):
        name, count = part.strip().rsplit(":", 1)
        out[name] = int(count)
    return out


def load_yaml_config(text: str) -> dict:
    """Parse the reference-compatible YAML config ({tables: [{name,
    randomRate, fields: [{name, range}]}]})."""
    if not _HAS_YAML:
        raise ImportError("pyyaml unavailable; pass config as dict instead")
    import yaml
    return yaml.safe_load(text) or {}


def apply_config(spec: TableSpec, config: dict) -> TableSpec:
    """Overlay a parsed YAML config onto a TableSpec."""
    for tbl in (config or {}).get("tables", []):
        if tbl.get("name") != spec.name:
            continue
        if "randomRate" in tbl:
            spec.random_rate = int(tbl["randomRate"])
        by_name = {f.name: f for f in spec.fields}
        for fcfg in tbl.get("fields", []):
            if fcfg.get("name") in by_name and "range" in fcfg:
                by_name[fcfg["name"]].range = list(fcfg["range"])
    return spec


# ---------------------------------------------------------------------------
# Deterministic primitive draws: every value = f(seed, table, field, id)
# ---------------------------------------------------------------------------


def _h(seed: str, table: str, fname: str, salt: str) -> Column:
    """md5 hex of (seed, table, field, salt, id) — the reproducible
    entropy source (id is the spark.range column)."""
    return F.md5(F.concat_ws("#", F.lit(seed), F.lit(table), F.lit(fname),
                             F.lit(salt), F.col("id").cast("string")))


def _uniform01(seed: str, table: str, fname: str, salt: str) -> Column:
    """Uniform double in [0, 1) from the first 8 hex chars (32 bits)."""
    return (F.conv(F.substring(_h(seed, table, fname, salt), 1, 8), 16, 10)
            .cast("double") / F.lit(float(1 << 32)))


def _gen_scalar(f: FieldSpec, t: TableSpec, seed: str, salt: str = "v") -> Column:
    u = _uniform01(seed, t.name, f.name, salt)
    if f.range:
        # choice from the configured pool (reference STRING/INT64 range)
        pool = F.array(*[F.lit(v) for v in f.range])
        idx = (u * F.lit(len(f.range))).cast("int") + 1
        choice = F.element_at(pool, idx)
        if f.type == "INT64":
            return choice.cast("long")
        if f.type == "FLOAT64":
            return choice.cast("double")
        return choice.cast("string")
    if f.type == "STRING":
        # reference: UUID+UUID truncated to STRING(n); here two md5 hexes
        s = F.concat(_h(seed, t.name, f.name, salt + "a"),
                     _h(seed, t.name, f.name, salt + "b"))
        return F.substring(s, 1, f.max_length or 64)
    if f.type == "BYTES":
        if f.is_primary:
            return F.col("id").cast("string").cast("binary")
        return F.sha2(F.col("id").cast("string").cast("binary"), 512).cast("binary")
    if f.type == "INT64":
        if f.is_primary:
            return F.col("id")
        return (u * F.lit(1_000_000)).cast("long")
    if f.type == "FLOAT64":
        return u * F.lit(1_000_000.0)
    if f.type == "BOOL":
        return u < 0.5
    if f.type == "DATE":
        days = F.col("id") if f.is_primary else (u * 3650).cast("int")
        return F.date_add(F.lit(_EPOCH_START[:10]).cast("date"),
                          days.cast("int"))
    if f.type == "TIMESTAMP":
        secs = F.col("id") if f.is_primary else (u * 86400 * 3650).cast("long")
        return F.timestamp_seconds(
            F.unix_timestamp(F.lit(_EPOCH_START).cast("timestamp")) + secs)
    raise ValueError(f"unsupported generator type {f.type!r}")


def _gen_field(f: FieldSpec, t: TableSpec, seed: str) -> Column:
    if f.type.startswith("ARRAY<"):
        inner_type = f.type[6:-1]
        if inner_type.startswith("ARRAY"):
            # reference rejects nested arrays (DummyToMutation.java:748)
            raise ValueError("ARRAY<ARRAY<..>> not supported")
        inner = FieldSpec(name=f.name, type=inner_type,
                          is_primary=False, nullable=False,
                          max_length=f.max_length, range=f.range)
        gen = F.array(*[
            _gen_scalar(inner, t, seed, salt=f"e{i}") for i in range(ARRAY_LEN)
        ])
    else:
        gen = _gen_scalar(f, t, seed)
    if f.nullable and not f.is_primary and t.random_rate > 0:
        null_u = _uniform01(seed, t.name, f.name, "null")
        gen = F.when(null_u * 100 < t.random_rate,
                     F.lit(None)).otherwise(gen)
    return gen.alias(f.name)


def generate_table(spark: SparkSession, spec: TableSpec,
                   seed: str = "42", parallelism: int | None = None) -> DataFrame:
    """The generator source: `spark.range(count)` + one generated column
    per field. Zero shuffles; each partition emits its own id slice —
    the Spark-native form of the reference's AddSeqNumber/GroupByKey
    fan-out (DummyToMutation.java:234-289)."""
    if parallelism is None:
        parallelism = spark.sparkContext.defaultParallelism
    base = spark.range(0, spec.count, 1, parallelism)
    return base.select(*[_gen_field(f, spec, seed) for f in spec.fields])
