"""Oracle-checked queries over the synthetic generator source (S6).

The generator derives every value deterministically from
(seed, table, field, salt, id) via md5 (sources/generator.py), so the
DuckDB oracle REGENERATES the same table from `RANGE(0, n)` and the
same md5 arithmetic — a full-row equivalence proof of the generator,
far stronger than the reference's own tests (which only assert shapes;
its java.util.Random draws are unreproducible outside the JVM).

Portability notes baked into both sides:
* hex -> int: Spark `conv(x, 16, 10)`, DuckDB `CAST('0x'||x AS BIGINT)`;
* double -> int uses floor on both sides (Spark's cast truncates,
  DuckDB's rounds — floor agrees for the non-negative draws here);
* timestamps built by adding whole seconds to the epoch start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataflowtemplates_spark.sources.generator import (
    ARRAY_LEN,
    FieldSpec,
    TableSpec,
    generate_table,
)

_SEED = "42"
_N = 1000
_TBL = "gen1"

_SPEC = TableSpec(
    name=_TBL,
    count=_N,
    random_rate=20,
    fields=[
        FieldSpec("id", "INT64", is_primary=True, nullable=False),
        FieldSpec("name", "STRING", nullable=True, max_length=16),
        FieldSpec("category", "STRING", nullable=False,
                  range=["red", "green", "blue"]),
        FieldSpec("score", "FLOAT64", nullable=True),
        FieldSpec("active", "BOOL", nullable=False),
        FieldSpec("born", "DATE", nullable=True),
        FieldSpec("created", "TIMESTAMP", nullable=False),
        FieldSpec("pts", "ARRAY<INT64>", nullable=False),
    ],
)


def q70_generator_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full deterministic generated table (sf_dir unused: synthetic source).

    The `pts ARRAY<INT64>` column is rendered as a comma-joined string on
    BOTH sides so the driver's pandas-based canonicalizer (which cannot
    hash python lists) can sort+hash the result.
    """
    from pyspark.sql import functions as F
    df = generate_table(spark, _SPEC, seed=_SEED)
    return (df.withColumn(
                "pts",
                F.array_join(F.transform("pts", lambda x: x.cast("string")), ","))
            .orderBy("id"))


def q71_generator_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate profile: null-injection rate and per-category counts."""
    from pyspark.sql import functions as F
    df = generate_table(spark, _SPEC, seed=_SEED)
    return (df.groupBy("category")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("name").isNull(), 1).otherwise(0)).alias("n_null_name"),
                 F.sum(F.when(F.col("score").isNull(), 1).otherwise(0)).alias("n_null_score"),
                 F.sum(F.when(F.col("active"), 1).otherwise(0)).alias("n_active"))
            .orderBy("category"))


# ---------------------------------------------------------------------------
# DuckDB regeneration of the identical table
# ---------------------------------------------------------------------------


def _dd_h(fname: str, salt: str) -> str:
    return f"MD5('{_SEED}' || '#' || '{_TBL}' || '#' || '{fname}' || '#' || '{salt}' || '#' || CAST(i AS VARCHAR))"


def _dd_u(fname: str, salt: str) -> str:
    return (f"(CAST('0x' || SUBSTRING({_dd_h(fname, salt)}, 1, 8) AS BIGINT)"
            " / 4294967296.0)")


def _dd_nullable(fname: str, expr: str, rate: int) -> str:
    return (f"CASE WHEN {_dd_u(fname, 'null')} * 100 < {rate} THEN NULL "
            f"ELSE {expr} END")


def _dd_field(f: FieldSpec, rate: int) -> str:
    if f.range:
        pool = ", ".join(f"'{v}'" for v in f.range)
        expr = (f"(LIST_VALUE({pool}))"
                f"[CAST(FLOOR({_dd_u(f.name, 'v')} * {len(f.range)}) AS INTEGER) + 1]")
    elif f.type == "STRING":
        expr = (f"SUBSTRING({_dd_h(f.name, 'va')} || {_dd_h(f.name, 'vb')}, "
                f"1, {f.max_length or 64})")
    elif f.type == "INT64":
        expr = ("i" if f.is_primary
                else f"CAST(FLOOR({_dd_u(f.name, 'v')} * 1000000) AS BIGINT)")
    elif f.type == "FLOAT64":
        expr = f"{_dd_u(f.name, 'v')} * 1000000.0"
    elif f.type == "BOOL":
        expr = f"{_dd_u(f.name, 'v')} < 0.5"
    elif f.type == "DATE":
        days = ("i" if f.is_primary
                else f"CAST(FLOOR({_dd_u(f.name, 'v')} * 3650) AS INTEGER)")
        expr = f"DATE '2000-01-01' + CAST({days} AS INTEGER)"
    elif f.type == "TIMESTAMP":
        secs = ("i" if f.is_primary
                else f"CAST(FLOOR({_dd_u(f.name, 'v')} * 86400 * 3650) AS BIGINT)")
        expr = f"TIMESTAMP '2000-01-01 00:00:00' + {secs} * INTERVAL 1 SECOND"
    elif f.type == "ARRAY<INT64>":
        elems = ", ".join(
            f"CAST(FLOOR({_dd_u(f.name, f'e{i}')} * 1000000) AS BIGINT)"
            for i in range(ARRAY_LEN))
        expr = f"LIST_VALUE({elems})"
    else:
        raise ValueError(f"no oracle lowering for {f.type}")
    if f.nullable and not f.is_primary and rate > 0:
        expr = _dd_nullable(f.name, expr, rate)
    return f"{expr} AS {f.name}"


def _gen_oracle() -> str:
    cols = ",\n       ".join(_dd_field(f, _SPEC.random_rate) for f in _SPEC.fields)
    return (f"SELECT {cols}\nFROM RANGE(0, {_N}) t(i)\nORDER BY id")


_Q70_ORACLE = f"""
WITH gen AS ({_gen_oracle()})
SELECT id, name, category, score, active, born, created,
       array_to_string(pts, ',') AS pts
FROM gen ORDER BY id
"""

_Q71_ORACLE = f"""
WITH gen AS ({_gen_oracle()})
SELECT category, COUNT(*) AS n,
       CAST(SUM(CASE WHEN name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_name,
       CAST(SUM(CASE WHEN score IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_score,
       CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active
FROM gen GROUP BY category ORDER BY category
"""

QUERIES = {
    "q70_generator_rows": q70_generator_rows,
    "q71_generator_profile": q71_generator_profile,
}

ORACLES = {
    "q70_generator_rows": _Q70_ORACLE,
    "q71_generator_profile": _Q71_ORACLE,
}
