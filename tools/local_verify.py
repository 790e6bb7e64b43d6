"""Local stand-in for the driver's correctness harness — but stricter.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given scale factor and compares row count, column names,
and the exact multiset of canonicalized values (no tolerance, no
rounding: floats compare by bit pattern via repr). If this passes, any
order-insensitive value-hash the driver computes will match too.

Usage: python tools/local_verify.py [sf_dir] [query ...] [--json OUT]

With ``--json OUT`` a machine-readable result map is written, one row
per query (status pass/fail/rows_only, row counts, timing, problems) —
committed per round as ``LOCALVERIFY_r*.json`` so every registry query
carries fresh evidence even when an external harness scores only a
prefix (see queries/__init__.py).
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataflowtemplates_spark.catalog import TABLES
from dataflowtemplates_spark.session import build_session


def canon(v):
    """Canonical, engine-independent rendering of one value."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr == bit-exact compare
    if isinstance(v, Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(
        "|".join(canon(r[i]) for i in order) for r in rows
    )


def compare(name, spark_df, dd_rel):
    s_cols = sorted(c.lower() for c in spark_df.columns)
    d_cols = sorted(c.lower() for c in dd_rel.columns)
    problems = []
    if s_cols != d_cols:
        problems.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
        return problems, None, None
    s_rows = spark_df.collect()
    d_rows = dd_rel.fetchall()
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    s_ms = row_multiset([tuple(r) for r in s_rows], spark_df.columns)
    d_ms = row_multiset(d_rows, list(dd_rel.columns))
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:3]
        only_d = list((d_ms - s_ms).items())[:3]
        problems.append(f"value mismatch: {len((s_ms - d_ms))} spark-only / "
                        f"{len((d_ms - s_ms))} duckdb-only rows")
        for r, n in only_s:
            problems.append(f"  spark-only x{n}: {r[:300]}")
        for r, n in only_d:
            problems.append(f"  duckdb-only x{n}: {r[:300]}")
    return problems, len(s_rows), len(d_rows)


def main():
    import json
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: --json requires an output path")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.01"
    only = set(a for a in args if not os.path.isdir(a))

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = build_session("local_verify")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results: dict[str, dict] = {}
    passed = failed = skipped = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                print(f"  ~ {name}: rows-only check, {n} rows ({time.time()-t0:.1f}s)")
                results[name] = {"status": "rows_only", "spark_rows": n,
                                 "secs": round(time.time() - t0, 1)}
                skipped += 1
                continue
            rel = con.sql(oracles[name])
            problems, ns, nd = compare(name, sdf, rel)
        except Exception as e:
            print(f"  ✗ {name}: EXCEPTION {type(e).__name__}: {str(e)[:500]}")
            results[name] = {"status": "fail",
                             "error": f"{type(e).__name__}: {str(e)[:300]}",
                             "secs": round(time.time() - t0, 1)}
            failed += 1
            continue
        if problems:
            print(f"  ✗ {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"    {p}")
            results[name] = {"status": "fail", "problems": problems[:5],
                             "spark_rows": ns, "oracle_rows": nd,
                             "secs": round(time.time() - t0, 1)}
            failed += 1
        else:
            print(f"  ✓ {name}: {ns} rows ({time.time()-t0:.1f}s)")
            results[name] = {"status": "pass", "spark_rows": ns,
                             "oracle_rows": nd,
                             "secs": round(time.time() - t0, 1)}
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only")
    if json_out:
        payload = {
            "sf_dir": sf_dir,
            "compare": "bit-exact multiset (tools/local_verify.py)",
            "n_pass": passed, "n_fail": failed, "n_rows_only": skipped,
            "queries": results,
        }
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
