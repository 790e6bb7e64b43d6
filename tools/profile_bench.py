"""Per-query breakdown probe for the headline bench (guide §1).

For every headline query, times separately:
  * build_s  — the Python call ``qs[name](spark, sf_dir)`` that
    constructs the plan (includes register_tables, any driver-side
    metadata work, and for the audit queries their whole lifecycle);
  * exec_s   — the noop-sink execution of the returned plan.

Prints a sorted table plus totals, and writes a JSON map. Execution
methodology matches bench.py (same session confs, same warmup); use it
to find where the headline seconds actually live, not as the bench of
record.

Usage: python tools/profile_bench.py [--repeats N] [--json OUT] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from bench import HEADLINE
    from dataflowtemplates_spark.catalog import register_tables
    from dataflowtemplates_spark.queries import all_queries
    from dataflowtemplates_spark.session import build_session

    repeats = 2
    json_out = None
    names: list[str] = []
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--repeats":
            repeats = int(next(args))
        elif a.startswith("--json="):
            json_out = a.split("=", 1)[1]
        else:
            names.append(a)
    if not names:
        names = list(HEADLINE)

    spark = build_session("profile_bench")
    qs = all_queries()
    register_tables(spark, SF_DIR)
    _noop(qs["q06_revenue_delta"](spark, SF_DIR))
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    rows: dict[str, dict] = {}
    for name in names:
        builds, execs = [], []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            _noop(df)
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        rows[name] = {
            "build_s": round(statistics.median(builds), 3),
            "exec_s": round(statistics.median(execs), 3),
        }
        print(f"# {name}: build {rows[name]['build_s']:.2f}s "
              f"exec {rows[name]['exec_s']:.2f}s", file=sys.stderr)

    tb = sum(r["build_s"] for r in rows.values())
    te = sum(r["exec_s"] for r in rows.values())
    print(f"\n{'query':42s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    for name, r in sorted(rows.items(),
                          key=lambda kv: -(kv[1]["build_s"] + kv[1]["exec_s"])):
        print(f"{name:42s} {r['build_s']:7.2f} {r['exec_s']:7.2f} "
              f"{r['build_s'] + r['exec_s']:7.2f}")
    print(f"{'TOTAL':42s} {tb:7.2f} {te:7.2f} {tb + te:7.2f}")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump({"sf_dir": SF_DIR, "repeats": repeats,
                       "build_total": round(tb, 3),
                       "exec_total": round(te, 3), "queries": rows}, fh,
                      indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
