"""Capture .explain("formatted") for named queries into plan files.

Writes ``<outdir>/<query>_<tag>.txt`` for each query — the
before/after plan evidence the optimization rounds commit under
``plans/r15/`` (guide §7.2). The plan captured is the formatted
physical plan of the DataFrame the query function returns (for the
audit/streaming queries whose lifecycle RUNS at build time, the
returned summary plan — their real cost is the build phase, which the
file notes in a header).

Usage: python tools/capture_plans.py <outdir> <tag> <query> [query ...]
       [--sf SF_DIR]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from dataflowtemplates_spark.queries import all_queries
    from dataflowtemplates_spark.session import build_session

    args = [a for a in sys.argv[1:]]
    sf = SF_DIR
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i:i + 2]
    outdir, tag, *names = args
    os.makedirs(outdir, exist_ok=True)

    spark = build_session("capture_plans")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf}, tag={tag}\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
