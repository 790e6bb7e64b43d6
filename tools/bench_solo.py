"""Fresh-JVM per-query timing: the anti-noise instrument.

One subprocess per (query, repetition) — every sample gets a cold JVM
(empty code cache, no cross-query JIT interference), which is the
isolation the shared-session bench.py cannot give. Use this to settle
whether an apparent cross-round mover is code or host noise: a real
regression reproduces under fresh-JVM isolation; noise does not.

Usage:
  python tools/bench_solo.py q55_dedup_pipeline q09_agg_stats \
      [--reps 3] [--sf-dir /root/testdata/sf0.1] [--json OUT]

Prints per-query: all fresh-JVM samples (each itself the in-process
median of 3 executions after a warmup) and their min — the min across
cold JVMs is the best noise-resistant point estimate on a loaded host.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from dataflowtemplates_spark.queries import all_queries
from dataflowtemplates_spark.session import build_session

name, sf_dir = {name!r}, {sf_dir!r}
spark = build_session("bench-solo")
q = all_queries()[name]

def run_once():
    t0 = time.monotonic()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0

run_once()  # warmup: plan + codegen + shuffle dirs off the clock
samples = sorted(run_once() for _ in range(3))
print("SOLO_RESULT " + json.dumps(samples[1]))
"""


def solo_time(name: str, sf_dir: str, repo: str) -> float:
    code = _CHILD.format(repo=repo, name=name, sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("SOLO_RESULT "):
            return float(json.loads(line.split(" ", 1)[1]))
    raise RuntimeError(
        f"{name}: no result (stderr tail: {out.stderr[-500:]})")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    json_out = None
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--json="):
            json_out = a.split("=", 1)[1]
    if not args:
        sys.exit(__doc__)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for name in args:
        samples = [solo_time(name, sf_dir, repo) for _ in range(reps)]
        results[name] = {"samples": [round(s, 3) for s in samples],
                         "min": round(min(samples), 3)}
        print(f"{name}: samples={results[name]['samples']} "
              f"min={results[name]['min']}s", flush=True)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "reps": reps,
                       "queries": results}, fh, indent=1)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
