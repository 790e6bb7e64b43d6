"""Compare two bench.py outputs query-by-query, noise-aware.

Wall-clock on this host swings 2-5x run-to-run from external load and
JVM code-cache state (see .claude/skills/verify/SKILL.md), so a raw
total comparison misleads. This tool diffs per-query, separates
queries present in only one run, and labels deltas against a noise
threshold instead of calling every change a regression.

Usage: python tools/bench_compare.py BENCH_a.json BENCH_b.json [--noise 2.0]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if isinstance(data.get("parsed"), dict):  # driver BENCH_r* wrapper
        data = data["parsed"]
    if not data.get("valid", True):
        print(f"note: {path} is an INVALID run "
              f"(errors: {list(data.get('errors', {}))})")
    return data


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noise = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--noise"):
            noise = float(a.split("=", 1)[1])
    if len(args) != 2:
        sys.exit(__doc__)
    a, b = load(args[0]), load(args[1])
    qa, qb = a.get("queries", {}), b.get("queries", {})
    shared = sorted(set(qa) & set(qb))
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))

    print(f"{'query':32s} {'A':>8s} {'B':>8s} {'B/A':>6s}  verdict")
    worse = better = 0
    for q in shared:
        ta, tb = qa[q], qb[q]
        ratio = tb / ta if ta else float("inf")
        if ratio > noise:
            verdict, worse = "SLOWER (beyond noise)", worse + 1
        elif ratio < 1 / noise:
            verdict, better = "faster (beyond noise)", better + 1
        else:
            verdict = ""
        print(f"{q:32s} {ta:8.2f} {tb:8.2f} {ratio:6.2f}  {verdict}")
    sa, sb = sum(qa[q] for q in shared), sum(qb[q] for q in shared)
    if shared and sa:
        print(f"\nshared-set total: {sa:.1f}s -> {sb:.1f}s "
              f"(x{sb / sa:.2f} over {len(shared)} queries); "
              f"{worse} slower / {better} faster beyond x{noise} noise")
    else:
        print("\nno overlapping timed queries")
    if only_a:
        print(f"only in A: {only_a}")
    if only_b:
        print(f"only in B: {only_b}")


if __name__ == "__main__":
    main()
