"""Compare two bench.py outputs query-by-query, noise-aware.

Wall-clock on this host swings 2-5x run-to-run from external load and
JVM code-cache state (see .claude/skills/verify/SKILL.md), so a raw
total comparison misleads. This tool diffs per-query, separates
queries present in only one run, and labels deltas against a noise
threshold instead of calling every change a regression.

Usage:
  python tools/bench_compare.py BENCH_a.json BENCH_b.json \
      [--noise=2.0] [--solo=BENCH_SOLO.json] [--ratio=1.5] [--json=OUT]

With ``--solo`` (a tools/bench_solo.py --json artifact), every query in
run B is ALSO checked against its fresh-JVM floor: an in-session/solo
ratio beyond ``--ratio`` (default 1.5) is flagged
``code-cache-suspect`` — the q96-style pathology where a late-bench
query runs interpreted because whole-stage codegen filled the JVM code
cache. The flags are machine-readable in the ``--json`` output
(``{"flags": [{"query", "in_session", "solo_min", "ratio", "flag"}]}``)
so the pathology self-reports instead of waiting for a human to eyeball
the table.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if isinstance(data.get("parsed"), dict):  # driver BENCH_r* wrapper
        data = data["parsed"]
    elif "tail" in data:
        # driver wrapper whose stdout tail truncated the JSON line
        # (parsed: null): recover every per-query timing pair by regex —
        # partial recovery beats dropping the run
        import re
        qs = {m.group(1): float(m.group(2))
              for m in re.finditer(r'"(q\d+[a-z0-9_]+)"\s*:\s*([0-9.]+)',
                                   data["tail"])}
        data = {"queries": qs}
    if not data.get("valid", True):
        print(f"note: {path} is an INVALID run "
              f"(errors: {list(data.get('errors', {}))})")
    return data


def solo_flags(qb: dict, solo_path: str, ratio_bar: float) -> list[dict]:
    """In-session vs fresh-JVM-floor guard: queries whose shared-session
    time exceeds ``ratio_bar`` x their solo min are flagged — the
    signature of code-cache exhaustion (or another cross-query session
    pathology), NOT of a plan regression (those reproduce solo)."""
    with open(solo_path) as f:
        solo = json.load(f).get("queries", {})
    flags = []
    for q in sorted(set(qb) & set(solo)):
        floor = solo[q].get("min")
        if not floor:
            continue
        r = qb[q] / floor
        if r > ratio_bar:
            flags.append({"query": q, "in_session": qb[q],
                          "solo_min": floor, "ratio": round(r, 2),
                          "flag": "code-cache-suspect"})
    return flags


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noise, solo_path, json_out, ratio_bar = 2.0, None, None, 1.5
    for a in sys.argv[1:]:
        if a.startswith("--noise"):
            noise = float(a.split("=", 1)[1])
        elif a.startswith("--solo"):
            solo_path = a.split("=", 1)[1]
        elif a.startswith("--ratio"):
            ratio_bar = float(a.split("=", 1)[1])
        elif a.startswith("--json"):
            json_out = a.split("=", 1)[1]
    if len(args) != 2:
        sys.exit(__doc__)
    a, b = load(args[0]), load(args[1])
    qa, qb = a.get("queries", {}), b.get("queries", {})
    shared = sorted(set(qa) & set(qb))
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))

    print(f"{'query':32s} {'A':>8s} {'B':>8s} {'B/A':>6s}  verdict")
    worse = better = 0
    per_query = {}
    for q in shared:
        ta, tb = qa[q], qb[q]
        ratio = tb / ta if ta else float("inf")
        if ratio > noise:
            verdict, worse = "SLOWER (beyond noise)", worse + 1
        elif ratio < 1 / noise:
            verdict, better = "faster (beyond noise)", better + 1
        else:
            verdict = ""
        per_query[q] = {"a": ta, "b": tb, "ratio": round(ratio, 3),
                        "verdict": verdict or "within noise"}
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

    flags = []
    if solo_path:
        flags = solo_flags(qb, solo_path, ratio_bar)
        if flags:
            print(f"\nin-session/solo guard (> x{ratio_bar}):")
            for fl in flags:
                print(f"  {fl['query']:32s} in-session {fl['in_session']:.2f}s"
                      f" vs solo floor {fl['solo_min']:.2f}s"
                      f" = x{fl['ratio']} -> {fl['flag']}")
        else:
            print(f"\nin-session/solo guard: clean "
                  f"(no shared query beyond x{ratio_bar} of its "
                  f"fresh-JVM floor)")

    if json_out:
        summary = {
            "a": args[0], "b": args[1], "noise": noise,
            "shared_total_a": round(sa, 2) if shared else None,
            "shared_total_b": round(sb, 2) if shared else None,
            "n_slower_beyond_noise": worse,
            "n_faster_beyond_noise": better,
            "queries": per_query,
            "only_a": only_a, "only_b": only_b,
            "solo_ratio_bar": ratio_bar if solo_path else None,
            "flags": flags,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"\nwrote {json_out}")


if __name__ == "__main__":
    main()
