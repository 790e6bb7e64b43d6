"""Merge a subset local_verify --json result into a committed sweep
artifact, keeping the pass/fail counters consistent.

Usage: python tools/merge_localverify.py BASE_ARTIFACT SUBSET_JSON

Used when a development cycle adds or changes a few queries: the new
entries are verified at the same sf_dir as the artifact and merged in,
so the committed sweep stays complete (tests/test_registry.py pins
completeness against the registry) without re-running all ~130 queries.
Entries are only ever replaced by a genuinely fresh run — the tool
refuses to merge across different sf_dirs.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base_path, add_path = sys.argv[1], sys.argv[2]
    with open(base_path) as fh:
        base = json.load(fh)
    with open(add_path) as fh:
        add = json.load(fh)
    if base["sf_dir"] != add["sf_dir"]:
        raise SystemExit(
            f"sf_dir mismatch: {base['sf_dir']} vs {add['sf_dir']}")
    base["queries"].update(add["queries"])
    for field, status in (("n_pass", "pass"), ("n_fail", "fail"),
                          ("n_rows_only", "rows_only")):
        base[field] = sum(1 for v in base["queries"].values()
                          if v["status"] == status)
    with open(base_path, "w") as fh:
        json.dump(base, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"{base_path}: {base['n_pass']} pass, {base['n_fail']} fail, "
          f"{base['n_rows_only']} rows-only")


if __name__ == "__main__":
    main()
