"""Shared prefix-listing pagination for the service emulators.

Both the S3 (XML) and GCS (JSON) emulators expose the same logical
listing — lexicographically ordered keys under a prefix, optional
delimiter rollup into common prefixes, tiny fixed pages so client
pagination is always exercised — and differ only in response
rendering. The cursor/rollup logic lives here ONCE so a pagination
fix cannot silently diverge between the twins the commit-protocol
property tests treat as equivalent.

Known shared simplification (kept deliberately identical on both
sides): a common prefix is deduplicated only within one response
page, not across pages — harmless for clients that union results, as
both backends' ``list_dir_typed`` do."""

from __future__ import annotations


def paginate(rel_keys: list[str], stamps: list, prefix: str,
             delim: str | None, start: int, page: int):
    """One listing page over ``rel_keys`` (sorted, already filtered to
    ``prefix``) with parallel ``stamps`` (opaque per-key metadata the
    caller renders — the emulators pass ``(mtime, size)``). Returns
    ``(items, prefixes, next_start)`` where ``items`` are
    ``(rel_key, stamp)`` pairs, ``prefixes`` the delimiter rollups,
    and ``next_start`` the continuation cursor (None = last page)."""
    items: list[tuple] = []
    prefixes: list[str] = []
    seen: set[str] = set()
    emitted, i = 0, start
    while i < len(rel_keys) and emitted < page:
        rel = rel_keys[i]
        if delim:
            rest = rel[len(prefix):]
            if delim in rest:
                cp = prefix + rest.split(delim, 1)[0] + delim
                if cp not in seen:
                    seen.add(cp)
                    prefixes.append(cp)
                    emitted += 1
                i += 1
                continue
        items.append((rel, stamps[i]))
        emitted += 1
        i += 1
    return items, prefixes, (i if i < len(rel_keys) else None)
