"""Morton/Z-order bit interleaving as engine-portable SQL expressions.

Shared by the q171 layout audit (`queries/layout.py`) and the
KeyedTable write-path clustering (`operators/mutations.py`): both need
the SAME generated expression so the audit measures exactly what the
writer produces. The DuckDB twin exists so oracles can replay the
interleave bit-for-bit.
"""

from __future__ import annotations


def interleave_expr(d1: str, d2: str, bits: int = 16) -> tuple[str, str]:
    """(spark_expr, duckdb_expr) computing the Morton/Z value that
    interleaves the low ``bits`` bits of ``d1`` (odd positions) and
    ``d2`` (even positions). Both strings are generated from the same
    loop so the engines cannot diverge structurally. Inputs must be
    non-negative integers below 2^bits (the callers normalize via
    min/max scaling first)."""
    spark_terms, duck_terms = [], []
    for i in range(bits):
        spark_terms.append(
            f"shiftleft(shiftright({d1}, {i}) & 1, {2 * i + 1})")
        spark_terms.append(
            f"shiftleft(shiftright({d2}, {i}) & 1, {2 * i})")
        # explicit BIGINT cast: a 32-bit input (e.g. an INTEGER literal)
        # would otherwise overflow DuckDB's left shift at position 31
        duck_terms.append(
            f"(CAST(({d1} >> {i}) & 1 AS BIGINT) << {2 * i + 1})")
        duck_terms.append(
            f"(CAST(({d2} >> {i}) & 1 AS BIGINT) << {2 * i})")
    return " + ".join(spark_terms), " + ".join(duck_terms)


def normalized_zorder_spark(c1: str, c2: str,
                            lo1: str, hi1: str,
                            lo2: str, hi2: str) -> str:
    """Spark SQL expression: min/max-normalize two BIGINT columns to
    16 bits and Morton-interleave them — the sort key a Z-order
    clustering write orders rows by. Bounds columns come from a
    broadcast 1-row aggregate over the slice being written (the same
    per-rewrite scaling Delta's OPTIMIZE ZORDER applies)."""
    n1 = f"(({c1} - {lo1}) * 65535) DIV greatest({hi1} - {lo1}, 1)"
    n2 = f"(({c2} - {lo2}) * 65535) DIV greatest({hi2} - {lo2}, 1)"
    spark, _ = interleave_expr(f"({n1})", f"({n2})")
    return spark
