"""x10 TIMING-ONLY amplification of a testdata SF directory.

The driver ships sf0.001/0.01/0.1; the 100 TB story wants at least one
scaling checkpoint past the largest provided factor. This tool builds
a synthetic sf(N*10) from sfN by unioning 10 key-shifted replicas of
every FACT table (dimensions region/nation stay as-is, like TPC-H's
fixed dims): each replica offsets every primary/foreign key by
``replica * (max_key + 1)``, applied CONSISTENTLY across tables
(o_custkey shifts with c_custkey, l_orderkey with o_orderkey,
events.user_id with c_custkey — it joins customer in q94/q157), so
every join keeps its selectivity per replica. Text/embedding payloads
repeat verbatim: new doc_ids over identical text makes the dedup
family find 10x real duplicates, which is a harder (and realistic)
workload, not an easier one.

This data is for WALL-CLOCK scaling probes only (tools/scaling_probe.py
--extra-sf) — it is not an oracle input and never feeds correctness
artifacts.

Usage: python tools/amplify_sf.py [src_sf_dir] [dst_dir] [factor]
       (defaults: /root/testdata/sf0.1 /tmp/sf1_amplified 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

#: table -> list of (column, span-source table, span-source column).
#: The span of a key domain is computed ONCE from its owning table and
#: reused for every foreign reference, keeping joins replica-aligned.
_KEYED = {
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [("o_orderkey", "orders", "o_orderkey"),
               ("o_custkey", "customer", "c_custkey")],
    "lineitem": [("l_orderkey", "orders", "o_orderkey"),
                 ("l_partkey", "part", "p_partkey"),
                 ("l_suppkey", "supplier", "s_suppkey")],
    "events": [("event_id", "events", "event_id"),
               ("user_id", "customer", "c_custkey")],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}
_DIMS = ("region", "nation")


def amplify(spark, src: str, dst: str, factor: int = 10) -> None:
    from dataflowtemplates_spark.catalog import load_table
    os.makedirs(dst, exist_ok=True)
    spans: dict[tuple[str, str], int] = {}

    def span(table: str, col: str) -> int:
        key = (table, col)
        if key not in spans:
            spans[key] = int(
                load_table(spark, src, table).agg(
                    F.max(F.col(col)).alias("m")).first()["m"]) + 1
        return spans[key]

    for t in _DIMS:
        load_table(spark, src, t).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: copied", flush=True)
    for t, keys in _KEYED.items():
        base = load_table(spark, src, t)
        reps = []
        for i in range(factor):
            r = base
            for col, st, sc in keys:
                r = r.withColumn(col, F.col(col)
                                 + F.lit(i * span(st, sc)).cast("long"))
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        (out.repartition(32)
         .write.mode("overwrite").parquet(os.path.join(dst, f"{t}.parquet")))
        print(f"{t}: x{factor}", flush=True)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_amplified"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    from dataflowtemplates_spark.session import build_session
    amplify(build_session(), src, dst, factor)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
