"""Adaptive exact-duplicate collapse gate (r13): q66/q141 switch
between the direct per-row pair plan and the group-before-pair
collapse on a measured duplication probe (DUP_COLLAPSE_MIN_RATIO).
The two plans are output-identical; these tests pin (a) that the gate
picks the intended PHYSICAL plan on each side of the threshold, and
(b) that BOTH branches match the (branch-independent) DuckDB oracle."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
SF001_EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _vec(seed: int) -> list[float]:
    # all-positive -> one sign bucket; distinct seeds stay distinct
    return [1.0 + 0.001 * seed * ((i % 7) + 1) for i in range(64)]


def _write_embeddings(sf_dir: str, rows: list[tuple[int, list[float]]]):
    os.makedirs(sf_dir, exist_ok=True)
    table = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "label": pa.array(["x"] * len(rows), pa.string()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
    })
    pq.write_table(table, os.path.join(sf_dir, "embeddings.parquet"))


def _oracle_pairs(sf_dir: str, sql: str) -> list[tuple]:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    return [tuple(r) for r in con.execute(sql).fetchall()]


def test_q66_gate_picks_direct_plan_on_unique_corpus(spark, tmp_path):
    from dataflowtemplates_spark.queries.similarity import (
        _Q66_ORACLE, q66_embedding_neardup_lsh)
    sf_dir = str(tmp_path / "uniq")
    _write_embeddings(sf_dir, [(i, _vec(i)) for i in range(12)])
    df = q66_embedding_neardup_lsh(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # direct branch: no explode of grouped id lists anywhere
    assert "Generate" not in plan
    got = sorted((r["id_a"], r["id_b"], round(r["cosine"], 12))
                 for r in df.collect())
    want = sorted((a, b, round(c, 12))
                  for a, b, _, c in _oracle_pairs(sf_dir, _Q66_ORACLE))
    assert got == want


def test_q66_gate_picks_collapse_on_duplicated_corpus(spark, tmp_path):
    from dataflowtemplates_spark.queries.similarity import (
        _Q66_ORACLE, q66_embedding_neardup_lsh)
    sf_dir = str(tmp_path / "dup")
    # 4 distinct vectors x 6 bit-identical copies: ratio ~6
    rows = [(d * 10 + c, _vec(d)) for d in range(4) for c in range(6)]
    _write_embeddings(sf_dir, rows)
    df = q66_embedding_neardup_lsh(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # collapse branch: the member-pair expansion explodes id lists
    assert "Generate" in plan
    got = sorted((r["id_a"], r["id_b"], round(r["cosine"], 12))
                 for r in df.collect())
    want = sorted((a, b, round(c, 12))
                  for a, b, _, c in _oracle_pairs(sf_dir, _Q66_ORACLE))
    assert got == want
    # within-group pairs are present (copies of one vector pair up)
    assert any(a // 10 == b // 10 for a, b, _ in got)


def test_q141_branches_agree_across_duplication(spark, tmp_path):
    """q141 on a duplicated corpus (collapse branch) must equal the
    r11 direct-prune semantics the oracle encodes — and the sf0.01
    corpus (direct branch) is covered by the driver gate, so here we
    only need the duplicated side."""
    from dataflowtemplates_spark.queries.similarity import (
        _Q141_ORACLE, q141_semdedup)
    sf_dir = str(tmp_path / "dup141")
    os.makedirs(sf_dir)
    # duplicate the real sf0.001 embeddings x3: real cluster geometry,
    # certain gate engagement (ratio ~3)
    t = pq.read_table(SF001_EMB)
    n = t.num_rows
    import pyarrow.compute as pc
    parts = [t]
    for k in (1, 2):
        shifted = t.set_column(
            t.schema.get_field_index("vec_id"), "vec_id",
            pc.add(t.column("vec_id"), 100000 * k))
        parts.append(shifted)
    pq.write_table(pa.concat_tables(parts),
                   os.path.join(sf_dir, "embeddings.parquet"))
    df = q141_semdedup(spark, sf_dir)
    got = sorted(tuple(r) for r in df.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = sorted(tuple(r) for r in con.execute(_Q141_ORACLE).fetchall())
    assert got == want
    assert n > 0
