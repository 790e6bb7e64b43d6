"""LSH bucket cap: a degenerate hot bucket (boilerplate/identical docs)
must be dropped BEFORE in-bucket pair generation, with the drop count
observable from the same job."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from dataflowtemplates_spark.queries.dedup import lsh_candidate_pairs


def _docs(spark):
    rows = [(i, "exactly the same boilerplate text repeated here") 
            for i in range(120)]
    rows += [(1000, "first genuinely distinct document about spark plans"),
             (1001, "first genuinely distinct document about spark plans")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_bucket_dropped_and_counted(spark):
    docs = _docs(spark)
    obs = Observation()
    pairs = lsh_candidate_pairs(docs, max_bucket_size=50, drop_metrics=obs)
    got = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    # no pair from the 120-doc boilerplate bucket survives the cap
    assert not any(a < 1000 and b < 1000 for a, b in got)
    # the near-dup pair from small buckets is unaffected
    assert (1000, 1001) in got
    assert obs.get["dropped_ids"] >= 120  # doc x band rows over the cap


def test_uncapped_would_explode(spark):
    docs = _docs(spark)
    got = lsh_candidate_pairs(docs, max_bucket_size=1_000_000).collect()
    # C(120,2) boilerplate pairs — what the cap protects against
    assert len(got) >= 120 * 119 // 2


def test_single_exchange_on_band_key(spark):
    plan = (lsh_candidate_pairs(_docs(spark))
            ._jdf.queryExecution().executedPlan().toString())
    # size-filter + collect_list share ONE band_key shuffle
    assert plan.count("Exchange hashpartitioning(band_key") == 1


def test_q55_signature_materialized_once(spark):
    """The minhash aggregation must not be re-executed per consumer:
    audited plan had 12 document scans / 8 minhash aggs before the
    signature checkpoint."""
    from dataflowtemplates_spark.queries.dedup import q55_dedup_pipeline
    plan = (q55_dedup_pipeline(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("partial_min") == 0  # sig comes from the checkpoint
    assert plan.count("FileScan parquet [doc_id") <= 4


def test_cap_parity_with_oracle_when_binding(spark):
    """The HAVING-cap CTE in the q52 oracle must drop the SAME hot
    bucket the Spark-side window cap drops — checked on data where the
    cap actually binds (sf0.01 buckets never reach MAX_BUCKET, so the
    driver gate alone can't prove this)."""
    import duckdb

    from dataflowtemplates_spark.queries.dedup import _Q52_ORACLE

    docs = _docs(spark)
    got = sorted((r["doc_a"], r["doc_b"])
                 for r in lsh_candidate_pairs(docs, max_bucket_size=50).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    [(r["doc_id"], r["text"]) for r in docs.collect()])
    want = sorted(tuple(r) for r in con.execute(
        _Q52_ORACLE.replace("COUNT(*) <= 256", "COUNT(*) <= 50")).fetchall())
    assert got == want
    assert got == [(1000, 1001)]  # hot bucket dropped on BOTH engines


def test_q74_band_side_cap_drops_hot_bucket(spark):
    """q74's incremental new-x-old band join caps EACH side: a
    boilerplate bucket must vanish from the banded stream before the
    join, while small buckets pass through untouched."""
    from dataflowtemplates_spark.queries.dedup import (
        banded_capped, minhash_signature)

    sig = minhash_signature(_docs(spark))
    capped = banded_capped(sig, "doc_id", max_bucket=50)
    sizes = [r["n"] for r in capped.groupBy("band_key")
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert sizes and max(sizes) <= 50
    # the two genuinely-near-dup docs still band together
    kept_ids = {r["doc_id"] for r in capped.collect()}
    assert {1000, 1001} <= kept_ids
    # uncapped form retains the 120-doc boilerplate bucket
    raw = banded_capped(sig, "doc_id", max_bucket=None)
    raw_max = max(r["n"] for r in raw.groupBy("band_key")
                  .agg(F.count(F.lit(1)).alias("n")).collect())
    assert raw_max >= 120


def test_q74_oracle_mirrors_per_side_cap():
    """The cap must be declared semantics on BOTH engines: the q74
    oracle carries the identical per-side HAVING cap."""
    from dataflowtemplates_spark.queries.dedup import MAX_BUCKET, _Q74_ORACLE
    assert _Q74_ORACLE.count(f"HAVING COUNT(*) <= {MAX_BUCKET}") == 2
    assert "new_kept" in _Q74_ORACLE and "old_kept" in _Q74_ORACLE


def test_bloom_build_guard_raises_on_oversized_side(spark):
    """The Bloom bitmap is driver-held by design; a build side larger
    than max_items must fail loudly, not OOM the driver."""
    import pytest

    from dataflowtemplates_spark.queries.dedup import build_bloom_bitmap

    members = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(500)], "gram string")
    with pytest.raises(ValueError, match="max_items"):
        build_bloom_bitmap(members, max_items=100)


def test_bloom_probe_via_broadcast_row_is_shuffle_free(spark):
    """q73's delivery path: bitmap as a broadcast one-row side — the
    probe must stay map-only (no shuffle of the corpus)."""
    from pyspark.sql import functions as F

    from dataflowtemplates_spark.queries.dedup import (
        bloom_might_contain, build_bloom_bitmap)

    members = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(200)], "gram string")
    words, m = build_bloom_bitmap(members)
    probe = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(800)], "gram string")
    bloom_df = spark.createDataFrame([(words,)], "bloom array<long>")
    flt = (probe.crossJoin(F.broadcast(bloom_df))
           .filter(bloom_might_contain(F.col("bloom"), m, F.col("gram")))
           .drop("bloom"))
    hits = {r["gram"] for r in flt.collect()}
    assert {f"gram number {i}" for i in range(200)} <= hits
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_connected_components_multihop(spark):
    """Chain a-b-c-d must converge to one component (label propagation
    crosses multiple hops), disjoint pairs stay separate."""
    from dataflowtemplates_spark.queries.dedup import connected_components
    pairs = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 5),      # chain -> component 2
         (10, 11),                    # separate pair
         (20, 21), (21, 20)],         # duplicate edge, both directions
        "doc_a long, doc_b long")
    got = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {2: 2, 3: 2, 4: 2, 5: 2, 10: 10, 11: 10, 20: 20, 21: 20}


def test_bloom_filter_no_false_negatives_and_join_free(spark):
    """The hand-rolled Bloom probe must never miss a true member, keep
    false positives near the designed rate, and stay join-free (the
    whole point of the sketch at 100 TB)."""
    from pyspark.sql import functions as F

    from dataflowtemplates_spark.queries.dedup import (
        bloom_might_contain, build_bloom_bitmap)

    members = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(500)], "gram string")
    words, m = build_bloom_bitmap(members)
    probe = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(2000)], "gram string")
    flt = probe.filter(bloom_might_contain(F.lit(words), m, F.col("gram")))
    hits = {r["gram"] for r in flt.collect()}
    assert {f"gram number {i}" for i in range(500)} <= hits
    assert len(hits) - 500 <= 75  # 5% of 1500 non-members; ~0.2% designed
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan  # map-only probe
