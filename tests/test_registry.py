"""Registry invariants + the driver contract surface.

The external harness imports ``__spark_entry__`` and scores a prefix of
``queries()`` — these tests pin the properties that contract depends
on: every query has an oracle, the registry order is the explicit
source-committed ``REGISTRY_ORDER`` (a pure function of the checkout —
no result artifacts, no environment state), and ``entry`` produces rows
with a stable schema.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_every_query_has_an_oracle():
    from dataflowtemplates_spark.queries import all_oracles, all_queries
    q, o = all_queries(), all_oracles()
    assert set(q) == set(o)


def test_order_is_exactly_registry_order():
    """all_queries() iterates in the committed REGISTRY_ORDER — the
    scored prefix is reviewable in source and identical for every
    clone of the same commit."""
    from dataflowtemplates_spark.queries import REGISTRY_ORDER, all_queries
    assert list(all_queries()) == list(REGISTRY_ORDER)


def test_registry_count_matches_survey():
    """SURVEY.md §7.5 states the registry size; keep the self-
    description exact (update BOTH when adding a query)."""
    from dataflowtemplates_spark.queries import all_queries
    assert len(all_queries()) == 184


def test_committed_docs_state_the_real_registry_count():
    """Every committed self-description of the registry size must match
    the registry — the static-prefix contract depends on readers
    trusting these counts (the r7 SCALE.md '90' drift motivated this)."""
    import re

    from dataflowtemplates_spark.queries import all_queries
    n = len(all_queries())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    survey = open(os.path.join(repo, "SURVEY.md")).read()
    m = re.search(r"Registry: (\d+) queries", survey)
    assert m and int(m.group(1)) == n, f"SURVEY.md says {m and m.group(1)}"

    scale = open(os.path.join(repo, "SCALE.md")).read()
    m = re.search(r"for all (\d+)\s+registry queries", scale)
    assert m and int(m.group(1)) == n, f"SCALE.md says {m and m.group(1)}"

    readme = open(os.path.join(repo, "README.md")).read()
    m = re.search(r"the (\d+)-query registry", readme)
    assert m and int(m.group(1)) == n, f"README.md says {m and m.group(1)}"


def test_registry_order_covers_registered_set_exactly():
    from dataflowtemplates_spark.queries import REGISTRY_ORDER, _registered
    assert len(REGISTRY_ORDER) == len(set(REGISTRY_ORDER)), "duplicates"
    assert set(REGISTRY_ORDER) == set(_registered())


def test_order_ignores_result_artifacts(tmp_path, monkeypatch):
    """The order must not depend on files outside source control:
    importing/calling from a different cwd with artifacts lying around
    yields the identical order."""
    import json

    from dataflowtemplates_spark.queries import all_queries
    before = list(all_queries())
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps({
        before[-1]: {"err": "boom", "rows_match": False,
                     "schema_match": False, "hash_match": False}}))
    monkeypatch.chdir(tmp_path)
    assert list(all_queries()) == before


def test_driver_contract_surface(spark):
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) == set(qs)
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert out.schema == entrymod.entry(spark).schema  # stable schema


def test_sf_dir_switch_repoints_views(spark):
    """The same session must serve different scale factors back to
    back — stale views would silently answer from the wrong corpus."""
    from dataflowtemplates_spark.catalog import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    n_small = spark.table("lineitem").count()
    register_tables(spark, "/root/testdata/sf0.01")
    n_big = spark.table("lineitem").count()
    assert n_big > n_small
    register_tables(spark, "/root/testdata/sf0.001")
    assert spark.table("lineitem").count() == n_small


def test_bogus_sf_dir_raises_not_stale(spark):
    import pytest

    from dataflowtemplates_spark.catalog import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    with pytest.raises(FileNotFoundError):
        register_tables(spark, "/no/such/dir")
    # prior registration still intact after the failed switch
    assert spark.table("documents").count() > 0


def test_latest_localverify_sweep_covers_full_registry():
    """The committed LOCALVERIFY_r*.json with the highest round number
    must contain one entry per registry query (the r8 artifact omitted
    q121 — full-surface evidence means FULL surface), and every entry
    must be a pass. Adding a query without re-running the sweep fails
    here by design."""
    import glob
    import json
    import re

    from dataflowtemplates_spark.queries import all_queries
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifacts = sorted(
        glob.glob(os.path.join(repo, "LOCALVERIFY_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)))
    assert artifacts, "no LOCALVERIFY artifact committed"
    latest = artifacts[-1]
    data = json.load(open(latest))
    entries = data["queries"] if isinstance(data.get("queries"), dict) else data
    missing = set(all_queries()) - set(entries)
    extra = set(entries) - set(all_queries())
    assert not missing, f"{os.path.basename(latest)} missing {sorted(missing)}"
    assert not extra, f"{os.path.basename(latest)} has stale {sorted(extra)}"
