"""Registry invariants + the driver contract surface.

The external harness imports ``__spark_entry__`` and scores a prefix of
``queries()`` — these tests pin the properties that contract depends
on: every query has an oracle, the rotation really orders
least-recently-green first, and ``entry`` produces rows with a stable
schema.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_every_query_has_an_oracle():
    from dataflowtemplates_spark.queries import all_oracles, all_queries
    q, o = all_queries(), all_oracles()
    assert set(q) == set(o)


def test_rotation_orders_least_recently_green_first():
    from dataflowtemplates_spark.queries import (
        _last_green_round,
        all_queries,
    )
    scored = _last_green_round()
    ranks = [scored.get(name, -1) for name in all_queries()]
    # never-green (-1) first, then strictly by last green round — the
    # property that makes a fixed-size scoring prefix rotate through
    # the whole registry across rounds
    assert ranks == sorted(ranks)


def test_rotation_is_deterministic():
    from dataflowtemplates_spark.queries import all_queries
    assert list(all_queries()) == list(all_queries())


def test_driver_contract_surface(spark):
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) == set(qs)
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert out.schema == entrymod.entry(spark).schema  # stable schema
