"""The r15 catalog registration memo: reuse, invalidation, safety.

`catalog.load_table` memoizes the loaded DataFrame per (session, path,
stat signature) and `register_tables` skips re-binding an identical
registration — pure plan metadata reuse. These tests pin the contract
that makes that safe: repeat calls reuse, any file change or sf-dir
switch invalidates, and the error path is unchanged.
"""

from __future__ import annotations

import os
import shutil

import pytest

from dataflowtemplates_spark.catalog import load_table, register_tables

SF_SMOKE = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


def test_repeat_load_reuses_plan_object(spark):
    a = load_table(spark, SF_SMOKE, "nation")
    b = load_table(spark, SF_SMOKE, "nation")
    assert a is b  # memo hit: identical immutable plan, no re-read


def test_sf_dir_switch_repoints_views(spark):
    register_tables(spark, SF_SMOKE)
    n_smoke = spark.table("lineitem").count()
    register_tables(spark, SF_SMALL)
    n_small = spark.table("lineitem").count()
    assert n_small > n_smoke  # views must follow the new sf_dir
    register_tables(spark, SF_SMOKE)
    assert spark.table("lineitem").count() == n_smoke


def test_file_change_invalidates_memo(spark, tmp_path):
    d = tmp_path / "sfx"
    d.mkdir()
    src = os.path.join(SF_SMOKE, "nation.parquet")
    dst = d / "nation.parquet"
    shutil.copy(src, dst)
    first = load_table(spark, str(d), "nation")
    n1 = first.count()
    # replace the file with a different table's bytes and force a
    # distinct mtime: the stat signature must miss and reload
    st = os.stat(dst)
    shutil.copy(os.path.join(SF_SMOKE, "region.parquet"), dst)
    os.utime(dst, ns=(st.st_mtime_ns + 10**9, st.st_mtime_ns + 10**9))
    second = load_table(spark, str(d), "nation")
    assert second is not first
    assert second.count() != n1 or set(second.columns) != set(first.columns)


def test_missing_dir_still_raises(spark):
    with pytest.raises(FileNotFoundError):
        register_tables(spark, "/root/testdata/does_not_exist")


def test_inplace_member_rewrite_invalidates_dir_memo(spark, tmp_path):
    """A DIRECTORY table whose member file is rewritten in place (same
    name; the dir's own mtime does not move) must still miss the memo —
    the r15 verdict's directory-shape hole."""
    d = tmp_path / "sfy"
    t = d / "nation.parquet"  # directory-shaped table
    t.mkdir(parents=True)
    src = os.path.join(SF_SMOKE, "nation.parquet")
    member = t / "part-00000.parquet"
    shutil.copy(src, member)
    dir_st = os.stat(t)
    first = load_table(spark, str(d), "nation")
    n1 = first.count()
    # rewrite the member IN PLACE with different bytes, then pin the
    # directory's own stat back so only the member's (mtime, size)
    # differs — exactly the staleness class the signature must catch
    shutil.copy(os.path.join(SF_SMOKE, "region.parquet"), member)
    m = os.stat(member)
    os.utime(member, ns=(m.st_mtime_ns + 10**9, m.st_mtime_ns + 10**9))
    os.utime(t, ns=(dir_st.st_mtime_ns, dir_st.st_mtime_ns))
    second = load_table(spark, str(d), "nation")
    assert second is not first
    assert second.count() != n1 or set(second.columns) != set(first.columns)
