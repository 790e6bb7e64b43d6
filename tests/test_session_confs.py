"""Engine session-conf behavior (r15 change #10).

The PySpark 4 DataFrame-debugging wrapper taxes every DataFrame call
with origin bookkeeping purely to enrich error messages; the engine
disables it (`spark.python.sql.dataFrameDebugging.enabled=false` in
`_BASE_CONFS`). PySpark memoizes the flag at the FIRST decorated call
(`pyspark.errors.utils._enable_debugging_cache`), so a harness-built
session that ran DataFrame code before reaching us would have locked
it True — `ensure_engine_confs` must both set the conf and drop a
stale True memo so the new value is actually read.
"""

from pyspark.errors import utils as pyspark_err_utils

from dataflowtemplates_spark.session import _BASE_CONFS, ensure_engine_confs


def test_base_confs_disable_dataframe_debugging(spark):
    assert _BASE_CONFS["spark.python.sql.dataFrameDebugging.enabled"] == "false"
    assert (spark.conf.get("spark.python.sql.dataFrameDebugging.enabled")
            == "false")


def test_ensure_engine_confs_drops_stale_debugging_memo(spark):
    orig = pyspark_err_utils._enable_debugging_cache
    try:
        # simulate a harness session that memoized True before we ran
        pyspark_err_utils._enable_debugging_cache = True
        ensure_engine_confs(spark)
        assert pyspark_err_utils._enable_debugging_cache is None
        # next wrapper call re-reads the conf just pinned -> False
        assert pyspark_err_utils.is_debugging_enabled() is False
    finally:
        pyspark_err_utils._enable_debugging_cache = orig


def test_ensure_engine_confs_keeps_false_memo(spark):
    orig = pyspark_err_utils._enable_debugging_cache
    try:
        # a False memo already matches the engine conf: left alone
        pyspark_err_utils._enable_debugging_cache = False
        ensure_engine_confs(spark)
        assert pyspark_err_utils._enable_debugging_cache is False
    finally:
        pyspark_err_utils._enable_debugging_cache = orig


def test_private_debugging_attr_still_exists():
    """The stale-memo drop reaches into pyspark's private
    `_enable_debugging_cache`; if a PySpark upgrade renames it the
    perf fix must degrade LOUDLY (ensure_engine_confs warns), and this
    test is the tripwire that says the guard's happy path still
    applies to the installed version."""
    assert hasattr(pyspark_err_utils, "_enable_debugging_cache")


def test_ensure_engine_confs_warns_when_attr_gone(spark, monkeypatch):
    import warnings

    monkeypatch.delattr(pyspark_err_utils, "_enable_debugging_cache")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ensure_engine_confs(spark)
    assert any("_enable_debugging_cache" in str(w.message) for w in rec)


def test_streaming_checkpoint_checksum_disabled(spark):
    """Spark 4.1's per-checkpoint-file checksum layer doubles
    checkpoint file I/O and leaks per-file thread pools into the
    session (r16 q96 profile); the engine runs with it off and pins
    that here so an upgrade flipping the default degrades loudly."""
    assert _BASE_CONFS[
        "spark.sql.streaming.checkpoint.fileChecksum.enabled"] == "false"
    assert (spark.conf.get(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled")
        == "false")
