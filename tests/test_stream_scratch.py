"""_mkscratch (VERDICT r11 item 6): streaming checkpoint/staging dirs
route through one allocator so SPARK_GRAFT_STREAM_SCRATCH can move ALL
streaming state I/O onto a tmpfs for the disk-vs-compute bench split."""

import os

from aws_glue_etl_sample_hist_spark.streaming.jobs import _mkscratch


def test_mkscratch_honors_env(tmp_path, monkeypatch):
    root = str(tmp_path / "shm_stand_in")
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SCRATCH", root)
    d = _mkscratch(prefix="ckpt_test_")
    assert os.path.isdir(d)
    assert os.path.dirname(d) == root
    assert os.path.basename(d).startswith("ckpt_test_")


def test_mkscratch_defaults_to_tempdir(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SCRATCH", raising=False)
    import tempfile

    d = _mkscratch(prefix="ckpt_test_")
    try:
        assert os.path.dirname(d) == tempfile.gettempdir()
    finally:
        os.rmdir(d)


def test_no_unrouted_mkdtemp_in_streaming_module():
    """Every scratch dir in streaming/jobs.py must come through
    _mkscratch -- a raw tempfile.mkdtemp would silently escape the
    tmpfs dial."""
    import aws_glue_etl_sample_hist_spark.streaming.jobs as jobs

    src = open(jobs.__file__).read()
    body = src[src.index("def _read_events_stream") :]
    assert "tempfile.mkdtemp(" not in body


def test_state_provider_dial_resolution(monkeypatch):
    """SPARK_GRAFT_STREAM_STATE_PROVIDER (VERDICT r13 item 5): unset ->
    None (default HDFS-backed provider, bench comparability); 'rocksdb'
    -> the bundled RocksDB provider class; anything else passes through
    as a provider class name."""
    from aws_glue_etl_sample_hist_spark.streaming.jobs import (
        _ROCKSDB_PROVIDER,
        _state_provider_override,
    )

    monkeypatch.delenv("SPARK_GRAFT_STREAM_STATE_PROVIDER", raising=False)
    assert _state_provider_override() is None
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PROVIDER", "RocksDB")
    assert _state_provider_override() == _ROCKSDB_PROVIDER
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PROVIDER", "com.x.MyProvider")
    assert _state_provider_override() == "com.x.MyProvider"


def test_rocksdb_dial_drains_exactly_and_restores_conf(
    spark, sf_small, monkeypatch
):
    """Under the RocksDB dial the dedup drain must produce the SAME
    answer as the default provider (state correctness is provider-
    independent), and the session conf must come back clean after the
    drain (the override is scoped to the started query -- the provider
    class is snapshotted at query start, proven by the .sst state files
    an engaged RocksDB store writes; a conf leak would silently flip
    every later stream in the session)."""
    from aws_glue_etl_sample_hist_spark.streaming.jobs import (
        _PROVIDER_KEY,
        stream_events_dedup_agg,
    )

    monkeypatch.delenv("SPARK_GRAFT_STREAM_STATE_PROVIDER", raising=False)
    base = {
        (r.event_type, r.n_events, r.sum_value)
        for r in stream_events_dedup_agg(spark, sf_small).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PROVIDER", "rocksdb")
    rdb = {
        (r.event_type, r.n_events, r.sum_value)
        for r in stream_events_dedup_agg(spark, sf_small).collect()
    }
    assert rdb == base
    assert spark.conf.get(_PROVIDER_KEY, None) is None
