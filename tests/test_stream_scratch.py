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
