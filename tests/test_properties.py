"""Property-based checks (hypothesis): the distributed sessionizer agrees
with a trivially-correct single-threaded Python reference on randomized event
streams -- catches boundary/ordering bugs example tables can miss. Examples
are kept few (each is a Spark job); the generator biases gaps around the
threshold where the bugs live."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

GAP_S = 100
GAP_US = GAP_S * 1_000_000
BASE = 1_700_000_000_000_000

# per-user lists of inter-event gaps in micros, biased to straddle the
# threshold (0.5x .. 2x gap) plus exact-boundary values
gap_strategy = st.one_of(
    st.integers(min_value=0, max_value=2 * GAP_US),
    st.sampled_from([GAP_US - 1, GAP_US, GAP_US + 1]),
)
stream_strategy = st.lists(  # users
    st.lists(gap_strategy, min_size=1, max_size=8),  # events per user
    min_size=1,
    max_size=4,
)


def _reference_sessions(gaps_by_user):
    """Single-threaded ground truth: split at gap > threshold."""
    out = {}
    for uid, gaps in enumerate(gaps_by_user):
        ts = BASE
        seq, n, start, end = 0, 0, 0, 0
        for i, g in enumerate(gaps):
            ts = BASE if i == 0 else ts + g
            if n == 0 or (ts - end) > GAP_US:
                if n:
                    out[(uid, seq)] = (n, start, end)
                seq += 1
                n, start, end = 1, ts, ts
            else:
                n += 1
                end = ts
        out[(uid, seq)] = (n, start, end)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream_strategy)
def test_sessionize_matches_python_reference(spark, gaps_by_user):
    from aws_glue_etl_sample_hist_spark.operators.sessionize import sessionize

    rows, eid = [], 0
    for uid, gaps in enumerate(gaps_by_user):
        ts = BASE
        for i, g in enumerate(gaps):
            ts = BASE if i == 0 else ts + g
            rows.append((eid, uid, ts, 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_us", "value"]
    ).withColumn("ts", F.timestamp_micros("ts_us"))

    got = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start_us, r.session_end_us)
        for r in sessionize(df, gap_seconds=GAP_S).collect()
    }
    assert got == _reference_sessions(gaps_by_user)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_tokens=st.integers(min_value=1, max_value=120),
    window=st.integers(min_value=2, max_value=40),
    data=st.data(),
)
def test_chunking_covers_every_token_with_exact_overlap(spark, n_tokens, window, data):
    """Property: token-window chunking covers EVERY token (the tail is
    never dropped), non-final chunks are exactly min(window, remaining)
    tokens, and chunk indices are dense from 0."""
    stride = data.draw(st.integers(min_value=1, max_value=window))
    from aws_glue_etl_sample_hist_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(n_tokens))
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = sorted(
        (r.chunk_idx, r.chunk_tokens)
        for r in chunk_documents(docs, window=window, stride=stride).collect()
    )
    # chunk i covers tokens [i*stride, i*stride + chunk_tokens)
    covered = set()
    for idx, ct in rows:
        assert ct >= 1
        start = idx * stride
        covered |= set(range(start, start + ct))
        if (idx, ct) != rows[-1]:
            assert ct == min(window, n_tokens - start)
    assert covered == set(range(n_tokens))
    # dense chunk indices
    assert [i for i, _ in rows] == list(range(len(rows)))
