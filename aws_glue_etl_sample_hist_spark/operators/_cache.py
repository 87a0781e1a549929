"""Operator-internal persist tracking.

Several lazy operators persist shared intermediates (LSH band frames,
normalized-vector frames, shingle sets) because their self-join sides do not
share a physical subtree -- without persist each side recomputes the frame,
and a broadcast side additionally defeats ReusedExchange. An operator that
returns a LAZY DataFrame cannot unpersist those frames itself: the caller
has not executed anything yet.

The frames are therefore registered here. Short-lived jobs can ignore this
entirely (executor eviction handles it); a long-lived session that calls
banded operators repeatedly should call :func:`release_operator_caches`
between jobs -- or ``spark.catalog.clearCache()`` for the blunt version --
so cached blocks don't accumulate until eviction pressure
(round-3 ADVICE finding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for later bulk release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_operator_caches() -> int:
    """Unpersist every operator-persisted frame still tracked; returns the
    number released. Safe to call at any time -- already-consumed frames
    simply drop their cached blocks; unconsumed lazy results recompute."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped -- nothing to release
            pass
    return n
