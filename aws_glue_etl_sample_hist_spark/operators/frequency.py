"""Frequent-item (heavy-hitter) detection: per-partition Misra-Gries
summaries merged into an exact answer via a candidate re-count.

The classic two-phase distributed shape (Misra & Gries 1982; merge bound
from Agarwal et al. 2013 "Mergeable Summaries"): each partition compresses
its stream to at most k counters in one pass (undercount <= N_p/k), the
union of surviving keys is a superset of every item with global frequency
> N/k, and one exact groupBy restricted to that candidate set turns the
sketch into an EXACT heavy-hitter answer. At 100 TB the first pass streams
map-side with O(k) state per task and ships only candidate keys; the
re-count is a semi-join-pruned aggregate over the (tiny) candidate set, so
no full-frequency table is ever materialized -- the whole point vs a plain
groupBy().count() whose shuffle carries every distinct key.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """One-pass per-partition Misra-Gries over ``col`` (bigint); returns the
    distinct surviving keys -- a superset of all items with freq > N/k."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[int, int] = {}
        for pdf in batches:
            for v in pdf[col]:
                v = int(v)
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(summarize, schema=f"{col} long").distinct()


def heavy_hitters_exact(
    df: DataFrame, col: str, threshold_frac: float, *, k: int | None = None
) -> DataFrame:
    """All values of ``col`` with frequency >= threshold_frac * N, exactly.

    k defaults to 2/threshold_frac, twice the 1/phi needed for the
    superset guarantee (any true heavy hitter has freq >= phi*N > N/k).
    Output: (col, freq) with exact counts.
    """
    if k is None:
        k = int(2.0 / threshold_frac)
    candidates = misra_gries_candidates(df, col, k)
    total = df.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") >= F.ceil(F.col("_n") * threshold_frac))
        .select(col, F.col("freq").cast("long").alias("freq"))
    )
