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


def count_min_estimates(
    items: DataFrame,
    queries: DataFrame,
    *,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency estimates
    for a set of query keys -- THE mergeable sketch for "how often did X
    occur" over a stream too wide for an exact frequency table: the sketch
    is depth x width counters (here 4 x 1024 = 16 KB), each item
    increments one counter per row (md5-derived column, so the sketch is
    DETERMINISTIC and engine-portable), and est(x) = min over rows of its
    counter. Guarantees: est >= true always (collisions only add), and
    P(est > true + e*N) <= (1/2)^depth at width = 2/e -- the bounds this
    operator SURFACES per query key instead of asking for trust.

    Scale shape: one groupBy((row, col)) count with map-side combine --
    the shuffle is bounded by depth*width regardless of corpus size
    (that bounded table IS the mergeable sketch; union two corpora's
    tables and re-sum to merge). Query keys join against it by broadcast.
    Returns (item, est_n, depth, width) -- est_n the CMS estimate.
    Callers join true counts beside it for the bound witnesses (see
    queries.q_corpus_token_cms)."""
    cell = None
    cells = []
    for r in range(depth):
        col_idx = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}{r}:"), F.col(item_col).cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % width
        )
        cells.append(F.struct(F.lit(r).alias("r"), col_idx.alias("c")))
    cell = F.explode(F.array(*cells)).alias("cell")
    sketch = (
        items.select(cell)
        .select(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = queries.select(F.col(item_col).alias("item"))
    q_cells = q.select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"{salt}{r}:"),
                                            F.col("item").cast("string"),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("item", F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
    return (
        q_cells.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_n"))
        .select(
            "item",
            F.col("est_n").cast("long").alias("est_n"),
            F.lit(depth).cast("long").alias("depth"),
            F.lit(width).cast("long").alias("width"),
        )
    )


def misra_gries_partials(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries WITH their residual counts --
    the MERGEABLE form (Agarwal et al. 2013, "Mergeable Summaries"):
    two summaries merge by pointwise count addition followed by the
    compress step (subtract the (k+1)-th largest count, drop <= 0), and
    the merged undercount stays <= N/k no matter how many merges -- which
    is what lets a STREAM maintain one standing summary across batches
    (streaming/jobs.py::stream_events_heavy_hitters). Returns (col, cnt)
    rows, at most k per partition."""

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
        yield pd.DataFrame(
            {col: list(counters.keys()), "cnt": list(counters.values())}
        )

    return df.select(col).mapInPandas(summarize, schema=f"{col} long, cnt long")


def merge_mg_summary(
    state: dict[int, int], rows, k: int
) -> dict[int, int]:
    """Driver-side merge of (key, cnt) rows into a standing MG summary of
    size <= k: pointwise addition, then compress by subtracting the
    (k+1)-th largest count. Deterministic; O(k log k)."""
    for key, cnt in rows:
        state[int(key)] = state.get(int(key), 0) + int(cnt)
    if len(state) > k:
        cuts = sorted(state.values(), reverse=True)
        cut = cuts[k]  # the (k+1)-th largest
        state = {
            key: c - cut for key, c in state.items() if c - cut > 0
        }
    return state
