"""Sorts / limits / top-k (reference SURVEY §2.5 O1-O5).

The reference globally sorts one mart before writing
(jb_de_enhancement_t2_salesbyresidence_s2s.py:57) and uses ORDER BY/LIMIT in
its Athena queries. A global sort is a range-partitioned shuffle -- fine for
KB marts, expensive at scale; `topk` expresses ORDER BY+LIMIT instead, which
Spark executes as TakeOrderedAndProject (per-partition heap + driver merge,
no full sort, no full shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def multi_sort(df: DataFrame, *cols: Column) -> DataFrame:
    """Global multi-column mixed-direction sort (reference O1)."""
    return df.orderBy(*cols)


def topk(df: DataFrame, k: int, *cols: Column) -> DataFrame:
    """ORDER BY ... LIMIT k. Include a unique tiebreak column in ``cols`` when
    determinism matters -- ties are otherwise partition-order dependent."""
    return df.orderBy(*cols).limit(k)
