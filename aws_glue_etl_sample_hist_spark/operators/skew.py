"""Skew defenses: salted two-phase aggregation.

At 100 TB a handful of hot group keys (one affiliate, one event_type) can pin
an entire aggregation on one reducer. AQE splits skewed JOIN partitions but
does not re-shard a skewed GROUP BY key; salting does: shard every hot key
into ``n_salts`` sub-keys, aggregate partials per (key, salt), then combine
partials per key. Two small shuffles instead of one unbalanced one.

Only algebraic aggregates decompose this way (sum, count, min, max; avg via
sum+count). The combine step re-aggregates PARTIALS -- sum of sums, sum of
counts, min of mins -- so results are bit-identical to the direct group-by,
which is what lets a salted query share its unsalted twin's oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_COMBINE = {"sum": F.sum, "count": lambda c: F.sum(c), "min": F.min, "max": F.max}


def salted_top_k(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    k: int,
    *,
    rank_col: str = "rank",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe top-k per group over a LOW-cardinality partition key.

    A plain ``rank().over(partitionBy(key))`` on a ~5-value key sorts each
    key's ENTIRE history on one task. Two phases fix that:

    1. rank within (key, salt) -- ``n_salts`` tasks per hot key -- and keep
       local rank <= k only. Exact: a row in the global top-k has at most
       k-1 rows ahead of it globally, so at most k-1 ahead of it within its
       own shard, so its local rank is <= k. No survivor is lost, whatever
       the salt assignment (rand is fine; it need not be reproducible).
    2. rank the <= k * n_salts survivors per key -- a tiny final window.

    ``order_cols`` must be a total order (include a unique tiebreaker), so
    rank() has no ties and equals row_number() -- that is what makes the
    local <=k cut exact. Output = input columns + ``rank_col`` (long),
    filtered to rank <= k.
    """
    salt = (F.rand(seed=0) * n_salts).cast("int")
    w_local = Window.partitionBy(*part_cols, "_salt").orderBy(*order_cols)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_local_rn", F.row_number().over(w_local))
        .filter(F.col("_local_rn") <= k)
        .drop("_salt", "_local_rn")
    )
    w_final = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return survivors.withColumn(
        rank_col, F.rank().over(w_final).cast("long")
    ).filter(F.col(rank_col) <= k)


def salted_left_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe left equi-join: salt the big side's key into ``n_salts``
    shards and replicate the small side once per shard, so a hot key's rows
    spread over ``n_salts`` reducers instead of one.

    The replicate-the-small-side construction keeps results exactly equal to
    the plain join (every big row still meets every matching small row,
    exactly once). Use when the small side is too big to broadcast AND the
    key is skewed; AQE's skew-join handles sort-merge cases, but this works
    for any join and under any planner. Cost: small side x n_salts.
    """
    salted_big = big.withColumn("_salt", (F.rand(seed=0) * n_salts).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(salted_small, [on, "_salt"], "left")
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys) with salting: ``aggs`` maps output column ->
    (agg function name, input column), e.g. {"n_events": ("count", "*"),
    "sum_value": ("sum", "value")}. Supported: sum/count/min/max."""
    salt = (F.rand(seed=0) * n_salts).cast("int").alias("_salt")
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(
                (F.count("*") if col == "*" else F.count(col)).alias(f"_p_{out}")
            )
        else:
            partial_exprs.append(getattr(F, fn)(col).alias(f"_p_{out}"))
        final_exprs.append(_COMBINE[fn](f"_p_{out}").alias(out))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
