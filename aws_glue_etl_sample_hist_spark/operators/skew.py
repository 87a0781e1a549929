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

_COMBINE = {"sum": F.sum, "count": lambda c: F.sum(c), "min": F.min, "max": F.max}


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
