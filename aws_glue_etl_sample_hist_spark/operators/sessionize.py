"""Gap-based sessionization over an event stream (batch form).

The reference has no event/stream processing (SURVEY.md §2.9: closest analog
is its scheduled micro-batch DAG), so this is a north-star extension: the
classic "split a user's clickstream into sessions at >gap idle" operator a
training-data pipeline needs for behavioral data.

Spark-first design: no UDFs, no applyInPandas -- two window functions
(lag + running sum) and a hash aggregate, all whole-stage-codegen'd JVM
expressions. At 100 TB the only shuffle is the single hash-partition on
user_id, which both window specs and the final groupBy reuse (one exchange,
three operators). The streaming twin (streaming/jobs.py) expresses the same
semantics with applyInPandasWithState for unbounded input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
    value_col: str | None = "value",
) -> DataFrame:
    """Split each user's events into sessions separated by > gap_seconds idle.

    Returns one row per (user, session_seq) with event count, start/end epoch
    micros, and an optional rounded value sum. Timestamps are carried as
    epoch-microsecond longs so results are engine-portable (no tz coupling).
    """
    us: Column = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap_us = gap_seconds * 1_000_000

    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    seq = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    flagged = df.withColumn("_us", us).withColumn("session_seq", seq)
    aggs = [
        F.count("*").alias("n_events"),
        F.min("_us").alias("session_start_us"),
        F.max("_us").alias("session_end_us"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("session_value"))
    return flagged.groupBy(user_col, "session_seq").agg(*aggs)
