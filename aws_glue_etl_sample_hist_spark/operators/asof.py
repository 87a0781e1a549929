"""As-of (point-in-time) join: for every left row, attach the most recent
right row with right_time <= left_time for the same key -- the
feature-store-correctness join (no leakage from the future), which plain
equi-joins can't express and naive non-equi joins explode into nested loops.

Scale design
------------
Spark has no native ASOF JOIN; the scalable form is the union-tag trick:

    rows = right(tagged 0) ∪ left(tagged 1)
    window: partitionBy(key) orderBy(time, tag)
    carry  = last(right_value, ignorenulls=True) over (unbounded, current)
    result = rows where tag = 1

ONE shuffle on the join key (same as any equi-join), a within-partition
sort, and a carry-forward -- never a per-row range probe, never a
BroadcastNestedLoopJoin. Ordering (time, tag) with right before left makes
a tie (right_time == left_time) visible to the left row, matching ASOF's
`>=` semantics. DuckDB ships a native ASOF JOIN, so the operator has an
exact oracle.

Right-side duplicates per (key, time) must be pre-reduced (pick a
deterministic winner) or the carry-forward picks whichever sorts last --
the query layer reduces to max-id per (key, day) before joining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _epoch_us(col: F.Column) -> F.Column:
    """Epoch microseconds for TIMESTAMP *or* TIMESTAMP_NTZ input.
    ``unix_micros`` rejects NTZ outright; casting to ``timestamp`` first is
    a no-op for LTZ and interprets NTZ in the session zone (the engine pins
    UTC everywhere -- catalog._ensure_session_confs), so both storage
    flavors of the same instant yield the same integer."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Attach to each left row the latest right row (by ``right_time`` <=
    ``left_time``) sharing the ``on`` key. Output = left columns +
    ``value_cols`` (null when no prior right row and how='left';
    how='inner' drops those rows).

    ``left`` and ``right`` must both expose ``on``; time columns may have
    different names. Right rows must be unique per (key, time)."""
    lcols = left.columns
    tagged_r = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        "_tag",
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    out = carried.filter(F.col("_tag") == 1).drop("_tag")
    if how == "inner":
        out = out.filter(F.col(value_cols[0]).isNotNull())
    return out


def interval_join_binned(
    left: DataFrame,
    intervals: DataFrame,
    *,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Keyless interval (range) join made shuffle-joinable: attach to each
    left row every interval with start <= ts < end. A naive `ts BETWEEN
    start AND end` join has NO equi key, so Spark executes it as a
    BroadcastNestedLoopJoin -- O(|left| x |intervals|), the classic range-
    join scale cliff.

    The binned form restores an equi key: every interval EXPLODES into the
    fixed-width time bins it overlaps (ceil(len/bin) rows -- pick
    ``bin_seconds`` near the typical interval length so the fan-out stays
    O(1)), each left row computes its single bin, and the join runs as a
    plain equi-join on the bin followed by the exact [start, end) filter.
    Both sides shuffle/broadcast on the bin key like any hash join; the
    per-bin candidate set replaces the all-pairs product. This is the
    standard range-join optimization Spark itself lacks (Databricks ships
    it as a hint; open-source implementations do exactly this explode).

    End is EXCLUSIVE (micros precision). Overlapping intervals multiply
    matching left rows -- real range-join semantics, no accidental dedup.
    Output: all left columns + all interval columns."""
    bin_us = F.lit(int(bin_seconds) * 1_000_000)
    b_int = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(_epoch_us(F.col(start_col)) / bin_us),
                F.floor((_epoch_us(F.col(end_col)) - 1) / bin_us),
            )
        ).alias("_bin"),
    )
    b_left = left.withColumn("_bin", F.floor(_epoch_us(F.col(ts_col)) / bin_us))
    return (
        b_left.join(b_int, "_bin")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bin")
    )
