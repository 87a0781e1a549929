"""Sampling and shard-packing operators for LLM-data pipelines (north-star
extension): the selection/layout stages between a cleaned corpus and a
training run.

Scale design notes
------------------
- Sampling is HASH-based, never `rand()`: keep a row iff
  md5(salt:key) mod M < fraction*M. Map-only (no shuffle, no state),
  reproducible across runs/engines/partitionings, and stable under corpus
  growth -- a doc's fate never depends on which executor saw it. The same
  expression runs in DuckDB, so sampling ships with an exact oracle
  (`rand(seed)` does not: Spark seeds per-partition, so output depends on
  the physical split).
- Stratified rates are a CASE over the stratum column -- still map-only.
- Shard packing needs a GLOBAL running total of tokens; a bare
  `Window.orderBy(...)` without partitions collapses to ONE task -- the
  low-cardinality window trap. The two-level prefix sum keeps it parallel:
  within-bucket cumsum (window partitioned by bucket = id div B, B ~ 2^10
  rows) + per-bucket offsets (n/B rows -- tiny, broadcast back). Exactly
  the textbook parallel scan, expressed as two windows and a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

SAMPLE_MOD = 1_000_000


def sample_hash(key: Column, salt: str) -> Column:
    """Deterministic per-key draw in [0, SAMPLE_MOD): first 8 md5 hex chars
    of 'salt:key' as an integer, mod SAMPLE_MOD. Portable: DuckDB computes
    the identical value, so sampled outputs are oracle-exact."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(SAMPLE_MOD))


def hash_sample(
    df: DataFrame,
    fraction: float,
    *,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Uniform deterministic sample: keep iff draw < fraction. Map-only."""
    return df.filter(sample_hash(F.col(key_col), salt) < int(fraction * SAMPLE_MOD))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of scarce
    languages, 10% of the dominant one). One CASE expression over the
    stratum column picks the threshold; still map-only, no shuffle."""
    thr: Column = F.lit(int(default_fraction * SAMPLE_MOD))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(int(frac * SAMPLE_MOD))).otherwise(thr)
    return df.filter(sample_hash(F.col(key_col), salt) < thr)


def pack_shards(
    df: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    bucket_size: int = 1024,
) -> DataFrame:
    """Assign rows (in ``id_col`` order) to fixed-budget shards: shard i
    holds the rows whose running token total falls in [i*budget, (i+1)*budget).
    A doc's shard = floor(tokens_before_it / budget) -- deterministic,
    order-stable, and each shard's payload is within one document of the
    budget.

    The running total is the two-level prefix sum from the module docstring:
    no single-task global window at any size. Output adds ``cum_tokens``
    (inclusive running total) and ``shard``."""
    bucket = F.floor(F.col(id_col) / bucket_size).alias("_bucket")
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = df.withColumn("_bucket", bucket).withColumn(
        "_run_in", F.sum(weight_col).over(w_in)
    )
    # per-bucket totals: n/bucket_size rows -- the single-partition window
    # over THEM is over a tiny relation, then broadcast back
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        within.groupBy("_bucket")
        .agg(F.sum(weight_col).alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)))
        .select("_bucket", "_off")
    )
    cum = F.col("_off") + F.col("_run_in")
    return (
        within.join(F.broadcast(offsets), "_bucket")
        .withColumn("cum_tokens", cum.cast("long"))
        .withColumn(
            "shard",
            F.floor((cum - F.col(weight_col)) / budget).cast("long"),
        )
        .drop("_bucket", "_run_in", "_off")
    )
