"""Multi-dimensional data layout: z-order (Morton) clustering for parquet
file skipping.

A lake sorted by ONE column prunes row groups only for filters on that
column; every other dimension's min/max spans the full range in every file.
Interleaving the bits of two dimensions (the Morton curve) makes file-level
min/max statistics tight in BOTH dimensions at once, so a selective filter
on either column -- or a box on both -- skips most files at the scan, before
a single row is read. This is the layout trick behind Delta/Iceberg
Z-ORDER, expressed with nothing but Spark expressions and a range
partitioner; it composes with `write_bucketed_table` (cluster within
buckets) and `compact_dir` (re-layout during compaction).

Everything is a JVM expression (shift/and/multiply), whole-stage codegen'd;
the only actions are the one min/max aggregate used to normalize the
columns into bucket space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def z_value(a: Column, b: Column, bits: int = 10) -> Column:
    """Morton code: interleave the low ``bits`` bits of two non-negative
    bucket indices (a gets the odd bit positions, b the even)."""
    terms = [
        F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        for i in range(bits)
    ] + [
        F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        for i in range(bits)
    ]
    out = F.lit(0).cast("long")
    for t in terms:
        out = out + t
    return out


def _bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Min-max normalize a numeric column into [0, 2^bits) bucket indices."""
    n = 1 << bits
    span = max(hi - lo, 1e-12)
    idx = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * n).cast("long")
    return F.least(F.greatest(idx, F.lit(0)), F.lit(n - 1))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    *,
    n_files: int = 32,
    bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the Morton
    curve of ``cols``: range-partition by z-value (files own contiguous
    curve segments => tight per-file min/max on BOTH columns), sort within
    files (tight row-group stats too). One min/max aggregate to calibrate
    the bucket space; everything else is map-side."""
    ca, cb = cols
    stats = df.agg(
        F.min(ca).alias("a_lo"), F.max(ca).alias("a_hi"),
        F.min(cb).alias("b_lo"), F.max(cb).alias("b_hi"),
    ).collect()[0]
    z = z_value(
        _bucketize(F.col(ca), float(stats.a_lo), float(stats.a_hi), bits),
        _bucketize(F.col(cb), float(stats.b_lo), float(stats.b_hi), bits),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
