"""Sinks (reference SURVEY §2.1 S5-S8).

The reference writes Hive-partitioned parquet with dynamic partition
overwrite (jb_de_enhancement_t0_fact_d2s.py:23,91) and controls file counts
by hand: ``repartition(4)`` on ingest, ``coalesce(1)`` on marts
(jb_de_enhancement_t2_salesbyresidence_s2s.py:61-62, document/glue_t1.md:82).

``coalesce(1)`` is correct for KB-sized marts and catastrophic at 100 TB, so
file-count control is a *policy*, not a hardcoded number: callers state a
target file size and the writer picks partition counts from a row-count
estimate, falling back to AQE coalescing when it can't know better.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class WriterPolicy:
    """How many files to produce, stated as intent instead of a magic number.

    target_file_rows: approximate rows per output file (None = let AQE decide).
    max_files: hard cap (the tiny-mart case: cap at 1 reproduces the
        reference's coalesce(1) without baking it into job code).
    """

    target_file_rows: int | None = None
    max_files: int | None = None

    def shape(self, df: DataFrame, row_estimate: int | None = None) -> DataFrame:
        n = None
        if self.target_file_rows:
            rows = row_estimate if row_estimate is not None else df.count()
            n = max(1, -(-rows // self.target_file_rows))  # ceil
        if self.max_files is not None:
            n = min(n or self.max_files, self.max_files)
        if n is None:
            return df
        # coalesce when shrinking (no shuffle); repartition when growing
        current = df.rdd.getNumPartitions()
        return df.coalesce(n) if n <= current else df.repartition(n)


# reference defaults: marts are tiny -> one file (parity with coalesce(1));
# facts get size-targeted files
MART_POLICY = WriterPolicy(max_files=1)
FACT_POLICY = WriterPolicy(target_file_rows=5_000_000)


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    policy: WriterPolicy | None = None,
    row_estimate: int | None = None,
) -> None:
    """Partitioned parquet write. With
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (session default),
    ``mode='overwrite'`` only replaces partitions present in ``df`` --
    the reference's idempotent incremental-load mechanism (S7)."""
    if policy is not None:
        df = policy.shape(df, row_estimate)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
