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

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class WriterPolicy:
    """How many files to produce, stated as intent instead of a magic number.

    target_file_rows: rows per output file, enforced via the writer's
        ``maxRecordsPerFile`` option -- splits oversized tasks WITHOUT a
        shuffle or an extra counting pass (the scale path; AQE coalescing
        handles the too-many-tiny-partitions direction).
    max_files: hard cap via coalesce (the tiny-mart case: cap 1 reproduces
        the reference's coalesce(1) without baking it into job code).
    """

    target_file_rows: int | None = None
    max_files: int | None = None

    def shape(self, df: DataFrame) -> DataFrame:
        if self.max_files is not None:
            # coalesce never shuffles; a cap above the partition count is a no-op
            return df.coalesce(self.max_files)
        return df

    def writer_options(self) -> dict[str, str]:
        if self.target_file_rows:
            return {"maxRecordsPerFile": str(self.target_file_rows)}
        return {}


# reference defaults: marts are tiny -> one file (parity with coalesce(1));
# facts get size-targeted files
MART_POLICY = WriterPolicy(max_files=1)
FACT_POLICY = WriterPolicy(target_file_rows=5_000_000)


def compact_dir(
    spark,
    path: str,
    *,
    target_file_rows: int = 5_000_000,
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """Small-files compaction: rewrite a parquet directory so each file
    carries ~``target_file_rows`` rows. The lake-maintenance counterpart of
    the writer policies above -- incremental loads and streaming sinks
    accrete small files over time, and at 100 TB the file COUNT (driver
    listing, task scheduling, S3 requests) becomes the bottleneck before
    the bytes do.

    Shape: one read -> coalesce to ceil(rows / target) -> write alongside ->
    atomic directory swap. coalesce (not repartition) -- merging small files
    needs no shuffle, only fewer tasks. One count action up front is the
    honest price of sizing the output; Hive-partitioned inputs pass
    ``partition_by`` so the layout is preserved per partition directory.
    Returns {files_before, files_after, rows}."""
    import glob as _glob
    import math
    import shutil

    df = spark.read.parquet(path)
    rows = df.count()
    files_before = len(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    n_files = max(1, math.ceil(rows / target_file_rows))
    tmp = path.rstrip("/") + "__compact_tmp"
    writer = df.coalesce(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    old = path.rstrip("/") + "__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = len(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return {"files_before": files_before, "files_after": files_after, "rows": rows}


def upsert_partitioned(
    spark,
    path: str,
    updates: DataFrame,
    *,
    key_cols: list[str],
    partition_cols: list[str],
) -> None:
    """MERGE (upsert by key) into a Hive-partitioned parquet table without a
    table format: CDC batches land in an ordinary parquet lake with IO
    proportional to the TOUCHED partitions, never the table.

    Plan: semi-join the table scan to the updates' distinct partition values
    (partition pruning keeps the read to those directories), anti-join away
    old versions of updated keys, union the updates, and dynamic-partition-
    overwrite -- untouched partitions are never read or written (reference
    S7 semantics extended from replace-partition to replace-row).

    The merged frame is localCheckpoint'd before the write because source
    and destination are the same directory; at petabyte scale stage to a
    sibling directory and swap instead (same plan, different landing)."""
    from pyspark.sql import functions as F

    parts = updates.select(*partition_cols).distinct()
    existing = spark.read.parquet(path).join(
        F.broadcast(parts), partition_cols, "left_semi"
    )
    keep = existing.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    merged = keep.unionByName(updates).localCheckpoint(eager=True)
    write_partitioned(merged, path, partition_by=partition_cols, mode="overwrite")


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    policy: WriterPolicy | None = None,
) -> None:
    """Partitioned parquet write. With
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (session default),
    ``mode='overwrite'`` only replaces partitions present in ``df`` --
    the reference's idempotent incremental-load mechanism (S7)."""
    if policy is not None:
        df = policy.shape(df)
    writer = df.write.mode(mode)
    if policy is not None:
        for k, v in policy.writer_options().items():
            writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def observed_write(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> dict:
    """Partitioned parquet write that collects in-flight metrics via
    ``df.observe`` -- row counts, null counts, sums ride along INSIDE the
    write job (accumulator-backed), so the pipeline gets its audit numbers
    without a second scan-and-count action over the tier it just wrote.

    This is the production ingestion contract at 100 TB: every tier write
    reports its own volumetrics for free; a separate `count()` would re-read
    the tier (or recompute the lineage) and double the job's cost.

    ``metrics`` maps name -> aggregate Column (e.g. ``F.count(F.lit(1))``,
    ``F.sum(F.col('x').isNull().cast('long'))``). Returns the observed
    values as a plain dict after the write completes.
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    writer = observed.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return dict(obs.get)
