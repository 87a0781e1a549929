"""SparkSession factory.

The reference runs on Glue 3.0 (Spark 3.1) with hand-tuned confs
(dynamic partition overwrite: reference scripts/jb_de_enhancement_t0_fact_d2s.py:23;
committer tweaks: scripts/jb_de_dehancement_t0_dimension_d2s.py:19-21).
We standardize those plus the scale-oriented defaults Spark added since:
AQE (runtime partition coalescing + skew-join splitting), Arrow for any
Python exchange, and UTC session time so timestamp semantics are
deterministic across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "aws-glue-etl-sample-hist-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Scale notes (the same confs are what we would set cluster-side):
      - AQE on: runtime coalescing replaces hand-tuned ``coalesce(1)`` in the
        reference (document/glue_t1.md:82), skew-join splitting replaces
        manual salting for moderately skewed keys.
      - ``partitionOverwriteMode=dynamic``: idempotent incremental loads
        (reference S7).
      - shuffle partitions default to 2x cores locally; on a real cluster this
        is left to AQE's ``spark.sql.adaptive.coalescePartitions`` with a
        large initial number.
    """
    n = cpus or default_parallelism()
    shuffle = shuffle_partitions or max(32, 2 * n)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark cannot read
        # nanos natively -- read as long and convert (catalog.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # suppress _SUCCESS markers like the reference committer tweaks
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
