"""Table registry: name -> path/schema, replacing the Glue Data Catalog +
crawlers of the reference (document/glue_t0.md:95-99 — crawlers infer parquet
schema; scripts read catalog tables via create_dynamic_frame.from_catalog().toDF(),
jb_de_enhancement_t1_fulljoin_s2s.py:39-49).

Spark-first equivalent: parquet is self-describing and path-partitioned
layouts are discovered automatically, so the "catalog" is just a name->path
map plus per-table normalization (the one real fix-up: events.ts is stored as
parquet TIMESTAMP(NANOS), which Spark reads as long only under
``nanosAsLong`` — we convert back to a proper timestamp here, truncating to
microseconds exactly like DuckDB/Presto do).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# the driver-generated star schema (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make any externally-built session (e.g. the driver's) able to read the
    testdata: UTC for deterministic timestamp formatting, nanosAsLong because
    events.parquet stores TIMESTAMP(NANOS). Both are runtime-settable."""
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with schema normalization applied."""
    _ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as long nanos; integer-divide to micros
            # (`div`, NOT `/` -- `/` is double division and loses precision
            # at ~1.7e18 ns, off-by-1us). All values are post-epoch, so
            # integer division == floor, matching DuckDB's micro-truncation.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # parquet isAdjustedToUTC=false surfaces as TIMESTAMP_NTZ, which
            # half the epoch functions (unix_micros & co.) reject. Under the
            # pinned UTC session the cast keeps the same wall clock == same
            # instant, and matches how DuckDB treats the naive value.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every testdata table as a temp view (the rebuild's 'crawler')."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
