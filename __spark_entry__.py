"""Driver contract for the spark-graft builder (PySpark target).

entry(spark):     flagship query (the reference's gold-mart spine) on sf0.001.
queries():        every implemented operator from SURVEY.md §2 + extensions.
oracle_sql():     DuckDB twin of each query (dual-engine oracle, the same
                  Spark-vs-Presto pattern the reference used for verification).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_glue_etl_sample_hist_spark.oracles import ORACLE_SQL
from aws_glue_etl_sample_hist_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's T1->T2 spine (silver denormalize -> 7-key
    gold mart) over /root/testdata/sf0.001."""
    # match the session confs the engine needs for the testdata (nanos
    # timestamps) without rebuilding the driver-provided session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # fine: flagship tables (lineitem/orders/...) are micros/millis
    return QUERIES["mart_sales_by_segment_product"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
