"""JDBC source smoke (reference S11): partitioned parallel reads against an
embedded Derby database -- Derby ships on Spark's own classpath, so the
reference's JDBC extract path (jb_de_enhancement_t0_fact_d2s.py:72-75) is
exercised end-to-end without any external service: write a table over JDBC,
read it back sliced into N connections, and check filter pushdown reaches
the remote query."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_etl_sample_hist_spark.io.sources import read_jdbc

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_read_jdbc_partitioned_roundtrip_embedded_derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/smokedb;create=true"
    src = spark.range(0, 100).select(
        F.col("id").cast("long").alias("pk"), (F.col("id") * 2).cast("long").alias("val")
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "t_smoke")
        .option("driver", DERBY["driver"])
        .mode("overwrite")
        .save()
    )

    # partitioned read: Spark opens num_partitions connections, each with a
    # bound-sliced WHERE on the partition column
    df = read_jdbc(
        spark,
        url,
        "t_smoke",
        connection=DERBY,
        partition_column="pk",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 100
    assert sum(r.val for r in rows) == 2 * sum(range(100))

    # filter pushdown: the predicate must reach the JDBC scan (PushedFilters),
    # not run Spark-side over a full-table fetch
    filtered = df.filter(F.col("pk") < 10)
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "LessThan(pk,10" in plan.replace(" ", ""), plan
    assert filtered.count() == 10
