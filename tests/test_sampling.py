"""Sampling + shard-packing operators: determinism, rate accuracy, and the
two-level parallel prefix sum's exact equality with a naive global window."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_glue_etl_sample_hist_spark.operators.sampling import (
    hash_sample,
    pack_shards,
    stratified_hash_sample,
)


def test_hash_sample_is_deterministic_and_rate_accurate(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(df, 0.2).collect()}
    b = {r.doc_id for r in hash_sample(df.repartition(13), 0.2).collect()}
    # identical under any physical partitioning (rand(seed) would NOT be)
    assert a == b
    assert abs(len(a) / 10_000 - 0.2) < 0.02
    # different salt -> a different (independent) sample
    c = {r.doc_id for r in hash_sample(df, 0.2, salt="other").collect()}
    assert c != a


def test_stratified_sample_rates_per_stratum(spark):
    df = spark.range(0, 9_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "fr")
        .otherwise("zh").alias("lang"),
    )
    out = stratified_hash_sample(
        df, {"en": 0.1, "fr": 1.0}, strata_col="lang", default_fraction=0.0
    )
    rates = {
        r.lang: r.n / 3_000
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert abs(rates["en"] - 0.1) < 0.03
    assert rates["fr"] == 1.0
    assert "zh" not in rates  # default 0.0 drops the stratum entirely


def test_pack_shards_equals_naive_global_window(spark):
    # ids with gaps (sampling upstream) and varying weights
    rows = [(i * 7 + (i % 3), (i % 50) + 1) for i in range(2_000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    fast = pack_shards(df, budget=500, bucket_size=128)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = df.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long")).withColumn(
        "shard", F.floor((F.col("cum_tokens") - F.col("n_tokens")) / 500).cast("long")
    )
    assert sorted(map(tuple, fast.select("doc_id", "n_tokens", "cum_tokens", "shard").collect())) == \
        sorted(map(tuple, naive.select("doc_id", "n_tokens", "cum_tokens", "shard").collect()))
    # every shard except the last stays within budget + one doc's overhang
    caps = fast.groupBy("shard").agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
    bad = caps.filter(F.col("tot") > 500 + F.col("mx")).count()
    assert bad == 0


def test_pack_shards_window_partitions_by_bucket_not_single_task(spark):
    df = spark.range(0, 4_096).select(F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens"))
    out = pack_shards(df, budget=1000, bucket_size=256)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    # the big window runs per-bucket: its exchange hashes on _bucket; the
    # only global (SinglePartition) exchange is over the tiny bucket totals
    assert "_bucket" in plan
    assert "hashpartitioning(_bucket" in plan
