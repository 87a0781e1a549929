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


def test_shuffle_shards_partitioned_export_layout(spark, sf_small, tmp_path):
    """The end of the pipeline: shuffled shards exported as a
    Hive-partitioned lake (partition dir per shard), reading back complete
    and per-shard ordered by pos. This is the layout a training loader
    consumes shard-by-shard."""
    import glob
    import os

    from pyspark.sql import functions as F

    from aws_glue_etl_sample_hist_spark.catalog import load_table
    from aws_glue_etl_sample_hist_spark.io.sinks import write_partitioned
    from aws_glue_etl_sample_hist_spark.operators.sampling import shuffle_shards

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    sharded = shuffle_shards(docs, 4)
    out = str(tmp_path / "shards")
    write_partitioned(sharded, out, partition_by=["shard"])
    dirs = sorted(os.path.basename(d) for d in glob.glob(os.path.join(out, "shard=*")))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # within a shard directory, pos is dense from 1 (loader contract)
    one = back.filter(F.col("shard") == 0).select("pos").collect()
    assert sorted(r.pos for r in one) == list(range(1, len(one) + 1))


def test_distribution_matched_sample_rates_and_caps(spark):
    """Rate math on a hand fixture: over-represented pool buckets get
    ppm < 1e6 proportional to ref_share/pool_share, matched buckets cap at
    exactly 1e6 (keep everything), ref-only buckets report zero pool and
    zero sampled, pool-only buckets get rate 0."""
    from aws_glue_etl_sample_hist_spark.operators.sampling import (
        distribution_matched_sample,
    )
    from pyspark.sql import functions as F

    # ref: 10 docs in bucket 0, 10 in bucket 1, 5 in bucket 3 (ref-only)
    ref = spark.createDataFrame(
        [(i, 0) for i in range(10)]
        + [(100 + i, 1) for i in range(10)]
        + [(200 + i, 3) for i in range(5)],
        "doc_id long, bucket long",
    )
    # pool: 40 docs bucket 0 (over-rep), 10 bucket 1, 10 bucket 2 (pool-only)
    pool = spark.createDataFrame(
        [(1000 + i, 0) for i in range(40)]
        + [(2000 + i, 1) for i in range(10)]
        + [(3000 + i, 2) for i in range(10)],
        "doc_id long, bucket long",
    )
    rows = {r.bucket: r for r in distribution_matched_sample(pool, ref).collect()}
    # bucket 0: ref share 10/25, pool share 40/60 -> rate = (10*60)/(25*40)=0.6
    assert rows[0].rate_ppm == 600_000
    # bucket 1: ref share 10/25 vs pool 10/60 -> uncapped 2.4 -> capped
    assert rows[1].rate_ppm == 1_000_000
    assert rows[1].n_sampled == rows[1].n_pool == 10
    # pool-only bucket: nothing in ref -> drop all
    assert rows[2].rate_ppm == 0 and rows[2].n_sampled == 0
    # ref-only bucket: present in report, no pool, nothing sampled
    assert rows[3].n_pool == 0 and rows[3].n_sampled == 0
    # sampled counts never exceed the rate's expectation by an absurd margin
    assert 0 < rows[0].n_sampled <= 40


def test_rate_ppm_exact_at_100tb_cardinalities(spark):
    """The per-bucket acceptance rate must be EXACT integer arithmetic at
    100 TB-scale corpus cardinalities: in plain long arithmetic the
    numerator SAMPLE_MOD * n_ref * n_pool_total overflows past ~9.2e12
    (silently wrapping in non-ANSI mode -> wrong/negative rates while the
    DuckDB oracle stays exact in HUGEINT). The DECIMAL(38,0) form is
    pinned against Python's arbitrary-precision integers. ADVICE r5."""
    from aws_glue_etl_sample_hist_spark.operators.sampling import (
        SAMPLE_MOD,
        _rate_ppm_expr,
    )

    t_ref, t_pool = 3_700_000_000_000, 8_900_000_000_000  # ~1e12 docs each
    df = spark.createDataFrame(
        [
            (1_234_567_890_123, 5_678_901_234_567),
            (987_654_321, 123_456_789_012),
            (0, 7),
            (5, 0),
            (2_000_000_000_000, 1),  # uncapped quotient ~1.8e25 -> clamp
        ],
        "n_ref long, n_pool long",
    )
    out = df.withColumn("rate_ppm", _rate_ppm_expr(t_ref, t_pool))
    assert dict(out.dtypes)["rate_ppm"] == "bigint"
    for r in out.collect():
        want = (
            0
            if r.n_pool == 0
            else min(
                SAMPLE_MOD,
                (SAMPLE_MOD * r.n_ref * t_pool) // (t_ref * r.n_pool),
            )
        )
        assert r.rate_ppm == want, (r.n_ref, r.n_pool, r.rate_ppm, want)
