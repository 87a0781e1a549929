"""Curation-DAG tests, appended to tests/ as test_curation.py."""
from __future__ import annotations

from pyspark.sql import functions as F


def test_curation_dag_materializes_exact_composition(spark, sf_small, tmp_path):
    """The materialized C2 release equals the in-memory composition
    (quality AND keepers AND not-benchmark AND not-contaminated), the
    training tier shards every released doc exactly once, and the manifest
    totals agree with the release."""
    from aws_glue_etl_sample_hist_spark.catalog import load_table
    from aws_glue_etl_sample_hist_spark.operators.dedup import (
        cluster_best_keeper,
        contamination_flags,
    )
    from aws_glue_etl_sample_hist_spark.plans.curation import run_curation
    from aws_glue_etl_sample_hist_spark.queries import q_text_stats

    out = str(tmp_path / "curation")
    timings = run_curation(spark, sf_small, out)
    assert {k.split(".")[0] for k in timings} == {"c0", "c1", "c2", "c3"}

    released = spark.read.parquet(out + "/c2/released")

    # in-memory composition of the same oracle-checked operators (keepers
    # are the keep-LONGEST canonical members, the corpus_release rule)
    docs = load_table(spark, sf_small, "documents")
    stats = q_text_stats(spark, sf_small).select("doc_id", "quality_score")
    keepers = cluster_best_keeper(docs, n=3, threshold=0.2, max_df=100).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    cleaned = (
        docs.join(keepers, "doc_id")
        .join(stats, "doc_id")
        .filter((F.col("quality_score") >= 0.5) & (F.col("doc_id") >= 10))
    )
    bench = docs.filter(F.col("doc_id") < 10)
    contaminated = contamination_flags(cleaned, bench, n=5).filter(
        F.col("is_contaminated") == 1
    ).select("doc_id")
    want = {r.doc_id for r in cleaned.join(contaminated, "doc_id", "left_anti").collect()}

    got = {r.doc_id for r in released.collect()}
    assert got == want and got  # exact and non-empty

    # training tier: every released doc exactly once, shard dirs prunable
    training = spark.read.parquet(out + "/c3/training")
    assert {r.doc_id for r in training.collect()} == got
    assert training.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    import os
    assert any(d.startswith("shard=") for d in os.listdir(out + "/c3/training"))

    # manifest totals == release totals
    manifest = spark.read.parquet(out + "/c3/manifest")
    assert manifest.agg(F.sum("n_docs")).collect()[0][0] == len(got)

    # idempotent re-run: same release
    run_curation(spark, sf_small, out)
    assert {r.doc_id for r in spark.read.parquet(out + "/c2/released").collect()} == want


def test_curate_increment_gates_and_idempotency(spark, sf_small, tmp_path):
    """A new batch flows through the incremental gates: already-released
    ids skipped, low-quality dropped, near-dups of the RELEASED corpus
    dropped, survivors appended with their own cluster_id -- and
    re-delivering the same batch is a no-op."""
    from aws_glue_etl_sample_hist_spark.catalog import load_table
    from aws_glue_etl_sample_hist_spark.plans.curation import (
        curate_increment,
        run_curation,
    )

    out = str(tmp_path / "curation")
    run_curation(spark, sf_small, out)
    released0 = {r.doc_id for r in spark.read.parquet(out + "/c2/released").collect()}
    some_released = next(iter(released0))

    # batch: one re-delivered doc + one near-dup of a released doc (same
    # text, new id) + one garbage doc + one genuinely new good doc
    released_row = (
        spark.read.parquet(out + "/c2/released")
        .filter(F.col("doc_id") == some_released)
        .collect()[0]
    )
    good_text = (
        "fresh unseen words about partitions exchanges catalysts windows "
        "aggregates joins buckets shards manifests tiers quality tokens "
        "metrics relations columns rows schemas formats codecs readers"
    )
    batch = spark.createDataFrame(
        [
            (some_released, released_row.text, "en", "crawl", len(released_row.text)),
            (900001, released_row.text, "en", "crawl", len(released_row.text)),
            (900002, "a a a", "en", "crawl", 5),
            (900003, good_text, "en", "crawl", len(good_text)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    counts = curate_increment(spark, out, batch)
    assert counts["fresh"] == 3  # re-delivered id gated out
    assert counts["kept"] == 1  # dup + garbage dropped, good doc kept

    released1 = {r.doc_id for r in spark.read.parquet(out + "/c2/released").collect()}
    assert released1 == released0 | {900003}
    row = (
        spark.read.parquet(out + "/c2/released")
        .filter(F.col("doc_id") == 900003)
        .collect()[0]
    )
    assert row.cluster_id == 900003

    # re-delivery of the identical batch: nothing fresh survives the id gate
    counts2 = curate_increment(spark, out, batch)
    assert counts2["kept"] == 0
    released2 = {r.doc_id for r in spark.read.parquet(out + "/c2/released").collect()}
    assert released2 == released1
