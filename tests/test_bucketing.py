"""Bucketed co-located join: the lineitem⋈orders bridge (the medallion
pipeline's only fact-to-fact shuffle) joins WITHOUT any shuffle exchange when
both sides are bucketed on the join key -- and produces identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_etl_sample_hist_spark.catalog import load_table
from aws_glue_etl_sample_hist_spark.io.bucketing import drop_table, write_bucketed_table


def _physical_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed_table(
        load_table(spark, sf_small, "lineitem"),
        "lineitem_bkt",
        str(base / "lineitem"),
        bucket_cols=["l_orderkey"],
        n_buckets=8,
        sort_cols=["l_orderkey"],
    )
    write_bucketed_table(
        load_table(spark, sf_small, "orders"),
        "orders_bkt",
        str(base / "orders"),
        bucket_cols=["o_orderkey"],
        n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    yield "lineitem_bkt", "orders_bkt"
    drop_table(spark, "lineitem_bkt")
    drop_table(spark, "orders_bkt")


def test_bucketed_join_has_no_shuffle(spark, sf_small, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    orders = spark.table(o_t)
    # disable auto-broadcast so the comparison isolates bucketing, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        # the same join over plain (unbucketed) parquet DOES shuffle both sides
        li_p = load_table(spark, sf_small, "lineitem")
        o_p = load_table(spark, sf_small, "orders")
        plain = li_p.join(o_p, li_p.l_orderkey == o_p.o_orderkey, "left")
        assert "Exchange" in _physical_plan(plain)

        # identical results either way
        a = joined.groupBy().agg(
            F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
        ).collect()[0]
        b = plain.groupBy().agg(
            F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
        ).collect()[0]
        assert (a.n, a.s) == (b.n, b.s)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
