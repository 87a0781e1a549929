"""The engine's declared query surface over the driver testdata star schema.

Each function takes (spark, sf_dir) and returns a DataFrame; the registry
`QUERIES` maps names to callables and `aws_glue_etl_sample_hist_spark.oracles.ORACLE_SQL`
carries the DuckDB twin of each query (the dual-engine oracle pattern the
reference itself used: Spark-produced parquet cross-checked with Athena SQL,
document/glue_t1.md:30-54, glue_t2.md:26-128).

Role mapping reference -> testdata (FIXTURES.md §6): purchase -> lineitem
(+orders for date/customer), products_info -> part, customer -> customer,
zipcode -> nation/region. Aggregate aliases follow the reference
(total_purchase_amount / count_of_purchase,
jb_de_enhancement_t2_salesbyageproducts_s2s.py:55-56).

Float discipline: any aggregated double is rounded (2-4 dp) in BOTH engines
so partial-aggregation order cannot flip the value hash; pass-through doubles
are left exact. Where fine-grained groups land sums on rounding boundaries
anyway (nation_trade_matrix), the accumulation is DECIMAL: each addend
rounds to 6 dp once, identically in both engines, and decimal addition is
exact -- the sum is partitioning-invariant by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .catalog import load_table
from .operators._local import arrow_local_frame as _arrow_local_frame
from .functions.datetime_fns import day_name, presto_day_of_week, with_date_parts, ymd
from .operators.joins import left_join_drop_keys

# ---------------------------------------------------------------- helpers


def _dated_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """lineitem with the reference's string-date surface: purchase_date
    (yyyymmdd string) + substring-derived year/month/day partition columns
    (reference P1, jb_de_enhancement_t0_fact_d2s.py:86-88)."""
    li = load_table(spark, sf, "lineitem")
    return with_date_parts(li.withColumn("purchase_date", ymd("l_shipdate")))


def silver_denorm_df(spark: SparkSession, sf: str) -> DataFrame:
    """The T1 silver wide table (reference jb_de_enhancement_t1_fulljoin_s2s.py:53-86):
    fact left-joined to every dimension, right-side key columns dropped.

    Join strategy at scale: lineitem⋈orders is fact-to-fact -> shuffle hash
    join on l_orderkey (both sides huge at 100 TB; co-partitioning/bucketing
    on orderkey removes this shuffle in a persisted lake). All true dimensions
    (part, customer, nation, region) are broadcast -- the fact never shuffles
    for them. Dimension-side pre-joins (customer⟕nation⟕region) happen first,
    mirroring the reference's customer⟕zipcode pre-join.
    """
    li = _dated_lineitem(spark, sf)
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    part = load_table(spark, sf, "part")

    # dims pre-join (reference J1: customer ⟕ zipcode)
    cust_geo = left_join_drop_keys(
        left_join_drop_keys(customer, nation, [("c_nationkey", "n_nationkey")]),
        region,
        [("n_regionkey", "r_regionkey")],
    )

    wide = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
        .drop(orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "left")
        .drop(part.p_partkey)
        .join(F.broadcast(cust_geo), F.col("o_custkey") == cust_geo.c_custkey, "left")
        .drop(cust_geo.c_custkey)
    )
    return wide.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        "l_linestatus",
        "purchase_date",
        "purchase_year",
        "purchase_month",
        "purchase_day",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "c_name",
        "c_mktsegment",
        "c_acctbal",
        "n_name",
        "r_name",
        "p_name",
        "p_brand",
        "p_type",
        "p_size",
    )


# ------------------------------------------------- reference-parity spine


def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical multi-measure hash
    aggregate (reference A1 generalized). String-date BETWEEN filter keeps the
    reference's lexicographic-compare semantics (P5/F2)."""
    li = _dated_lineitem(spark, sf)
    return (
        li.filter(F.col("purchase_date") <= "19980902")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_bronze_purchases(spark: SparkSession, sf: str) -> DataFrame:
    """T0 bronze ingest shape (reference S2+P1): date-bounded fact extract with
    substring-derived partition columns. The filter is pushed into the parquet
    scan by Catalyst -- the Spark-first replacement for the reference's
    hand-built JDBC pushdown query (jb_de_enhancement_t0_fact_d2s.py:69-82)."""
    li = _dated_lineitem(spark, sf)
    return li.filter(F.col("purchase_date").between("19960101", "19961231")).select(
        "l_orderkey",
        "l_linenumber",
        "purchase_date",
        "purchase_year",
        "purchase_month",
        "purchase_day",
        F.col("l_extendedprice").alias("amount"),
    )


def q_silver_denorm(spark: SparkSession, sf: str) -> DataFrame:
    """T1 silver: the 3-chain left-join wide table (reference J1-J3)."""
    return silver_denorm_df(spark, sf)


def q_mart_sales_by_segment_product(spark: SparkSession, sf: str) -> DataFrame:
    """Gold mart A1 analog: 7-key group-by sum/count
    (reference jb_de_enhancement_t2_salesbyageproducts_s2s.py:55-56)."""
    return (
        silver_denorm_df(spark, sf)
        .groupBy(
            "purchase_year",
            "purchase_month",
            "c_mktsegment",
            "p_brand",
            "p_type",
            "l_returnflag",
            "n_name",
        )
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_purchase_amount"),
            F.count("l_extendedprice").alias("count_of_purchase"),
        )
    )


def q_mart_sales_by_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Gold mart A2 analog with the reference's agg-THEN-join order (J4,
    jb_de_enhancement_t2_salesbycustomer_s2s.py:54-78): aggregate the fact
    first (shrinks it by orders of magnitude), then broadcast-join dims onto
    the small result -- the hand-written 'eager aggregation' Catalyst doesn't
    do for outer joins."""
    li = _dated_lineitem(spark, sf)
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")

    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
        .groupBy("o_custkey", "purchase_year", "purchase_month")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_purchase_amount"),
            F.count("l_extendedprice").alias("count_of_purchase"),
        )
    )
    cust_nat = left_join_drop_keys(customer, nation, [("c_nationkey", "n_nationkey")])
    return (
        agg.join(F.broadcast(cust_nat), agg.o_custkey == cust_nat.c_custkey, "left")
        .drop(cust_nat.c_custkey)
        .select(
            F.col("o_custkey").alias("customer_id"),
            "purchase_year",
            "purchase_month",
            "c_name",
            "c_mktsegment",
            "n_name",
            "total_purchase_amount",
            "count_of_purchase",
        )
    )


def q_mart_sales_by_datetime(spark: SparkSession, sf: str) -> DataFrame:
    """Gold mart A3 analog (jb_de_enhancement_t2_salesbydatetime_s2s.py:59-82):
    date-part keys + day-of-week columns. The reference computed day names
    with a row-at-a-time Python UDF (U1); the engine's hot path is the
    equivalent JVM expression (day_name/presto_day_of_week) -- the UDF
    exemplar survives in functions.datetime_fns and its parity test."""
    li = _dated_lineitem(spark, sf)
    return (
        li.groupBy(
            "purchase_year",
            "purchase_month",
            "purchase_day",
            day_name("l_shipdate").alias("day_of_week"),
            presto_day_of_week("l_shipdate").cast("long").alias("day_num"),
        )
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_purchase_amount"),
            F.count("l_extendedprice").alias("count_of_purchase"),
        )
    )


def q_mart_sales_by_region(spark: SparkSession, sf: str) -> DataFrame:
    """Gold mart A4 analog + the reference's multi-column mixed-direction
    global sort before write (O1, jb_de_enhancement_t2_salesbyresidence_s2s.py:55-57)."""
    mart = (
        silver_denorm_df(spark, sf)
        .groupBy("purchase_year", "purchase_month", "r_name", "n_name")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_purchase_amount"),
            F.count("l_extendedprice").alias("count_of_purchase"),
        )
    )
    return mart.orderBy(
        F.col("purchase_year").asc(),
        F.col("purchase_month").asc(),
        F.col("r_name").asc(),
        F.col("total_purchase_amount").desc(),
        F.col("count_of_purchase").desc(),
    )


def q_monthly_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Athena A5 (document/glue_t2.md:27-36): unit-scaled monthly revenue."""
    li = _dated_lineitem(spark, sf)
    return li.groupBy("purchase_year", "purchase_month").agg(
        F.round(F.sum("l_extendedprice") / 1_000_000, 2).alias("revenue_musd"),
        F.count("l_extendedprice").alias("count_of_purchase"),
    )


def q_weekday_hour_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Athena A6 (document/glue_t2.md:41-52): weekday-name x hour revenue over
    the events table. Day numbering is Presto's 1=Monday..7=Sunday -- Spark's
    dayofweek() is 1=Sunday and must not be used (SURVEY §7.4)."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy(
        day_name("ts").alias("day_of_week"),
        presto_day_of_week("ts").cast("long").alias("day_num"),
        F.hour("ts").cast("long").alias("hour_of_day"),
    ).agg(
        F.round(F.sum("value"), 2).alias("total_value"),
        F.count("value").alias("count_of_events"),
    )


def q_product_category_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Athena A7 (document/glue_t2.md:55-67): revenue by product category."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    joined = left_join_drop_keys(li, part, [("l_partkey", "p_partkey")])
    return joined.groupBy("p_brand", "p_type").agg(
        F.round(F.sum("l_extendedprice") / 1_000_000, 2).alias("revenue_musd"),
        F.count("l_extendedprice").alias("count_of_purchase"),
    )


def q_segment_category_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Athena A8 (document/glue_t2.md:70-83): segment x category revenue with
    the reference's ORDER BY 1,2,revenue desc."""
    mart = (
        silver_denorm_df(spark, sf)
        .groupBy("c_mktsegment", "p_brand")
        .agg(
            F.round(F.sum("l_extendedprice") / 1_000_000, 2).alias("revenue_musd"),
            F.count("l_extendedprice").alias("count_of_purchase"),
        )
    )
    return mart.orderBy(F.col("c_mktsegment").asc(), F.col("p_brand").asc(), F.col("revenue_musd").desc())


def q_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Athena A9 (document/glue_t2.md:86-97): revenue by region geography."""
    return (
        silver_denorm_df(spark, sf)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("l_extendedprice") / 1_000_000, 2).alias("revenue_musd"),
            F.count("l_extendedprice").alias("count_of_purchase"),
        )
    )


def q_customer_base_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Athena A10 (document/glue_t2.md:101-113): distinct customers, purchase
    counts, per-customer ratios. Exact count_distinct here (oracle-checkable);
    operators.aggregates.customer_base_stats(approx=True) is the HLL path for
    100 TB (one shuffle instead of two)."""
    orders = load_table(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("count_of_customers"),
        F.count("o_custkey").alias("count_of_purchase"),
        F.round(F.count("o_custkey") / F.count_distinct("o_custkey"), 2).alias(
            "purchase_per_customer"
        ),
        F.round(F.sum("o_totalprice") / F.count("o_custkey") / 10000, 2).alias(
            "amount_per_purchase_10k"
        ),
        F.round(F.sum("o_totalprice") / F.count_distinct("o_custkey") / 10000, 2).alias(
            "amount_per_customer_10k"
        ),
    )


def q_customer_monthly_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Athena A11 (document/glue_t2.md:116-128): per-customer monthly stats."""
    orders = load_table(spark, sf, "orders")
    return (
        orders.withColumn("purchase_year", F.date_format("o_orderdate", "yyyy"))
        .withColumn("purchase_month", F.date_format("o_orderdate", "MM"))
        .groupBy("o_custkey", "purchase_year", "purchase_month")
        .agg(
            F.count("o_orderkey").alias("count_of_purchase"),
            F.round(F.sum("o_totalprice") / F.count("o_orderkey") / 10000, 2).alias(
                "amount_per_purchase_10k"
            ),
        )
        .withColumnRenamed("o_custkey", "customer_id")
    )


def q_customer_base_stats_approx(spark: SparkSession, sf: str) -> DataFrame:
    """A10 sketch-accuracy CONTRACT: HLL approx_count_distinct (the 100 TB
    one-shuffle path, operators.aggregates.customer_base_stats(approx=True))
    checked against the exact distinct count in the same plan, emitted as a
    boolean `hll_within_rel_err` (|approx-exact|/exact <= 0.15; Spark's HLL
    default rsd is 0.05, so 3x margin). The oracle asserts the exact group
    keys/counts and all-true booleans -- a checkable driver row instead of
    the r1-r3 `no_oracle` err. The operator itself stays the scale path;
    this registry entry is its accuracy witness."""
    orders = load_table(spark, sf, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count("o_custkey").alias("count_of_purchase"),
        F.count_distinct("o_custkey").alias("_exact"),
        F.approx_count_distinct("o_custkey").alias("_approx"),
    )
    return agg.select(
        "o_orderpriority",
        "count_of_purchase",
        (
            F.abs(F.col("_approx") - F.col("_exact")) / F.col("_exact") <= 0.15
        ).alias("hll_within_rel_err"),
    )


def q_adhoc_join_limit(spark: SparkSession, sf: str) -> DataFrame:
    """Athena J5/O3 (document/glue_t1.md:34-54): CTE + left joins + LIMIT 20,
    expressed through the engine's SQL surface (spark.sql over registered
    views). The reference sorted a subquery before joining; join output order
    is not guaranteed in Spark or Presto, so the determinism lives in the
    OUTER order-by over a unique key (SURVEY §7.4)."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        WITH customer_info AS (
            SELECT c.c_custkey, c.c_name, c.c_mktsegment, n.n_name
            FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        )
        SELECT o.o_orderkey, o.o_orderdate_str, o.o_totalprice,
               ci.c_name, ci.c_mktsegment, ci.n_name
        FROM (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate_str
            FROM orders
            WHERE date_format(o_orderdate, 'yyyyMMdd') BETWEEN '19960101' AND '19961231'
        ) o
        LEFT JOIN customer_info ci ON o.o_custkey = ci.c_custkey
        ORDER BY o.o_orderdate_str, o.o_orderkey
        LIMIT 20
        """
    )


def q_top_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k (O2/O3): ORDER BY + LIMIT with a unique tiebreak; Spark executes
    this as TakeOrderedAndProject (per-partition heaps, no global sort)."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    agg = li.groupBy("l_partkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("total_purchase_amount"),
        F.count("l_extendedprice").alias("count_of_purchase"),
    )
    return (
        agg.join(F.broadcast(part), agg.l_partkey == part.p_partkey, "left")
        .drop(part.p_partkey)
        .select("l_partkey", "p_name", "p_brand", "total_purchase_amount", "count_of_purchase")
        .orderBy(F.col("total_purchase_amount").desc(), F.col("l_partkey").asc())
        .limit(20)
    )


# ---------------------------------------- beyond-reference relational ops


def q_customer_order_ranks(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking + offset window functions (beyond reference): per-customer
    order sequence number, spend rank within market segment, and gap since
    the previous order.

    The per-customer windows (row_number/lag) share one high-cardinality
    partition shuffle -- fine at any scale. The per-SEGMENT spend rank is a
    ~5-value partition key, so it runs through the two-phase salted top-k
    (operators.skew.salted_top_k): local top-100 per (segment, salt), final
    rank over the <=100*n_salts survivors -- result-identical (unique
    tiebreaker => no ties), never a whole segment on one task."""
    from .operators.skew import salted_top_k

    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    o = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
        "left",
    ).drop("c_custkey")
    w_cust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    base = o.select(
        "o_orderkey",
        F.col("o_custkey").alias("customer_id"),
        "c_mktsegment",
        "o_totalprice",
        F.row_number().over(w_cust).cast("long").alias("order_seq"),
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w_cust)
        ).cast("long").alias("days_since_prev"),
    )
    ranked = salted_top_k(
        base,
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        100,
        rank_col="segment_spend_rank",
        n_salts=16,
    )
    return ranked.select(
        "o_orderkey",
        "customer_id",
        "c_mktsegment",
        "o_totalprice",
        "order_seq",
        "segment_spend_rank",
        "days_since_prev",
    )


def q_customer_running_total(spark: SparkSession, sf: str) -> DataFrame:
    """Window function (beyond reference §2.9 -- it has none): per-customer
    running revenue across months. Explicit ROWS frame; one shuffle on the
    partition key, sort within partitions only."""
    monthly = (
        load_table(spark, sf, "orders")
        .withColumn("purchase_year", F.date_format("o_orderdate", "yyyy"))
        .withColumn("purchase_month", F.date_format("o_orderdate", "MM"))
        .groupBy("o_custkey", "purchase_year", "purchase_month")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("monthly_amount"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("purchase_year", "purchase_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        F.col("o_custkey").alias("customer_id"),
        "purchase_year",
        "purchase_month",
        "monthly_amount",
        F.round(F.sum("monthly_amount").over(w), 2).alias("running_amount"),
    )


def q_order_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Set operations (beyond reference): customers active in both 1996 and
    1997 (INTERSECT) and in 1996 only (EXCEPT), tagged and unioned."""
    orders = load_table(spark, sf, "orders")
    y = lambda yr: (
        orders.filter(F.date_format("o_orderdate", "yyyy") == yr)
        .select("o_custkey")
        .distinct()
    )
    both = y("1996").intersect(y("1997")).withColumn("cohort", F.lit("both"))
    only96 = y("1996").exceptAll(y("1997")).withColumn("cohort", F.lit("only_1996"))
    return both.unionByName(only96).withColumnRenamed("o_custkey", "customer_id")


def q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Anti join (beyond reference): customers that never ordered, as a
    broadcast-able left-anti join (SQL NOT EXISTS equivalent)."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return (
        customer.join(
            orders.select("o_custkey").distinct(),
            customer.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# ------------------------------------ LLM-data-pipeline extensions (north star)


def q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document text statistics + composite quality score (length,
    lexical diversity, stopword density) -- the quality-filter stage of a
    training-data pipeline, all JVM expressions
    (operators.text.quality_stats, frame-generic so incremental pipelines
    score new batches with byte-identical expressions)."""
    from .operators.text import quality_stats

    return quality_stats(load_table(spark, sf, "documents"))


def q_text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic language ID (function-word vote + CJK codepoint check)
    against the labeled lang column."""
    from .operators.text import lang_guess, tokens

    docs = load_table(spark, sf, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        lang_guess(F.col("text"), toks).alias("lang_guess"),
    ).withColumn("match_flag", (F.col("lang_guess") == F.col("lang")).cast("int"))


def q_text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace word count + BPE-ish subword estimate."""
    from .operators.text import subword_token_estimate, token_count, tokens

    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        subword_token_estimate(tokens(F.col("text"))).alias("n_subword_est"),
    )


def q_text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprints: full-content md5 + min-shingle rolling
    fingerprint (portable across engines -- md5, not Spark-private hashes)."""
    from .operators.text import min_shingle_fingerprint, tokens

    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        min_shingle_fingerprint(tokens(F.col("text")), 5).alias("min_shingle_md5"),
    )


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup via content-hash group-by (operators.dedup.exact_dedup)."""
    from .operators.dedup import exact_dedup

    # spread=False (r14): one md5 per row is the entire map-side work --
    # cheaper than shuffling the text bytes an extra time; the groupBy's
    # own exchange already parallelizes the reduce side
    return exact_dedup(load_table(spark, sf, "documents", spread=False))


def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard via inverted-index join."""
    from .operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(load_table(spark, sf, "documents"), n=3, threshold=0.2)


def q_dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash(12 hashes)+LSH(bands of 3) candidate pairs, md5 hash family."""
    from .operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(load_table(spark, sf, "documents"), num_hashes=12, band_size=3)


def q_dedup_lsh_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Empirical recall of the MinHash-LSH band join against the exact
    Jaccard >= 0.2 truth, per 0.2-wide Jaccard bucket
    (operators.dedup.lsh_pair_recall) -- the measured S-curve for the
    SAME config as dedup_minhash_lsh (12 hashes, bands of 3). Both sides
    are deterministic md5 arithmetic, so the DuckDB oracle recomputes the
    per-bucket recall EXACTLY (not a contract row). PERF.md carries the
    recall-vs-band-count curve this row anchors."""
    from .operators.dedup import lsh_pair_recall

    return lsh_pair_recall(
        load_table(spark, sf, "documents"),
        num_hashes=12,
        band_size=3,
        threshold=0.2,
    )


def q_dedup_lsh_recall_sampled(spark: SparkSession, sf: str) -> DataFrame:
    """The PRODUCTION mode of the LSH recall audit (VERDICT r8 item 4):
    the same S-curve measurement as dedup_lsh_recall, but both the truth
    and candidate sides restricted FIRST to the same deterministic md5
    half-sample of documents (sample_frac=0.5, salt 'lshrecall' --
    operators.dedup.lsh_pair_recall + sampling.hash_sample). Pair cost
    drops to sample_frac^2 = 25% while per-bucket recall stays an
    unbiased estimate over sampled-doc pairs; PERF.md carries the
    measured estimate-vs-full-audit delta. Exact oracle: the sample
    threshold is md5 arithmetic DuckDB recomputes verbatim."""
    from .operators.dedup import lsh_pair_recall

    return lsh_pair_recall(
        load_table(spark, sf, "documents"),
        num_hashes=12,
        band_size=3,
        threshold=0.2,
        sample_frac=0.5,
    )


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash-32 near-dup pairs (hamming <= 3) via the 4-band pigeonhole
    candidate generation -- exact result without the n^2 pair space."""
    from .operators.dedup import simhash_near_pairs

    return simhash_near_pairs(load_table(spark, sf, "documents"), max_hamming=3)


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup resolution end-to-end: Jaccard pairs -> connected components
    (iterative min-label propagation) -> cluster keeper flag. The iterative
    DataFrame loop is the one legitimately non-single-SQL Spark pattern here;
    the oracle uses a recursive CTE for the same fixpoint. max_df=100 keeps
    the high-DF shingle skew guard ON in the composed path (the oracle
    carries the identical DF filter, so the check is exact at any SF)."""
    from .operators.dedup import dedup_clusters

    return dedup_clusters(load_table(spark, sf, "documents"), n=3, threshold=0.2, max_df=100)


def q_text_winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprints (operators.text.winnow_fingerprints,
    Schleimer et al. 2003 / MOSS): per-window min k-gram hash with the
    rightmost tie rule -- position-robust PARTIAL-overlap detection at
    guaranteed density 2/(w+1), where the min_shingle fingerprint only
    catches whole-document similarity. Per-doc summary row with an
    exact integer checksum of the selected fingerprint set; oracle
    replays the packed-key argmin arithmetic verbatim."""
    from .operators.text import winnow_fingerprints

    return winnow_fingerprints(
        load_table(spark, sf, "documents"), k=3, w=4
    )


def q_dedup_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """k-core of the near-dup graph (operators.graph.kcore_members,
    Seidman 1983, k=2): iterative peeling to fixpoint -- the
    template-farm detector (docs embedded in DENSE blobs of mutual
    near-dups, a curation signal pair-level Jaccard can't express).
    Pair generation carries the max_df=100 high-DF shingle skew guard
    (same config as dedup_clusters -- the registered query IS the
    production exemplar, so the guard is ON, and the oracle carries the
    identical DF filter). Exact oracle: unrolled peel rounds are
    fixpoint-stable, and the oracle asserts its own fixpoint (the last
    two unrolled rounds must agree) so an insufficient unroll fails
    loudly instead of silently keeping not-yet-peeled nodes."""
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph import kcore_members

    docs = load_table(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=100)
    return kcore_members(docs.select("doc_id"), pairs, k=2)


def q_events_ab_sprt(spark: SparkSession, sf: str) -> DataFrame:
    """Wald SPRT early-stopping monitor (operators.analytics.
    ab_sprt_monitor): cumulative Bernoulli log-likelihood ratio per
    arrival wave against three (p0, p1) hypothesis pairs bracketing the
    observed conversion rate, so all three regimes show up measured --
    early accept_h1, continue, accept_h0 -- with Wald's guaranteed
    error rates. Exact oracle (LLR arithmetic + thresholds replayed at
    6 dp). Completes the experimentation family: fixed-horizon z
    (events_ab_test), FDR across many tests (events_ab_fdr), streaming
    maintenance (stream_events_ab), sequential stopping (this row)."""
    from .operators.analytics import ab_sprt_monitor

    return ab_sprt_monitor(load_table(spark, sf, "events"))


def q_dedup_winnow_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """MOSS-style partial-overlap candidate pairs
    (operators.text.winnow_overlap_pairs): docs sharing >= 2 winnowing
    fingerprints, fingerprints equi-joined on their hash (inverted
    index, offset-invariant, never all-pairs) with the max_df=100
    stop-fingerprint guard. Catches a shared paragraph inside
    otherwise-different documents -- below whole-document Jaccard's
    radar. Exact oracle: same packed-key selection + join replayed."""
    from .operators.text import winnow_overlap_pairs

    return winnow_overlap_pairs(
        load_table(spark, sf, "documents"),
        k=3,
        w=4,
        min_shared=2,
        max_df=100,
    )


def q_dedup_winnow_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing-vs-truth audit (operators.text.winnow_pair_recall, r9
    VERDICT item 8): measured recall of winnowing fingerprint candidates
    (k=3, w=4, min_shared=1, no df guard) against the EXACT truth --
    pairs sharing at least one run of w + k - 1 = 6 consecutive tokens
    -- stratified by shared-run count. Schleimer et al.'s guarantee says
    every bucket must read recall = 1.0000 at this config; the row makes
    the theorem a hash-checked measurement (the same accounting the
    MinHash path got via dedup_lsh_recall). Exact oracle: both sides are
    md5 arithmetic DuckDB replays verbatim."""
    from .operators.text import winnow_pair_recall

    return winnow_pair_recall(
        load_table(spark, sf, "documents"), k=3, w=4, min_shared=1
    )


def q_dedup_winnow_recall_sampled(spark: SparkSession, sf: str) -> DataFrame:
    """The PRODUCTION mode of the winnowing recall audit (VERDICT r10
    item 6, the proven dedup_lsh_recall_sampled pattern): the same
    recall-vs-exact-truth measurement as dedup_winnow_recall, but both
    the truth and candidate sides restricted FIRST to the same
    deterministic md5 half-sample of documents (sample_frac=0.5, salt
    'winrecall' -- operators.text.winnow_pair_recall + sampling.
    hash_sample). Pair cost drops to ~sample_frac^2 = 25% while
    per-bucket recall stays an unbiased estimate over sampled-doc pairs
    -- and Schleimer et al.'s >= w+k-1-run guarantee is sample-invariant,
    so every occupied bucket must still read 1.0000. Exact oracle: the
    sample threshold is md5 arithmetic DuckDB recomputes verbatim."""
    from .operators.text import winnow_pair_recall

    return winnow_pair_recall(
        load_table(spark, sf, "documents"),
        k=3,
        w=4,
        min_shared=1,
        sample_frac=0.5,
    )


def q_corpus_epoch_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget epoch planner (operators.sampling.epoch_budget_plan):
    waterfill a 2x-corpus training budget across sources under quality-
    derived epoch caps (1 + 3 x gopher keep rate) -- the repeat-factor
    table an LLM data plan starts from. Exact oracle: the piecewise-
    linear lambda and every per-source epoch count replay in SQL with
    the identical sorted prefix scan."""
    from .operators.sampling import epoch_budget_plan

    return epoch_budget_plan(
        load_table(spark, sf, "documents"), budget_factor=2.0
    )


def q_embedding_kcenter_coreset(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy k-center coreset + distributed coverage audit
    (operators.similarity.kcenter_coreset, Gonzalez 1985): 4 maximally-
    spread exemplars from a 32-candidate seed pool (candidate-bounded
    greedy, the MMR pattern), then every corpus vector assigned to its
    nearest center via the broadcast assignment pass -- per-center
    population, coverage radius (the k-center objective), mean distance.
    EXACT oracle: the greedy trajectory unrolls as 4 SQL stages
    (oracles._kcenter_sql) and the assignment recomputes value-for-
    value."""
    from .operators.similarity import kcenter_coreset

    return kcenter_coreset(
        load_table(spark, sf, "embeddings"), k=4, n_candidates=32
    )


def q_dedup_cluster_keeper(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster canonicalization (operators.dedup.cluster_best_keeper):
    one row per near-dup cluster naming the keep-longest member (ties to
    smallest id) -- the content-aware keeper rule crawl pipelines
    actually apply, computed as a pure max_by aggregation (never a
    per-cluster window sort, so a million-member template cluster
    reduces on many tasks). Same clustering config as dedup_clusters
    (n=3, threshold 0.2, max_df=100), so the oracle composes that
    oracle's recursive CTE verbatim."""
    from .operators.dedup import cluster_best_keeper

    return cluster_best_keeper(
        load_table(spark, sf, "documents"), n=3, threshold=0.2, max_df=100
    )


def q_cleaned_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The composed training-data pipeline output: quality-filtered
    (quality_score >= 0.5) AND near-dup-resolved (cluster keepers only)
    document set -- text_stats x dedup_clusters."""
    stats = q_text_stats(spark, sf).select("doc_id", "lang", "quality_score")
    keepers = q_dedup_clusters(spark, sf).filter(F.col("is_keeper") == 1).select(
        "doc_id", "cluster_id"
    )
    return stats.join(keepers, "doc_id").filter(F.col("quality_score") >= 0.5)


def q_corpus_release(spark: SparkSession, sf: str) -> DataFrame:
    """The curation DAG's C1 release composition, pinned exactly
    (plans/curation.py::c1_cleaned, r9 VERDICT item 7): quality filter
    (>= 0.5) AND keep-LONGEST near-dup cluster canonicalization
    (operators.dedup.cluster_best_keeper -- the RefinedWeb-style
    content-aware keeper rule, ties to smallest id) AND the eval-set
    gate (doc_id >= 10 trains). Keeper selection runs over ALL cluster
    members before the quality filter, matching the plan's join order.
    Exact oracle: the dedup_cluster_keeper oracle's keeper window joined
    to the cleaned_corpus quality arithmetic."""
    from .operators.dedup import cluster_best_keeper

    docs = load_table(spark, sf, "documents")
    stats = q_text_stats(spark, sf).select("doc_id", "lang", "quality_score")
    keepers = cluster_best_keeper(
        docs, n=3, threshold=0.2, max_df=100
    ).select(F.col("keeper_doc_id").alias("doc_id"), "cluster_id")
    return (
        stats.join(keepers, "doc_id")
        .filter((F.col("quality_score") >= 0.5) & (F.col("doc_id") >= 10))
        .select("doc_id", "lang", "quality_score", "cluster_id")
    )


def q_text_bigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus bigram language-model statistics: count and conditional
    probability p(w2|w1) for every bigram seen >= 3 times -- the n-gram-LM
    table (perplexity filters, synthetic-text detectors, OOV scoring).
    Shape: one explode (duplicates kept -- frequency IS the signal), one
    groupBy on the bigram, a window-free conditional via a second groupBy
    broadcast back on w1. All JVM."""
    from .operators.text import tokens, word_shingles

    docs = load_table(spark, sf, "documents")
    bg = docs.select(
        F.explode(word_shingles(tokens(F.col("text")), 2)).alias("bigram")
    )
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= 3
    )
    split = counts.select(
        F.split_part("bigram", F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part("bigram", F.lit(" "), F.lit(2)).alias("w2"),
        "n",
    )
    w1_tot = split.groupBy("w1").agg(F.sum("n").alias("w1_n"))
    return (
        split.join(F.broadcast(w1_tot), "w1")
        .select("w1", "w2", "n", F.round(F.col("n") / F.col("w1_n"), 6).alias("p_cond"))
    )


def q_corpus_decontamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: docs 0-9 stand in for a held-out eval
    set; every other doc is flagged if it shares any 5-gram with them
    (operators.dedup.contamination_flags -- broadcast benchmark shingles,
    corpus text never shuffles)."""
    from .operators.dedup import contamination_flags

    docs = load_table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    return contamination_flags(corpus, bench, n=5)


def q_training_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The WHOLE training-data pipeline composed end-to-end: quality filter
    (>= 0.5) AND text near-dup cluster keepers (n-gram Jaccard + connected
    components, max_df guard on) AND embedding near-dup removal (banded
    sign-LSH pairs; the higher doc_id of each pair is dropped via one
    left_anti join). Everything upstream is oracle-checked individually;
    this entry pins that the composition stays exact."""
    from .operators.similarity import near_dup_pairs

    base = q_cleaned_corpus(spark, sf)
    losers = (
        near_dup_pairs(load_table(spark, sf, "embeddings"), threshold=0.4)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return base.join(losers, "doc_id", "left_anti")


def q_embedding_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors (exact ANN baseline)."""
    from .operators.similarity import cosine_topk

    return cosine_topk(load_table(spark, sf, "embeddings"), [0, 1, 2, 3, 4], k=10)


def q_embedding_lsh_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Sign-bucket LSH ANN: same queries, candidates restricted to the
    query's bucket, exact rerank within it."""
    from .operators.similarity import lsh_ann_topk

    return lsh_ann_topk(load_table(spark, sf, "embeddings"), [0, 1, 2, 3, 4], k=5)


def q_embedding_ivf_ann(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN: 8 seeded centroid cells, probe 2, exact rerank within the
    probed cells (operators.similarity.ivf_ann_topk)."""
    from .operators.similarity import ivf_ann_topk

    return ivf_ann_topk(
        load_table(spark, sf, "embeddings"), [0, 1, 2, 3, 4], k=5, n_centroids=8, nprobe=2
    )


def q_embedding_ivf_ann_trained(spark: SparkSession, sf: str) -> DataFrame:
    """Trained-IVF ANN CONTRACT: pyspark.ml KMeans coarse quantizer (seeded)
    behind the same centroid contract as the seeded twin, validated against
    the exact brute-force top-5 IN the same plan. KMeans centroids aren't
    SQL-reproducible, so instead of a rows-only row (the r1-r3 `no_oracle`
    err) the query emits per-query structural invariants plus a corpus-level
    recall floor, all as booleans the oracle asserts true:

    - `ranks_complete`: every query returned exactly k=5 neighbors with
      ranks 1..5 and self excluded;
    - `cosine_monotone`: reported cosine non-increasing in rank;
    - `overall_recall_ok`: mean recall@5 vs the exact top-5 >= 0.12
      (measured 0.32 at sf0.01 with nprobe=2/8 cells; the floor leaves 2.5x
      margin for KMeans float jitter across partition layouts while still
      catching a broken quantizer).

    embedding_ivf_ann keeps the value-exact oracle on the seeded path, and
    tests/test_operators_unit.py pins trained >= seeded recall."""
    from .operators.similarity import cosine_topk, ivf_ann_topk, kmeans_centroids

    emb = load_table(spark, sf, "embeddings")
    qids = [0, 1, 2, 3, 4]
    cent = kmeans_centroids(emb, 8, seed=42)
    ann = ivf_ann_topk(emb, qids, k=5, n_centroids=8, nprobe=2, centroids=cent)
    exact = cosine_topk(emb, qids, k=5).select(
        "query_id", F.col("neighbor_id").alias("_exact_nid")
    )
    hits = ann.join(
        exact,
        (ann.query_id == exact.query_id) & (ann.neighbor_id == exact._exact_nid),
        "left_semi",
    )
    per_q = ann.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        (
            (F.count(F.lit(1)) == 5)
            & (F.count_distinct("rank") == 5)
            & (F.max("rank") == 5)
            & (F.sum((F.col("neighbor_id") == F.col("query_id")).cast("int")) == 0)
        ).alias("ranks_complete"),
    )
    total_hits = hits.groupBy().agg(F.count(F.lit(1)).alias("_h"))
    recall_ok = total_hits.select(
        (F.col("_h") / F.lit(5.0 * len(qids)) >= 0.12).alias("overall_recall_ok")
    )
    monotone = (
        ann.groupBy("query_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("rank", "cosine"))),
                F.struct(F.lit(True).alias("ok"), F.lit(float("inf")).alias("prev")),
                lambda acc, x: F.struct(
                    (acc.ok & (x.cosine <= acc.prev)).alias("ok"),
                    x.cosine.alias("prev"),
                ),
                lambda acc: acc.ok,
            ).alias("cosine_monotone")
        )
    )
    return (
        per_q.join(monotone, "query_id")
        .crossJoin(F.broadcast(recall_ok))
        .select("query_id", "n_neighbors", "ranks_complete", "cosine_monotone",
                "overall_recall_ok")
    )


def q_embedding_cosine_topk_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 via the Arrow/numpy kernel -- result-identical
    to embedding_cosine_topk (same oracle), vectorized physical plan."""
    from .operators.similarity import cosine_topk_pandas

    return cosine_topk_pandas(load_table(spark, sf, "embeddings"), [0, 1, 2, 3, 4], k=10)


def q_embedding_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 scalar quantization summary per embedding (scale, L1, md5 of the
    quantized vector) -- operators.similarity.quantize_int8_summary; every
    quantized component is pinned by the md5, scalar oracle compare."""
    from .operators.similarity import quantize_int8_summary

    return quantize_int8_summary(load_table(spark, sf, "embeddings"))


def q_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.4), exact all-pairs
    form -- the small-n oracle twin and recall baseline for the bucketed
    default path (embedding_near_dup_bucketed)."""
    from .operators.similarity import near_dup_pairs

    return near_dup_pairs(load_table(spark, sf, "embeddings"), threshold=0.4, exact=True)


def q_embedding_near_dup_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup via the DEFAULT scale path: sign-bucket equi-join
    candidate generation + exact cosine filter -- no nested-loop join in the
    plan (plan-asserted in tests/test_plans.py); oracle reproduces the same
    bucket semantics so the check is exact, not rows-only."""
    from .operators.similarity import near_dup_pairs

    return near_dup_pairs(load_table(spark, sf, "embeddings"), threshold=0.4)


def q_corpus_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Uniform 10% deterministic hash sample (operators.sampling.hash_sample):
    map-only, reproducible across runs/engines/partitionings -- which is why
    it ships an exact oracle where rand(seed) could not."""
    from .operators.sampling import hash_sample

    return hash_sample(load_table(spark, sf, "documents"), 0.1).select("doc_id", "lang")


def q_corpus_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified deterministic sampling: downsample the dominant language
    (en 10%), keep half of the rest -- the rebalancing step of a training
    mix. One CASE over the stratum column, still map-only."""
    from .operators.sampling import stratified_hash_sample

    return stratified_hash_sample(
        load_table(spark, sf, "documents"),
        {"en": 0.1},
        strata_col="lang",
        default_fraction=0.5,
    ).select("doc_id", "lang")


def q_corpus_shard_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget shard packing (operators.sampling.pack_shards): assign
    docs in id order to 5000-token shards via the two-level parallel prefix
    sum -- the global running total without a one-task global window."""
    from .operators.sampling import pack_shards
    from .operators.text import token_count

    docs = load_table(spark, sf, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_shards(docs, 5000).select("doc_id", "n_tokens", "cum_tokens", "shard")


def q_text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc repetition signals (duplicate-bigram ratio, top-shingle
    share) -- the boilerplate/degeneracy corpus filters
    (operators.text.repetition_stats)."""
    from .operators.text import repetition_stats

    return repetition_stats(load_table(spark, sf, "documents"), n=2)


def q_text_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 characteristic terms per doc by tf-idf (operators.text
    .tfidf_top_terms): inverted-index groupBys + high-cardinality window."""
    from .operators.text import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf, "documents"), k=3)


def q_events_asof_last_order(spark: SparkSession, sf: str) -> DataFrame:
    """As-of (point-in-time) join: each event picks up the user's most
    recent order ON OR BEFORE the event timestamp -- the no-future-leakage
    feature join (operators.asof.asof_join: union-tag + carry-forward
    window, ONE shuffle, no nested-loop range probe). Orders are
    pre-reduced to one deterministic row per (user, day); the oracle is
    DuckDB's native ASOF LEFT JOIN."""
    from .operators.asof import asof_join

    ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("ots"),
        )
        .agg(
            F.max("o_orderkey").alias("last_order_key"),
            F.round(F.max_by("o_totalprice", "o_orderkey"), 2).alias("last_order_price"),
        )
    )
    out = asof_join(
        ev,
        orders,
        on="user_id",
        left_time="ts",
        right_time="ots",
        value_cols=["last_order_key", "last_order_price"],
    )
    return out.select("event_id", "user_id", "last_order_key", "last_order_price")


# ------------------------------------------------- event-stream analytics


def q_events_windowed_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour window per event_type: count / distinct users / value
    sum. Batch twin of the streaming job (streaming/jobs.py) -- same F.window
    semantics; at scale this is one shuffle on (window, event_type) with
    map-side partial aggregation."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value",
        )
    )


def q_events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min idle threshold) -- see
    operators.sessionize for the scale analysis (single user_id shuffle
    reused by both window specs and the final agg)."""
    from .operators.sessionize import sessionize

    return sessionize(load_table(spark, sf, "events"), gap_seconds=1800)


def q_events_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization via the BUILT-IN F.session_window (native Spark session
    windows, usable in batch and streaming). Boundary semantics differ from
    operators.sessionize: an event exactly gap after the previous one starts
    a NEW session here (window end is exclusive), vs `>` gap there -- the
    oracle mirrors this with a >= comparison."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


def q_events_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured props column: JSON path extraction feeding an agg --
    all JVM-side (get_json_object), no Python in the loop."""
    ev = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_daily_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: per-day event counts as one column per event_type. The explicit
    value list keeps the schema static (no extra distinct-collection job --
    the form that scales; an unlisted pivot scans twice)."""
    ev = load_table(spark, sf, "events")
    return (
        ev.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("event_date")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


def q_events_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP subtotals: (date, type) -> per-date -> grand total in one pass
    (partial aggregation handles all grouping sets in a single shuffle);
    grouping_id disambiguates subtotal rows from natural values."""
    ev = load_table(spark, sf, "events")
    return (
        ev.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .rollup("event_date", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            # grouping_id is only resolvable INSIDE the rollup aggregate
            F.grouping_id("event_date", "event_type").cast("long").alias("lvl"),
        )
    )


def q_product_category_revenue_salted(spark: SparkSession, sf: str) -> DataFrame:
    """A7 through a salted left join (replicate-the-small-side skew defense)
    instead of broadcast -- results identical by construction, so it shares
    A7's oracle. The path for a skewed key whose dim is too big to broadcast."""
    from .operators.skew import salted_left_join

    li = load_table(spark, sf, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    part = load_table(spark, sf, "part")
    joined = salted_left_join(li, part, "p_partkey", n_salts=8)
    return joined.groupBy("p_brand", "p_type").agg(
        F.round(F.sum("l_extendedprice") / 1_000_000, 2).alias("revenue_musd"),
        F.count("l_extendedprice").alias("count_of_purchase"),
    )


def q_events_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (event_type, hour bucket): all 4 grouping sets in one pass
    (one Expand + one shuffle), grouping_id marking subtotal rows."""
    ev = load_table(spark, sf, "events")
    return (
        ev.withColumn("hour_of_day", F.hour("ts").cast("long"))
        .cube("event_type", "hour_of_day")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.grouping_id("event_type", "hour_of_day").cast("long").alias("lvl"),
        )
    )


def q_events_type_stats_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe aggregation: salted two-phase group-by on event_type (a
    low-cardinality, skew-prone key). Decomposed partials make it
    result-identical to the direct group-by -- shared oracle semantics."""
    from .operators.skew import salted_agg

    out = salted_agg(
        load_table(spark, sf, "events"),
        ["event_type"],
        {
            "n_events": ("count", "*"),
            "sum_value": ("sum", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        "min_value",
        "max_value",
    )


# ------------------------------------------------- SQL surface twins


def q_sql_monthly_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """A5 through the SQL entry point (sql.py) -- same semantics as the
    DataFrame twin, proving both surfaces agree."""
    from .sql import run_athena_sql

    return run_athena_sql(spark, sf, "monthly_revenue")


def q_sql_weekday_hour_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """A6 via spark.sql, incl. the Presto day_of_week numbering shim."""
    from .sql import run_athena_sql

    return run_athena_sql(spark, sf, "weekday_hour_revenue")


def q_sql_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """A9 via spark.sql: 4-way left-join star query."""
    from .sql import run_athena_sql

    return run_athena_sql(spark, sf, "region_revenue")


def q_sql_customer_base_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A10 via spark.sql, incl. the bigint-division ratio semantics."""
    from .sql import run_athena_sql

    return run_athena_sql(spark, sf, "customer_base_stats")


def q_sql_product_category_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """A7 via spark.sql (ref document/glue_t2.md:55-67): broadcast left join
    to part, same oracle as the DataFrame twin."""
    from .sql import run_athena_sql

    return run_athena_sql(spark, sf, "product_category_revenue")


def q_sql_segment_category_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """A8 via spark.sql (ref document/glue_t2.md:70-83): 4-way left-join star
    with ordinal ORDER BY."""
    from .sql import run_athena_sql

    return run_athena_sql(spark, sf, "segment_category_revenue")


def q_sql_customer_monthly_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A11 via spark.sql (ref document/glue_t2.md:116-128): per-customer
    monthly purchase stats."""
    from .sql import run_athena_sql

    return run_athena_sql(spark, sf, "customer_monthly_stats")


# ------------------------------------------------- multimodal plumbing


def q_multimodal_media_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-payload metadata extraction via Arrow-batched mapInPandas
    (operators.multimodal): content hash + deterministic fake header parse.
    The real-decoder path (PIL) is stubbed; the Spark plumbing is real."""
    from .operators.multimodal import attach_fake_payload, extract_media_meta

    # spread=False (r14, measured): the fake header parse is ~free per row
    # (unlike the real jpeg decode row, which keeps the spread), so the
    # text exchange dominated (interleaved A/B: 0.76 vs 0.42 s median)
    return extract_media_meta(
        attach_fake_payload(load_table(spark, sf, "documents", spread=False))
    )


def q_multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """'Video' frame sampling: 16-byte frames, every 4th sampled; 1-row-in ->
    n-rows-out through mapInPandas."""
    from .operators.multimodal import attach_fake_payload, sample_frames

    return sample_frames(
        attach_fake_payload(load_table(spark, sf, "documents")), frame_bytes=16, stride=4
    )


def q_multimodal_type_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Python metadata stage feeding a JVM hash agg: per media_type payload
    stats -- the typed-metadata-joins-downstream pattern at scale."""
    from .operators.multimodal import attach_fake_payload, extract_media_meta

    meta = extract_media_meta(attach_fake_payload(load_table(spark, sf, "documents")))
    return meta.groupBy("media_type").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("width"), 4).alias("avg_width"),
        F.round(F.avg("height"), 4).alias("avg_height"),
    )


def q_multimodal_thumbnail(spark: SparkSession, sf: str) -> DataFrame:
    """'Resize' stage over binary payloads: every-8th-byte downsample via
    Arrow mapInPandas (operators.multimodal.resize_thumbnail); a real
    PIL resize slots in behind the same schema. Thumb md5 pins every byte."""
    from .operators.multimodal import attach_fake_payload, resize_thumbnail

    return resize_thumbnail(attach_fake_payload(load_table(spark, sf, "documents")))


def q_multimodal_byte_features(spark: SparkSession, sf: str) -> DataFrame:
    """Signal-level feature extraction over binary payloads: vectorized
    numpy byte-histogram + mean per payload through Arrow mapInPandas
    (operators.multimodal.extract_byte_features) -- the featurizer shape a
    real embed/spectrogram stage takes."""
    from .operators.multimodal import attach_fake_payload, extract_byte_features

    return extract_byte_features(attach_fake_payload(load_table(spark, sf, "documents")))


def q_stream_events_windowed(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming twin of events_windowed_agg: readStream ->
    watermark -> tumbling window agg -> availableNow drain (streaming/jobs.py),
    oracle-checked against the same SQL as the batch path."""
    from .streaming.jobs import stream_events_windowed

    return stream_events_windowed(spark, sf)


def q_stream_events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator: gap sessionization via
    applyInPandasWithState (O(1) state per user), oracle-checked against the
    batch sessionize SQL."""
    from .streaming.jobs import stream_events_sessionize

    return stream_events_sessionize(spark, sf)


def q_stream_events_purchase_follow(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream time-interval join (attribution): purchases matched to
    the same user's clicks in the preceding 30 min, both sides live
    watermarked streams -- state-store equi+range join, never a nested
    loop. Oracle is the identical batch join."""
    from .streaming.jobs import stream_events_purchase_follow

    return stream_events_purchase_follow(spark, sf)


def q_stream_events_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming exactly-once dedup (at-least-once repair): source unioned
    with itself -> dropDuplicates(event_id) in watermark-bounded state ->
    agg; the oracle is the SINGLE-copy batch answer, so any state slip
    (dropped or double-kept event) fails the hash."""
    from .streaming.jobs import stream_events_dedup_agg

    return stream_events_dedup_agg(spark, sf)


def q_stream_events_dedup_ttl(spark: SparkSession, sf: str) -> DataFrame:
    """dropDuplicatesWithinWatermark dedup (state evicted by event-time
    TTL -- the bounded-state form; see streaming.jobs.stream_events_dedup_ttl
    for why this, not plain dropDuplicates, is the 100 TB shape). Duplicates
    here arrive together, so the oracle stays the single-copy batch answer."""
    from .streaming.jobs import stream_events_dedup_ttl

    return stream_events_dedup_ttl(spark, sf)


def q_quality_quantiles_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-language quantiles (p50/p90) of the document quality score
    -- linear-interpolated percentile, matching DuckDB's quantile_cont. The
    exact form needs a per-group sort; the approx twin below is the 100 TB
    path (fixed-size sketches, one pass)."""
    stats = q_text_stats(spark, sf).select("lang", "quality_score")
    return (
        stats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.expr("percentile(quality_score, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(quality_score, 0.9)"), 6).alias("p90"),
        )
    )


def q_quality_quantiles_by_lang_approx(spark: SparkSession, sf: str) -> DataFrame:
    """approx_percentile sketch-accuracy CONTRACT (GK summary, single pass,
    bounded memory -- the 100 TB quantile path). accuracy=1000 bounds the
    RANK error at n/1000, so the sketch's p50/p90 must land inside wide
    exact rank windows ([p40,p60] / [p80,p96]); those windows are computed
    in the SAME Spark plan and emitted as booleans the oracle asserts
    all-true -- a checkable driver row instead of the r1-r3 `no_oracle`
    err. quality_quantiles_by_lang remains the exact oracle-valued twin."""
    stats = q_text_stats(spark, sf).select("lang", "quality_score")
    agg = stats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("approx_percentile(quality_score, 0.5, 1000)").alias("_p50a"),
        F.expr("approx_percentile(quality_score, 0.9, 1000)").alias("_p90a"),
        F.expr("percentile(quality_score, 0.40)").alias("_p40"),
        F.expr("percentile(quality_score, 0.60)").alias("_p60"),
        F.expr("percentile(quality_score, 0.80)").alias("_p80"),
        F.expr("percentile(quality_score, 0.96)").alias("_p96"),
    )
    return agg.select(
        "lang",
        "n_docs",
        F.col("_p50a").between(F.col("_p40"), F.col("_p60")).alias("p50_in_rank_window"),
        F.col("_p90a").between(F.col("_p80"), F.col("_p96")).alias("p90_in_rank_window"),
    )


def q_text_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub (operators.text.pii_redact): the corpus text carries no
    PII, so the query deterministically plants one email / IPv4 / phone per
    document from doc_id arithmetic, then counts and masks them -- the scrub
    is exercised on every row and the oracle rebuilds the identical
    enriched text. Map-only JVM regexp; redacted bytes pinned by md5."""
    from .operators.text import pii_redact

    docs = load_table(spark, sf, "documents")
    did = F.col("doc_id").cast("string")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact user"), did, F.lit("@example.com from 10."),
        (F.col("doc_id") % 200).cast("string"), F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" call 010-"),
        F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return pii_redact(docs.withColumn("text", enriched))


def q_corpus_chunk(spark: SparkSession, sf: str) -> DataFrame:
    """Token-window chunking (operators.text.chunk_documents): 32-token
    windows every 16 tokens; long docs fan out into overlapping training
    rows, tails kept. One sequence+explode, no shuffle."""
    from .operators.text import chunk_documents

    return chunk_documents(load_table(spark, sf, "documents"), window=32, stride=16)


def q_text_token_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition trim (operators.text.token_dedup_stats):
    first-occurrence token dedup, trimmed text pinned by md5. Map-only."""
    from .operators.text import token_dedup_stats

    return token_dedup_stats(load_table(spark, sf, "documents"))


def q_text_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc perplexity under the corpus bigram LM
    (operators.text.doc_perplexity) -- the n-gram-LM quality filter."""
    from .operators.text import doc_perplexity

    return doc_perplexity(load_table(spark, sf, "documents"))


def q_corpus_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards
    (operators.sampling.shuffle_shards): hash draw -> shard + in-shard
    position; reproducible across runs/engines/partitionings, unlike
    rand()."""
    from .operators.sampling import shuffle_shards

    return shuffle_shards(load_table(spark, sf, "documents"), 8).select(
        "doc_id", "draw", "shard", "pos"
    )


def q_corpus_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Training-mixture resampling (operators.sampling.mixture_sample):
    10k-token budget split en 50% / zh 20% / fr 30%; strata outside the
    spec drop out. Per-stratum keep fractions derive from one broadcast
    aggregate -- lazy end to end."""
    from .operators.sampling import mixture_sample
    from .operators.text import token_count

    docs = load_table(spark, sf, "documents").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    return mixture_sample(
        docs, {"en": 0.5, "zh": 0.2, "fr": 0.3}, 10_000
    ).select("doc_id", "lang", "n_tokens")


def q_stream_events_cdc_lake(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming CDC into the parquet lake (streaming.jobs): foreachBatch +
    idempotent by-key MERGE; two availableNow runs prove insert then
    update-in-place. Oracle = final lake state (purchases doubled at v2)."""
    from .streaming.jobs import stream_events_cdc_lake

    return stream_events_cdc_lake(spark, sf)


def q_embedding_cell_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-diversity report over embedding space
    (operators.similarity.cell_stats): per-IVF-cell counts, corpus share,
    cosine tightness. Seeded centroids keep the oracle exact."""
    from .operators.similarity import cell_stats

    return cell_stats(load_table(spark, sf, "embeddings"), 8)


def q_text_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style rule-based quality filter
    (operators.text.gopher_quality): per-rule flags (length band, mean
    word length, stopword presence, numeric share) + conjunctive keep.
    Map-only JVM expressions end to end."""
    from .operators.text import gopher_quality

    return gopher_quality(load_table(spark, sf, "documents"))


def q_corpus_strip_boilerplate(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level boilerplate removal
    (operators.text.strip_repeated_chunks): non-overlapping 16-token
    chunks, corpus-wide chunk document-frequency, chunks in >=2 docs
    stripped, per-doc text reassembled in order and md5-pinned. One
    high-cardinality chunk groupBy + a broadcast hot-set join."""
    from .operators.text import strip_repeated_chunks

    # spread=False (r14, measured): chunking is one split pass feeding a
    # chunk-keyed exchange that parallelizes the reduce side anyway; the
    # extra text exchange lost (interleaved A/B: 1.99 vs 1.39 s median)
    return strip_repeated_chunks(load_table(spark, sf, "documents", spread=False))


def q_embedding_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (operators.similarity.semantic_dedup): cluster with seeded
    IVF centroids, within-cell cosine>=0.4 pairs mark the higher id as
    duplicate. Candidates come from an equi-join on the cell key -- the
    clustering bound that makes semantic dedup tractable at corpus
    scale."""
    from .operators.similarity import semantic_dedup

    return semantic_dedup(load_table(spark, sf, "embeddings"))


def q_embedding_semantic_dedup_trained(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup with the PRODUCTION quantizer (VERDICT r9 item 6): the
    coarse cells come from k-means|| (operators.similarity.
    kmeans_parallel_centroids, Bahmani et al. 2012) sized to the corpus
    (k = ceil(n / 64)), so the within-cell pair join costs ~n * cell_size
    -- LINEAR in the corpus -- instead of the toy k=8 seeded default's
    ~n^2/8 (kept only for oracle-exactness in the base row). Above
    k = 256 the flat O(n * k) nearest-centroid pass hands off to the
    TWO-LEVEL trained route (operators.similarity.two_level_assign,
    greedy-k-center coarse, kc = ceil(sqrt(2k)), nprobe = 2 -- O(n *
    (kc + 2k/kc))), the deployed mitigation for the 28x sf1 step
    (VERDICT r10 item 3); its measured routing cost lives in the
    `embedding_two_level_agreement` audit and SCALING.md.

    CONTRACT ORACLE (VERDICT r10 item 1, the round-7 pagerank-witness
    pattern): the k-means|| driver-side Lloyd reduction is not
    SQL-reproducible, so instead of emitting quantizer-dependent cells
    the row emits per-vector PRUNE-RULE WITNESSES computed in-plan and
    conditioned on the actual cells (operators.similarity.
    semantic_dedup_witness): `dup_has_partner_ok` (flagged => a
    lower-id >= threshold partner exists in my cell, via the production
    normalize-then-dot pair frame and distinct-dup-set route) and
    `keeper_has_none_ok` (kept => none, via a FULLY INDEPENDENT route
    that re-derives its own pair frame from the raw vectors with a
    reversed join and a different cosine formula -- ADVICE r11; the
    routes share nothing below the cell assignment). The DuckDB oracle
    re-derives the vec_id key set and asserts every witness TRUE -- the
    driver hash-certifies the prune rule BELOW the cell assignment for
    any trained quantizer; the assignment itself is certified
    separately (embedding_two_level_agreement /
    embedding_assign_arrow_agreement audits + brute-force pytest)."""
    from .operators.sampling import hash_sample
    from .operators.similarity import (
        kmeans_parallel_centroids,
        semantic_dedup_witness,
        two_level_assign,
    )

    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    k = int(max(2, min(4096, -(-n // 64))))
    # train on a BOUNDED deterministic sample (standard coarse-quantizer
    # practice): the k-means|| sketch pass costs O(|train| * rounds * 2k
    # * d), so training on the full corpus with k ~ n/cell would be
    # quadratic in the corpus. The sample is sized WITH k -- 16 points
    # per centroid (floor 4096, cap 16 * k_max = 65536) -- so
    # points-per-centroid never degrades as the corpus grows (the old
    # flat 8192 sample left ~5/centroid at n = 100k and ~2 at the
    # 4096-centroid cap; ADVICE r10), while the trainer stays a bounded
    # sketch; assignment + pruning still run over EVERY vector.
    n_train = min(n, max(16 * k, 4096), 65_536)
    train = (
        hash_sample(emb, min(1.0, n_train / n), key_col="vec_id", salt="semtrain")
        if n > n_train
        else emb
    )
    # vectorized trainer: the witness contract is quantizer-agnostic, so
    # this row may take the Arrow/BLAS distance passes (~10x on the
    # trainer, which dominated the sf1 wall); the embedding_kmeans_parallel
    # contract row keeps the fold-exact default. local_threshold (r15,
    # guide §5): the training frame is <= 65 536 rows BY CONSTRUCTION at
    # any corpus scale (n_train cap above), so the bounded driver-local
    # sketch replaces ~4 Spark jobs per k-means|| round; 131 072 = 2x the
    # cap (hash_sample is binomial around its rate) with the distributed
    # path as the over-cap fallback.
    cents = kmeans_parallel_centroids(
        train, k, vectorized=True, local_threshold=131_072
    )
    if k > 256:
        import math

        kc = int(math.ceil(math.sqrt(2 * k)))
        assigned = emb.join(
            two_level_assign(emb, cents, n_coarse=kc, nprobe=2), "vec_id"
        )
        return semantic_dedup_witness(emb, assigned=assigned)
    # flat regime (k <= 256): the Arrow/BLAS assignment (VERDICT r11
    # item 7) -- eligible because this row's oracle is the witness
    # contract (assignment-agnostic), and the argmax agreement vs the
    # fold-exact path is MEASURED by embedding_assign_arrow_agreement
    return semantic_dedup_witness(emb, centroids=cents, vectorized_assign=True)


def q_embedding_two_level_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Two-level quantizer agreement audit (operators.similarity.
    two_level_assign): the coarse-then-fine assignment (O(n*(kc+
    nprobe*k/kc)), the IMI-style fix for the flat O(n*k) pass that made
    the trained-SemDeDup row ~28x at the sf1 step) measured against the
    flat exact assignment over the SAME 32 seeded fine centroids, with
    the TRAINED coarse level (greedy k-center over the fine centroids,
    operators.similarity.kcenter_coarse -- VERDICT r10 item 3; the old
    untrained first-kc default measured 42%/40%) at kc=6, nprobe=3.
    One summary row: how often the shortcut lands in the exact cell,
    plus the routing fan (distinct fine cells used). Measured: ~73% at
    sf0.01 / ~70% at sf0.1 -- the honest routing penalty on this
    synthetic near-uniform corpus, where fine centroids carry no
    cluster structure for the coarse level to exploit (well-separated
    clusters agree fully -- unit test; real embedding corpora sit in
    between). Everything deterministic -- the greedy k-center selection
    runs with the engine's exact sequential cosine arithmetic -- so the
    EXACT oracle replays the selection chain and all three argmax
    stages."""
    from .operators._cache import tracked_persist
    from .operators.similarity import ivf_assign, seeded_centroids, two_level_assign

    # persist the loaded table (r14, guide §1.2/§5): the two assignment
    # routes scanned embeddings 12x with no shared subtree
    emb = tracked_persist(load_table(spark, sf, "embeddings"))
    fine = seeded_centroids(emb, 32)
    exact = ivf_assign(emb, 32, centroids=fine).select(
        "vec_id", F.col("cell").alias("cell_exact")
    )
    two = two_level_assign(emb, fine, n_coarse=6, nprobe=3).select(
        "vec_id", F.col("cell").alias("cell_2l")
    )
    j = exact.join(two, "vec_id")
    return j.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum((F.col("cell_2l") == F.col("cell_exact")).cast("long")).alias(
            "n_agree"
        ),
        F.count_distinct(F.col("cell_2l")).alias("n_cells_used"),
    ).withColumn(
        "agreement_bp", F.expr("(10000 * n_agree) DIV n_vectors")
    )


def _two_level_recall_fixture(spark: SparkSession, sf: str):
    """Shared planted-cluster fixture for the two-level handoff audits
    (`embedding_two_level_pair_recall`, `embedding_two_level_nprobe_curve`):
    md5-capped ~2000-vector base + two single-coordinate +0.2 perturbed
    copies per base vector, 32 seeded fine centroids, the persisted FLAT
    assignment, and the tau=0.4 truth pairs (pairs co-located under flat
    assignment with cosine >= tau -- what the k<=256 production path
    prunes on). Returns (fixture, fine, truth); float arithmetic is
    byte-for-byte what the unrolled DuckDB replays mirror."""
    from .operators._cache import tracked_persist
    from .operators.sampling import sample_hash
    from .operators.similarity import dot, ivf_assign, norm

    emb_full = load_table(spark, sf, "embeddings")
    n = emb_full.count()
    thr = int(min(1.0, 2000.0 / n) * 1_000_000)
    emb = emb_full.filter(sample_hash(F.col("vec_id"), "tlpair") < thr)
    # oracle precondition (ADVICE r12): the unrolled greedy replay
    # assumes >= 32 sampled vectors (fine-centroid LIMIT + kc seed
    # chain); fail loudly on a degenerate corpus instead of letting the
    # oracle's NULL-cosine CTEs produce a confusing hash mismatch. One
    # ~2000-row count job on an audit-class row.
    sampled_n = emb.count()
    if sampled_n < 32:
        raise ValueError(
            f"two_level_pair_recall needs >= 32 sampled vectors, got "
            f"{sampled_n} (corpus n={n}); the DuckDB replay's greedy "
            "chain would silently diverge below that"
        )
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", dv.alias("embedding"))
    # dimension-agnostic slices (ADVICE r12): derive the tail length from
    # the live array so a re-dimensioned embeddings fixture fails loudly
    # in the oracle compare instead of silently truncating the copies
    p1 = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.concat(
            F.array(F.element_at(dv, 1) + F.lit(0.2)),
            F.slice(dv, 2, F.size(dv) - 1),
        ).alias("embedding"),
    )
    p2 = emb.select(
        (F.col("vec_id") + F.lit(2_000_000)).alias("vec_id"),
        F.concat(
            F.slice(dv, 1, 1),
            F.array(F.element_at(dv, 2) + F.lit(0.2)),
            F.slice(dv, 3, F.size(dv) - 2),
        ).alias("embedding"),
    )
    fixture = base.unionAll(p1).unionAll(p2)
    fine = (
        emb.orderBy("vec_id")
        .limit(32)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv"))
    )
    # the flat assignment feeds the two truth-pair sides; persist so the
    # quantizer pass runs once, not per side
    flat = tracked_persist(ivf_assign(fixture, 32, centroids=fine))
    # normalize ONCE before the pair join (the semantic_dedup perf
    # pattern): per-pair work drops from dot + two norms to one dot --
    # the dominant term, since the fixture keeps k fixed at 32 for the
    # oracle's unrolled replay and in-cell pair count therefore grows
    # ~n^2/k. The oracle mirrors normalize-then-dot so floats stay in
    # lockstep.
    normed = flat.withColumn(
        "_norm", F.greatest(norm(F.col("embedding")), F.lit(1e-12))
    ).withColumn(
        "_nv", F.transform(F.col("embedding"), lambda x: x / F.col("_norm"))
    )
    a = normed.select(
        F.col("vec_id").alias("id_a"),
        F.col("_nv").alias("va"),
        F.col("cell").alias("cell_a"),
    )
    b = normed.select(
        F.col("vec_id").alias("id_b"),
        F.col("_nv").alias("vb"),
        F.col("cell").alias("cell_b"),
    )
    truth = (
        a.join(
            b,
            (F.col("cell_a") == F.col("cell_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", dot(F.col("va"), F.col("vb")).alias("_cos"))
        .filter(F.col("_cos") >= 0.4)
    )
    return fixture, fine, truth


def _two_level_preservation(truth: DataFrame, two: DataFrame) -> DataFrame:
    """Bucketed preservation counts of the truth pairs under a two-level
    routing `two` (vec_id, cell): one row per tightness bucket."""
    ta = two.select(F.col("vec_id").alias("id_a"), F.col("cell").alias("two_a"))
    tb = two.select(F.col("vec_id").alias("id_b"), F.col("cell").alias("two_b"))
    return (
        truth.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            F.when(F.col("_cos") >= 0.9, F.lit("tight_ge90"))
            .otherwise(F.lit("loose_40_90"))
            .alias("bucket"),
            (F.col("two_a") == F.col("two_b")).cast("long").alias("_kept"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("_kept").alias("n_preserved"),
        )
        .withColumn(
            "preserved_bp", F.expr("(10000 * n_preserved) DIV n_pairs")
        )
    )


def q_embedding_two_level_pair_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Dup-PAIR preservation audit for the two-level handoff regime
    (VERDICT r11 item 3 -- the accounting discipline every other
    approximate family already carries, applied to the k>256 routing
    that trained SemDeDup deploys): on a CLUSTERED fixture, how many of
    the dup pairs the FLAT assignment's in-cell pruning would catch at
    the production tau=0.4 stay co-located under `two_level_assign`?

    The r11 verdict's open question was exactly this: near-uniform
    synthetic vectors at cosine ~0.4 route independently (~50% pair
    preservation measured at sf0.1), while "tight dups co-route" was an
    argument, not a number. The fixture plants the tight clusters
    IN-PLAN so the oracle can replay them: every base embedding gets
    two single-coordinate +0.2 perturbed copies (ids offset by 1M/2M;
    unit-norm base => within-cluster cosines ~0.96-0.99), giving a
    corpus where both regimes exist -- planted tight pairs (cos >=
    0.9) and whatever loose (0.4..0.9) pairs the base corpus carries.
    Truth = pairs co-located under FLAT assignment with cosine >= tau
    (what the k<=256 production path prunes on); preserved = the pair
    is also co-located under the two-level route at the production
    handoff shape (k=32 seeded fine, kc=ceil(sqrt(2k))=8, nprobe=2).
    One row per tightness bucket: (bucket, n_pairs, n_preserved,
    preserved_bp). EXACT oracle: fixture construction, the greedy
    k-center coarse chain, all argmax stages, the pair join and the
    bucket split replayed in SQL over the same IEEE doubles.

    Scale shape: the oracle's unrolled replay pins k at 32, so in-cell
    pair count over the raw corpus would grow ~n^2/k; the audit
    therefore caps the BASE corpus at ~2000 vectors through the
    portable md5 draw (threshold least(1, 2000/n) computed from the
    live count in BOTH engines -- full corpus at sf<=0.1), and the
    fine centroids are the 32 smallest SAMPLED ids (ORDER BY/LIMIT,
    replayable), so fixture size and pair cost are bounded at any
    scale -- the measured rate is what matters, not the corpus pass."""
    from .operators._cache import tracked_persist
    from .operators.similarity import two_level_assign

    fixture, fine, truth = _two_level_recall_fixture(spark, sf)
    # the routing feeds the two pair sides; persist so the quantizer
    # pass runs once, not per side
    two = tracked_persist(two_level_assign(fixture, fine, n_coarse=8, nprobe=2))
    return _two_level_preservation(truth, two)


def q_embedding_two_level_nprobe_curve(spark: SparkSession, sf: str) -> DataFrame:
    """The nprobe preservation-vs-cost DIAL for the two-level handoff
    (VERDICT r12 item 4): `embedding_two_level_pair_recall` pins the
    production shape at nprobe=2 (~84% tight / ~47% loose preserved);
    a 100 TB operator pruning at a LOOSE tau needs the recall-buyback
    curve measured, not guessed -- probing one more coarse cell
    multiplies step-4 assignment work by ~nprobe/(nprobe-1) (total
    O(n * (kc + nprobe*k/kc)), similarity.two_level_assign) and buys
    back co-routing for pairs whose members' true cells sit in
    adjacent coarse regions. Same planted-cluster fixture, same truth
    pairs, the SAME greedy k-center coarse level (computed once and
    shared across the sweep, exactly like a production index reused at
    different probe depths): one row per (nprobe in {2,3,4}, tightness
    bucket) with preservation counts; the wall cost per point rides
    the bench row. EXACT oracle: one shared fixture/k-center/truth
    replay with the probe window rn <= nprobe widened per curve point
    (oracles._two_level_nprobe_curve_sql)."""
    from .operators._cache import tracked_persist
    from .operators.similarity import kcenter_coarse, two_level_assign

    fixture, fine, truth = _two_level_recall_fixture(spark, sf)
    truth = tracked_persist(truth)  # consumed by all three curve points
    coarse = kcenter_coarse(fine, 8)  # train ONCE; the dial is probe-only
    curves = []
    for np_ in (2, 3, 4):
        two = tracked_persist(
            two_level_assign(fixture, fine, n_coarse=8, nprobe=np_, coarse=coarse)
        )
        curves.append(
            _two_level_preservation(truth, two).select(
                F.lit(np_).cast("long").alias("nprobe"),
                "bucket",
                "n_pairs",
                "n_preserved",
                "preserved_bp",
            )
        )
    out = curves[0]
    for c in curves[1:]:
        out = out.unionAll(c)
    return out


def q_customer_id_luhn_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Luhn checksum audit (operators.text.luhn_valid, ISO/IEC 7812):
    validate the 9-digit account-style identifier embedded in every
    customer name per market segment -- the checksum-confirmation stage
    a PII scrubber runs on regex-found card-like digit runs (a random
    digit run passes Luhn with p = 0.1; the measured per-segment pass
    rate reads ~10%, the filter's expected noise rejection). All JVM
    expressions; exact oracle replays the reversed-digit arithmetic."""
    cust = load_table(spark, sf, "customer")
    digits = F.regexp_extract(F.col("c_name"), r"([0-9]{9})", 1)
    from .operators.text import luhn_valid

    return (
        cust.select(
            F.col("c_mktsegment"),
            luhn_valid(digits).cast("int").alias("_ok"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("_ok").alias("n_luhn_valid"),
        )
        .withColumn(
            "pass_rate_bp",
            F.expr("(10000 * n_luhn_valid) DIV n_customers"),
        )
    )


def q_embedding_bitext_mine(spark: SparkSession, sf: str) -> DataFrame:
    """Margin-based bitext mining (operators.similarity.
    bitext_margin_pairs, Artetxe & Schwenk 2019 -- the LASER/CCMatrix
    parallel-corpus miner): label-0 vectors are the source shard,
    label-1 the target; candidates from the multi-band sign-LSH
    equi-join (never a cross-shard nested loop), ratio margin
    cos/(mean of both sides' k-NN cosines) corrects hubness, each
    source keeps its best-margin target at margin >= 1.0, mutual-best
    flagged. EXACT oracle: bands, 6-dp-rounded cosine ranking, k-NN
    means, margins and both argmax picks replayed in SQL."""
    from .operators.similarity import bitext_margin_pairs

    return bitext_margin_pairs(
        load_table(spark, sf, "embeddings"), k=4, threshold=1.0
    )


def q_embedding_bitext_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Bitext-mining recall audit (operators.similarity.
    bitext_pair_recall, VERDICT r10 item 7 -- the dedup_lsh_recall
    discipline applied to the miner): the banded candidate generation's
    measured recall against the EXACT brute-force margin truth (all
    cross-shard pairs, exact k-NN denominators), stratified by truth
    margin. The truth side is shard x shard bounded by definition
    (measurement harness; the registered miner stays banded) and the
    operator carries the sample_frac^2 production dial. Both sides
    share the integer micro-cosine / floor-form margin arithmetic, so
    the DuckDB oracle replays recall exactly."""
    from .operators.similarity import bitext_pair_recall

    return bitext_pair_recall(
        load_table(spark, sf, "embeddings"), k=4, threshold=1.0
    )


def q_embedding_assign_arrow_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow/BLAS assignment agreement audit (operators.similarity.
    assign_cells_arrow): the numpy-matmul nearest-centroid assignment --
    the scale path once trained quantizers push k toward n/64, where
    even the max_by-aggregated JVM cosine fold is the bottleneck --
    measured against the fold-exact `ivf_assign` over the SAME 32
    seeded centroids. The two differ only where pairwise/SIMD float
    summation flips an argmax within the last ulp, so the witness pins
    >= 99.99% agreement (measured: 100% on this corpus) rather than
    assuming exactness -- the same measure-don't-assume discipline as
    the two-level and recall audits. Oracle: key-set + witness
    (numpy summation order is not SQL-reproducible by design)."""
    from .operators.similarity import (
        assign_cells_arrow,
        ivf_assign,
        seeded_centroids,
    )

    emb = load_table(spark, sf, "embeddings")
    fine = seeded_centroids(emb, 32)
    exact = ivf_assign(emb, 32, centroids=fine).select(
        "vec_id", F.col("cell").alias("cell_fold")
    )
    arrow = assign_cells_arrow(emb, fine).select(
        "vec_id", F.col("cell").alias("cell_arrow")
    )
    return (
        exact.join(arrow, "vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(
                (F.col("cell_arrow") == F.col("cell_fold")).cast("long")
            ).alias("_agree"),
        )
        .select(
            "n_vectors",
            (F.expr("(10000 * _agree) DIV n_vectors") >= 9999).alias(
                "agree_ge_9999bp"
            ),
        )
    )


def q_embedding_pq_codes(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization encode (operators.similarity.pq_codes): 4
    subspaces x 16 seeded codes; each vector compresses to 4 code ids
    (md5-pinned) + squared reconstruction error. The codebook is a literal
    expression, so encoding is map-only whole-stage codegen -- no join, no
    shuffle.

    The operator returns `codes` as array<long> (what pq_adc_topk consumes);
    this query flattens it to a '-'-joined string because the driver's
    pandas canonicalizer cannot sort/hash list-valued cells (r3 err row)."""
    from .operators.similarity import pq_codes

    out = pq_codes(load_table(spark, sf, "embeddings"))
    return out.withColumn(
        "codes", F.concat_ws("-", F.transform(F.col("codes"), lambda c: c.cast("string")))
    )


def q_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental dedup of a new batch against the existing corpus
    (operators.dedup.incremental_minhash_dedup): odd doc_ids are the
    incoming crawl, even doc_ids the kept corpus. LSH bands are the index
    (new x existing candidates only -- the existing corpus never re-pairs
    with itself), exact Jaccard verifies, each new doc reports its best
    existing match at >= 0.5."""
    from .operators.dedup import incremental_minhash_dedup

    docs = load_table(spark, sf, "documents")
    return incremental_minhash_dedup(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        threshold=0.5,
    )


def q_corpus_refresh_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """Composed incremental corpus-refresh DAG (plans/refresh.py -- the
    monthly-crawl shape of the reference's incremental load, ref:
    document/stepfunction.md:187-189, lifted to the LLM-corpus tier):
    standing corpus + IVF index at rest (manifest v1) -> new batch ->
    incremental MinHash dedup (batch x standing candidates only) ->
    survivors' embeddings appended into the persisted index under its
    RECORDED assign mode -> atomic manifest v2 publish. Returns the
    per-document audit frame: refreshed membership and each member's
    PERSISTED index cell (exact oracle: the seeded-centroid argmax
    replay), plus all-true witnesses that incremental maintenance equals
    the from-scratch build -- corpus set AND cell-for-cell index state
    (the stream_dedup_clusters contract) -- and that the committed
    manifest's version/row accounting holds."""
    from .plans.refresh import refresh_audit, run_corpus_refresh

    root = _cached_index_dir(
        "refresh", sf, lambda d: run_corpus_refresh(spark, sf, d)
    )
    return refresh_audit(spark, sf, root)


def q_events_incident_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Keyless range join via time-bin bucketing
    (operators.asof.interval_join_binned): each day's first error event
    opens a 2-hour incident window; every event inside any window joins by
    EQUI-join on its hour bin (+ exact [start, end) filter) -- never a
    BroadcastNestedLoopJoin, the range-join scale cliff. Per-incident
    traffic summary out."""
    from .operators.asof import interval_join_binned

    ev = load_table(spark, sf, "events")
    ints = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.min("ts").alias("start"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("incident_day"),
            "start",
            # interval arithmetic works for TIMESTAMP and TIMESTAMP_NTZ both
            (F.col("start") + F.expr("INTERVAL 2 HOURS")).alias("end"),
        )
    )
    joined = interval_join_binned(ev.select("event_id", "ts", "user_id", "value"), ints)
    from .operators.asof import _epoch_us

    return joined.groupBy("incident_day").agg(
        F.min(_epoch_us(F.col("start"))).alias("start_us"),
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_embedding_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """PQ asymmetric-distance search (operators.similarity.pq_adc_topk):
    queries 0-4 ranked against the PQ-ENCODED corpus (codes only, full
    vectors never re-enter the search), distance = summed subspace L2^2 to
    the coded centroids, k=5 ascending."""
    from .operators.similarity import pq_adc_topk

    return pq_adc_topk(load_table(spark, sf, "embeddings"), [0, 1, 2, 3, 4])


def q_customer_rolling_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Time-RANGE window frame (beyond reference §2.9): per-customer 90-day
    rolling order revenue. Orders collapse to one row per (customer, day)
    first, then the window runs ``rangeBetween(-89, 0)`` over an integer
    day number -- a TRUE range frame (calendar distance, not row count), so
    gaps in a customer's order history shrink the window correctly where a
    ROWS frame would silently include stale orders.

    Scale shape: one shuffle on the customer key serves the pre-agg AND the
    window (hash(custkey) satisfies the (custkey, day) clustering); frame
    width is bounded by 90 days of per-day rows per customer, so window
    state is O(90) regardless of corpus size."""
    daily = (
        load_table(spark, sf, "orders")
        .groupBy(
            F.col("o_custkey").alias("customer_id"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
                "day_num"
            ),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_revenue"))
    )
    w = (
        Window.partitionBy("customer_id")
        .orderBy("day_num")
        .rangeBetween(-89, Window.currentRow)
    )
    return daily.select(
        "customer_id",
        F.col("day_num").cast("long").alias("day_num"),
        "day_revenue",
        F.round(F.sum("day_revenue").over(w), 2).alias("rolling_90d"),
        F.count("day_revenue").over(w).alias("n_days_in_window"),
    )


def q_events_daily_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar gap-fill + forward fill (time-series resampling): per
    event_type daily totals on a COMPLETE date spine -- days with no events
    appear with zero counts and the last observed daily value carried
    forward (``F.last(ignorenulls=True)`` over an unbounded-preceding ROWS
    frame).

    Scale shape: the spine is built from two collected scalars (global
    min/max day -- a tiny all-column-pruned agg, same pattern as the
    z-order calibration collect) exploded per event_type: map-only, no
    cross join enters the plan. The daily agg shuffles on (type, day); the
    forward-fill window shuffles on type only -- with a handful of types
    that window would skew at petabyte scale, but its input is the
    POST-AGG frame (one row per type-day), so the skewed partition is
    bounded by the calendar, not the data."""
    ev = load_table(spark, sf, "events")
    day = F.to_date("ts")
    lo, hi = ev.agg(F.min(day), F.max(day)).first()
    daily = ev.groupBy(
        F.col("event_type"), day.alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("day_value"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(F.lit(lo).cast("date"), F.lit(hi).cast("date"))
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.round(F.coalesce("day_value", F.lit(0.0)), 4).alias("day_value"),
            F.round(F.last("day_value", ignorenulls=True).over(w), 4).alias(
                "ffill_value"
            ),
        )
    )


def q_events_user_state_scd2(spark: SparkSession, sf: str) -> DataFrame:
    """SCD type-2 interval builder (the lake-dimension pattern the
    reference's Glue jobs stop short of): each user's event_type stream
    collapses into validity intervals -- consecutive same-type runs become
    one row with valid_from / valid_to (exclusive, next run's start) and an
    is_current flag on the open interval. Classic gaps-and-islands: change
    flag via lag(), run id via running sum, one row per run, lead() for the
    closing edge.

    Scale shape: every window and the groupBy cluster on user_id -- ONE
    shuffle total (hash(user_id) satisfies the (user_id, run) clustering),
    per-user state only in each sort."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "chg",
            F.when(
                F.lag("event_type").over(w).isNull()
                | (F.lag("event_type").over(w) != F.col("event_type")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "run", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    iv = runs.groupBy("user_id", "run").agg(
        F.first("event_type").alias("state"),
        F.min(F.unix_micros("ts")).alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us")
    return iv.select(
        "user_id",
        "state",
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        F.lead("valid_from_us").over(w2).isNull().alias("is_current"),
        "n_events",
    )


def q_events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel over the event stream: view -> click -> purchase,
    greedy-earliest step matching per user (operators.analytics.funnel_reach
    -- all step timestamps from chained conditional window minima over ONE
    hash(user) exchange)."""
    from .operators.analytics import funnel_reach

    return funnel_reach(
        load_table(spark, sf, "events"), ["view", "click", "purchase"]
    )


def q_customer_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Monthly cohort retention on orders: cohort = first-order month,
    n_active distinct customers per months-since offset, retention vs the
    cohort's month-0 size (operators.analytics.cohort_retention -- one
    data-scale shuffle on the customer key; the retention window runs on
    the calendar-bounded cohort x offset grid)."""
    from .operators.analytics import cohort_retention

    return cohort_retention(load_table(spark, sf, "orders"))


def q_customer_rfm(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation of the customer base: recency / frequency /
    monetary quartile scores 1-4 and the concatenated segment code
    (operators.analytics.rfm_scores -- quartile CUTS broadcast to a
    map-only scorer instead of a single-task global ntile; swap
    percentile -> approx_percentile for the 100 TB knob)."""
    from .operators.analytics import rfm_scores

    return rfm_scores(load_table(spark, sf, "orders"))


def q_corpus_decontamination_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """Decontamination via Bloom-filter semi-join reduction: identical
    output to corpus_decontamination (the verify join removes Bloom false
    positives -- same oracle), but the broadcast side is the bounded-size
    bitmap of benchmark shingle bits, not the shingle strings: the shape
    that survives a consortium-sized decontamination list
    (operators.dedup.contamination_flags_bloom)."""
    from .operators.dedup import contamination_flags_bloom

    docs = load_table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    return contamination_flags_bloom(corpus, bench, n=5)


def q_corpus_split_leakage_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split key is the near-dup
    CLUSTER id (dedup_clusters, max_df=100), not the doc id, so
    near-duplicates can never straddle a split boundary -- the eval-set
    integrity rule every LLM data pipeline needs. Assignment is the
    deterministic md5 draw (operators.sampling.sample_hash): 80/10/10,
    map-only once clusters exist, engine-portable, stable under corpus
    growth."""
    from .operators.dedup import dedup_clusters
    from .operators.sampling import SAMPLE_MOD, sample_hash

    clusters = dedup_clusters(
        load_table(spark, sf, "documents"), n=3, threshold=0.2, max_df=100
    ).select("doc_id", "cluster_id")
    draw = sample_hash(F.col("cluster_id"), "split")
    return clusters.withColumn(
        "split",
        F.when(draw < int(0.8 * SAMPLE_MOD), F.lit("train"))
        .when(draw < int(0.9 * SAMPLE_MOD), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def q_corpus_lang_source_chi2(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square independence test of the corpus's (lang x source)
    contingency table -- the composition-drift detector: a large statistic
    says language mix depends on source, i.e. a source went off-mix.
    Returns the per-cell contributions plus a NULL-keyed total row carrying
    the chi2 statistic and its degrees of freedom
    (df = (n_langs-1)*(n_sources-1); NULL on per-cell rows).

    Scale shape: ONE map-side-combined agg builds the contingency table
    (langs x sources rows); marginals and expectations are windows over
    that tiny table; the corpus is scanned once."""
    docs = load_table(spark, sf, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    w_lang = Window.partitionBy("lang")
    w_src = Window.partitionBy("source")
    scored = cells.select(
        "lang",
        "source",
        "n",
        (
            (F.col("n") - F.sum("n").over(w_lang) * F.sum("n").over(w_src) / F.sum("n").over(w_all))
            ** 2
            / (F.sum("n").over(w_lang) * F.sum("n").over(w_src) / F.sum("n").over(w_all))
        ).alias("_contrib"),
    )
    per_cell = scored.select(
        "lang",
        "source",
        "n",
        F.round("_contrib", 6).alias("chi2_contrib"),
        F.lit(None).cast("long").alias("df"),
    )
    total = scored.agg(
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("source"),
        F.sum("n").alias("n"),
        F.round(F.sum("_contrib"), 6).alias("chi2_contrib"),
        ((F.count_distinct("lang") - 1) * (F.count_distinct("source") - 1))
        .cast("long")
        .alias("df"),
    )
    return per_cell.unionByName(total)


def q_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-chain equality constraint (TPC-H Q5's shape): revenue from
    lineitems where the CUSTOMER'S nation equals the SUPPLIER'S nation --
    the join predicate relates two different dimension chains of the same
    fact row, which the trade matrix deliberately does not (it keeps all
    nation pairs). Region-scoped to REGION_1's nations, per nation x year.

    Plan shape: both nation chains broadcast; the cross-chain equality is a
    post-join filter Catalyst pushes into the join; lineitem⋈orders stays
    the only exchange. Decimal revenue."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    supplier = load_table(spark, sf, "supplier")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")

    r1_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "REGION_1")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    supp = supplier.join(
        F.broadcast(r1_nations), supplier.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_nationkey").alias("_s_nat"), F.col("n_name").alias("nation_name"))
    cust = customer.join(
        F.broadcast(r1_nations.select("n_nationkey")),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", F.col("n_nationkey").alias("_c_nat"))

    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cust), orders.o_custkey == F.col("c_custkey"))
        .filter(F.col("_s_nat") == F.col("_c_nat"))  # the Q5 local constraint
        .groupBy("nation_name", F.date_format("l_shipdate", "yyyy").alias("ship_year"))
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q_nation_balance_sheet(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join (the one join type the surface lacked) + dense_rank:
    per-nation customer-side vs supplier-side account-balance totals, where
    each side covers a DIFFERENT nation range (customers: nations < 20,
    suppliers: nations >= 5) so both unmatched directions genuinely occur
    and null-fill to zero. dense_rank orders nations by combined balance
    with no rank gaps on ties.

    Scale: both inputs pre-aggregate to nation cardinality BEFORE the full
    outer join -- dims-sized frames, broadcast-able; the window runs over
    ~25 rows."""
    customer = load_table(spark, sf, "customer")
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    cust = (
        customer.filter(F.col("c_nationkey") < 20)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_balance"))
    )
    supp = (
        supplier.filter(F.col("s_nationkey") >= 5)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_balance"))
    )
    merged = (
        cust.join(supp, "nationkey", "full_outer")
        .join(F.broadcast(nation), F.col("nationkey") == nation.n_nationkey, "left")
        .select(
            "nationkey",
            "n_name",
            F.coalesce("cust_balance", F.lit(0.0)).alias("cust_balance"),
            F.coalesce("supp_balance", F.lit(0.0)).alias("supp_balance"),
        )
        .withColumn(
            "combined", F.round(F.col("cust_balance") + F.col("supp_balance"), 2)
        )
    )
    w = Window.orderBy(F.col("combined").desc())
    return merged.withColumn(
        "balance_rank", F.dense_rank().over(w).cast("long")
    )


def q_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Date-crossed join filter + top-k (TPC-H Q3's shape): the 10 highest-
    revenue orders placed BEFORE a date whose lineitems ship AFTER it --
    the filter cuts BOTH join sides on opposite sides of the same date, so
    each cut pushes to its own parquet scan before the orderkey exchange.
    Decimal revenue; TakeOrderedAndProject top-k with the orderkey
    tiebreak."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cut = "1996-06-30"
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        orders.filter(F.to_date("o_orderdate") < F.lit(cut).cast("date"))
        .join(
            li.filter(F.to_date("l_shipdate") > F.lit(cut).cast("date")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q_returned_revenue_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Returned-item loss report (TPC-H Q10's shape): the 20 customers with
    the most revenue tied up in RETURNED lineitems over H2-1996, with their
    nation -- the selective-filter-then-4-table-join report. The returnflag
    + date cuts prune lineitem at its scan; customer/nation broadcast;
    decimal revenue; top-k heap, custkey tiebreak."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    returned = li.filter(
        (F.col("l_returnflag") == "R")
        & F.date_format("l_shipdate", "yyyyMMdd").between("19960701", "19961231")
    )
    cust_geo = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        returned.join(orders, returned.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_geo), orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("returned_revenue"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.col("returned_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_promo_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional-aggregate ratio (TPC-H Q14's shape): per month of 1996,
    the percentage of revenue coming from PROMO-type parts -- one broadcast
    part join, one agg computing numerator and denominator together (a
    CASE inside SUM, never two scans). Decimal accumulation keeps both
    sums partitioning-invariant before the ratio."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.filter(F.date_format("l_shipdate", "yyyy") == "1996")
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,6)"))).alias("_promo"),
            F.sum(rev).alias("_total"),
        )
        .select(
            "ship_month",
            F.round((F.col("_promo") * 100 / F.col("_total")).cast("double"), 4).alias(
                "promo_pct"
            ),
            F.round(F.col("_total"), 2).cast("double").alias("total_revenue"),
        )
    )


def q_special_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Disjunctive multi-branch predicate (TPC-H Q19's shape): revenue from
    lineitems matching ANY of three (brand x size-range x quantity-range)
    branches -- the OR-of-ANDs boolean tree Catalyst must push through the
    broadcast join and into both scans as a residual filter. One row out;
    decimal accumulation."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return joined.filter(branch).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


def q_nation_trade_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Bilateral trade matrix (TPC-H Q7's shape): discounted revenue per
    (supplier nation -> customer nation, year) -- the one join topology the
    surface lacked: the SAME fact row joins dimensions through BOTH of its
    foreign keys (suppkey chain and orderkey->custkey chain) before the
    agg.

    Scale shape: supplier/customer/nation all broadcast (the fact never
    shuffles for them); lineitem⋈orders is the one fact-to-fact exchange,
    same as the silver build (and deleted by the bucketed layout); the
    final agg runs on (nation, nation, year) keys -- bounded."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    supplier = load_table(spark, sf, "supplier")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")

    supp_nation = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select(F.col("s_suppkey"), F.col("n_name").alias("supp_nation"))
    cust_nation = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(F.col("c_custkey"), F.col("n_name").alias("cust_nation"))

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cust_nation), orders.o_custkey == F.col("c_custkey"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("ship_year"),
        )
        .agg(
            # decimal accumulation: double sums are order-dependent and this
            # matrix's fine groups land on 2-dp rounding boundaries; each
            # product rounds to 6 dp ONCE (identically in both engines) and
            # decimal addition is exact, so the sum is partitioning-invariant
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q_corpus_sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-weighted corpus subsample (operators.sampling.weighted_sample_topk):
    Efraimidis-Spirakis u^(1/w) top-k with the deterministic md5 draw,
    weight = doc length in chars -- longer docs proportionally likelier,
    selection reproducible and oracle-exact. Map-only scoring +
    TakeOrderedAndProject."""
    from .operators.sampling import weighted_sample_topk

    docs = load_table(spark, sf, "documents")
    return weighted_sample_topk(
        docs.select("doc_id", "lang", "source", "n_chars"),
        100,
        weight=F.col("n_chars").cast("double"),
    )


def q_dedup_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle census of the near-dup graph: per-document count of
    triangles (mutually-similar triples) it belongs to -- the structure
    signal that separates a pairwise-similar pile from a true template
    cluster (triangle-dense neighborhoods = boilerplate families; the
    graph-analytics complement of connected components).

    Scale shape: edges come from the banded LSH generator (already sparse,
    id_a < id_b). The census is the canonical two-join enumeration over the
    ORIENTED edge list -- orientation (a<b<c) counts each triangle exactly
    once AND bounds the join fan-out (the standard degree-ordering trick);
    both joins are plain equi-joins shuffling edges on one key. The final
    per-node explode aggregates on doc ids."""
    from .operators.dedup import minhash_lsh_pairs

    from .operators._cache import tracked_persist

    edges = tracked_persist(
        minhash_lsh_pairs(load_table(spark, sf, "documents"), num_hashes=12, band_size=3)
        .select("doc_a", "doc_b")
    )
    e1 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = edges.select(F.col("doc_a").alias("b2"), F.col("doc_b").alias("c"))
    e3 = edges.select(F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def q_corpus_semantic_decontamination(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors whose cosine
    against ANY benchmark vector reaches 0.5 -- the semantic complement of
    the 5-gram scrub (corpus_decontamination), catching paraphrased leaks
    n-gram overlap misses. Benchmark = vec_id < 10, corpus = the rest.

    Scale shape: both sides L2-normalize once (map-only); the BOUNDED
    benchmark side broadcasts and the corpus never shuffles -- the
    per-corpus-row work is |bench| dot products, an acceptable constant for
    a benchmark suite (thousands of rows); a consortium-scale bench list
    would swap in the banded-LSH candidate path (near_dup_pairs) exactly
    like the Bloom variant does for n-grams."""
    from .operators.similarity import dot, norm

    emb = load_table(spark, sf, "embeddings")
    normed = emb.withColumn(
        "_norm", F.greatest(norm(F.col("embedding")), F.lit(1e-12))
    ).withColumn(
        "_nv", F.transform("embedding", lambda x: x.cast("double") / F.col("_norm"))
    )
    bench = normed.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("bench_id"), F.col("_nv").alias("bv")
    )
    corpus = normed.filter(F.col("vec_id") >= 10).select("vec_id", "_nv")
    return (
        corpus.crossJoin(F.broadcast(bench))
        .groupBy("vec_id")
        .agg(F.max(dot(F.col("_nv"), F.col("bv"))).alias("_max_cos"))
        .select(
            "vec_id",
            F.round("_max_cos", 6).alias("max_bench_cosine"),
            (F.col("_max_cos") >= 0.5).alias("is_contaminated"),
        )
    )


def q_customer_spend_outliers_mad(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier detection: per-segment median + MAD (median absolute
    deviation) of customer total spend, modified z-score
    0.6745*(x - median)/MAD, |z| > 3.5 flags -- the robust-statistics twin
    of the mean/stddev z-score (embedding_centroid_outliers), immune to the
    very outliers it hunts. Oracle uses DuckDB's native median()/mad().

    Scale shape: one shuffle for per-customer spend; the exact per-segment
    percentiles run over the ~5 bounded segments (same documented trap and
    alternatives as customer_spend_deciles); stats broadcast back, scoring
    map-only."""
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("total_spend"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    med = spend.groupBy("c_mktsegment").agg(
        F.expr("percentile(total_spend, 0.5)").alias("_med")
    )
    dev = spend.join(F.broadcast(med), "c_mktsegment")
    stats = dev.groupBy("c_mktsegment").agg(
        F.first("_med").alias("_med"),
        F.expr("percentile(abs(total_spend - _med), 0.5)").alias("_mad"),
    )
    return (
        spend.join(F.broadcast(stats), "c_mktsegment")
        .select(
            F.col("o_custkey").alias("customer_id"),
            "c_mktsegment",
            F.round("total_spend", 2).alias("total_spend"),
            F.round(
                0.6745 * (F.col("total_spend") - F.col("_med"))
                / F.nullif(F.col("_mad"), F.lit(0.0)),
                4,
            ).alias("robust_z"),
        )
        .withColumn(
            "is_outlier", F.coalesce(F.abs(F.col("robust_z")) > 3.5, F.lit(False))
        )
    )


def q_corpus_chunk_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """U2 exemplar: the token-window chunker as a Python UDTF (Spark 4's
    user-defined TABLE function -- one input row, many output rows) applied
    via LATERAL join. Same contract and oracle as corpus_chunk, the same
    role U1 plays for row UDFs: the documented SLOW path (one Python
    process round-trip per row) whose JVM twin (operators.text.chunk_documents,
    sequence+explode, zero Python) is the production path. Chunk math is
    kept token-for-token identical: starts 1..ceil(max(n-w,0)/s)*s+1 step s,
    tail windows short, chunk text pinned by md5."""
    import hashlib
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: long, chunk_tokens: long, chunk_md5: string")
    class ChunkDoc:
        def eval(self, text: str):  # noqa: ANN001
            window, stride = 32, 16
            toks = re.split(r"\s+", (text or "").strip())
            n = len(toks)
            stop = int(-(-max(n - window, 0) // stride)) * stride + 1
            for start in range(1, stop + 1, stride):
                chunk = toks[start - 1 : start - 1 + window]
                yield (
                    (start - 1) // stride,
                    min(window, n - start + 1),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    spark.udtf.register("chunk_doc_udtf", ChunkDoc)
    load_table(spark, sf, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_tokens, c.chunk_md5
        FROM _docs_udtf d, LATERAL chunk_doc_udtf(d.text) c
        """
    )


def q_events_variant_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of the semi-structured props column:
    parse_json once into the binary variant encoding, then typed
    try_variant_get extraction feeding per-type distribution stats -- the
    open-schema path for event properties (contrast events_json_extract's
    per-path get_json_object string re-parse: variant parses ONCE and every
    extraction is a binary field lookup, the difference that matters when
    one row feeds ten extractions at 100 TB)."""
    ev = load_table(spark, sf, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.expr("percentile(k, 0.5)"), 1).alias("median_k"),
            F.sum((F.col("k") > 50).cast("long")).alias("n_high"),
        )
    )


def q_events_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot/melt (the inverse of events_daily_pivot, completing the
    reshape pair): the wide per-day × per-type count matrix melts back to
    long (event_date, event_type, n_events) via DataFrame.unpivot -- one
    row per cell including the zero-filled ones, so wide -> long is
    lossless. Map-only over the tiny pivoted frame."""
    wide = q_events_daily_pivot(spark, sf)
    return wide.unpivot(
        ["event_date"], EVENT_TYPES, "event_type", "n_events"
    ).withColumn("n_events", F.col("n_events").cast("long"))


def q_events_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """Event-path analysis: the first-order Markov transition matrix of
    event types -- for each (prev_type, next_type) adjacent pair in a
    user's stream, the count and P(next | prev). The complement of the
    ordered funnel: the funnel checks ONE path, the transition matrix
    surfaces every path users actually take.

    Scale shape: one hash(user) shuffle for the lag window (the same
    exchange the funnel uses); the matrix agg then runs on (types x types)
    keys -- map-side combined, bounded by the type vocabulary, skew-immune.
    Ties on a timestamp are broken by event_id so `prev` is deterministic
    in both engines."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(w_prev), 6
        ).alias("p_next_given_prev"),
    )


def q_stream_events_enriched(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static dimension enrichment (streaming.jobs.stream_events_enriched):
    the event stream broadcast-joined to the static customer dim per
    micro-batch -- zero streaming state -- aggregated per (segment, type).
    Oracle = the identical batch join."""
    from .streaming.jobs import stream_events_enriched

    return stream_events_enriched(spark, sf)


def q_events_user_trend_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user OLS trend fitted in applyInPandas
    (operators.analytics.user_value_trend_pandas): the grouped Arrow path,
    with day-level pre-aggregation JVM-side so Python sees O(days) rows per
    user. Oracle = DuckDB's native regr_slope/regr_intercept per user."""
    from .operators.analytics import user_value_trend_pandas

    return user_value_trend_pandas(load_table(spark, sf, "events"))


def q_customer_spend_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist --
    the last uncovered window family): per-segment spend deciles over each
    customer's total. Ordering carries the unique custkey tiebreak, so
    every tile assignment is deterministic in both engines.

    Scale note: partitions are the ~5 market segments, so at real scale one
    segment is one task -- same trap as a global sort. The two-phase salted
    top-k (customer_order_ranks) or the broadcast quartile CUTS (customer_rfm)
    are this surface's scale-safe alternatives; this query exists for exact
    distribution semantics where the partition is known-bounded."""
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("total_spend").desc(), F.col("o_custkey").asc()
    )
    return spend.select(
        F.col("o_custkey").alias("customer_id"),
        "c_mktsegment",
        "total_spend",
        F.ntile(10).over(w).cast("long").alias("spend_decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
    )


def q_events_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id (beyond the ROLLUP/CUBE
    twins): (type, day), (type), (day), () subtotals in ONE pass -- Spark
    expands the input once per set and aggregates in a single shuffle, and
    grouping_id disambiguates real NULLs from subtotal NULLs. Bit semantics
    match DuckDB's GROUPING(a, b) exactly."""
    load_table(spark, sf, "events").createOrReplaceTempView("_ev_gs")
    return spark.sql(
        """
        SELECT event_type,
               date_format(ts, 'yyyy-MM-dd')        AS day,
               grouping_id(event_type, date_format(ts, 'yyyy-MM-dd')) AS gid,
               COUNT(*)                              AS n_events,
               ROUND(SUM(value), 4)                  AS sum_value
        FROM _ev_gs
        GROUP BY GROUPING SETS (
            (event_type, date_format(ts, 'yyyy-MM-dd')),
            (event_type),
            (date_format(ts, 'yyyy-MM-dd')),
            ()
        )
        """
    )


def q_part_fuzzy_matches(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked fuzzy join (entity resolution): part-name pairs within
    Levenshtein distance 3, with candidate pairs bounded by a blocking key
    (the name's first token) instead of the all-pairs cross join.

    Scale shape: the self-join is an EQUI-join on the block key -- the
    standard record-linkage blocking step; only within-block pairs pay the
    edit-distance compare, and the id_a < id_b guard halves them. A naive
    `levenshtein(a, b) <= 3` join has no equi key and would be a cartesian
    product (the plan guard forbids exactly that shape engine-wide)."""
    part = load_table(spark, sf, "part").select(
        "p_partkey", "p_name", F.split(F.col("p_name"), " ")[0].alias("_blk")
    )
    a, b = part.alias("a"), part.alias("b")
    return (
        a.join(b, "_blk")
        .filter(F.col("a.p_partkey") < F.col("b.p_partkey"))
        .withColumn("edit_dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name")))
        .filter(F.col("edit_dist") <= 3)
        .filter(F.col("a.p_name") != F.col("b.p_name"))
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("edit_dist").cast("long").alias("edit_dist"),
        )
    )


def q_events_value_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregate family (covar/var/corr -- none used anywhere
    else in the surface): per event type, the OLS trend of daily total value
    over the day index. slope = covar_pop(x,y)/var_pop(x), intercept from
    the means, plus Pearson r -- the closed forms every SQL engine ships,
    so the oracle is DuckDB's native regr_slope/regr_intercept/corr.

    Scale shape: daily totals first (map-side-combined (type, day) agg),
    then the regression aggregates run over types x days rows -- calendar-
    bounded, tiny, no matter the event volume."""
    ev = load_table(spark, sf, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("x"),
        )
        .agg(F.sum("value").alias("y"))
    )
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 4).alias("slope"),
        F.round(
            F.avg("y") - F.covar_pop("x", "y") / F.var_pop("x") * F.avg("x"), 4
        ).alias("intercept"),
        F.round(F.corr("x", "y"), 6).alias("r"),
    )


def q_corpus_zipf(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf term-frequency curve: the corpus's top-50 lowercased terms with
    frequency rank and cumulative share -- the vocabulary sanity check run
    before tokenizer training.

    Scale shape: explode -> (term) count is map-side combined, so the
    shuffle carries one row per DISTINCT term per mapper, not per token.
    The rank/cumulative windows run AFTER a top-50 TakeOrderedAndProject,
    i.e. on 50 rows in one task -- a global sort never touches the full
    vocabulary."""
    from .operators.text import tokens

    docs = load_table(spark, sf, "documents")
    counts = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = counts.agg(F.sum("freq").alias("_total"))
    top = (
        counts.orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(50)
        .crossJoin(F.broadcast(total))
    )
    w_rank = Window.orderBy(F.col("freq").desc(), F.col("term").asc())
    return top.select(
        F.row_number().over(w_rank).cast("long").alias("rank"),
        "term",
        "freq",
        F.round(F.col("freq") / F.col("_total"), 6).alias("share"),
        F.round(
            F.sum("freq").over(w_rank.rowsBetween(Window.unboundedPreceding, 0))
            / F.col("_total"),
            6,
        ).alias("cum_share"),
    )


def q_corpus_source_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source token accounting: document counts, token totals, corpus
    share, and cumulative share in descending-size order -- the mixture
    dashboard behind training-data budget decisions. One map-side-combined
    agg on the tiny source key; every window runs on sources-cardinality
    rows."""
    from .operators.text import token_count

    docs = load_table(spark, sf, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
    )
    total = per_source.agg(F.sum("n_tokens").alias("_total"))
    w = Window.orderBy(F.col("n_tokens").desc(), F.col("source").asc())
    return (
        per_source.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_total"), 6).alias("token_share"),
            F.round(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / F.col("_total"),
                6,
            ).alias("cum_share"),
        )
    )


def q_dq_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality expectation suite over the whole star schema
    (operators.audit.star_schema_audit): null keys, value ranges, PK
    uniqueness, and every FK edge, one report row per check. Single-table
    checks share one scan per table; FK checks are anti-joins (dims
    broadcast, the one fact-to-fact edge shuffles on its key)."""
    from .operators.audit import star_schema_audit

    return star_schema_audit(
        {
            t: load_table(spark, sf, t)
            for t in ("lineitem", "orders", "customer", "part", "supplier", "nation", "region")
        }
    )


def q_dq_profile_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Per-column profile of the orders table (operators.audit.profile_table):
    rows / nulls / exact distincts / string-rendered min-max, one row per
    column -- the schema-drift tripwire run after every load."""
    from .operators.audit import profile_table

    return profile_table(load_table(spark, sf, "orders"), "orders")


def q_embedding_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16 dims
    (operators.similarity.random_projection): the seeded Rademacher matrix
    rides into the plan as literals, so the projection is map-only JVM
    arithmetic -- the dimensionality-reduction pass that shrinks every
    downstream ANN / near-dup shuffle 4x."""
    from .operators.similarity import random_projection

    return random_projection(load_table(spark, sf, "embeddings"), k=16)


def q_embedding_centroid_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid outlier scoring
    (operators.similarity.centroid_outliers): distance to own-label mean
    vector, z-scored within the label -- the label-noise QA pass. Centroids
    and stats are label-cardinality aggregates broadcast back; the corpus
    never shuffles."""
    from .operators.similarity import centroid_outliers

    return centroid_outliers(load_table(spark, sf, "embeddings"))


def q_orders_with_returns(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-join shape (TPC-H Q4's EXISTS, adapted to this schema): count
    orders per priority that contain at least one RETURNED lineitem.

    LEFT SEMI join keeps order rows without duplicating them per matching
    lineitem -- the plan Spark picks for SQL EXISTS. At scale both sides
    shuffle once on orderkey (same cost as any fact-to-fact equi-join); the
    returned-only filter prunes the probe side BEFORE the exchange, so the
    shuffled lineitem volume is the match fraction, not the full table."""
    orders = load_table(spark, sf, "orders")
    returned = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_customer_order_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Count-distribution shape (TPC-H Q13): how many customers placed
    exactly N orders, INCLUDING the zero bucket via left join from the
    customer dim.

    Two aggregations, each a single hash shuffle: per-customer count (key =
    custkey, high cardinality, no skew), then the tiny histogram groupBy.
    The join is customer⟕orders on custkey -- at 100 TB both sides shuffle
    on the key; counting o_orderkey (not *) makes the null-match rows the
    zero bucket exactly like the SQL LEFT JOIN + COUNT(col) idiom."""
    customer = load_table(spark, sf, "customer").select("c_custkey")
    orders = load_table(spark, sf, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


def q_top_supplier_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Argmax-with-ties shape (TPC-H Q15): supplier(s) with the maximum
    discounted revenue over Q1-1996, tie-safe via a broadcast join on the
    1-row scalar max -- never a global sort, never a single-task window.

    The revenue agg shuffles lineitem once on suppkey; the max is a 1-row
    reduction broadcast back; the supplier dim broadcasts. Rounding to 2 dp
    happens BEFORE the max-equality compare in both engines, so float
    accumulation order cannot split a tie."""
    li = load_table(spark, sf, "lineitem")
    supplier = load_table(spark, sf, "supplier")
    revenue = (
        li.filter(ymd("l_shipdate").between("19960101", "19960331"))
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.join(F.broadcast(top), revenue.total_revenue == F.col("_max_rev"))
        .join(F.broadcast(supplier), revenue.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "total_revenue",
        )
    )


def q_rich_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-subquery + anti-join shape (TPC-H Q22): customers whose
    balance exceeds the average positive balance AND who never ordered,
    summarized per market segment.

    The global average is a 1-row agg broadcast into the filter (Spark runs
    SQL scalar subqueries the same way); the no-orders test is a left-anti
    join against the distinct order custkeys. Anti-join shuffles on custkey
    once; the segment rollup is a 5-key agg."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg_bal")
    )
    idle = rich.join(
        orders.select("o_custkey").distinct(),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


def q_part_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated-average shape (TPC-H Q17): yearly revenue opportunity from
    small-quantity orders -- lineitems of Brand#3 parts whose quantity is
    below 50% of that part's average quantity.

    The correlated subquery decorrelates into agg-then-join exactly as
    Catalyst rewrites SQL: per-part avg quantity (one shuffle on partkey over
    the BRAND-PRUNED fact -- the broadcast part filter runs first, so the agg
    input is the selective subset, not the full table), joined back to the
    same pruned lineitems on partkey. Output is one row; division by 7.0
    mirrors Q17's avg_yearly convention."""
    part = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#3")
    li = load_table(spark, sf, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_part = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("_avg_qty"))
    small = li.join(per_part.withColumnRenamed("l_partkey", "_pk"), F.col("l_partkey") == F.col("_pk")).filter(
        F.col("l_quantity") < 0.5 * F.col("_avg_qty")
    )
    return small.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        F.count("*").alias("n_lineitems"),
    )


# ------------------------------------------------------------- round 4


def q_documents_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 retrieval over the corpus (operators.ranking.bm25_topk):
    top-10 documents for a fixed bag-of-words query -- the lexical-ranking
    baseline every retrieval/dedup pipeline needs next to the embedding ANN
    path. Corpus stats broadcast; explode is pre-filtered to query terms, so
    the shuffle is query-sized, not vocabulary-sized."""
    from .operators.ranking import bm25_topk

    # spread=False (r14, measured): the map side is a tokenize+explode that
    # immediately pre-filters to 3 query terms -- the work is query-sized,
    # so the extra full-text exchange costs more than it parallelizes
    # (interleaved A/B 1.06 vs 1.33 s)
    return bm25_topk(
        load_table(spark, sf, "documents", spread=False),
        ["spark", "window", "merge"],
        k=10,
    )


def q_corpus_bigram_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """PMI collocation mining (operators.ranking.bigram_pmi): top-30 adjacent
    bigrams by pointwise mutual information with count >= 5 -- the
    tokenizer-merge / phrase-detection signal. Bigrams come from a per-row
    JVM transform (no self-join); counts are map-side combined."""
    from .operators.ranking import bigram_pmi

    return bigram_pmi(load_table(spark, sf, "documents"), min_count=5, k=30)


def q_text_word_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document unigram Shannon entropy + type/token ratio
    (operators.text.word_entropy_stats): the information-density screen that
    catches templated/boilerplate docs the repetition stats miss."""
    from .operators.text import word_entropy_stats

    return word_entropy_stats(load_table(spark, sf, "documents"))


def q_mart_incremental_update(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental aggregation maintenance (operators.aggregates
    .merge_partial_aggs): the monthly-revenue mart refreshed by merging the
    EXISTING mart (months before the latest) with the latest month's delta
    aggregate -- union + re-agg over sums/counts, avg recomputed after the
    merge. Result is provably identical to a full recompute (sum/count are
    commutative monoids), which is exactly what the oracle asserts.

    Scale shape: history contributes GROUP-cardinality rows (the stored
    mart), only the delta shuffles at data scale -- the 100 TB mart-refresh
    pattern. The month cutoff arrives via one 1-row collected scalar (the
    same bounded-calibration pattern as the gap-fill spine)."""
    from .operators.aggregates import merge_partial_aggs

    orders = load_table(spark, sf, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    (maxm,) = orders.agg(F.max("month")).first()

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("month").agg(
            F.sum("o_totalprice").alias("sum_price"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )

    mart = agg(orders.filter(F.col("month") < maxm))
    delta = agg(orders.filter(F.col("month") == maxm))
    merged = merge_partial_aggs(mart, delta, ["month"], ["sum_price"], "n_orders")
    return merged.select(
        "month",
        "n_orders",
        F.round("sum_price", 2).alias("sum_price"),
        F.round(F.col("sum_price") / F.col("n_orders"), 4).alias("avg_price"),
    )


def q_events_distinct_rolling7(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-7-day distinct active users per day -- the rolling-retention
    dashboard metric, computed WITHOUT a range join: each (user, day) pair
    contributes itself to days d..d+6 via a JVM sequence explode, then one
    distinct + groupBy(day) counts users. Linear in events (x7), map-side
    expanded, no window over an unbounded distinct -- the shape that
    survives 100 TB where `COUNT(DISTINCT) OVER (RANGE 7 days)` cannot
    (engines would keep per-day state or rescan). Output days are
    restricted to days that actually appear in the data (semi join against
    the observed-day set)."""
    ev = load_table(spark, sf, "events")
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    contrib = (
        ud.select(
            F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("day"),
            "user_id",
        )
        .distinct()
        .join(days, "day", "left_semi")
    )
    return contrib.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_users_7d")
    )


def q_orders_median_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Exact median + deterministic mode per order priority: median order
    value (linear-interpolated percentile, the engine-exact twin of the
    approx sketch family) and the most frequent order STATUS with ties
    broken to the lexicographically smallest -- built from count+rank so
    the answer is engine-stable, unlike a bare mode() whose tie behavior is
    undefined. Both aggs are tiny-key (5 priorities); the mode rank runs on
    the POST-AGG (priority x status) frame."""
    orders = load_table(spark, sf, "orders")
    base = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
    )
    counts = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("c").desc(), F.col("o_orderstatus").asc()
    )
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            F.col("c").cast("long").alias("mode_count"),
        )
    )
    return base.join(mode, "o_orderpriority")


def q_part_set_similarity_join(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Jaccard set-similarity self-join over part-name token sets
    (operators.dedup.prefix_filter_jaccard_join, threshold 0.6): the
    SSJoin/PPJoin prefix-filter algorithm -- candidates only from shared
    RAREST-first prefix tokens, so frequent tokens never generate pairs and
    the join stays an inverted-index equi-join at any scale. The record
    string is the part's full attribute profile (name + brand + type +
    size), the entity-resolution shape: pairs agreeing on >= 4 of ~5
    profile tokens. Profile vocabularies are SMALL (every token frequent),
    so this uses block=2 pair-key generation -- single-token prefix keys
    would degenerate toward n^2/|V| candidates here."""
    from .operators.dedup import prefix_filter_jaccard_join

    # spread=True (r14): the tokenize+explode+self-join pipeline below is
    # exact int/string math (no float sums), so the scan spread is safe, and
    # the single-row-group part.parquet would otherwise run it on one core
    part = load_table(spark, sf, "part", spread=True).select(
        "p_partkey",
        F.concat_ws(
            " ", "p_name", "p_brand", "p_type", F.col("p_size").cast("string")
        ).alias("profile"),
    )
    return prefix_filter_jaccard_join(
        part, threshold=0.6, id_col="p_partkey", text_col="profile", block=2
    ).select(
        F.col("id_a").alias("partkey_a"),
        F.col("id_b").alias("partkey_b"),
        "n_inter",
        "n_union",
        "jaccard",
    )


def q_supplier_pareto(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto concentration per region: how many suppliers cover 80% of
    discounted revenue, plus the top supplier's share -- the
    skew-diagnostics query run before choosing a partitioning key.

    Scale shape: revenue aggregates on the HIGH-cardinality supplier key
    with map-side combine; dims broadcast; the ranking window runs on the
    POST-AGG supplier frame partitioned by region. A supplier needs
    cum_share_before < 0.8 to be counted -- computed from a running sum,
    never a global sort of raw lineitems."""
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    dims = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("s_suppkey", "r_name")
    )
    per_supp = rev.join(F.broadcast(dims), rev.l_suppkey == dims.s_suppkey)
    w = Window.partitionBy("r_name").orderBy(F.col("rev").desc(), F.col("s_suppkey").asc())
    wtot = Window.partitionBy("r_name")
    ranked = per_supp.select(
        "r_name",
        "rev",
        (
            F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("rev")
        ).alias("cum_before"),
        F.sum("rev").over(wtot).alias("total"),
        F.max("rev").over(wtot).alias("top_rev"),
    )
    return ranked.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum((F.col("cum_before") < 0.8 * F.col("total")).cast("long")).alias(
            "n_top80"
        ),
        F.round(F.max(F.col("top_rev") / F.col("total")), 6).alias("top1_share"),
    )


def q_corpus_winsorized_length(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorized document-length statistics per language: exact p05/p95
    (linear interpolation), raw mean, and the mean with lengths clamped into
    [p05, p95] -- the outlier-robust corpus profile. Two passes over a
    lang-keyed agg (percentiles first, broadcast back, then the clamped
    mean); both shuffles are tiny-key but operate on the post-scan pruned
    (lang, n_chars) projection only."""
    docs = load_table(spark, sf, "documents").select("lang", "n_chars")
    pcts = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("p05"),
        F.expr("percentile(n_chars, 0.95)").alias("p95"),
    )
    return (
        docs.join(F.broadcast(pcts), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.first("p05"), 4).alias("p05"),
            F.round(F.first("p95"), 4).alias("p95"),
            F.round(F.avg("n_chars"), 4).alias("mean_chars"),
            F.round(
                F.avg(F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("n_chars")))),
                4,
            ).alias("winsorized_mean"),
        )
    )


def q_events_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Exact heavy hitters via per-partition Misra-Gries + candidate re-count
    (operators.frequency.heavy_hitters_exact): users generating >= 0.75% of
    all events. The sketch pass keeps O(k) state per task and ships only
    surviving keys; the re-count is a semi-join-pruned aggregate -- no
    full-frequency table ever materializes, unlike a plain groupBy. The
    answer is EXACT (candidates are a guaranteed superset; recount filters
    with true counts), so the oracle is plain GROUP BY / HAVING."""
    from .operators.frequency import heavy_hitters_exact

    return heavy_hitters_exact(
        load_table(spark, sf, "events"), "user_id", threshold_frac=0.0075
    )


def q_events_hopping_window(spark: SparkSession, sf: str) -> DataFrame:
    """Hopping (sliding) window aggregation: 1-hour windows advancing every
    15 minutes, per event type -- F.window with a slide, the batch twin of
    the streaming sliding-window job. Each event lands in exactly 4 windows
    (JVM-side expansion); the agg shuffles on (window, type) with map-side
    combine. Output keys are the window START timestamps."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events", "sum_value")
    )


def q_customer_order_value_window(spark: SparkSession, sf: str) -> DataFrame:
    """Window VALUE-function family (first_value / nth_value / last_value
    over a full frame -- the last uncovered window functions): per customer
    with >= 3 orders, the first, second, and latest order price in
    (date, orderkey) order. The frame must be UNBOUNDED FOLLOWING for
    last_value/nth_value to see the whole partition -- the classic frame
    trap, pinned here against DuckDB's implementation. One shuffle on the
    high-cardinality customer key."""
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    enriched = orders.select(
        "o_custkey",
        F.first_value("o_totalprice").over(w).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.last_value("o_totalprice").over(w).alias("last_price"),
    )
    return (
        enriched.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.first("first_price"), 2).alias("first_price"),
            F.round(F.first("second_price"), 2).alias("second_price"),
            F.round(F.first("last_price"), 2).alias("last_price"),
        )
        .filter(F.col("n_orders") >= 3)
    )


def q_corpus_tokens_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions as the per-doc token profiler: transform
    + array_max (longest token), filter + size (digit-token count), exists
    (any digit), aggregate (mean token length) -- all JVM lambda
    expressions inside whole-stage codegen, zero explode/shuffle: the whole
    query is map-only, the shape to prefer over explode+groupBy whenever
    the aggregation is per-row."""
    from .operators.text import tokens

    docs = load_table(spark, sf, "documents")
    toks = tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_max(F.transform(toks, lambda t: F.length(t))).cast("long").alias(
            "max_token_len"
        ),
        F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$"))).cast("long").alias(
            "n_digit_tokens"
        ),
        F.exists(toks, lambda t: t.rlike("[0-9]")).alias("has_digit"),
        F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("long")),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            )
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


def q_multimodal_bmp_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode end-to-end (no codec library): each doc's text
    bytes become an 8x4 24-bit BMP (pure-numpy encoder), and
    operators.multimodal.real_image_meta decodes the HEADERS AND PIXELS
    back -- true width/height plus exact per-channel means. The oracle
    recomputes the channel means from the same text bytes in SQL, so the
    whole decode path (struct unpack, bottom-up rows, BGR swap, row
    padding) is pinned by a dual-engine compare, not just a unit test.
    Arrow-batched map-only; the binary payload never shuffles."""
    import numpy as np

    from .operators.multimodal import encode_bmp, real_image_meta

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_bmp(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                px = np.resize(b, 96).reshape(4, 8, 3)  # cycles if short
                rows.append((doc_id, "image", bytearray(encode_bmp(px))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_bmp, "doc_id long, media_type string, payload binary"
    )
    return real_image_meta(with_payload).select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_r",
        "mean_g",
        "mean_b",
    )


def q_multimodal_wav_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio decode end-to-end (no codec library): each doc's text
    bytes become 64 centered int16 PCM samples in a RIFF/WAVE container
    (pure-struct encoder), and operators.multimodal.real_audio_meta parses
    the chunks back -- true channel count, sample rate, sample count, and
    RMS amplitude from the DECODED samples. Oracle recomputes the RMS from
    the same text bytes in SQL. The audio twin of multimodal_bmp_decode."""
    import numpy as np

    from .operators.multimodal import encode_wav, real_audio_meta

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_wav(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                samples = np.resize(b, 64).astype(np.int16) - 128
                rows.append((doc_id, "audio", bytearray(encode_wav(samples, 8000, 1))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_wav, "doc_id long, media_type string, payload binary"
    )
    return real_audio_meta(with_payload).select(
        "doc_id",
        F.col("n_channels").cast("long").alias("n_channels"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        "n_samples",
        "rms",
    )


def q_multimodal_y4m_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL video decode end-to-end (no codec library): each doc's text
    bytes become a 3-frame 8x4 YUV4MPEG2 stream (luma = cycled text bytes,
    frame f offset by f*32), and operators.multimodal.real_video_meta
    decodes headers + planes back -- per-frame dimensions and mean luma,
    1 payload -> 3 rows (the video fan-out shape). Oracle recomputes each
    frame's mean from the same bytes in SQL. Completes the modality trio:
    BMP image, WAV audio, y4m video -- all with REAL decoders."""
    import numpy as np

    from .operators.multimodal import encode_y4m, real_video_meta

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_y4m(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                frames = [
                    np.resize(np.roll(b, -(f * 32)), 32).reshape(4, 8)
                    for f in range(3)
                ]
                rows.append((doc_id, "video", bytearray(encode_y4m(frames))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_y4m, "doc_id long, media_type string, payload binary"
    )
    return real_video_meta(with_payload).select(
        "doc_id",
        "frame_idx",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_y",
    )


def q_hybrid_retrieval_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009):
    BM25 lexical top-20 fused with embedding-cosine top-20 (query = vec 0's
    embedding, doc ids align with the corpus), fused score = sum of
    1/(60 + rank) over the lists a doc appears in, final top-10.

    The modern RAG retrieval stack in one plan: both branches are the
    already-bounded top-k operators (query-sized frames), the fusion is a
    20-row full outer join -- nothing data-scale happens after the two
    retrievals. Ranked on the ROUNDED fused score with doc_id tie-break so
    the cutoff is engine-stable."""
    from .operators.ranking import bm25_topk
    from .operators.similarity import cosine_topk

    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    lex = bm25_topk(docs, ["spark", "window", "merge"], k=20)
    w_lex = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    lex_r = lex.select(
        "doc_id", F.row_number().over(w_lex).cast("long").alias("lex_rank")
    )
    sem_r = (
        cosine_topk(emb, [0], k=20)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("sem_rank"))
    )
    fused = (
        lex_r.join(sem_r, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60.0 + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (60.0 + F.col("sem_rank")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).alias("sem_rank"),
        )
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(10)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "rrf_score", "lex_rank", "sem_rank")
    )


_INDEX_DIR_CACHE: dict = {}


def _cached_index_dir(kind: str, sf: str, build) -> str:
    """Build a persisted ANN index ONCE per (kind, sf-dir) per process and
    reuse it: repeated bench/correctness invocations used to mkdtemp + rebuild
    every call, leaking index directories on local disk and making the
    registry entries side-effecting (round-4 ADVICE). TemporaryDirectory
    objects are held in the cache so their finalizers reclaim the disk at
    interpreter exit."""
    import tempfile

    key = (kind, sf)
    if key not in _INDEX_DIR_CACHE:
        tmp = tempfile.TemporaryDirectory(prefix=f"{kind}_index_")
        build(tmp.name)
        _INDEX_DIR_CACHE[key] = tmp
    return _INDEX_DIR_CACHE[key].name


def q_embedding_pq_index_search(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted PQ index round-trip (operators.ann_index.build_pq_index /
    query_pq_index): codebook + encoded corpus written to parquet, then
    ADC top-5 answered from the CODES TABLE alone -- shares the literal-
    codebook distance expression with the in-plan search, so it carries
    the same exact oracle as embedding_pq_topk."""
    from .operators.ann_index import build_pq_index, query_pq_index

    emb = load_table(spark, sf, "embeddings")
    idx = _cached_index_dir("pq", sf, lambda d: build_pq_index(emb, d))
    queries = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 5).collect()
    ]
    return query_pq_index(spark, idx, queries, k=5)


def q_orders_market_basket(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket co-occurrence (the item-item recommendation primitive):
    part pairs bought in the same order, with support and lift =
    N * c_ab / (c_a * c_b), top-25 by (support, lift) with pair
    tie-breaks.

    Scale shape: pairs come from a SELF-EQUI-JOIN on the order key -- with
    a bounded basket size b the blow-up is b^2/2 per order, linear in
    orders; never an item-item cross join. Item marginals join back by
    part key (vocabulary-sized), the order count broadcasts as a 1-row
    scalar, and the top-25 is a TakeOrderedAndProject on rounded lift."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = load_table(spark, sf, "orders").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders")
    )
    item_counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    scored = (
        pairs.join(
            item_counts.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a")),
            "part_a",
        )
        .join(
            item_counts.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("support").cast("long").alias("support"),
            F.round(
                F.col("n_orders") * F.col("support") / (F.col("c_a") * F.col("c_b")), 4
            ).alias("lift"),
        )
    )
    return (
        scored.orderBy(
            F.col("support").desc(),
            F.col("lift").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        )
        .limit(25)
    )


def q_events_exp_smoothing(spark: SparkSession, sf: str) -> DataFrame:
    """Simple exponential smoothing (alpha=0.3) of daily event value per
    type -- the second sequential statistic expressed as pure windows: the
    recursion S_t = a*x_t + (1-a)*S_{t-1} (S_1 = x_1) unrolls to
    S_t = (1-a)^(t-1)*x_1 + a * sum_{j=2..t} (1-a)^(t-j) * x_j, computed
    as a row-number-weighted prefix sum -- each term carries
    (1-a)^(-j) once, the outer factor (1-a)^t rescales, and no per-row
    state survives. Bounded series (a calendar month) keeps the
    (1-a)^(-j) growth far inside double range; both engines share the
    identical pow/sum pipeline, so 4-dp rounding is stable."""
    ev = load_table(spark, sf, "events")
    # smooth the RAW sums: pre-rounding x to 4dp gives early S_t a 5-decimal
    # granularity whose 4dp rounding lands exactly on .5 ties ~10% of the
    # time (measured) -- the raw doubles have no structured tie points
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value").alias("x")
    )
    a = 0.3
    wo = Window.partitionBy("event_type").orderBy("day")
    t = F.row_number().over(wo).cast("double")
    # factored by (1-a)^(t-1): term_1 = x_1 (full weight, no alpha),
    # term_j = a * x_j / (1-a)^(j-1) for j >= 2
    term = F.when(t == 1, F.col("x")).otherwise(
        F.col("x") * F.lit(a) / F.pow(F.lit(1.0 - a), t - 1)
    )
    smoothed = F.pow(F.lit(1.0 - a), t - 1) * F.sum(term).over(
        wo.rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "event_type",
        "day",
        F.round("x", 4).alias("x"),
        F.round(smoothed, 4).alias("smoothed"),
    )


def q_orders_benford_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law fraud/authenticity screen on order values: observed
    first-significant-digit shares vs the Benford expectation
    log10(1 + 1/d), with each digit's chi-square contribution -- the
    forensic-accounting dq check. One tiny-key agg over a map-side digit
    extraction; 9 rows out. (Synthetic uniform-ish prices will FAIL
    Benford -- the point of the audit is the measurement, which the oracle
    pins exactly.)"""
    orders = load_table(spark, sf, "orders")
    digit = F.substring(
        F.regexp_replace(F.format_number(F.col("o_totalprice"), 10), "[0.,]", ""), 1, 1
    ).cast("long")
    counts = orders.select(digit.alias("d")).filter(F.col("d") >= 1).groupBy("d").agg(
        F.count(F.lit(1)).alias("c")
    )
    total = counts.agg(F.sum("c").cast("double").alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "d",
            F.col("c").cast("long").alias("n_orders"),
            F.round(F.col("c") / F.col("n"), 6).alias("observed_share"),
            F.round(F.log10(1.0 + 1.0 / F.col("d")), 6).alias("benford_share"),
            F.round(
                F.pow(F.col("c") / F.col("n") - F.log10(1.0 + 1.0 / F.col("d")), 2)
                / F.log10(1.0 + 1.0 / F.col("d"))
                * F.col("n"),
                4,
            ).alias("chi2_contrib"),
        )
    )


def q_events_cusum_alerts(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM change-point detection over daily event volumes, windows-only:
    the recursion S_t = max(0, S_{t-1} + y_t) rewrites EXACTLY as
    S_t = cum_t - min(0, running_min(cum)) (prefix sum minus its running
    minimum), so the sequential statistic becomes two ordered window
    functions -- no fold, no UDF, no state, and both engines share the
    identity. y_t centers each day's count on the type's mean minus a
    slack of 0.5 sigma; days with S > 3 sigma flag as alerts.

    Scale shape: the daily agg shuffles (type, day); both windows partition
    on type over the POST-AGG calendar-sized frame. The classic streaming
    statistic as a batch plan."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("day")
    cum = daily.select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n_events"),
        F.sum(
            F.col("n") - F.avg("n").over(wt) - 0.5 * F.stddev_samp("n").over(wt)
        ).over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("_cum"),
        (3.0 * F.stddev_samp("n").over(wt)).alias("_h"),
    )
    s_stat = F.col("_cum") - F.least(
        F.lit(0.0), F.min("_cum").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    return cum.select(
        "event_type",
        "day",
        "n_events",
        F.round(s_stat, 4).alias("cusum"),
        (s_stat > F.col("_h")).alias("alert"),
    )


def q_corpus_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    """The dataset card: one row summarizing the training corpus -- doc and
    token counts, language diversity (count, majority share, Shannon
    entropy), exact-duplicate rate, length profile. The release artifact
    every curated corpus ships with, computed in two tiny-key aggregates
    over one scan each (lang marginals + content-hash distinct) and joined
    as 1-row frames."""
    docs = load_table(spark, sf, "documents")
    from .operators.text import token_count

    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("n_tokens"),
        F.round(F.avg("n_chars"), 4).alias("mean_chars"),
        F.count_distinct(F.md5("text")).cast("long").alias("_n_uniq"),
    )
    langs = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    lang_stats = langs.agg(
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.min_by(
            "lang",
            F.concat_ws(
                "#",
                F.lpad((F.lit(10**12) - F.col("c")).cast("string"), 13, "0"),
                F.col("lang"),
            ),
        ).alias("top_lang"),
        F.max("c").alias("_top_c"),
        F.sum("c").alias("_total"),
        F.round(
            -F.sum(F.col("c") * F.log(F.col("c"))) / F.sum("c")
            + F.log(F.sum("c")),
            6,
        ).alias("lang_entropy_nats"),
    )
    return (
        base.crossJoin(F.broadcast(lang_stats))
        .select(
            "n_docs",
            "n_tokens",
            "mean_chars",
            F.round(1.0 - F.col("_n_uniq") / F.col("n_docs"), 6).alias("exact_dup_rate"),
            "n_langs",
            "top_lang",
            F.round(F.col("_top_c") / F.col("_total"), 6).alias("top_lang_share"),
            "lang_entropy_nats",
        )
    )


def q_orders_nullsafe_join(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM -- the one join
    predicate semantics not yet pinned): orders carry a NULLable tier key
    (priority demoted to NULL for '1-URGENT'), the tier dim carries the
    same NULL row, and the join must MATCH the null keys (unlike plain =,
    which drops them silently -- the classic dim-join bug for optional
    attributes). Output proves the NULL tier matched: one row per tier
    including the NULL one, with dim attribution."""
    orders = load_table(spark, sf, "orders").withColumn(
        "tier", F.nullif("o_orderpriority", F.lit("1-URGENT"))
    )
    tiers = (
        orders.select("tier")
        .distinct()
        .withColumn(
            "tier_label",
            F.coalesce(F.concat(F.lit("tier:"), "tier"), F.lit("tier:urgent")),
        )
    )
    # self-derived dim: alias both sides so <=> resolves unambiguously
    o = orders.alias("o")
    d = tiers.withColumnRenamed("tier", "d_tier")
    return (
        o.join(F.broadcast(d), F.col("o.tier").eqNullSafe(F.col("d_tier")))
        .groupBy("tier_label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


def q_orders_geomean_udaf(spark: SparkSession, sf: str) -> DataFrame:
    """Vectorized pandas UDAF (the GROUPED_AGG pandas_udf API -- the last
    uncovered Python-UDF surface, U-family): per-priority geometric mean of
    order value computed by an Arrow-batched numpy kernel, beside its
    pure-JVM twin exp(avg(ln(x))) in the SAME aggregate -- the two columns
    must agree to 4 dp, and the oracle checks both. Grouped-agg pandas UDFs
    receive whole-group columns as pandas Series (no per-row Python), so
    this is the correct shape for custom numeric aggregates the built-ins
    lack; the JVM twin documents that for THIS aggregate the built-in
    composition is the better 100 TB path (partial-aggregatable, no Python
    at all)."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: `from __future__ import annotations`
    # stringifies type hints module-wide, which defeats hint inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geomean(v):
        return float(np.exp(np.log(v.to_numpy()).mean()))

    orders = load_table(spark, sf, "orders")
    # a grouped-agg pandas UDF cannot share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) -- the twin runs as its own agg and
    # joins back on the tiny group key
    udaf = orders.groupBy("o_orderpriority").agg(
        F.round(geomean("o_totalprice"), 4).alias("geomean_price")
    )
    builtin = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.exp(F.avg(F.log("o_totalprice"))), 4).alias("geomean_builtin"),
    )
    return builtin.join(udaf, "o_orderpriority").select(
        "o_orderpriority", "n_orders", "geomean_price", "geomean_builtin"
    )


def q_multimodal_byte_features_arrow(spark: SparkSession, sf: str) -> DataFrame:
    """mapInArrow twin of multimodal_byte_features (the last uncovered
    Arrow-Python API): RecordBatches in, RecordBatches out, no pandas
    layer. Shares the pandas twin's oracle -- identical numbers prove the
    two APIs are interchangeable here."""
    from .operators.multimodal import attach_fake_payload, extract_byte_features_arrow

    return extract_byte_features_arrow(
        attach_fake_payload(load_table(spark, sf, "documents"))
    )


def q_text_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Classifier inference over the corpus (operators.text
    .hashed_linear_score): hashing-trick features, broadcast weight vector,
    sigmoid score, keep decision -- the model-based quality filter's exact
    plan shape with md5-derived stand-in weights (trained weights slot in
    as a parquet read; the plan does not change). Fully JVM-side, exact
    DuckDB oracle."""
    from .operators.text import hashed_linear_score

    return hashed_linear_score(load_table(spark, sf, "documents"))


def q_join_key_skew_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-key skew audit (operators.audit.key_skew_profile) across the
    engine's four hottest join/partition keys -- the diagnostic run BEFORE
    committing a partitioning at scale. Each profile is a map-side-combined
    key count reduced to one summary row (n_keys, max/avg key rows, skew
    ratio, deterministic top key); the union is 4 rows total."""
    from .operators.audit import key_skew_profile

    profiles = [
        key_skew_profile(load_table(spark, sf, "lineitem"), "lineitem", "l_suppkey"),
        key_skew_profile(load_table(spark, sf, "orders"), "orders", "o_custkey"),
        key_skew_profile(load_table(spark, sf, "events"), "events", "user_id"),
        key_skew_profile(load_table(spark, sf, "documents"), "documents", "lang"),
    ]
    out = profiles[0]
    for pr in profiles[1:]:
        out = out.unionByName(pr)
    return out


def q_part_entity_resolution(spark: SparkSession, sf: str) -> DataFrame:
    """Entity resolution end-to-end, the capstone composition: prefix-filter
    SSJoin candidate pairs (block=2 pair keys) -> connected components
    (min-label, checkpointed loop) -> one GOLDEN RECORD per resolved entity
    (the min-id member's name, member count, price spread). The classic
    record-linkage pipeline -- blocking, matching, clustering, canonical-
    ization -- each stage an already-oracle-checked operator; here their
    composition is oracle-checked too (DuckDB: all-pairs Jaccard + recursive
    transitive closure). Only multi-member entities are emitted."""
    from .operators.dedup import connected_components, prefix_filter_jaccard_join

    part = load_table(spark, sf, "part")
    # spread=True on the SSJoin branch only (r15, same rationale as
    # part_set_similarity_join: the tokenize+explode+self-join pipeline is
    # exact int/string math); the price-aggregating members branch keeps
    # the unspread load so avg(p_retailprice)'s sum order is unchanged
    profiled = load_table(spark, sf, "part", spread=True).select(
        "p_partkey",
        F.concat_ws(
            " ", "p_name", "p_brand", "p_type", F.col("p_size").cast("string")
        ).alias("profile"),
    )
    pairs = prefix_filter_jaccard_join(
        profiled, threshold=0.6, id_col="p_partkey", text_col="profile", block=2
    )
    cc = connected_components(
        part.select("p_partkey"),
        pairs,
        node_col="p_partkey",
        pair_cols=("id_a", "id_b"),
        # the size-adaptive dispatch every other CC caller ships (r15 --
        # this row ran the distributed loop's ~180 driver-coordinated
        # jobs on a 20k-node graph): under the cap, one bounded Arrow
        # fetch + driver union-find; a 100 TB part catalog exceeds it
        # and runs the distributed loop unchanged
        local_threshold=100_000,
    )
    members = cc.join(
        part.select("p_partkey", "p_retailprice"), "p_partkey"
    )
    canon = part.select(
        F.col("p_partkey").alias("cluster_id"), F.col("p_name").alias("canonical_name")
    )
    return (
        members.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
        )
        .filter(F.col("n_members") >= 2)
        .join(F.broadcast(canon), "cluster_id")
    )


def q_corpus_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """BPE tokenizer training (operators.bpe.train_bpe), first 3 learned
    merges over the corpus -- an ITERATIVE distributed algorithm with a
    driver-checkable oracle: DuckDB unrolls the 3 rounds as chained CTEs
    (pair-count agg -> argmax -> list_reduce fold merge), so the learned
    merge sequence is pinned exactly, tie-breaks and greedy overlap
    semantics included. Each Spark round touches only the vocabulary
    table and collects ONE row (the argmax pair)."""
    from .operators.bpe import train_bpe

    merges, _ = train_bpe(load_table(spark, sf, "documents"), n_merges=3)
    return _arrow_local_frame(spark, 
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "round long, merge_left string, merge_right string, pair_count long",
    )


def q_corpus_bpe_compression(spark: SparkSession, sf: str) -> DataFrame:
    """Tokens-per-word distribution AFTER the 3 learned BPE merges
    (operators.bpe.bpe_segment_stats) -- the compression accounting
    tokenizer training optimizes. Oracle = the same unrolled-round CTEs as
    corpus_bpe_merges, read out at the final vocab state."""
    from .operators.bpe import bpe_segment_stats, train_bpe

    _, vocab = train_bpe(load_table(spark, sf, "documents"), n_merges=3)
    return bpe_segment_stats(vocab)


def q_orders_price_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width histogram (the profiling family's last gap): 10 bins over
    [min, max] of order value, with bin bounds and counts. The bounds come
    from a 1-row broadcast aggregate (plan stays lazy), binning is a
    map-side expression, the count is a 10-key agg -- the whole thing is
    one scan + one tiny shuffle at any scale. Bin edges are identical
    IEEE-double arithmetic in both engines, so assignment is
    deterministic."""
    orders = load_table(spark, sf, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(9),
            F.floor((F.col("o_totalprice") - F.col("lo")) * 10.0 / (F.col("hi") - F.col("lo"))),
        ).cast("long").alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("bin").agg(
        F.round(F.first("lo") + F.col("bin") * (F.first("hi") - F.first("lo")) / 10.0, 4).alias("bin_lo"),
        F.round(F.first("lo") + (F.col("bin") + 1) * (F.first("hi") - F.first("lo")) / 10.0, 4).alias("bin_hi"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


def q_embedding_ivf_index_search(spark: SparkSession, sf: str) -> DataFrame:
    """Persistent IVF index round-trip (operators.ann_index): build the
    cell-partitioned index on disk (seeded centroids -> deterministic), then
    answer 5 queries through the PERSISTED layout with every cell probed --
    full probe makes the index answer EXACTLY the brute-force top-k, which
    is what the oracle asserts. The storage-pruning contract (partial probe
    reads only probed cells' files) is pinned in tests/test_ann_index.py."""
    from .operators.ann_index import build_ivf_index, query_ivf_index

    emb = load_table(spark, sf, "embeddings")
    idx = _cached_index_dir(
        "ivf", sf, lambda d: build_ivf_index(emb, d, n_centroids=8)
    )
    queries = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < 5).collect()
    ]
    return query_ivf_index(spark, idx, queries, k=10, nprobe=8)


def q_orders_month_spine_recursive(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive CTE (Spark 4.1 WITH RECURSIVE + UNION ALL -- the last
    uncovered SQL construct): a calendar month spine generated IN SQL.
    Anchor = first order month carrying the last month as a bound column
    (no subquery needed in the recursive member), step = add_months(+1)
    until the bound; the monthly order aggregate left-joins onto the spine
    so empty months would surface with zero.

    Scale shape: recursion depth is bounded by the CALENDAR (80 levels
    here, under Spark's default 100-level recursion limit), never by data
    volume -- each level is a 1-row frame. The data-scale work is the
    ordinary monthly agg; the spine join is calendar-cardinality. Cyclic
    graph closure is deliberately NOT expressed this way: Spark recursion
    is UNION ALL-only, so unbounded structures belong to the iterative
    operators (operators.dedup.connected_components)."""
    from .catalog import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        WITH RECURSIVE spine(m, mx) AS (
            SELECT CAST(date_trunc('MM', MIN(o_orderdate)) AS DATE),
                   CAST(date_trunc('MM', MAX(o_orderdate)) AS DATE)
            FROM orders
            UNION ALL
            SELECT add_months(m, 1), mx FROM spine WHERE m < mx
        ),
        agg AS (
            SELECT CAST(date_trunc('MM', o_orderdate) AS DATE) AS m,
                   COUNT(*) AS n, SUM(o_totalprice) AS s
            FROM orders GROUP BY 1
        )
        SELECT date_format(spine.m, 'yyyy-MM') AS month,
               CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_orders,
               ROUND(COALESCE(agg.s, 0.0), 2) AS sum_price
        FROM spine LEFT JOIN agg ON spine.m = agg.m
        """
    )


def q_stream_events_hopping(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming twin of events_hopping_window: readStream ->
    watermark -> 1h/15min sliding window agg -> availableNow drain
    (streaming/jobs.py) -- each event updates 4 windows of state; oracle =
    the same per-window SQL as the batch path."""
    from .streaming.jobs import stream_events_hopping

    return stream_events_hopping(spark, sf)


def q_events_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series resample to daily OHLC bars per event type: open/close via
    min_by/max_by on a deterministic (timestamp, event_id) string key --
    the argmin/argmax aggregate family (uncovered until now), which at
    scale replaces the window-rank idiom with ONE map-side-combinable agg
    and no per-group sort. The composite key makes ties impossible, so the
    answer is engine-stable by construction."""
    ev = load_table(spark, sf, "events")
    key = F.concat_ws(
        "#",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.withColumn("_k", key)
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.min_by("value", F.col("_k")), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", F.col("_k")), 4).alias("close"),
        )
    )


def q_corpus_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """The APPLY side of tokenizer training: train 3 BPE merges on the
    corpus (same pinned sequence as corpus_bpe_merges), then tokenize every
    document under the frozen vocab -- per-doc word and post-merge token
    counts via operators.bpe.bpe_encode_tokens (corpus explodes to doc-word
    multiplicities, vocab BROADCAST-joins, no per-doc Python). The oracle
    reuses the unrolled 3-round merge CTE chain and joins the resulting
    merged vocab back to doc words, so the whole train->apply path is
    dual-engine exact."""
    from .operators.bpe import bpe_encode_tokens, train_bpe

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    _, vocab = train_bpe(docs, 3)
    return bpe_encode_tokens(docs, vocab).orderBy("doc_id")


def q_corpus_length_matched_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-matched resampling (operators.sampling
    .distribution_matched_sample): make the NON-English pool's token-length
    histogram match the English reference's -- per-bucket acceptance
    min(1, ref_share/pool_share) in exact integer ppm, deterministic md5
    draw, fixed-width 20-token buckets capped at 10 so bucketing is
    engine-exact. Returns the per-bucket accounting the curation report
    would publish."""
    from .operators.sampling import distribution_matched_sample

    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.least(
            F.lit(10),
            F.expr(r"size(split(trim(text), '\\s+')) div 20"),
        )
        .cast("long")
        .alias("bucket"),
    )
    return distribution_matched_sample(
        docs.filter(F.col("lang") != "en"),
        docs.filter(F.col("lang") == "en"),
    ).orderBy("bucket")


def q_corpus_vocab_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary drift audit between two corpus slices (the
    distribution-shift check a refresh pipeline runs before retraining a
    tokenizer): document-frequency log2-odds ratio of each term between the
    first and second half of the corpus (by doc_id), add-one smoothed, for
    terms appearing in >= 20 docs overall. Top-30 by absolute drift.

    Scale shape: one explode -> (term, half) distinct -> count -- the same
    inverted-index groupBy as tf-idf; halves come from a column predicate,
    never two scans. log-odds on integer df counts is engine-exact; the
    6-dp rounding only trims the division."""
    docs = load_table(spark, sf, "documents")
    # bounded scalar: the exact doc_id median (matches quantile_cont in SQL)
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)").alias("m")).collect()[0]["m"]
    terms = (
        docs.select(
            (F.col("doc_id") > F.lit(mid)).cast("int").alias("half"),
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
            "doc_id",
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    per_half = terms.groupBy("term").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("df_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("df_b"),
    )
    n_a = docs.filter(F.col("doc_id") <= mid).count()
    n_b = docs.filter(F.col("doc_id") > mid).count()
    drift = (
        per_half.filter(F.col("df_a") + F.col("df_b") >= 20)
        .select(
            "term",
            F.col("df_a").cast("long").alias("df_a"),
            F.col("df_b").cast("long").alias("df_b"),
            F.round(
                F.log2(
                    ((F.col("df_b") + 1) / F.lit(float(n_b + 2)))
                    / ((F.col("df_a") + 1) / F.lit(float(n_a + 2)))
                ),
                6,
            ).alias("log2_odds"),
        )
    )
    return (
        drift.orderBy(F.abs("log2_odds").desc(), F.col("term").asc())
        .limit(30)
    )


def q_orders_xml_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """XML source/sink round-trip (Spark 4 native XML, new surface): the
    monthly order mart is written as XML rows and read back under an
    EXPLICIT schema -- values, not just shapes, must survive the format
    hop, so the oracle recomputes the same mart from parquet. The XML
    artifact is built once per (sf, process) like the persisted ANN
    indexes (no tempdir leak); Avro stays an honestly-documented gap (the
    external avro module jar is not in this container)."""
    from .io.sources import read_xml, write_xml
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    def build(d: str) -> None:
        mart = (
            load_table(spark, sf, "orders")
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast(
                        "double"
                    ),
                    2,
                ).alias("total_price"),
            )
        )
        write_xml(mart, d + "/mart", row_tag="month_row")

    d = _cached_index_dir("xml", sf, build)
    schema = StructType(
        [
            StructField("month", StringType()),
            StructField("n_orders", LongType()),
            StructField("total_price", DoubleType()),
        ]
    )
    return read_xml(spark, d + "/mart", row_tag="month_row", schema=schema).orderBy(
        "month"
    )


def q_events_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly-seasonality decomposition of the event stream (the additive
    model's first two terms): per (event_type, day) counts split into the
    weekday seasonal mean and the residual -- the de-seasonalized series an
    anomaly detector (see events_cusum_alerts) should consume instead of
    raw counts. Pure window arithmetic: one agg to daily grain, one
    partition-mean window over (type, weekday); integer count sums are
    exact so the 4-dp rounding is engine-invariant."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = Window.partitionBy("event_type", F.dayofweek("day"))
    return daily.select(
        "day",
        "event_type",
        F.dayofweek("day").cast("long").alias("weekday"),
        "n_events",
        F.round(F.avg("n_events").over(w), 4).alias("seasonal"),
        F.round(F.col("n_events") - F.avg("n_events").over(w), 4).alias(
            "residual"
        ),
    )


def q_region_top_customers_lateral(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 3.4+ SQL surface, previously
    uncovered): per-region top-2 customers by lifetime spend, expressed as
    `FROM region, LATERAL (... WHERE correlated ... ORDER BY ... LIMIT 2)`
    -- the SQL twin of a partitioned window top-k. Catalyst decorrelates
    the limit into a per-region rank, so the physical plan is the same
    shuffle-once window as the DataFrame form, not a per-region re-scan.
    Decimal spend accumulation keeps the 2-dp sums partitioning-invariant
    (same policy as nation_trade_matrix)."""
    from .catalog import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        SELECT r.r_name, t.c_name, t.spend
        FROM region r,
        LATERAL (
            SELECT c.c_name,
                   CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 2)
                        AS DOUBLE) AS spend
            FROM customer c
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN orders o ON o.o_custkey = c.c_custkey
            WHERE n.n_regionkey = r.r_regionkey
            GROUP BY c.c_name
            ORDER BY spend DESC, c.c_name
            LIMIT 2
        ) t
        ORDER BY r.r_name, t.spend DESC, t.c_name
        """
    )


def q_nations_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted PageRank over the international trade graph: edges are
    (supplier nation -> customer nation, total revenue), ranks from
    operators.graph.weighted_pagerank (3 message-passing rounds, damping
    0.85, 12-dp quantization so the oracle's unrolled recurrence lands on
    identical doubles). The graph-analytics twin of the connected-components
    family: same edges⋈state-per-round shuffle shape, exact dual-engine
    oracle via 3 unrolled iterations in SQL."""
    from .operators.graph import weighted_pagerank

    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    supplier = load_table(spark, sf, "supplier")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")

    supp_nation = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select(F.col("s_suppkey"), F.col("n_name").alias("src"))
    cust_nation = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(F.col("c_custkey"), F.col("n_name").alias("dst"))
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cust_nation), orders.o_custkey == F.col("c_custkey"))
        .groupBy("src", "dst")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ).cast("double"),
                2,
            ).alias("weight")
        )
    )
    # local_threshold (r14): the rank loop runs over the NATION-contracted
    # graph, <= 25x25 edges by construction at ANY fact scale -- the
    # fact-scale work is the edge build above, which stays distributed;
    # the bounded contracted loop dispatches driver-local (the CC pattern)
    ranks = weighted_pagerank(
        edges, n_iter=3, damping=0.85, local_threshold=100_000
    )
    return ranks.select(
        F.col("node").alias("n_name"), F.round("rank", 6).alias("pagerank")
    ).orderBy("n_name")


def q_corpus_bpe_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer fertility by language (tokens per word under the frozen
    3-merge vocab) -- the multilingual-equity number a tokenizer report
    publishes: a language whose fertility runs high pays more sequence
    length per word of content. Same train->apply path as
    corpus_bpe_encode, rolled up per language; integer token/word sums are
    exact, so only the final ratio carries the 6-dp rounding."""
    from .operators.bpe import bpe_encode_tokens, train_bpe

    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "text")
    _, vocab = train_bpe(docs, 3)
    per_doc = bpe_encode_tokens(docs, vocab)
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.sum("n_tokens") / F.sum("n_words"), 6).alias("fertility"),
        )
        .orderBy("lang")
    )


def q_multimodal_png_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL compressed-image decode end-to-end with zero image libraries:
    each doc's text bytes become an 8x4 truecolor PNG (DEFLATE via stdlib
    zlib), and operators.multimodal.real_png_meta inflates + unfilters the
    scanlines back to exact per-channel means. PNG is lossless, so this
    carries the SAME exact dual-engine oracle as the BMP path (the oracle
    recomputes channel means straight from the text bytes) -- the
    'compressed formats need PIL' stub is now only about JPEG's lossy
    codecs, not about compression per se."""
    import numpy as np

    from .operators.multimodal import encode_png, real_png_meta

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_png(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                px = np.resize(b, 96).reshape(4, 8, 3)  # cycles if short
                rows.append((doc_id, "image", bytearray(encode_png(px))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_png, "doc_id long, media_type string, payload binary"
    )
    return real_png_meta(with_payload).select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_r",
        "mean_g",
        "mean_b",
    )


def q_multimodal_jpeg_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL lossy-image codec end-to-end in pure numpy (operators.jpeg):
    each doc's text bytes become an 8x8 RGB tile, baseline-JPEG encoded at
    quality 95 (DCT -> quantize -> Huffman, tables written to DHT) and
    decoded back by our own stream-driven decoder. Lossy output is not
    SQL-reproducible, so the oracle is a WITHIN-BOUNDS contract (the same
    pattern as the sketch queries): decoded per-channel means must sit
    within 3/255 of the true byte means, which bounds DC quantization error
    plus color-space round-trip -- a broken Huffman table, zigzag, IDCT or
    YCbCr matrix blows far past it. Dims come from the decoded SOF0 header.

    Arrow-batched mapInPandas; payloads never shuffle decoded."""
    import numpy as np

    from .operators.jpeg import decode_jpeg, encode_jpeg

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def roundtrip(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                px = np.resize(b, 192).reshape(8, 8, 3)
                dec = decode_jpeg(encode_jpeg(px, quality=95))
                true_means = px.reshape(-1, 3).mean(axis=0)
                got_means = dec.reshape(-1, 3).mean(axis=0)
                ok = np.abs(got_means - true_means) <= 3.0
                rows.append(
                    (
                        doc_id,
                        int(dec.shape[1]),
                        int(dec.shape[0]),
                        bool(ok[0]),
                        bool(ok[1]),
                        bool(ok[2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "r_ok", "g_ok", "b_ok"],
            )

    return docs.mapInPandas(
        roundtrip,
        "doc_id long, width long, height long, "
        "r_ok boolean, g_ok boolean, b_ok boolean",
    )


def q_nations_pagerank_converged(spark: SparkSession, sf: str) -> DataFrame:
    """Production-parity PageRank over the same trade graph as
    nations_pagerank: dangling mass redistributed (ranks sum to 1),
    epsilon convergence stop instead of a fixed round count,
    localCheckpoint lineage truncation. The raw rank values are not
    SQL-expressible (data-dependent round count), so the registered output
    is the CONTRACT shape (same trick as the HLL / IVF rows): per graph
    node, boolean witnesses that the stochastic-matrix model actually held
    -- rank strictly inside (0, 1), ranks summing to 1 (the property the
    leaking fixed-round twin does NOT have), and convergence before the
    round cap. The DuckDB oracle recomputes the node set from the edges
    and asserts every flag true, making the row hash-checkable; the rank
    VALUES are pinned by the numpy power-iteration parity test
    (tests/test_operators_unit.py) and the 3-round twin's exact oracle.
    The operator's check_every dial (round 13) can batch K lazy rank
    updates per driver action for long-converging graphs; this trade
    graph converges in 5-6 rounds (measured), so batching pays an extra
    sub-eps round for nothing -- the registered row stays per-round
    (same-session A/B: K=3 read 17.9 s vs K=1's 12.5 warm at sf0.1)."""
    from .operators.graph import weighted_pagerank_converged

    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    supplier = load_table(spark, sf, "supplier")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")

    supp_nation = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select(F.col("s_suppkey"), F.col("n_name").alias("src"))
    cust_nation = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(F.col("c_custkey"), F.col("n_name").alias("dst"))
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cust_nation), orders.o_custkey == F.col("c_custkey"))
        .groupBy("src", "dst")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ).cast("double"),
                2,
            ).alias("weight")
        )
    )
    # local_threshold (r14): the convergence loop runs over the NATION-
    # contracted graph (<= 25x25 edges at any fact scale); the fact-scale
    # edge build stays distributed, the bounded loop dispatches driver-
    # local -- the job-count-heaviest row drops its per-round barriers
    ranks = weighted_pagerank_converged(
        edges, eps=1e-9, max_iter=50, local_threshold=100_000
    )
    # node-sized global window (25 nations): the sum-to-one witness
    total = F.sum("rank").over(Window.partitionBy())
    return ranks.select(
        F.col("node").alias("n_name"),
        ((F.col("rank") > 0) & (F.col("rank") < 1)).alias("rank_in_unit"),
        (F.abs(total - F.lit(1.0)) < 1e-6).alias("sum_to_one"),
        (F.col("n_rounds") < F.lit(50)).alias("converged"),
    )


def q_corpus_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-document exact substring dedup (Lee et al. 2021 ExactSubstr,
    distributed): maximal token spans whose every 8-token window repeats
    somewhere in the corpus -- the spans the suffix-array stage would cut.
    See operators.dedup.substring_dedup_spans for the
    inverted-index + gaps-and-islands shape."""
    from .operators.dedup import substring_dedup_spans

    return substring_dedup_spans(load_table(spark, sf, "documents"), k=8)


def q_corpus_substring_dedup_apply(spark: SparkSession, sf: str) -> DataFrame:
    """The ExactSubstr APPLY side: every document rebuilt with its
    duplicated >= 8-token spans cut (operators.dedup.substring_dedup_apply)
    -- cleaned text + removal accounting, docs without spans pass
    through."""
    from .operators.dedup import substring_dedup_apply

    return substring_dedup_apply(load_table(spark, sf, "documents"), k=8)


def q_corpus_dsir_select(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): select the 100 pool
    docs (source != src0) whose hashed unigram+bigram distribution is most
    target-like (source == src0), Gumbel-top-k on the importance weight
    with the deterministic md5 draw
    (operators.sampling.dsir_select)."""
    from .operators.sampling import dsir_select

    docs = load_table(spark, sf, "documents")
    return dsir_select(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        k=100,
    )


def q_multimodal_audio_spectrogram(spark: SparkSession, sf: str) -> DataFrame:
    """Short-time spectrum features over REAL decoded WAV audio: the same
    64-sample PCM payloads as multimodal_wav_decode, framed into 4 Hann-
    windowed 16-sample windows, per-frame one-sided DFT -> energy (dB) +
    spectral centroid (operators.multimodal.audio_spectrogram). Oracle
    recomputes the DFT as an explicit sum-of-cos/sin over the same text
    bytes."""
    import numpy as np

    from .operators.multimodal import audio_spectrogram, encode_wav

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_wav(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                samples = np.resize(b, 64).astype(np.int16) - 128
                rows.append((doc_id, "audio", bytearray(encode_wav(samples, 8000, 1))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_wav, "doc_id long, media_type string, payload binary"
    )
    return audio_spectrogram(with_payload, frame_len=16)


def q_multimodal_shot_boundaries(spark: SparkSession, sf: str) -> DataFrame:
    """Shot-boundary detection over REAL decoded y4m video: 6-frame 8x4
    streams where frame f's luma is the text bytes rolled by f*16 --
    INVERTED (255-b) from frame 3 on, planting exactly one scene cut --
    then operators.multimodal.video_shot_boundaries computes consecutive-
    frame mean-abs-luma-diff + cut flags from the DECODED planes. Oracle
    recomputes every pixel pair in SQL."""
    import numpy as np

    from .operators.multimodal import encode_y4m, video_shot_boundaries

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_y4m(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                frames = []
                for f in range(6):
                    y = np.resize(np.roll(b, -(f * 16)), 32).reshape(4, 8)
                    frames.append(255 - y if f >= 3 else y)
                rows.append((doc_id, "video", bytearray(encode_y4m(frames))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_y4m, "doc_id long, media_type string, payload binary"
    )
    return video_shot_boundaries(with_payload, threshold=64.0)


def q_embedding_pca(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed PCA accuracy CONTRACT (operators.similarity.pca_fit /
    pca_project): moments accumulate in ONE Arrow pass (numpy X^T X per
    batch, driver fetch bounded by partition count), eigh runs driver-side
    on the 64x64 covariance, projection is map-only JVM literals. The
    contract ties the two phases together end-to-end: the DISTRIBUTED
    variance of each projected component must equal its eigenvalue
    (rel err <= 1e-6), components orthonormal, eigenvalues descending,
    exact n. Projected values themselves are not oracle-comparable --
    partial-sum order perturbs eigenvectors at ~1e-13, which 4-dp rounding
    could flip -- so the witness is the variance identity, not the floats."""
    import numpy as np

    from .operators.similarity import pca_fit, pca_project

    emb = load_table(spark, sf, "embeddings")
    comps, eigvals, mu, _n = pca_fit(emb, k=4)
    mono = bool(np.all(np.diff(eigvals) <= 1e-12))
    ortho = bool(np.abs(comps @ comps.T - np.eye(len(comps))).max() < 1e-8)
    proj = pca_project(emb, comps, mu)
    agg = proj.agg(
        F.count("*").alias("n"),
        *[F.var_samp(f"pc{i}").alias(f"v{i}") for i in range(4)],
    )
    per_comp = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("component"),
                (
                    F.abs(F.col(f"v{i}") - F.lit(float(eigvals[i])))
                    <= F.lit(float(max(eigvals[i], 1e-12)) * 1e-6)
                ).alias("proj_var_matches"),
            )
            for i in range(4)
        ]
    )
    return (
        agg.select(F.col("n").cast("long").alias("n_vectors"), F.explode(per_comp).alias("c"))
        .select(
            F.col("c.component").alias("component"),
            "n_vectors",
            F.lit(mono).alias("eig_monotone"),
            F.lit(ortho).alias("orthonormal_ok"),
            F.col("c.proj_var_matches").alias("proj_var_matches"),
        )
    )


def q_embedding_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining (operators.similarity.hard_negatives): per
    anchor, the 3 most-cosine-similar DIFFERENT-label vectors from the
    sign-LSH banded candidate space -- the contrastive-training pair-mining
    stage. Oracle reproduces band semantics, symmetrization, label filter
    and the (rounded-cosine, id) ranking exactly."""
    from .operators.similarity import hard_negatives

    return hard_negatives(load_table(spark, sf, "embeddings"), k=3)


def q_embedding_pca_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental PCA maintenance CONTRACT
    (operators.similarity.pca_moments/pca_merge_moments/pca_from_moments):
    the moment statistics are associative, so fitting from
    moments(old half) + moments(appended half) must reproduce the
    full-corpus fit -- refreshing the PCA for an appended batch costs one
    pass over the NEW rows only. Witnesses per component: eigenvalue
    within 1e-9 relative of the full fit, |cos(component_inc,
    component_full)| >= 1 - 1e-9, and the exact merged row count."""
    import numpy as np

    from .operators.similarity import (
        pca_from_moments,
        pca_merge_moments,
        pca_moments,
    )

    emb = load_table(spark, sf, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    merged = pca_merge_moments(pca_moments(old), pca_moments(new))
    ci, ei, _mi, ni = pca_from_moments(*merged, k=4)
    cf, ef, _mf, nf = pca_from_moments(*pca_moments(emb), k=4)
    rows = [
        (
            i,
            ni,
            bool(abs(ei[i] - ef[i]) <= max(abs(ef[i]), 1e-12) * 1e-9),
            bool(abs(float(np.dot(ci[i], cf[i]))) >= 1.0 - 1e-9),
        )
        for i in range(4)
    ]
    return _arrow_local_frame(spark, 
        rows,
        "component long, n_vectors long, eig_matches boolean, component_aligned boolean",
    ).filter(F.lit(ni == nf))


def q_corpus_distinct_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-n diversity audit (the distinct-1/distinct-2 metric of
    Li et al. 2016, arXiv:1510.03055) per source: unique-to-total unigram
    and bigram ratios -- low values flag a TEMPLATED or self-repetitive
    slice of the corpus before it floods the training mixture. Two
    explode->groupBy passes with map-side-combined distincts; source
    cardinality output."""
    from .operators.text import tokens

    docs = load_table(spark, sf, "documents")
    toks = docs.select("source", tokens(F.col("text")).alias("t"))
    uni = toks.select("source", F.explode("t").alias("g"))
    bi = toks.filter(F.size("t") >= 2).select(
        "source",
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> concat(t[i - 1], ' ', t[i]))")
        ).alias("g"),
    )

    def ratios(g: DataFrame, pfx: str) -> DataFrame:
        return g.groupBy("source").agg(
            F.count(F.lit(1)).alias(f"n_{pfx}"),
            F.count_distinct("g").alias(f"distinct_{pfx}"),
            F.round(F.count_distinct("g") / F.count(F.lit(1)), 6).alias(
                f"{pfx}_diversity"
            ),
        )

    return ratios(uni, "unigrams").join(ratios(bi, "bigrams"), "source")


def q_corpus_substring_dedup_keep_first(spark: SparkSession, sf: str) -> DataFrame:
    """ExactSubstr keep-first spans (operators.dedup.substring_dedup_spans
    with keep_first=True): duplicated >= 8-token passages flagged
    everywhere EXCEPT their canonical (min doc_id, pos) occurrence, so one
    copy survives the cut -- dedup, not deletion."""
    from .operators.dedup import substring_dedup_spans

    return substring_dedup_spans(
        load_table(spark, sf, "documents"), k=8, keep_first=True
    )


def q_corpus_substring_dedup_apply_keep_first(
    spark: SparkSession, sf: str
) -> DataFrame:
    """ExactSubstr keep-first APPLY: rebuild every document cutting only
    the NON-canonical copies of duplicated >= 8-token passages -- the
    cleaned corpus retains exactly one copy of each
    (operators.dedup.substring_dedup_apply with keep_first=True)."""
    from .operators.dedup import substring_dedup_apply

    return substring_dedup_apply(
        load_table(spark, sf, "documents"), k=8, keep_first=True
    )


def q_multimodal_audio_segments(spark: SparkSession, sf: str) -> DataFrame:
    """Energy-VAD activity segments over the same real WAV payloads as the
    spectrogram query (operators.multimodal.audio_activity_segments):
    frames above 51 dB (the corpus median) merge into per-doc (start, end) segments via
    gaps-and-islands. Oracle recomputes the DFT energies and the island
    merge in SQL, thresholding the same 4-dp-rounded value."""
    import numpy as np

    from .operators.multimodal import audio_activity_segments, encode_wav

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_wav(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                samples = np.resize(b, 64).astype(np.int16) - 128
                rows.append((doc_id, "audio", bytearray(encode_wav(samples, 8000, 1))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_wav, "doc_id long, media_type string, payload binary"
    )
    return audio_activity_segments(with_payload, threshold_db=51.0)


def q_embedding_kmeans_parallel(spark: SparkSession, sf: str) -> DataFrame:
    """k-means|| quantizer CONTRACT
    (operators.similarity.kmeans_parallel_centroids, Bahmani et al. 2012):
    the md5-deterministic oversampled init + driver Lloyd must produce a
    STRICTLY better coarse quantizer than the first-k-by-id seeded
    baseline -- witnesses: exactly k centroids, all unit-norm (spherical
    contract), and mean quantization cost (1 - max cosine) below the
    seeded quantizer's on the same corpus. Everything is deterministic
    (hash draws, seeded numpy), so the comparison is a stable fact of the
    dataset, not a flaky benchmark."""
    import numpy as np

    from .operators.similarity import (
        ivf_assign,
        kmeans_parallel_centroids,
        seeded_centroids,
    )

    emb = load_table(spark, sf, "embeddings")
    k = 8

    def mean_cost(centroids) -> float:
        assigned = ivf_assign(emb, k, centroids=centroids)
        cent = centroids.withColumnRenamed("cent_id", "cell")
        from .operators.similarity import cosine

        return (
            assigned.join(F.broadcast(cent), "cell")
            .agg(F.avg(1.0 - cosine(F.col("cv"), F.col("embedding"))))
            .collect()[0][0]
        )

    par = kmeans_parallel_centroids(emb, k)
    rows = par.collect()
    norms = [float(np.linalg.norm(r["cv"])) for r in rows]
    cost_par = mean_cost(par)
    cost_seeded = mean_cost(seeded_centroids(emb, k))
    return _arrow_local_frame(spark, 
        [
            (
                len(rows),
                bool(all(abs(n - 1.0) < 1e-6 for n in norms)),
                bool(cost_par < cost_seeded),
            )
        ],
        "n_centroids long, all_unit_norm boolean, beats_seeded boolean",
    )


def q_multimodal_image_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Image-level dedup via dHash over REAL decoded 8x9 BMPs
    (operators.multimodal.image_dhash_dedup): perceptual gradient
    fingerprints collide for identical/near-identical images, turning
    media dedup into the text-exact-dedup hash-groupBy shape -- pixels
    never shuffle. Oracle recomputes the integer luma + gradient bits per
    pixel pair in SQL."""
    import numpy as np

    from .operators.multimodal import encode_bmp, image_dhash_dedup

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_bmp(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                px = np.resize(b, 216).reshape(8, 9, 3)
                rows.append((doc_id, "image", bytearray(encode_bmp(px))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_bmp, "doc_id long, media_type string, payload binary"
    )
    return image_dhash_dedup(with_payload)


def q_multimodal_image_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Near-exact image matching by banded hamming distance over packed
    64-bit dHashes (operators.multimodal.image_near_dup_hamming): each
    document yields its 8x9 BMP plus a PERTURBED variant (first pixel's
    red channel +96 mod 256 -- a one-gradient-bit brightness nudge), and
    the operator must recover every (original, variant) pair plus the
    exact-text dup cross-pairs at hamming <= 3. Candidates from an
    equi-join on any shared 16-bit band of the BIGINT fingerprint
    (SimHash pigeonhole: hamming <= 3 over 4 bands guarantees a shared
    band -- recall 1.0, never all-pairs), exact bit_count(xor) rerank.
    Oracle recomputes both fingerprints and the band join in SQL."""
    import numpy as np

    from .operators.multimodal import encode_bmp, image_near_dup_hamming

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_bmp(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                px = np.resize(b, 216).reshape(8, 9, 3)
                rows.append((2 * doc_id, "image", bytearray(encode_bmp(px))))
                px2 = px.copy()
                px2[0, 0, 0] = (int(px2[0, 0, 0]) + 96) % 256
                rows.append(
                    (2 * doc_id + 1, "image", bytearray(encode_bmp(px2)))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_bmp, "doc_id long, media_type string, payload binary"
    )
    return image_near_dup_hamming(with_payload, max_hamming=3)


def q_multimodal_shot_keyframes(spark: SparkSession, sf: str) -> DataFrame:
    """Shot segmentation + keyframe selection over the same 6-frame
    planted-cut videos as multimodal_shot_boundaries
    (operators.multimodal.shot_keyframes): cut flags split each stream
    into shots, the middle frame of each shot is the representative.
    Oracle recomputes cuts then the running-sum segmentation in SQL."""
    import numpy as np

    from .operators.multimodal import encode_y4m, shot_keyframes

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_y4m(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                frames = []
                for f in range(6):
                    y = np.resize(np.roll(b, -(f * 16)), 32).reshape(4, 8)
                    frames.append(255 - y if f >= 3 else y)
                rows.append((doc_id, "video", bytearray(encode_y4m(frames))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_y4m, "doc_id long, media_type string, payload binary"
    )
    return shot_keyframes(with_payload, threshold=64.0)


def q_stream_embedding_pca(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming PCA maintenance CONTRACT
    (streaming.jobs.stream_pca_maintenance): moment statistics accumulate
    per micro-batch (idempotent per-batch-id state files, exactly-once
    under replay), and the streamed fit must equal the full-corpus batch
    fit. n_batches >= 2 is part of the witness -- the drain really was
    multi-batch."""
    from .streaming.jobs import stream_pca_maintenance

    return stream_pca_maintenance(spark, sf)


def q_corpus_skipgram_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Skip-gram pair generation (operators.text.skipgram_pairs): corpus-
    wide (center, context) counts in a +-2 token window -- the word2vec
    data-prep stage; pair generation is one map-only higher-order
    expression, the only shuffle is the vocab^2-bounded count agg."""
    from .operators.text import skipgram_pairs

    return skipgram_pairs(load_table(spark, sf, "documents"), window=2)


def q_orders_target_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe mean target encoding
    (operators.analytics.target_encode): o_orderpriority encoded against
    the o_totalprice target -- smoothed category mean (prior m=10 toward
    the global mean) plus the leave-one-out value each row trains on.
    One category-cardinality agg broadcast back; the row pass is
    map-only."""
    from .operators.analytics import target_encode

    orders = load_table(spark, sf, "orders")
    return target_encode(orders, "o_orderpriority", "o_totalprice").select(
        "o_orderkey", "o_orderpriority", "te_encoded", "te_loo"
    )


def q_multimodal_video_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Video near-dup pairs by frame-fingerprint overlap
    (operators.multimodal.video_frame_hash_dedup) over the same 6-frame
    planted-cut videos: videos sharing >= 3 of their frame dHashes are
    near-duplicates (exact text dups share all 6). Inverted-index
    equi-join on the hash, stop-frame max_df guard; pixels never shuffle.
    Oracle recomputes luma gradient hashes per frame in SQL."""
    import numpy as np

    from .operators.multimodal import encode_y4m, video_frame_hash_dedup

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def to_y4m(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                frames = []
                for f in range(6):
                    y = np.resize(np.roll(b, -(f * 16)), 32).reshape(4, 8)
                    frames.append(255 - y if f >= 3 else y)
                rows.append((doc_id, "video", bytearray(encode_y4m(frames))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    with_payload = docs.mapInPandas(
        to_y4m, "doc_id long, media_type string, payload binary"
    )
    return video_frame_hash_dedup(with_payload, min_shared=3)


def q_corpus_negative_sampling_table(spark: SparkSession, sf: str) -> DataFrame:
    """SGNS negative-sampling table (Mikolov et al. 2013): unigram counts
    raised to the 3/4 power, normalized, with the cumulative distribution
    in token order -- the lookup table word2vec training draws negatives
    from. One token-count agg (vocab-bounded) + one vocab-sized window
    cumsum; the corpus shuffles token strings once."""
    from .operators.text import tokens

    docs = load_table(spark, sf, "documents")
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum(F.pow("n", 0.75))).collect()[0][0]
    w = Window.orderBy("token").rowsBetween(Window.unboundedPreceding, 0)
    return counts.select(
        "token",
        "n",
        F.round(F.pow("n", 0.75) / F.lit(float(total)), 6).alias("p_neg"),
        F.round(
            F.sum(F.pow("n", 0.75)).over(w) / F.lit(float(total)), 6
        ).alias("cum_p"),
    )


def q_customer_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation, market segment):
    equivalence-class sizes and the at-risk flag (class < k = 5) -- the
    governance check run before releasing joined training data containing
    demographic columns (Sweeney 2002). One groupBy on the
    quasi-identifier tuple; class-cardinality output."""
    cust = load_table(spark, sf, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < 5)
    )


def q_stream_events_session_native(spark: SparkSession, sf: str) -> DataFrame:
    """Native streaming session windows
    (streaming.jobs.stream_events_session_native): built-in
    F.session_window in a watermarked streaming agg, state = open sessions
    only; the availableNow drain equals the batch session_window answer
    row-for-row (shared oracle)."""
    from .streaming.jobs import stream_events_session_native

    return stream_events_session_native(spark, sf)


def q_corpus_dsir_quality(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR quality audit (operators.sampling.dsir_quality): at 25%
    selection pressure, the selected docs' hashed-ngram distribution must
    be closer (exact smoothed KL over all 4096 buckets) to the target
    than a size-matched deterministic random sample's -- the
    distribution-shift claim of Xie et al. 2023 itself, not just oracle
    parity of the selection. Contract row; measured KLs (including the
    fixed-k overshoot regime) are tracked in PERF.md."""
    from .operators.sampling import dsir_quality

    docs = load_table(spark, sf, "documents")
    return dsir_quality(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        fraction=0.25,
    )


def q_dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric containment dedup (operators.dedup.containment_pairs):
    directed pairs where >= 80% of one doc's 3-gram shingles appear in
    another's -- the quote/excerpt detector symmetric Jaccard misses when
    a short doc is wholly contained in a long one. Inverted-index
    candidates with the max_df stop-shingle guard; oracle mirrors the
    index join and the per-direction ratio in SQL."""
    from .operators.dedup import containment_pairs

    return containment_pairs(
        load_table(spark, sf, "documents"), n=3, threshold=0.8, max_df=100
    )


def q_corpus_context_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing audit (operators.sampling.context_pack):
    length-bucketed static packing of the corpus into 512-token context
    windows (bucket width 32; per-bucket bin capacity is closed-form, one
    parallel window, no sequential first-fit state), aggregated to
    per-bin (n_docs, sum_tokens, padding) -- the padding-efficiency
    accounting every dataloader pipeline needs. Oracle mirrors the
    row_number binning and padding arithmetic in SQL."""
    from .operators.sampling import context_pack

    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    packed = context_pack(docs, context_len=512, bucket_width=32)
    return (
        packed.groupBy("lbucket", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.greatest(F.lit(0), F.lit(512) - F.sum("n_tokens"))
            .cast("long")
            .alias("padding"),
            F.max(F.col("truncated").cast("int")).cast("boolean").alias("any_truncated"),
        )
    )


def q_corpus_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index per source vs the src0 reference
    (operators.audit.psi_drift): fixed-width n_chars buckets, add-one
    smoothing, PSI > 0.2 alert flag -- the admit-this-crawl-batch
    distribution monitor. One corpus scan; output bounded by sources x
    16 buckets. Oracle mirrors the binning and smoothing in SQL."""
    from .operators.audit import psi_drift

    return psi_drift(
        load_table(spark, sf, "documents"),
        group_col="source",
        reference="src0",
        value_col="n_chars",
    )


def q_dedup_clusters_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental near-dup cluster maintenance
    (operators.dedup.connected_components_incremental): the corpus is
    split into a standing 80% (doc_id % 10 < 8, labels computed as the
    stored artifact) and a 20% "new crawl batch"; only the contracted
    graph -- one node per standing cluster plus the batch -- goes through
    the iterative CC loop with the batch's edges. The hash-checked claim
    is the contraction identity itself: the oracle is dedup_clusters'
    full-recompute recursive CTE VERBATIM, so incremental labels must
    equal a from-scratch run on the union graph, row for row."""
    from .operators.dedup import (
        connected_components,
        connected_components_incremental,
        ngram_jaccard_pairs,
    )

    from .operators._cache import tracked_persist

    docs = load_table(spark, sf, "documents")
    # persist the candidate pairs (r14): the old-old filter feeding the
    # standing CC, the batch filter feeding the incremental merge, and the
    # CC loop's own consumers each re-ran the whole inverted-index
    # candidate join otherwise (guide §1.2)
    pairs = tracked_persist(
        ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_df=100
        ).select("doc_a", "doc_b")
    )
    new_a = F.col("doc_a") % 10 >= 8
    new_b = F.col("doc_b") % 10 >= 8
    old_nodes = docs.filter(F.col("doc_id") % 10 < 8).select("doc_id")
    new_nodes = docs.filter(F.col("doc_id") % 10 >= 8).select("doc_id")
    # the standing build takes the same size-adaptive dispatch the merge
    # has shipped since r10 (r14): under the threshold, one bounded Arrow
    # fetch + driver-local union-find replaces ~8 loop jobs; a real corpus
    # exceeds it and runs the distributed loop unchanged
    old_labels = connected_components(
        old_nodes, pairs.filter(~new_a & ~new_b), local_threshold=100_000
    )
    inc = connected_components_incremental(
        old_labels, new_nodes, pairs.filter(new_a | new_b)
    )
    return inc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("is_keeper"),
    )


def q_retrieval_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking-quality accounting for the lexical path: NDCG@10 of the
    BM25 ranking against term-coverage graded relevance (rel(d) =
    distinct query terms present -- deterministic ground truth), the
    retrieval twin of the ANN recall rows. DCG over the BM25 top-10,
    IDCG over the corpus-wide ideal ordering by relevance; everything is
    closed-form arithmetic, so the oracle recomputes NDCG exactly. BM25
    ranks by ROUNDED score with doc_id tie-break, so rank order -- and
    hence DCG -- is engine-stable."""
    from .operators.ranking import bm25_topk

    # spread=False (r14, measured): both consumers (BM25 top-10 and the
    # term-coverage grading) are query-term-sized explodes; each branch
    # paid its own full-text exchange under the spread for map work too
    # light to amortize it (interleaved A/B: 2.38 vs 1.14 s median)
    docs = load_table(spark, sf, "documents", spread=False)
    # 'dup' is the corpus's one genuinely rare term (df 25/500 at sf0.01
    # vs ~380 for the rest of the vocab): coverage grades actually vary
    # (11 docs carry all three, 297 two, 147 one), so the metric
    # discriminates -- with three common terms every top doc hits rel 3
    # and NDCG degenerates to 1.0
    terms = ["dup", "key", "fast"]
    terms_arr = F.array(*[F.lit(t) for t in terms])
    top = bm25_topk(docs, terms, k=10)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1
    disc = F.log2(F.col("rank") + 1)
    ranked = top.withColumn("rank", F.row_number().over(w)).withColumn(
        "rel", F.col("n_terms_matched").cast("double")
    )
    dcg = ranked.agg(F.sum(gain / disc).alias("dcg"))
    from .operators.text import tokens as _tokens

    rel_all = docs.select(
        "doc_id",
        F.size(
            F.array_intersect(
                F.array_distinct(_tokens(F.lower(F.col("text")))), terms_arr
            )
        )
        .cast("double")
        .alias("rel"),
    ).filter(F.col("rel") > 0)
    ideal = rel_all.orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    ).limit(10).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("rel").desc(), F.col("doc_id").asc())
        ),
    )
    idcg = ideal.agg(F.sum(gain / disc).alias("idcg"))
    return (
        dcg.crossJoin(idcg)
        .select(
            F.lit(10).cast("long").alias("k"),
            F.round("dcg", 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )


def q_events_ab_test(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion z-test over a deterministic experiment split -- the
    A/B readout every event pipeline ends in: users bucket by md5 hash
    (never user_id parity: sequential ids correlate with signup time),
    metric = did the user make a HIGH-VALUE purchase (value > 150 --
    plain "any purchase" saturates at 100% on this corpus and the test
    degenerates). Readout math lives in
    operators.analytics.ab_ztest_readout (shared with the streaming
    monitor). One per-user agg + one 2-row group agg; exact oracle
    recomputes z and the verdict."""
    from .operators.analytics import ab_ztest_readout

    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") > 150)
            ).cast("int")
        ).alias("converted")
    )
    return ab_ztest_readout(per_user)

def q_customer_survival_logrank(spark: SparkSession, sf: str) -> DataFrame:
    """Log-rank test between BUILDING-segment customers and the rest
    (operators.analytics.survival_logrank): does the segment churn at a
    different rate than everyone else, hypothesis-tested properly against
    the censored lifetimes -- the statistical companion to the KM curve.
    Closed-form chi2(1); oracle recomputes observed/expected/variance
    sums over the lifetime histogram exactly."""
    from .operators.analytics import survival_logrank

    orders = load_table(spark, sf, "orders")
    groups = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        (F.col("c_mktsegment") == "BUILDING").alias("is_g1"),
    )
    return survival_logrank(orders, groups)


def q_stream_events_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming heavy hitters via merged Misra-Gries summaries
    (streaming.jobs.stream_events_heavy_hitters): per micro-batch only
    the <= k-counter partials reach the driver, the standing summary
    merges with the mergeable-summaries compress rule, and the exact
    candidate re-count must equal the batch answer -- shares
    events_heavy_hitters' oracle verbatim."""
    from .streaming.jobs import stream_events_heavy_hitters

    return stream_events_heavy_hitters(spark, sf)


def q_customer_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007), the companion to
    customer_k_anonymity: a k-anonymous class is still attackable if its
    SENSITIVE attribute is homogeneous, so per quasi-identifier class
    (nation, segment) count the distinct sensitive values (the account
    balance SIGN bucket: negative / low / high) and flag classes below
    l = 2 -- an attacker knowing someone's class would learn their
    balance bucket. Same one-groupBy shape; distinct-count per class."""
    cust = load_table(spark, sf, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, F.lit("negative"))
        .when(F.col("c_acctbal") < 5000, F.lit("low"))
        .otherwise(F.lit("high"))
    )
    return (
        cust.withColumn("_sens", bucket)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct("_sens").alias("l_distinct"),
        )
        .withColumn("below_l", F.col("l_distinct") < 2)
    )


def q_nations_communities(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted label-propagation communities over the nation trade graph
    (operators.graph.label_propagation): 3 synchronized rounds, ties to
    the smallest label -- deterministic, so the oracle unrolls the same
    three rounds in SQL exactly (the 3-round-PageRank pattern applied to
    community detection). Same broadcast-dim edge build as
    nations_pagerank."""
    from .operators.graph import label_propagation

    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    supplier = load_table(spark, sf, "supplier")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    supp_nation = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select(F.col("s_suppkey"), F.col("n_name").alias("src"))
    cust_nation = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(F.col("c_custkey"), F.col("n_name").alias("dst"))
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cust_nation), orders.o_custkey == F.col("c_custkey"))
        .groupBy("src", "dst")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ).cast("double"),
                2,
            ).alias("weight")
        )
    )
    # local_threshold (r14): nation-contracted graph, bounded by
    # construction -- same adaptive dispatch note as nations_pagerank
    return label_propagation(
        edges, n_iter=3, local_threshold=100_000
    ).select(
        F.col("node").alias("n_name"), F.col("label").alias("community")
    )


def q_embedding_pq_trained(spark: SparkSession, sf: str) -> DataFrame:
    """Trained vs seeded PQ codebooks
    (operators.similarity.pq_codebook_trained): per-subspace Lloyd's
    k-means on a deterministic md5 sample must cut total reconstruction
    error vs the first-n_codes seeding -- closing the loop on the r7
    recall finding that PQ quality is the ANN family's weak axis.
    Contract row: corpus-summed recon_err strictly improves, both
    finite, codebook shape exact. Deterministic end to end (sampling,
    init, fixed Lloyd rounds), so the flags are stable facts."""
    import math as _math

    from .operators.similarity import (
        pq_codebook,
        pq_codebook_trained,
        pq_codes_arrow,
    )

    emb = load_table(spark, sf, "embeddings")
    # Arrow-encoded error sums (r15, guide §4.2): this row's contract is
    # trained_err < seeded_err (real margin -- training genuinely cuts
    # reconstruction error) + finiteness, not the err VALUES, so the
    # numpy encoding pass replaces two Catalyst-lambda corpus passes;
    # the exact-oracle embedding_pq_codes row keeps fold-exact pq_codes
    seeded_err = (
        pq_codes_arrow(emb, codebook=pq_codebook(emb))
        .agg(F.sum("recon_err")).collect()[0][0]
    )
    cb = pq_codebook_trained(emb)
    trained_err = (
        pq_codes_arrow(emb, codebook=cb).agg(F.sum("recon_err")).collect()[0][0]
    )
    return _arrow_local_frame(spark, 
        [
            (
                len(cb),
                len(cb[0]),
                bool(trained_err < seeded_err),
                bool(
                    _math.isfinite(trained_err) and _math.isfinite(seeded_err)
                ),
            )
        ],
        "m long, n_codes long, trained_beats_seeded boolean, errs_finite boolean",
    )


def q_customer_survival_km(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier retention curve over customer order lifetimes
    (operators.analytics.survival_km): right-censored churn analysis --
    lifetimes whose last order sits within 90 days of the corpus horizon
    are censored, contributing to risk sets but not the hazard. All
    windows run on the bounded lifetime histogram. Oracle recomputes the
    reverse-cumulative risk sets and the ln-sum product exactly."""
    from .operators.analytics import survival_km

    return survival_km(load_table(spark, sf, "orders"))


def q_stream_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming twin of the incremental cluster merge
    (streaming.jobs.stream_dedup_clusters): three deterministic document
    micro-batches, each generating only the candidate pairs that TOUCH it
    (batch shingles vs the accumulated index; no df guard, so Jaccard
    pairs are doc-local and the per-batch edge union is exactly the full
    pair set) and merging into the standing labels via the contracted
    graph. Oracle = the full-recompute recursive CTE over the whole
    corpus: stored-label maintenance across batches must equal
    from-scratch, row for row."""
    from .streaming.jobs import stream_dedup_clusters

    return stream_dedup_clusters(spark, sf)


def q_corpus_balanced_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Count-capped class balancing (operators.sampling.balanced_sample):
    exactly min(n, 60) docs per language by deterministic md5 order --
    the exact-count guarantee rate-based stratified sampling cannot give.
    Oracle mirrors the per-stratum row_number selection in SQL."""
    from .operators.sampling import balanced_sample

    return balanced_sample(
        load_table(spark, sf, "documents").select("doc_id", "lang"), cap=60
    )


def q_embedding_matryoshka_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka-style dimension-truncation audit (Kusupati et al. 2022,
    arXiv:2205.13147 motivation): recall@10 of brute-force search over a
    PREFIX of the 64 dims against full-dimension search -- the question
    behind every embedding-truncation cost cut, per prefix width. The
    64-dim row is a structural INVARIANT (the full prefix must reproduce
    the exact ranking: floor 1.0 pins the slice/rank machinery); the
    16-dim row is the measurement -- these synthetic vectors are NOT
    MRL-trained, so truncation recall is near chance (the baseline an
    MRL-trained model must beat; measured values in PERF.md), floor 0.0.
    Contract oracle: exact (query x dims) keys, all-true flags."""
    from .operators._cache import tracked_persist
    from .operators.similarity import cosine_topk, topk_recall

    # persist the loaded table (r14, guide §1.2/§5): each prefix width's
    # approx side plus the exact side re-scanned embeddings separately
    emb = tracked_persist(load_table(spark, sf, "embeddings"))
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=10)
    out = None
    for dims, floor in ((16, 0.0), (64, 1.0)):
        truncated = emb.select(
            "vec_id", F.slice("embedding", 1, dims).alias("embedding")
        )
        approx = cosine_topk(truncated, qids, k=10)
        # measured recall is not SQL-derivable: drop it from the
        # hash-checked contract row (topk_recall docstring)
        part = (
            topk_recall(approx, exact, k=10, floor=floor)
            .drop("recall")
            .withColumn("dims", F.lit(dims).cast("long"))
        )
        out = part if out is None else out.unionByName(part)
    return out


def q_corpus_kn_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM vs add-one baseline, held-out
    perplexity per language (operators.text.kn_bigram_perplexity):
    deterministic 80/20 hash split, vocab-bounded count tables broadcast,
    two bounded calibration scalars. Closed-form arithmetic end to end,
    so the oracle recomputes the per-language perplexities EXACTLY."""
    from .operators.text import kn_bigram_perplexity

    return kn_bigram_perplexity(load_table(spark, sf, "documents"))


def q_corpus_unigram_train(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM tokenizer training + Viterbi encode
    (operators.unigram.unigram_train/unigram_encode -- the SentencePiece
    family, completing the tokenizer surface beside BPE): EM over
    segmentation lattices on the word-frequency table, expected-count
    pruning to a 96-piece cap. Contract row (the converged-PageRank
    pattern -- an EM fixpoint is not SQL-expressible): corpus
    log-likelihood non-decreasing within every fixed-vocab EM block,
    vocab within [n_chars, cap], probs sum to 1, every corpus word
    Viterbi-segmentable under the trained vocab, and the encoding
    compresses (pieces strictly between word count and char count).
    A pure-python lattice parity test pins the math."""
    import math as _math

    from .operators.unigram import unigram_encode, unigram_train

    docs = load_table(spark, sf, "documents")
    vocab, diag = unigram_train(
        docs, vocab_size=96, seed_size=256, em_iters=2
    )
    em_monotone = all(
        b[i] <= b[i + 1] + 1e-6
        for b in diag["ll_blocks"]
        for i in range(len(b) - 1)
    )
    probs_sum_one = abs(sum(v for _, v in vocab) - 1.0) < 1e-9
    enc = unigram_encode(docs, vocab)
    stats = enc.agg(
        F.sum("n_words").alias("w"),
        F.sum("n_pieces").alias("p"),
        F.count(F.lit(1)).alias("d"),
    ).collect()[0]
    chars = docs.select(
        F.sum(
            F.aggregate(
                F.transform(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                    lambda w: F.length(w),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
        ).alias("c")
    ).collect()[0]
    return _arrow_local_frame(spark, 
        [
            (
                bool(diag["n_chars"] <= len(vocab) <= 96),
                bool(em_monotone),
                bool(probs_sum_one and _math.isfinite(diag["ll_blocks"][-1][-1])),
                bool(stats.p >= stats.w and stats.p <= chars.c),
            )
        ],
        "vocab_in_bounds boolean, em_monotone boolean,"
        " probs_normalized boolean, encode_compresses boolean",
    )


def q_corpus_token_cms(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min sketch token-frequency estimates
    (operators.frequency.count_min_estimates): the 20 most frequent
    tokens' counts estimated from a 4x1024 sketch whose shuffle is
    bounded at depth*width rows regardless of corpus size, with BOTH CMS
    bound witnesses surfaced per key -- est >= true (collisions only
    add) and est <= true + ceil(2N/width) (the epsilon guarantee at
    width=2/eps). md5 row hashes make the sketch deterministic, so the
    oracle recomputes the ENTIRE sketch exactly in SQL -- estimates
    included, not just the flags."""
    from .operators.frequency import count_min_estimates

    docs = load_table(spark, sf, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("item")
    )
    true_counts = tok.groupBy("item").agg(F.count(F.lit(1)).alias("true_n"))
    top = true_counts.orderBy(
        F.col("true_n").desc(), F.col("item").asc()
    ).limit(20)
    est = count_min_estimates(tok, top.select("item"), depth=4, width=1024)
    total = tok.agg(F.count(F.lit(1)).alias("_n"))
    return (
        est.join(F.broadcast(top), "item")
        .crossJoin(F.broadcast(total))
        .select(
            "item",
            "est_n",
            "true_n",
            (F.col("est_n") >= F.col("true_n")).alias("never_under"),
            (
                F.col("est_n")
                <= F.col("true_n")
                + F.ceil(F.lit(2.0) * F.col("_n") / 1024).cast("long")
            ).alias("within_eps"),
        )
    )


def q_stream_quality_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming per-micro-batch PSI drift monitor
    (streaming.jobs.stream_quality_drift): the corpus split into three
    deterministic one-file batches (user_id % 3), each batch's value
    histogram PSI'd against the full-corpus reference inside foreachBatch
    -- the as-data-arrives form of corpus_psi_drift. Oracle recomputes
    the per-split PSI against the global distribution in SQL."""
    from .streaming.jobs import stream_quality_drift

    return stream_quality_drift(spark, sf)


def q_embedding_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    """ANN quality accounting for the IVF path: recall@10 of the
    partial-probe IVF answer (8 seeded cells, nprobe=2 -- the SAME budget
    as embedding_ivf_ann) against the exact brute-force top-10, per query
    (operators.similarity.topk_recall). The driver-checkable claim is the
    contract row: every query's recall clears the pinned floor of 0.5 at
    a 2/8 probe budget -- measured 0.7-1.0 across sf0.01/sf0.1, floor
    pinned below with margin. PERF.md tracks recall vs nprobe."""
    from .operators._cache import tracked_persist
    from .operators.similarity import cosine_topk, ivf_ann_topk, topk_recall

    # persist the loaded table (r14, guide §1.2/§5): approx + exact sides
    # scanned embeddings 12x with no shared subtree (same fix as pq_recall)
    emb = tracked_persist(load_table(spark, sf, "embeddings"))
    qids = [0, 1, 2, 3, 4]
    approx = ivf_ann_topk(emb, qids, k=10, n_centroids=8, nprobe=2)
    exact = cosine_topk(emb, qids, k=10)
    return topk_recall(approx, exact, k=10, floor=0.5).drop("recall")


def q_embedding_pq_recall(spark: SparkSession, sf: str) -> DataFrame:
    """ANN quality accounting for the PQ path, in its PRODUCTION serving
    shape (operators.similarity.pq_rerank_topk -- ADC shortlist of 50,
    then exact cosine rerank to top-10; raw ADC-rank@10 bottoms at 0.0
    recall on this unclustered synthetic corpus, which is exactly the
    measurement this row exists to surface). Contract row: recall@10 >=
    the pinned 0.2 floor per query (measured 0.3-0.8 across
    sf0.01/sf0.1; quantization distortion, not randomness -- codebooks
    are deterministic). PERF.md tracks recall vs shortlist size."""
    from .operators._cache import tracked_persist
    from .operators.similarity import cosine_topk, pq_rerank_topk, topk_recall

    # persist the loaded table (r14, guide §1.2/§5): the approx and exact
    # sides scan embeddings through 12 plan branches with no shared
    # subtree -- one scan + cache reads replaces 12 scans (A/B 7.2->6.0 s)
    emb = tracked_persist(load_table(spark, sf, "embeddings"))
    qids = [0, 1, 2, 3, 4]
    # vectorized ADC shortlist (r15, guide §4.2): this row's oracle is the
    # recall-floor contract (flags with 0.1+ margin, keys quantizer-
    # independent), so it may take the numpy LUT path -- the Catalyst
    # lambda ADC measured ~2.8 s warm of this row's 4.4 s. The fold-exact
    # path stays on embedding_pq_topk, whose oracle replays the ADC
    # values; both paths' rank agreement is covered by the unit test.
    approx = pq_rerank_topk(emb, qids, k=10, shortlist=50, vectorized=True)
    exact = cosine_topk(emb, qids, k=10)
    return topk_recall(approx, exact, k=10, floor=0.2).drop("recall")



def q_text_quality_auc(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-scorer evaluation (operators.analytics.roc_auc): exact
    Mann-Whitney ROC-AUC + tie-corrected z of TWO scorers against the
    Gopher rule-filter labels -- the stopword-density heuristic (a real
    signal: the r_stopwords rule is part of the label, so AUC must land
    well above 0.5) beside the md5-stand-in linear model (uncorrelated
    with the rules BY CONSTRUCTION, so its honest readout is AUC ~ 0.5,
    not significant -- the null case every eval harness must get right).
    Closed-form rank arithmetic; the oracle recomputes both rows
    exactly."""
    from .operators._cache import tracked_persist
    from .operators.analytics import roc_auc
    from .operators.text import gopher_quality, hashed_linear_score

    # spread=False (r14, measured): the two scorer branches are hash and
    # token-count passes; each paid its own full-text exchange under the
    # spread (interleaved A/B: 2.98 vs 2.22 s median)
    docs = load_table(spark, sf, "documents", spread=False)
    # persist the rule labels (r14, guide §1.2): narrow (id, label, dens)
    # rows consumed by BOTH scorer branches of the union -- unpersisted,
    # the Gopher tokenize pass over the corpus ran once per branch
    g = tracked_persist(
        gopher_quality(docs).select(
            "doc_id",
            F.col("keep").alias("label"),
            F.round(F.col("stopword_hits") / F.col("n_tokens"), 6).alias("dens"),
        )
    )
    model = (
        hashed_linear_score(docs)
        .select("doc_id", "score")
        .join(g.select("doc_id", "label"), "doc_id")
    )
    out_m = roc_auc(model).withColumn("scorer", F.lit("model"))
    out_d = roc_auc(
        g.select(F.col("dens").alias("score"), "label")
    ).withColumn("scorer", F.lit("stopword_density"))
    return out_m.unionByName(out_d)


def q_quality_rater_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Chance-corrected agreement between the two quality filters the
    engine ships -- the Gopher rule filter and the hashing-trick model
    filter (operators.analytics.cohen_kappa): po is raw agreement, kappa
    subtracts the agreement two independent raters with these marginals
    get for free. With md5 stand-in weights the honest readout is kappa
    ~ 0 at high-ish po -- exactly the "85% agreement is meaningless"
    lesson the operator docstring states. Exact oracle."""
    from .operators.analytics import cohen_kappa
    from .operators.text import gopher_quality, hashed_linear_score

    docs = load_table(spark, sf, "documents")
    rule = gopher_quality(docs).select(
        "doc_id", F.col("keep").alias("rule_keep")
    )
    model = hashed_linear_score(docs).select(
        "doc_id", F.col("keep").alias("model_keep")
    )
    return cohen_kappa(rule.join(model, "doc_id"), "rule_keep", "model_keep")


def q_quality_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability diagram as data (operators.analytics.calibration_bins):
    the model quality score binned into deciles vs the observed Gopher
    pass rate, with per-bin Brier contributions -- the check run before a
    score is used as a sampling WEIGHT (mixture building) rather than a
    threshold. Exact oracle; bin edges are closed-form."""
    from .operators.analytics import calibration_bins
    from .operators.text import gopher_quality, hashed_linear_score

    docs = load_table(spark, sf, "documents")
    scored = (
        hashed_linear_score(docs)
        .select("doc_id", "score")
        .join(
            gopher_quality(docs).select(
                "doc_id", F.col("keep").alias("label")
            ),
            "doc_id",
        )
    )
    return calibration_bins(scored)


def q_events_ab_fdr(spark: SparkSession, sf: str) -> DataFrame:
    """Multiple-comparisons A/B readout (operators.analytics.ab_tests_fdr):
    one two-proportion z-test per event type, normal p-values via the
    Abramowitz-Stegun polynomial, Benjamini-Hochberg q-values across the
    m tests. The variant split is a deterministic md5 A/A null, so the
    CORRECT readout is zero discoveries at q <= 0.10 -- the row exists
    because m uncorrected tests at 0.05 would "discover" ~m/20 false
    effects. Exact oracle (same z, same polynomial, same running min)."""
    from .operators.analytics import ab_tests_fdr

    return ab_tests_fdr(load_table(spark, sf, "events"))



def q_retrieval_mmr(spark: SparkSession, sf: str) -> DataFrame:
    """Diversified retrieval serving (operators.ranking.mmr_rerank):
    BM25 top-20 candidates re-ranked to a top-10 by Maximal Marginal
    Relevance (lambda = 0.7, embedding-cosine redundancy penalty) -- the
    pass between retrieval and a RAG context window. The greedy
    trajectory is deterministic (6-dp rounding, id tie-breaks), so the
    DuckDB oracle replays all ten selection stages as unrolled SQL and
    the row is hash-checked EXACTLY, not a contract."""
    from .operators.ranking import bm25_topk, mmr_rerank

    # spread=False (r14, measured): the BM25 side is query-term-sized and
    # the rerank touches embeddings for only the 20 candidates, so both
    # spreads' exchanges were pure overhead (interleaved A/B: 3.21 vs
    # 2.02 s median)
    docs = load_table(spark, sf, "documents", spread=False)
    emb = load_table(spark, sf, "embeddings", spread=False)
    cand = bm25_topk(docs, ["spark", "window", "merge"], k=20)
    return mmr_rerank(cand, emb, k=10, lam=0.7)



def q_events_dp_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Laplace-mechanism DP release of per-event-type counts
    (operators.audit.dp_noisy_counts, epsilon = 1): the
    aggregate-publication shape, with the md5-deterministic inverse-CDF
    draw that makes the row exact-oracle-checkable (the docstring states
    the production swap to a real RNG). One count agg; noise applied to
    the type-bounded result."""
    from .operators.audit import dp_noisy_counts

    return dp_noisy_counts(
        load_table(spark, sf, "events"), "event_type", epsilon=1.0
    )


def q_quality_conformal(spark: SparkSession, sf: str) -> DataFrame:
    """Split conformal threshold for the model quality screen
    (operators.audit.conformal_threshold, alpha = 0.1): the
    finite-sample quantile of calibration positives' nonconformity plus
    the held-out coverage check -- the distribution-free guarantee is
    score-quality-independent (it must hold even for the md5 stand-in
    model, which is exactly what the coverage_ok witness verifies).
    Exact oracle (order statistics + coverage counts are closed-form)."""
    from .operators.audit import conformal_threshold
    from .operators.text import gopher_quality, hashed_linear_score

    docs = load_table(spark, sf, "documents")
    scored = (
        hashed_linear_score(docs)
        .select("doc_id", "score")
        .join(
            gopher_quality(docs).select(
                "doc_id", F.col("keep").alias("label")
            ),
            "doc_id",
        )
    )
    return conformal_threshold(scored, alpha=0.1)



def q_corpus_ccnet_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style per-document LM quality bucketing
    (operators.text.kn_doc_perplexity_buckets, Wenzek et al. 2020): every
    doc scored by perplexity under the train-split Kneser-Ney bigram LM,
    then per-language head/middle/tail terciles by perplexity rank -- the
    classic "keep the fluent slice of the crawl" gate. Rank-based NTILE
    bucketing, so the oracle recomputes rows EXACTLY (no cross-engine
    percentile semantics)."""
    from .operators.text import kn_doc_perplexity_buckets

    return kn_doc_perplexity_buckets(load_table(spark, sf, "documents"))


def q_corpus_ccnet_buckets_cuts(spark: SparkSession, sf: str) -> DataFrame:
    """Scale twin of corpus_ccnet_buckets (VERDICT r8 item 3): the SAME
    CCNet head/middle/tail gate, but bucketed by per-language
    percentile_approx cut points (mergeable GK sketch, partial
    aggregation) + a broadcast join of the tiny cut table -- NO
    per-language single-task NTILE sort, so the plan survives a crawl
    where one language is half the corpus
    (operators.text.kn_doc_perplexity_bucket_cuts; plan contrast
    asserted in tests/test_plans.py). Contract row per language: exact
    doc count (oracle-checked) + three invariants -- buckets balanced
    within the sketch/tie tolerance, bucket perplexity ranges ordered
    (max head ppl <= min middle ppl <= ... ), every scored doc
    assigned."""
    from .operators.text import kn_doc_perplexity_bucket_cuts

    from .operators._cache import tracked_persist

    pd_ = kn_doc_perplexity_bucket_cuts(load_table(spark, sf, "documents"))
    # ONE pass over the expensive KN scoring: reduce to a (lang, ppl,
    # bucket) histogram first; both the per-language aggregate and the
    # tie-mass probe below consume the persisted histogram, never the
    # scoring subtree twice
    hist = tracked_persist(
        pd_.groupBy("lang", "ppl_kn", "bucket").agg(
            F.count(F.lit(1)).alias("_c")
        )
    )
    per_lang = hist.groupBy("lang").agg(
        F.sum("_c").alias("n_docs"),
        F.sum(F.when(F.col("bucket") == 1, F.col("_c")).otherwise(0)).alias("_nh"),
        F.sum(F.when(F.col("bucket") == 2, F.col("_c")).otherwise(0)).alias("_nm"),
        F.sum(F.when(F.col("bucket") == 3, F.col("_c")).otherwise(0)).alias("_nt"),
        F.max(F.when(F.col("bucket") == 1, F.col("ppl_kn"))).alias("_maxh"),
        F.min(F.when(F.col("bucket") == 2, F.col("ppl_kn"))).alias("_minm"),
        F.max(F.when(F.col("bucket") == 2, F.col("ppl_kn"))).alias("_maxm"),
        F.min(F.when(F.col("bucket") == 3, F.col("ppl_kn"))).alias("_mint"),
    )
    # tie mass at the bucket boundaries: every doc whose ppl EQUALS a
    # boundary value stays in the lower bucket by the tie rule, so the
    # balance slack must absorb them (a degenerate-doc-heavy language can
    # put a large tied cohort exactly on a cut -- a data property, not an
    # operator defect; flat 2% alone would go red on such a corpus)
    # both joins below pair the corpus-bounded hist/ties frames with the
    # n_langs-row per_lang frame -- broadcast the tiny side explicitly
    # (r15, guide §3.1): the planner was picking SortMergeJoin (exchange +
    # sort on BOTH sides) because cached-frame stats are unknown
    ties = hist.join(
        F.broadcast(per_lang.select("lang", "_maxh", "_maxm")), "lang"
    ).groupBy("lang").agg(
        F.sum(
            F.when(
                (F.col("ppl_kn") == F.col("_maxh"))
                | (F.col("ppl_kn") == F.col("_maxm")),
                F.col("_c"),
            ).otherwise(0)
        ).alias("_tie_mass")
    )
    per_lang = per_lang.join(F.broadcast(ties), "lang")
    third = F.col("n_docs") / 3.0
    # slack: sample-exact sketch leaves only cut-value ties; 2 docs or 2%
    # plus the measured tie mass at the two boundary values
    tol = (
        F.greatest(F.lit(2.0), F.col("n_docs") * 0.02) + F.col("_tie_mass")
    )
    balanced = (
        (F.abs(F.col("_nh") - third) <= tol)
        & (F.abs(F.col("_nm") - third) <= tol)
        & (F.abs(F.col("_nt") - third) <= tol)
    )
    ordered = F.coalesce(
        F.col("_maxh") <= F.col("_minm"), F.lit(True)
    ) & F.coalesce(F.col("_maxm") <= F.col("_mint"), F.lit(True))
    return per_lang.select(
        "lang",
        "n_docs",
        balanced.alias("counts_balanced"),
        ordered.alias("buckets_ppl_ordered"),
        (
            (F.col("_nh") + F.col("_nm") + F.col("_nt")) == F.col("n_docs")
        ).alias("all_assigned"),
    )


def q_corpus_mixture_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled mixture sampling
    (operators.sampling.temperature_mixture_sample, T = 2, 10k-token
    budget): target shares derived from the corpus itself as
    p_i^(1/T) / sum -- the multilingual up-sampling rule (XLM-R) that
    flattens head-language dominance without a hand-specified dial.
    Derived q_share rides along per row so the mixture is auditable from
    the output. Exact oracle (md5 draws + closed-form thresholds)."""
    from .operators.sampling import temperature_mixture_sample
    from .operators.text import token_count

    docs = load_table(spark, sf, "documents").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    return temperature_mixture_sample(docs, 10_000, temperature=2.0).select(
        "doc_id", "lang", "n_tokens", "q_share"
    )



def q_dedup_lsh_precision(spark: SparkSession, sf: str) -> DataFrame:
    """Candidate-pair precision of the MinHash-LSH band join, stratified
    by n_shared_bands (operators.dedup.lsh_pair_precision) -- the
    companion to dedup_lsh_recall: recall says which true pairs the bands
    miss, precision says what fraction of surfaced candidates will
    survive the exact verify (the cost every false candidate incurs at
    100 TB). Exact oracle composing the same two dedup oracles."""
    from .operators.dedup import lsh_pair_precision

    return lsh_pair_precision(
        load_table(spark, sf, "documents"),
        num_hashes=12,
        band_size=3,
        threshold=0.2,
    )



def q_stream_events_ab(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming A/B monitor (streaming.jobs.stream_events_ab): per-batch
    per-user conversion partials accumulate in a parquet state dir (MAX
    fold -- associative, idempotent, replay-safe), final readout through
    the SAME ab_ztest_readout as the batch query. Oracle = events_ab_test
    verbatim: stream-maintained sufficient statistics must reproduce the
    batch answer row-for-row."""
    from .streaming.jobs import stream_events_ab

    return stream_events_ab(spark, sf)


def q_stream_quality_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming quantile monitor (streaming.jobs.stream_quality_
    quantiles): per-batch binned token-count histograms fold into
    batch-keyed parquet state (overwrite-by-batch-id = replay-idempotent
    ADDITIVE state -- the complement of the A/B monitor's MAX trick);
    readout interpolates p25/p50/p75/p90 from the merged CDF beside the
    exact batch percentiles with |est-exact| <= 2*bin_width witnesses.
    EXACT oracle: the stream-maintained histogram must equal the batch
    histogram, so every readout value recomputes from documents."""
    from .streaming.jobs import stream_quality_quantiles

    return stream_quality_quantiles(spark, sf)


# ---------------------------------------------------------------- registry

_QUERIES_LITERAL = {
    # registry order (after the round-15 rotation below) IS driver
    # recording order; the driver records exactly the FIRST 50 entries.
    # Round-14 rotation (VERDICT r13 item 2): slot 1 the round-14
    # composition addition (corpus-refresh DAG, never-checked), slots 2-9
    # the eight remaining r8-stale rows (the whole Athena-SQL-twin
    # surface first), slots 10-50 the 41 oldest r9-stale rows. Past slot
    # 50, blocks stay ordered oldest-evidence-first (the 9 remaining
    # r9-stale rows queued FIRST for r15, then the r10, r11, r12, r13
    # blocks). Everything past slot 50 stays oracle-checked every round
    # via tests/test_oracle_parity.py.
    # --- round-14 addition: composed incremental corpus-refresh DAG (1) ---
    "corpus_refresh_pipeline": q_corpus_refresh_pipeline,
    # --- r8-stale rows, the last of their class (8) ---
    "sql_weekday_hour_revenue": q_sql_weekday_hour_revenue,
    "sql_region_revenue": q_sql_region_revenue,
    "sql_customer_base_stats": q_sql_customer_base_stats,
    "sql_product_category_revenue": q_sql_product_category_revenue,
    "sql_segment_category_revenue": q_sql_segment_category_revenue,
    "sql_customer_monthly_stats": q_sql_customer_monthly_stats,
    "corpus_lang_source_chi2": q_corpus_lang_source_chi2,
    "local_supplier_volume": q_local_supplier_volume,
    # --- r9-stale, oldest-first (41) ---
    "dedup_lsh_recall": q_dedup_lsh_recall,
    "corpus_mixture_temperature": q_corpus_mixture_temperature,
    "dedup_lsh_precision": q_dedup_lsh_precision,
    "stream_events_ab": q_stream_events_ab,
    "corpus_ccnet_buckets_cuts": q_corpus_ccnet_buckets_cuts,
    "dedup_lsh_recall_sampled": q_dedup_lsh_recall_sampled,
    "customer_spend_deciles": q_customer_spend_deciles,
    "events_grouping_sets": q_events_grouping_sets,
    "part_fuzzy_matches": q_part_fuzzy_matches,
    "events_value_trend": q_events_value_trend,
    "corpus_zipf": q_corpus_zipf,
    "corpus_source_budget": q_corpus_source_budget,
    "dq_audit": q_dq_audit,
    "dq_profile_orders": q_dq_profile_orders,
    "embedding_random_projection": q_embedding_random_projection,
    "embedding_centroid_outliers": q_embedding_centroid_outliers,
    "orders_with_returns": q_orders_with_returns,
    "customer_order_histogram": q_customer_order_histogram,
    "top_supplier_revenue": q_top_supplier_revenue,
    "rich_idle_customers": q_rich_idle_customers,
    "part_small_qty_revenue": q_part_small_qty_revenue,
    "embedding_pq_codes": q_embedding_pq_codes,
    "quality_quantiles_by_lang_approx": q_quality_quantiles_by_lang_approx,
    "embedding_ivf_ann_trained": q_embedding_ivf_ann_trained,
    "customer_base_stats_approx": q_customer_base_stats_approx,
    "documents_bm25_topk": q_documents_bm25_topk,
    "corpus_bigram_pmi": q_corpus_bigram_pmi,
    "text_word_entropy": q_text_word_entropy,
    "mart_incremental_update": q_mart_incremental_update,
    "events_distinct_rolling7": q_events_distinct_rolling7,
    "part_set_similarity_join": q_part_set_similarity_join,
    "supplier_pareto": q_supplier_pareto,
    "events_heavy_hitters": q_events_heavy_hitters,
    "events_hopping_window": q_events_hopping_window,
    "customer_order_value_window": q_customer_order_value_window,
    "corpus_bpe_merges": q_corpus_bpe_merges,
    "part_entity_resolution": q_part_entity_resolution,
    "multimodal_bmp_decode": q_multimodal_bmp_decode,
    "hybrid_retrieval_rrf": q_hybrid_retrieval_rrf,
    "text_repetition": q_text_repetition,
    "orders_median_mode": q_orders_median_mode,
    # --- past slot 50: remaining r9-stale rows (9), queued FIRST for r15 ---
    "corpus_winsorized_length": q_corpus_winsorized_length,
    "corpus_tokens_hof": q_corpus_tokens_hof,
    "events_ohlc": q_events_ohlc,
    "stream_events_hopping": q_stream_events_hopping,
    "orders_month_spine_recursive": q_orders_month_spine_recursive,
    "embedding_ivf_index_search": q_embedding_ivf_index_search,
    "multimodal_wav_decode": q_multimodal_wav_decode,
    "multimodal_y4m_decode": q_multimodal_y4m_decode,
    "orders_price_histogram": q_orders_price_histogram,
    # --- r10-evidence block ---
    "dedup_cluster_keeper": q_dedup_cluster_keeper,
    "embedding_kcenter_coreset": q_embedding_kcenter_coreset,
    "corpus_epoch_plan": q_corpus_epoch_plan,
    "text_winnow_fingerprints": q_text_winnow_fingerprints,
    "stream_quality_quantiles": q_stream_quality_quantiles,
    "dedup_winnow_pairs": q_dedup_winnow_pairs,
    "events_ab_sprt": q_events_ab_sprt,
    "dedup_kcore": q_dedup_kcore,
    "corpus_release": q_corpus_release,
    "dedup_winnow_recall": q_dedup_winnow_recall,
    "embedding_pq_index_search": q_embedding_pq_index_search,
    "corpus_bpe_compression": q_corpus_bpe_compression,
    "join_key_skew_audit": q_join_key_skew_audit,
    "text_quality_classifier": q_text_quality_classifier,
    "orders_geomean_udaf": q_orders_geomean_udaf,
    "multimodal_byte_features_arrow": q_multimodal_byte_features_arrow,
    "orders_nullsafe_join": q_orders_nullsafe_join,
    "corpus_dataset_card": q_corpus_dataset_card,
    "events_cusum_alerts": q_events_cusum_alerts,
    "orders_market_basket": q_orders_market_basket,
    "orders_benford_audit": q_orders_benford_audit,
    "events_exp_smoothing": q_events_exp_smoothing,
    "multimodal_png_decode": q_multimodal_png_decode,
    "multimodal_jpeg_decode": q_multimodal_jpeg_decode,
    "corpus_bpe_encode": q_corpus_bpe_encode,
    "nations_pagerank": q_nations_pagerank,
    "region_top_customers_lateral": q_region_top_customers_lateral,
    "events_seasonal_decompose": q_events_seasonal_decompose,
    "orders_xml_roundtrip": q_orders_xml_roundtrip,
    "stream_events_dedup_ttl": q_stream_events_dedup_ttl,
    "corpus_vocab_drift": q_corpus_vocab_drift,
    "corpus_length_matched_sample": q_corpus_length_matched_sample,
    "corpus_bpe_fertility": q_corpus_bpe_fertility,
    "nation_balance_sheet": q_nation_balance_sheet,
    "shipping_priority": q_shipping_priority,
    "returned_revenue_customers": q_returned_revenue_customers,
    "promo_revenue_share": q_promo_revenue_share,
    "special_revenue": q_special_revenue,
    "nation_trade_matrix": q_nation_trade_matrix,
    "corpus_sample_weighted": q_corpus_sample_weighted,
    "dedup_triangles": q_dedup_triangles,
    "corpus_semantic_decontamination": q_corpus_semantic_decontamination,
    "customer_spend_outliers_mad": q_customer_spend_outliers_mad,
    "corpus_chunk_udtf": q_corpus_chunk_udtf,
    "events_variant_stats": q_events_variant_stats,
    "events_unpivot": q_events_unpivot,
    "events_markov_transitions": q_events_markov_transitions,
    "stream_events_enriched": q_stream_events_enriched,
    "events_user_trend_pandas": q_events_user_trend_pandas,
    # --- r11-evidence block ---
    "embedding_bitext_mine": q_embedding_bitext_mine,
    "customer_id_luhn_audit": q_customer_id_luhn_audit,
    "embedding_two_level_agreement": q_embedding_two_level_agreement,
    "embedding_semantic_dedup_trained": q_embedding_semantic_dedup_trained,
    "dedup_winnow_recall_sampled": q_dedup_winnow_recall_sampled,
    "embedding_bitext_recall": q_embedding_bitext_recall,
    "bronze_purchases": q_bronze_purchases,
    "silver_denorm": q_silver_denorm,
    "pricing_summary": q_pricing_summary,
    "mart_sales_by_segment_product": q_mart_sales_by_segment_product,
    "mart_sales_by_customer": q_mart_sales_by_customer,
    "mart_sales_by_datetime": q_mart_sales_by_datetime,
    "mart_sales_by_region": q_mart_sales_by_region,
    "monthly_revenue": q_monthly_revenue,
    "weekday_hour_revenue": q_weekday_hour_revenue,
    "product_category_revenue": q_product_category_revenue,
    "segment_category_revenue": q_segment_category_revenue,
    "region_revenue": q_region_revenue,
    "customer_base_stats": q_customer_base_stats,
    "customer_monthly_stats": q_customer_monthly_stats,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "cleaned_corpus": q_cleaned_corpus,
    "embedding_cosine_topk": q_embedding_cosine_topk,
    "embedding_lsh_ann": q_embedding_lsh_ann,
    "embedding_ivf_ann": q_embedding_ivf_ann,
    "embedding_cosine_topk_pandas": q_embedding_cosine_topk_pandas,
    "embedding_near_dup": q_embedding_near_dup,
    "corpus_substring_dedup": q_corpus_substring_dedup,
    "text_stats": q_text_stats,
    "text_langid": q_text_langid,
    "text_tokens": q_text_tokens,
    "text_fingerprint": q_text_fingerprint,
    "multimodal_media_meta": q_multimodal_media_meta,
    "multimodal_type_stats": q_multimodal_type_stats,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "top_parts": q_top_parts,
    "adhoc_join_limit": q_adhoc_join_limit,
    "customer_running_total": q_customer_running_total,
    "customer_order_ranks": q_customer_order_ranks,
    "order_set_ops": q_order_set_ops,
    "customers_without_orders": q_customers_without_orders,
    "events_windowed_agg": q_events_windowed_agg,
    "events_sessionize": q_events_sessionize,
    "events_session_window": q_events_session_window,
    "stream_events_sessionize": q_stream_events_sessionize,
    "stream_events_windowed": q_stream_events_windowed,
    # --- r12-evidence block ---
    "embedding_two_level_pair_recall": q_embedding_two_level_pair_recall,
    "embedding_assign_arrow_agreement": q_embedding_assign_arrow_agreement,
    "events_json_extract": q_events_json_extract,
    "events_daily_pivot": q_events_daily_pivot,
    "events_rollup": q_events_rollup,
    "events_cube": q_events_cube,
    "events_type_stats_salted": q_events_type_stats_salted,
    "product_category_revenue_salted": q_product_category_revenue_salted,
    "embedding_semantic_dedup": q_embedding_semantic_dedup,
    "embedding_pq_topk": q_embedding_pq_topk,
    "training_corpus": q_training_corpus,
    "dedup_incremental": q_dedup_incremental,
    "stream_events_dedup": q_stream_events_dedup,
    "embedding_near_dup_bucketed": q_embedding_near_dup_bucketed,
    "nations_pagerank_converged": q_nations_pagerank_converged,
    "corpus_substring_dedup_apply": q_corpus_substring_dedup_apply,
    "corpus_dsir_select": q_corpus_dsir_select,
    "multimodal_audio_spectrogram": q_multimodal_audio_spectrogram,
    "multimodal_shot_boundaries": q_multimodal_shot_boundaries,
    "embedding_pca": q_embedding_pca,
    "embedding_hard_negatives": q_embedding_hard_negatives,
    "embedding_pca_incremental": q_embedding_pca_incremental,
    "corpus_distinct_ngrams": q_corpus_distinct_ngrams,
    "corpus_substring_dedup_keep_first": q_corpus_substring_dedup_keep_first,
    "corpus_substring_dedup_apply_keep_first": q_corpus_substring_dedup_apply_keep_first,
    "multimodal_audio_segments": q_multimodal_audio_segments,
    "embedding_kmeans_parallel": q_embedding_kmeans_parallel,
    "multimodal_image_dedup": q_multimodal_image_dedup,
    "multimodal_shot_keyframes": q_multimodal_shot_keyframes,
    "stream_embedding_pca": q_stream_embedding_pca,
    "corpus_skipgram_pairs": q_corpus_skipgram_pairs,
    "orders_target_encoding": q_orders_target_encoding,
    "multimodal_video_dedup": q_multimodal_video_dedup,
    "corpus_negative_sampling_table": q_corpus_negative_sampling_table,
    "customer_k_anonymity": q_customer_k_anonymity,
    "stream_events_session_native": q_stream_events_session_native,
    "text_gopher_quality": q_text_gopher_quality,
    "corpus_strip_boilerplate": q_corpus_strip_boilerplate,
    "events_incident_windows": q_events_incident_windows,
    "customer_rolling_revenue": q_customer_rolling_revenue,
    "events_daily_gapfill": q_events_daily_gapfill,
    "events_user_state_scd2": q_events_user_state_scd2,
    "events_funnel": q_events_funnel,
    "customer_cohort_retention": q_customer_cohort_retention,
    "customer_rfm": q_customer_rfm,
    "corpus_decontamination_bloom": q_corpus_decontamination_bloom,
    "corpus_split_leakage_safe": q_corpus_split_leakage_safe,
    "text_pii_redact": q_text_pii_redact,
    "corpus_chunk": q_corpus_chunk,
    "text_token_dedup": q_text_token_dedup,
    # --- r13-evidence block (the round-13 window, newest evidence) ---
    "embedding_two_level_nprobe_curve": q_embedding_two_level_nprobe_curve,
    "text_perplexity": q_text_perplexity,
    "corpus_shuffle": q_corpus_shuffle,
    "corpus_mixture": q_corpus_mixture,
    "embedding_cell_stats": q_embedding_cell_stats,
    "stream_events_cdc_lake": q_stream_events_cdc_lake,
    "corpus_decontamination": q_corpus_decontamination,
    "events_asof_last_order": q_events_asof_last_order,
    "stream_events_purchase_follow": q_stream_events_purchase_follow,
    "text_quality_auc": q_text_quality_auc,
    "quality_rater_agreement": q_quality_rater_agreement,
    "quality_calibration": q_quality_calibration,
    "events_ab_fdr": q_events_ab_fdr,
    "retrieval_mmr": q_retrieval_mmr,
    "events_dp_counts": q_events_dp_counts,
    "quality_conformal": q_quality_conformal,
    "corpus_ccnet_buckets": q_corpus_ccnet_buckets,
    "multimodal_image_near_dup": q_multimodal_image_near_dup,
    "embedding_ivf_recall": q_embedding_ivf_recall,
    "embedding_pq_recall": q_embedding_pq_recall,
    "corpus_dsir_quality": q_corpus_dsir_quality,
    "dedup_containment": q_dedup_containment,
    "corpus_context_pack": q_corpus_context_pack,
    "corpus_psi_drift": q_corpus_psi_drift,
    "stream_quality_drift": q_stream_quality_drift,
    "corpus_token_cms": q_corpus_token_cms,
    "corpus_unigram_train": q_corpus_unigram_train,
    "corpus_kn_perplexity": q_corpus_kn_perplexity,
    "corpus_balanced_sample": q_corpus_balanced_sample,
    "embedding_matryoshka_recall": q_embedding_matryoshka_recall,
    "dedup_clusters_incremental": q_dedup_clusters_incremental,
    "stream_dedup_clusters": q_stream_dedup_clusters,
    "customer_survival_km": q_customer_survival_km,
    "embedding_pq_trained": q_embedding_pq_trained,
    "nations_communities": q_nations_communities,
    "customer_l_diversity": q_customer_l_diversity,
    "stream_events_heavy_hitters": q_stream_events_heavy_hitters,
    "customer_survival_logrank": q_customer_survival_logrank,
    "events_ab_test": q_events_ab_test,
    "retrieval_ndcg": q_retrieval_ndcg,
    "corpus_sample": q_corpus_sample,
    "corpus_sample_stratified": q_corpus_sample_stratified,
    "corpus_shard_pack": q_corpus_shard_pack,
    "text_tfidf_top_terms": q_text_tfidf_top_terms,
    "text_bigram_lm": q_text_bigram_lm,
    "quality_quantiles_by_lang": q_quality_quantiles_by_lang,
    "multimodal_byte_features": q_multimodal_byte_features,
    "multimodal_thumbnail": q_multimodal_thumbnail,
    "embedding_quantize_int8": q_embedding_quantize_int8,
    "sql_monthly_revenue": q_sql_monthly_revenue,
}

# Round-15 window rotation (VERDICT r14 item 9): the r14-verified head
# block (the literal's first 50 entries) rotates to the TAIL, promoting
# the next-oldest 50 (the r9-stale remainder + the r9-late block) into
# the driver's recording window. The rotation is a rotation, not a
# re-sort, so the "oldest-evidence-first past slot 50" invariant is
# preserved for every future round: after the r15 driver run the
# registry reads r10-stale ... r13 blocks, then the r14-verified block
# (newest evidence) last. Every entry stays oracle-checked every round
# via tests/test_oracle_parity.py regardless of window position.
_R14_WINDOW = 50
_names = list(_QUERIES_LITERAL)
QUERIES = {
    k: _QUERIES_LITERAL[k]
    for k in _names[_R14_WINDOW:] + _names[:_R14_WINDOW]
}



