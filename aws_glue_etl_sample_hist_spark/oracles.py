"""DuckDB oracle SQL, one entry per query in
`aws_glue_etl_sample_hist_spark.queries.QUERIES`.

This replicates the reference's own verification pattern -- the Spark
pipeline's outputs cross-checked with a second SQL engine (Athena/Presto,
document/glue_t1.md:30-54) -- with DuckDB as the second engine. Column names
and rounding are kept EXACTLY in sync with the Spark side; aggregated doubles
are rounded in both engines so accumulation order can't flip value hashes.

DuckDB-vs-Spark dialect notes baked in here:
  - strftime(ts, '%Y%m%d' / '%A') == Spark date_format 'yyyyMMdd' / 'EEEE'
  - isodow(ts) == Spark weekday(ts)+1  (1=Monday, the Presto convention)
  - DuckDB SUM(integer) returns HUGEINT -> always CAST to BIGINT
  - DuckDB `/` on integers is float division (matches Spark)
"""

from __future__ import annotations

_SILVER_FROM = """
    FROM lineitem l
    LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
    LEFT JOIN part p     ON l.l_partkey  = p.p_partkey
    LEFT JOIN customer c ON o.o_custkey  = c.c_custkey
    LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
"""

ORACLE_SQL: dict[str, str] = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
               ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
               ROUND(AVG(l_discount), 6)                                        AS avg_disc,
               COUNT(*)                                                         AS count_order
        FROM lineitem
        WHERE strftime(l_shipdate, '%Y%m%d') <= '19980902'
        GROUP BY l_returnflag, l_linestatus
    """,
    "bronze_purchases": """
        SELECT l_orderkey, l_linenumber,
               strftime(l_shipdate, '%Y%m%d') AS purchase_date,
               strftime(l_shipdate, '%Y')     AS purchase_year,
               strftime(l_shipdate, '%m')     AS purchase_month,
               strftime(l_shipdate, '%d')     AS purchase_day,
               l_extendedprice                AS amount
        FROM lineitem
        WHERE strftime(l_shipdate, '%Y%m%d') BETWEEN '19960101' AND '19961231'
    """,
    "silver_denorm": f"""
        SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
               l.l_quantity, l.l_extendedprice, l.l_discount,
               l.l_returnflag, l.l_linestatus,
               strftime(l.l_shipdate, '%Y%m%d') AS purchase_date,
               strftime(l.l_shipdate, '%Y')     AS purchase_year,
               strftime(l.l_shipdate, '%m')     AS purchase_month,
               strftime(l.l_shipdate, '%d')     AS purchase_day,
               o.o_custkey, o.o_orderstatus, o.o_orderpriority,
               c.c_name, c.c_mktsegment, c.c_acctbal,
               n.n_name, r.r_name,
               p.p_name, p.p_brand, p.p_type, p.p_size
        {_SILVER_FROM}
    """,
    "mart_sales_by_segment_product": f"""
        SELECT strftime(l.l_shipdate, '%Y') AS purchase_year,
               strftime(l.l_shipdate, '%m') AS purchase_month,
               c.c_mktsegment, p.p_brand, p.p_type, l.l_returnflag, n.n_name,
               ROUND(SUM(l.l_extendedprice), 2) AS total_purchase_amount,
               COUNT(l.l_extendedprice)         AS count_of_purchase
        {_SILVER_FROM}
        GROUP BY 1, 2, 3, 4, 5, 6, 7
    """,
    "mart_sales_by_customer": """
        WITH agg AS (
            SELECT o.o_custkey,
                   strftime(l.l_shipdate, '%Y') AS purchase_year,
                   strftime(l.l_shipdate, '%m') AS purchase_month,
                   ROUND(SUM(l.l_extendedprice), 2) AS total_purchase_amount,
                   COUNT(l.l_extendedprice)         AS count_of_purchase
            FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, 3
        )
        SELECT agg.o_custkey AS customer_id, agg.purchase_year, agg.purchase_month,
               c.c_name, c.c_mktsegment, n.n_name,
               agg.total_purchase_amount, agg.count_of_purchase
        FROM agg
        LEFT JOIN customer c ON agg.o_custkey = c.c_custkey
        LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
    """,
    "mart_sales_by_datetime": """
        SELECT strftime(l_shipdate, '%Y') AS purchase_year,
               strftime(l_shipdate, '%m') AS purchase_month,
               strftime(l_shipdate, '%d') AS purchase_day,
               strftime(l_shipdate, '%A') AS day_of_week,
               CAST(isodow(l_shipdate) AS BIGINT) AS day_num,
               ROUND(SUM(l_extendedprice), 2) AS total_purchase_amount,
               COUNT(l_extendedprice)         AS count_of_purchase
        FROM lineitem
        GROUP BY 1, 2, 3, 4, 5
    """,
    "mart_sales_by_region": f"""
        SELECT strftime(l.l_shipdate, '%Y') AS purchase_year,
               strftime(l.l_shipdate, '%m') AS purchase_month,
               r.r_name, n.n_name,
               ROUND(SUM(l.l_extendedprice), 2) AS total_purchase_amount,
               COUNT(l.l_extendedprice)         AS count_of_purchase
        {_SILVER_FROM}
        GROUP BY 1, 2, 3, 4
        ORDER BY 1, 2, 3, total_purchase_amount DESC, count_of_purchase DESC
    """,
    "monthly_revenue": """
        SELECT strftime(l_shipdate, '%Y') AS purchase_year,
               strftime(l_shipdate, '%m') AS purchase_month,
               ROUND(SUM(l_extendedprice) / 1000000, 2) AS revenue_musd,
               COUNT(l_extendedprice)                   AS count_of_purchase
        FROM lineitem
        GROUP BY 1, 2
    """,
    "weekday_hour_revenue": """
        SELECT strftime(ts, '%A')             AS day_of_week,
               CAST(isodow(ts) AS BIGINT)     AS day_num,
               CAST(hour(ts) AS BIGINT)       AS hour_of_day,
               ROUND(SUM(value), 2)           AS total_value,
               COUNT(value)                   AS count_of_events
        FROM events
        GROUP BY 1, 2, 3
    """,
    "product_category_revenue": """
        SELECT p.p_brand, p.p_type,
               ROUND(SUM(l.l_extendedprice) / 1000000, 2) AS revenue_musd,
               COUNT(l.l_extendedprice)                   AS count_of_purchase
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    """,
    "segment_category_revenue": f"""
        SELECT c.c_mktsegment, p.p_brand,
               ROUND(SUM(l.l_extendedprice) / 1000000, 2) AS revenue_musd,
               COUNT(l.l_extendedprice)                   AS count_of_purchase
        {_SILVER_FROM}
        GROUP BY 1, 2
        ORDER BY 1, 2, revenue_musd DESC
    """,
    "region_revenue": f"""
        SELECT r.r_name, n.n_name,
               ROUND(SUM(l.l_extendedprice) / 1000000, 2) AS revenue_musd,
               COUNT(l.l_extendedprice)                   AS count_of_purchase
        {_SILVER_FROM}
        GROUP BY 1, 2
    """,
    "customer_base_stats": """
        SELECT o_orderpriority,
               COUNT(DISTINCT o_custkey) AS count_of_customers,
               COUNT(o_custkey)          AS count_of_purchase,
               ROUND(COUNT(o_custkey) / COUNT(DISTINCT o_custkey), 2)     AS purchase_per_customer,
               ROUND(SUM(o_totalprice) / COUNT(o_custkey) / 10000, 2)     AS amount_per_purchase_10k,
               ROUND(SUM(o_totalprice) / COUNT(DISTINCT o_custkey) / 10000, 2)
                                                                          AS amount_per_customer_10k
        FROM orders
        GROUP BY 1
    """,
    "customer_monthly_stats": """
        SELECT o_custkey AS customer_id,
               strftime(o_orderdate, '%Y') AS purchase_year,
               strftime(o_orderdate, '%m') AS purchase_month,
               COUNT(o_orderkey) AS count_of_purchase,
               ROUND(SUM(o_totalprice) / COUNT(o_orderkey) / 10000, 2) AS amount_per_purchase_10k
        FROM orders
        GROUP BY 1, 2, 3
    """,
    "adhoc_join_limit": """
        WITH customer_info AS (
            SELECT c.c_custkey, c.c_name, c.c_mktsegment, n.n_name
            FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        )
        SELECT o.o_orderkey, o.o_orderdate_str, o.o_totalprice,
               ci.c_name, ci.c_mktsegment, ci.n_name
        FROM (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str
            FROM orders
            WHERE strftime(o_orderdate, '%Y%m%d') BETWEEN '19960101' AND '19961231'
        ) o
        LEFT JOIN customer_info ci ON o.o_custkey = ci.c_custkey
        ORDER BY o.o_orderdate_str, o.o_orderkey
        LIMIT 20
    """,
    "top_parts": """
        WITH agg AS (
            SELECT l_partkey,
                   ROUND(SUM(l_extendedprice), 2) AS total_purchase_amount,
                   COUNT(l_extendedprice)         AS count_of_purchase
            FROM lineitem
            GROUP BY 1
        )
        SELECT agg.l_partkey, p.p_name, p.p_brand,
               agg.total_purchase_amount, agg.count_of_purchase
        FROM agg LEFT JOIN part p ON agg.l_partkey = p.p_partkey
        ORDER BY agg.total_purchase_amount DESC, agg.l_partkey ASC
        LIMIT 20
    """,
    "customer_running_total": """
        WITH monthly AS (
            SELECT o_custkey,
                   strftime(o_orderdate, '%Y') AS purchase_year,
                   strftime(o_orderdate, '%m') AS purchase_month,
                   ROUND(SUM(o_totalprice), 2) AS monthly_amount
            FROM orders
            GROUP BY 1, 2, 3
        )
        SELECT o_custkey AS customer_id, purchase_year, purchase_month, monthly_amount,
               ROUND(SUM(monthly_amount) OVER (
                   PARTITION BY o_custkey ORDER BY purchase_year, purchase_month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_amount
        FROM monthly
    """,
    "order_set_ops": """
        SELECT customer_id, 'both' AS cohort FROM (
            SELECT DISTINCT o_custkey AS customer_id FROM orders
            WHERE strftime(o_orderdate, '%Y') = '1996'
            INTERSECT
            SELECT DISTINCT o_custkey FROM orders
            WHERE strftime(o_orderdate, '%Y') = '1997'
        )
        UNION ALL
        SELECT customer_id, 'only_1996' AS cohort FROM (
            SELECT DISTINCT o_custkey AS customer_id FROM orders
            WHERE strftime(o_orderdate, '%Y') = '1996'
            EXCEPT
            SELECT DISTINCT o_custkey FROM orders
            WHERE strftime(o_orderdate, '%Y') = '1997'
        )
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
}
