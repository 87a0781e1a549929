"""The engine's SQL entry point (reference SURVEY §3.3).

The reference's declared query surface is partly SQL-only: analysts run
Presto/Athena SQL against crawler-registered tables (document/glue_t2.md:26-128,
glue_t1.md:33-54). This module is the Spark-first rebuild of that surface:
``register_views`` replaces the crawler, and the A5-A11 query set runs through
``spark.sql`` -- same Catalyst plans as the DataFrame API, so both surfaces
stay semantically identical (several are registered in queries.py under
``sql_*`` names and oracle-checked against the same DuckDB SQL as their
DataFrame twins).

Presto -> Spark dialect shims the translation pins (SURVEY §7.4):
  - day_of_week(ts) [1=Mon]  ->  weekday(ts)+1   (Spark dayofweek is 1=Sun)
  - date_format(%W)          ->  date_format(ts, 'EEEE')
  - date_parse(s,'%Y%m%d')   ->  to_date(s,'yyyyMMdd')
  - bigint/bigint division: both Presto and Spark `/` return double here;
    the reference ratio A10 is pinned by the oracle at 2dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views

# Spark-SQL renditions of the reference's Athena query set (A5-A11,
# document/glue_t2.md:26-128), re-targeted at the testdata star schema
ATHENA_SQL: dict[str, str] = {
    # A5 monthly revenue (document/glue_t2.md:27-36)
    "monthly_revenue": """
        SELECT date_format(l_shipdate, 'yyyy') AS purchase_year,
               date_format(l_shipdate, 'MM')   AS purchase_month,
               ROUND(SUM(l_extendedprice) / 1000000, 2) AS revenue_musd,
               COUNT(l_extendedprice)                   AS count_of_purchase
        FROM lineitem
        GROUP BY 1, 2
    """,
    # A6 weekday x hour (document/glue_t2.md:41-52); Presto day_of_week -> weekday+1
    "weekday_hour_revenue": """
        SELECT date_format(ts, 'EEEE')        AS day_of_week,
               CAST(weekday(ts) + 1 AS BIGINT) AS day_num,
               CAST(hour(ts) AS BIGINT)        AS hour_of_day,
               ROUND(SUM(value), 2)            AS total_value,
               COUNT(value)                    AS count_of_events
        FROM events
        GROUP BY 1, 2, 3
    """,
    # A7 product-category revenue (document/glue_t2.md:55-67)
    "product_category_revenue": """
        SELECT p.p_brand, p.p_type,
               ROUND(SUM(l.l_extendedprice) / 1000000, 2) AS revenue_musd,
               COUNT(l.l_extendedprice)                   AS count_of_purchase
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    """,
    # A8 segment x category (document/glue_t2.md:70-83): the reference
    # orders by its 6th column (count_of_purchase) descending -- here that
    # column is ordinal 4
    "segment_category_revenue": """
        SELECT c.c_mktsegment, p.p_brand,
               ROUND(SUM(l.l_extendedprice) / 1000000, 2) AS revenue_musd,
               COUNT(l.l_extendedprice)                   AS count_of_purchase
        FROM lineitem l
        LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
        LEFT JOIN part p     ON l.l_partkey = p.p_partkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
        ORDER BY 1, 2, 4 DESC
    """,
    # A9 region revenue (document/glue_t2.md:86-97)
    "region_revenue": """
        SELECT r.r_name, n.n_name,
               ROUND(SUM(l.l_extendedprice) / 1000000, 2) AS revenue_musd,
               COUNT(l.l_extendedprice)                   AS count_of_purchase
        FROM lineitem l
        LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
        LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    """,
    # A10 customer-base stats (document/glue_t2.md:101-113)
    "customer_base_stats": """
        SELECT o_orderpriority,
               COUNT(DISTINCT o_custkey) AS count_of_customers,
               COUNT(o_custkey)          AS count_of_purchase,
               ROUND(COUNT(o_custkey) / COUNT(DISTINCT o_custkey), 2)
                   AS purchase_per_customer,
               ROUND(SUM(o_totalprice) / COUNT(o_custkey) / 10000, 2)
                   AS amount_per_purchase_10k,
               ROUND(SUM(o_totalprice) / COUNT(DISTINCT o_custkey) / 10000, 2)
                   AS amount_per_customer_10k
        FROM orders
        GROUP BY 1
    """,
    # A11 per-customer monthly stats (document/glue_t2.md:116-128)
    "customer_monthly_stats": """
        SELECT o_custkey AS customer_id,
               date_format(o_orderdate, 'yyyy') AS purchase_year,
               date_format(o_orderdate, 'MM')   AS purchase_month,
               COUNT(o_orderkey) AS count_of_purchase,
               ROUND(SUM(o_totalprice) / COUNT(o_orderkey) / 10000, 2)
                   AS amount_per_purchase_10k
        FROM orders
        GROUP BY 1, 2, 3
    """,
}


def run_athena_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Register the testdata views (the 'crawler') and run one named query."""
    register_views(spark, sf_dir)
    return spark.sql(ATHENA_SQL[name])
