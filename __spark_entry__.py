"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Every query name maps to an operator row in SURVEY.md §2; the engine
implementation lives in ``data_lake_for_e_commerce_analytics_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_lake_for_e_commerce_analytics_spark.operators import analytics, cleaning
from data_lake_for_e_commerce_analytics_spark.sources import load_table

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the event funnel (reference README.md:363-369) on
    the sf0.001 events table."""
    return analytics.funnel(_t(spark, SF0001, "events"))


# --- query registry -------------------------------------------------------

def _q_funnel(spark: SparkSession, sf: str) -> DataFrame:
    return analytics.funnel(_t(spark, sf, "events"))


def _q_conversion(spark: SparkSession, sf: str) -> DataFrame:
    return analytics.conversion_by_segment(_t(spark, sf, "events"), _t(spark, sf, "customer"))


def _q_top_categories(spark: SparkSession, sf: str) -> DataFrame:
    return analytics.top_categories_by_revenue(_t(spark, sf, "lineitem"), _t(spark, sf, "part"))


def _q_distinct_purchasers(spark: SparkSession, sf: str) -> DataFrame:
    return analytics.distinct_purchasers(_t(spark, sf, "events"))


def _q_clean_orders(spark: SparkSession, sf: str) -> DataFrame:
    return cleaning.clean_orders(_t(spark, sf, "orders"))


def _q_clean_events(spark: SparkSession, sf: str) -> DataFrame:
    return cleaning.clean_events(_t(spark, sf, "events"))


def _q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    return analytics.pricing_summary(_t(spark, sf, "lineitem"))


def _q_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    return analytics.revenue_by_nation(
        _t(spark, sf, "customer"), _t(spark, sf, "orders"), _t(spark, sf, "lineitem"), _t(spark, sf, "nation")
    )


def _q_top_customers(spark: SparkSession, sf: str) -> DataFrame:
    return analytics.top_customers_by_spend(_t(spark, sf, "orders"), _t(spark, sf, "customer"))


def _q_daily_order_stats(spark: SparkSession, sf: str) -> DataFrame:
    return analytics.daily_order_stats(_t(spark, sf, "orders"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "funnel": _q_funnel,
        "conversion_by_segment": _q_conversion,
        "top_categories_revenue": _q_top_categories,
        "distinct_purchasers": _q_distinct_purchasers,
        "clean_orders": _q_clean_orders,
        "clean_events": _q_clean_events,
        "pricing_summary": _q_pricing_summary,
        "revenue_by_nation": _q_revenue_by_nation,
        "top_customers": _q_top_customers,
        "daily_order_stats": _q_daily_order_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "funnel": """
            SELECT event_type, COUNT(DISTINCT user_id) AS sessions
            FROM events GROUP BY event_type
            ORDER BY sessions DESC, event_type
        """,
        "conversion_by_segment": """
            WITH purchases AS (
                SELECT DISTINCT user_id AS p_user_id FROM events WHERE event_type = 'purchase'
            )
            SELECT c.c_mktsegment,
                   COUNT(DISTINCT e.user_id) AS users,
                   COUNT(DISTINCT p.p_user_id) AS buyers,
                   ROUND(100.0 * COUNT(DISTINCT p.p_user_id) / COUNT(DISTINCT e.user_id), 4)
                       AS conversion_rate_pct
            FROM events e
            JOIN customer c ON e.user_id = c.c_custkey
            LEFT JOIN purchases p ON e.user_id = p.p_user_id
            GROUP BY c.c_mktsegment
            ORDER BY c.c_mktsegment
        """,
        "top_categories_revenue": """
            SELECT p.p_type, ROUND(SUM(l.l_extendedprice), 2) AS revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_type
            ORDER BY revenue DESC, p.p_type
            LIMIT 10
        """,
        "distinct_purchasers": """
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' ORDER BY user_id
        """,
        "clean_orders": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
                   CAST(o_orderdate AS DATE) AS order_date
            FROM orders
        """,
        "clean_events": """
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props,
                   CAST(ts AS DATE) AS event_date
            FROM events
            WHERE ts IS NOT NULL
              AND event_type IN ('signup', 'click', 'view', 'purchase', 'error')
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_extendedprice), 4) AS avg_price,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n.n_name,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
            ORDER BY revenue DESC, n.n_name
        """,
        "top_customers": """
            WITH spend AS (
                SELECT o_custkey,
                       ROUND(SUM(o_totalprice), 2) AS total_spend,
                       COUNT(*) AS order_count
                FROM orders GROUP BY o_custkey
            )
            SELECT c.c_custkey, c.c_name, c.c_mktsegment, s.total_spend, s.order_count
            FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
            ORDER BY s.total_spend DESC, c.c_custkey
            LIMIT 10
        """,
        "daily_order_stats": """
            SELECT CAST(o_orderdate AS DATE) AS order_date,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS gmv,
                   ROUND(AVG(o_totalprice), 4) AS avg_order_value,
                   ROUND(MIN(o_totalprice), 2) AS min_order_value,
                   ROUND(MAX(o_totalprice), 2) AS max_order_value
            FROM orders
            GROUP BY CAST(o_orderdate AS DATE)
            ORDER BY order_date
        """,
    }
