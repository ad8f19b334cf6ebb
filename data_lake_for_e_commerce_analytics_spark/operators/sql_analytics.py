"""spark.sql variants of the analytics suite (SURVEY.md §7.1:
"G5 queries as DataFrame fns + spark.sql variants").

The reference runs these as Athena SQL strings (reference
README.md:357-403); `spark.sql` is the drop-in path — same Catalyst
plans as the DataFrame forms in analytics.py (tests assert result
equality). Views are registered once per call from the provided
DataFrames, so the functions stay catalog-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FUNNEL_SQL = """
    SELECT event_type, COUNT(DISTINCT user_id) AS sessions
    FROM {events}
    GROUP BY event_type
    ORDER BY sessions DESC, event_type
"""

CONVERSION_SQL = """
    WITH purchases AS (
        SELECT DISTINCT user_id AS p_user_id FROM {events} WHERE event_type = 'purchase'
    )
    SELECT c.c_mktsegment,
           COUNT(DISTINCT e.user_id) AS users,
           COUNT(DISTINCT p.p_user_id) AS buyers,
           ROUND(100.0 * COUNT(DISTINCT p.p_user_id) / COUNT(DISTINCT e.user_id), 4)
               AS conversion_rate_pct
    FROM {events} e
    JOIN {customer} c ON e.user_id = c.c_custkey
    LEFT JOIN purchases p ON e.user_id = p.p_user_id
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
"""

TOP_CATEGORIES_SQL = """
    SELECT p.p_type, ROUND(SUM(l.l_extendedprice), 2) AS revenue
    FROM {lineitem} l JOIN {part} p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_type
    ORDER BY revenue DESC, p.p_type
    LIMIT 10
"""


def _view(df: DataFrame, name: str) -> str:
    df.createOrReplaceTempView(name)
    return name


def funnel_sql(spark: SparkSession, events: DataFrame) -> DataFrame:
    return spark.sql(FUNNEL_SQL.format(events=_view(events, "v_events")))


def conversion_sql(
    spark: SparkSession, events: DataFrame, customer: DataFrame
) -> DataFrame:
    return spark.sql(
        CONVERSION_SQL.format(
            events=_view(events, "v_events"), customer=_view(customer, "v_customer")
        )
    )


def top_categories_sql(
    spark: SparkSession, lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    return spark.sql(
        TOP_CATEGORIES_SQL.format(
            lineitem=_view(lineitem, "v_lineitem"), part=_view(part, "v_part")
        )
    )


COHORT_RETENTION_SQL = """
    WITH cohort AS (
        SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort_month
        FROM {orders} GROUP BY o_custkey
    ),
    active AS (
        SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS active_month
        FROM {orders}
    )
    SELECT CAST(c.cohort_month AS DATE) AS cohort_month,
           CAST(ROUND(months_between(a.active_month, c.cohort_month)) AS BIGINT)
               AS months_since,
           COUNT(DISTINCT a.o_custkey) AS active_customers
    FROM active a JOIN cohort c ON a.o_custkey = c.o_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

ORDERED_FUNNEL_SQL = """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM {events} WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM {events} e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM {events} e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT 'view' AS step, 1 AS step_order, COUNT(*) AS users FROM v
    UNION ALL SELECT 'click', 2, COUNT(*) FROM c
    UNION ALL SELECT 'purchase', 3, COUNT(*) FROM p
    ORDER BY step_order
"""


def cohort_retention_sql(spark: SparkSession, orders: DataFrame) -> DataFrame:
    return spark.sql(
        COHORT_RETENTION_SQL.format(orders=_view(orders, "v_orders_cohort"))
    )


def ordered_funnel_sql(spark: SparkSession, events: DataFrame) -> DataFrame:
    return spark.sql(
        ORDERED_FUNNEL_SQL.format(events=_view(events, "v_events_funnel"))
    )
