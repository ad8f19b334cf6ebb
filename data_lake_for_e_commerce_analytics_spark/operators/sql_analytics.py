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


# Spark-SQL dialect of operators/partsupp.PARTSUPP_CTE: explode(array())
# replaces unnest([]), a windowed scalar count replaces the correlated
# subquery — otherwise the text is the portable CTE. Proves the SQL
# surface carries the synthetic relation end-to-end (C1 composition).
MIN_COST_SUPPLIER_SQL = """
    WITH s_cnt AS (SELECT COUNT(*) AS s FROM {supplier}),
    partsupp AS (
        SELECT
            p.p_partkey AS ps_partkey,
            (p.p_partkey * 4 + i.i) % s_cnt.s AS ps_suppkey,
            (p.p_partkey * 13 + i.i * 29) % 99901 + 100 AS ps_supplycost_cents
        FROM {part} p
        CROSS JOIN s_cnt
        LATERAL VIEW explode(array(0, 1, 2, 3)) i AS i
    ),
    sup AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM {supplier}
        JOIN {nation} ON s_nationkey = n_nationkey
        JOIN {region} ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    j AS (
        SELECT s.s_acctbal, s.s_name, s.n_name, ps.ps_partkey,
               p.p_retailprice, ps.ps_supplycost_cents,
               MIN(ps.ps_supplycost_cents)
                   OVER (PARTITION BY ps.ps_partkey) AS min_cents
        FROM partsupp ps
        JOIN {part} p ON ps.ps_partkey = p.p_partkey AND p.p_size = 15
        JOIN sup s ON ps.ps_suppkey = s.s_suppkey
    )
    SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey, p_retailprice,
           CAST(ps_supplycost_cents AS DOUBLE) / 100.0 AS supplycost
    FROM j
    WHERE ps_supplycost_cents = min_cents
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""


def min_cost_supplier_sql(
    spark: SparkSession,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    return spark.sql(
        MIN_COST_SUPPLIER_SQL.format(
            part=_view(part, "v_part"),
            supplier=_view(supplier, "v_supplier"),
            nation=_view(nation, "v_nation"),
            region=_view(region, "v_region"),
        )
    )
