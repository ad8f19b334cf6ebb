"""Silver-zone cleaning transforms (pipelines G1-G3 of SURVEY.md §2.13).

The reference's Glue jobs (reference README.md:164-197, :219-244) do four
things per table: project needed columns (P1), cast strings to
timestamp/double (F1/F11), derive a date column (P4/F2), and
dedupe/validate (A5/P6/P9). Each transform here is a pure
DataFrame->DataFrame function: lazy, pushdown-friendly, no driver-side
materialization — at 100 TB these run as a single scan->project->hash-agg
pipeline per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Event vocabulary validation (P9): the reference validates clickstream
# event_type membership (reference README.md:223, :75). Driver events table
# uses its own five-value vocabulary (FIXTURES.md).
EVENT_VOCABULARY = ("signup", "click", "view", "purchase", "error")


def clean_orders(orders: DataFrame) -> DataFrame:
    """G1 clean-orders ETL (reference README.md:177-196).

    project -> cast/derive order_date -> dropDuplicates(order key).
    The dedup is a hash aggregate on the key: the one shuffle in this
    pipeline, partitioned by o_orderkey (which is also the downstream join
    key, so the exchange is reusable).
    """
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        )
        .withColumn("order_date", F.to_date("o_orderdate"))
        .dropDuplicates(["o_orderkey"])
    )


def clean_events(events: DataFrame) -> DataFrame:
    """G2 clean-clickstream ETL (reference README.md:219-244).

    cast event timestamp -> derive event_date -> drop null-ts rows (P6) ->
    validate event_type membership (P9). Entirely scan-local: no shuffle;
    both filters push down to the parquet scan.
    """
    return (
        events.select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .withColumn("event_date", F.to_date("ts"))
        .na.drop(subset=["ts"])
        .filter(F.col("event_type").isin(list(EVENT_VOCABULARY)))
    )


def clean_customers(customer: DataFrame) -> DataFrame:
    """G3 'same pattern' cleaning for the customer dimension
    (reference README.md:213): projection only, no shuffle."""
    return customer.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")


def clean_order_items(lineitem: DataFrame) -> DataFrame:
    """G3 cleaning for order items (reference README.md:216-217):
    project key/price columns, cast amounts to double (F11)."""
    return lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
        F.col("l_discount").cast("double").alias("l_discount"),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Completeness/cardinality profile (Deequ-style data-quality pass):
    per column, row count, NULL count, and exact distinct count —
    computed in ONE aggregate over a single scan, then unpivoted with
    ``stack`` so the output is one row per column.

    Multiple exact COUNT(DISTINCT)s in one aggregate expand into Spark's
    multi-distinct plan (one expand + two-phase agg): still a single
    scan of the fact, which is the property that matters at 100 TB —
    never one job per column.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `{c}__nulls`, `{c}__distinct`" for c in cols)
    return (
        row.selectExpr(
            "_n AS n_rows",
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
        )
        .select("column_name", "n_rows", "n_nulls", "n_distinct")
        .orderBy("column_name")
    )
