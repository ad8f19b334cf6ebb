"""Gold-zone star-schema build (pipeline G4, reference README.md:248-353).

The reference's five Athena CTAS statements build dim_customer,
dim_product, fact_orders, fact_order_items, fact_events as pure
projections of the silver zone. Mapped onto the driver's tables:

    dim_customer     <- customer      (reference README.md:264-269)
    dim_product      <- part          (reference README.md:279-283)
    fact_orders      <- orders        (reference README.md:290-303)
    fact_order_items <- lineitem      (reference README.md:307-319)
    fact_events      <- events        (reference README.md:323-344)

FK relationships preserved (reference README.md:346-352):
fact_orders.customer_key -> dim_customer, fact_order_items.product_key ->
dim_product, fact_events.user/customer key -> dim_customer.

Projections are shuffle-free; each table is one scan -> project ->
parquet write. Fact tables optionally partition by their date column
(S9) for downstream partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import CURATED_DB
from ..sources.catalog import save_as_table


def dim_customer(customer: DataFrame) -> DataFrame:
    return customer.select(
        F.col("c_custkey").alias("customer_key"),
        F.col("c_name").alias("customer_name"),
        F.col("c_nationkey").alias("nation_key"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


def dim_product(part: DataFrame) -> DataFrame:
    return part.select(
        F.col("p_partkey").alias("product_key"),
        F.col("p_name").alias("product_name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("category"),
        F.col("p_retailprice").alias("retail_price"),
    )


def fact_orders(orders: DataFrame) -> DataFrame:
    return orders.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("customer_key"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_totalprice").alias("total_price"),
        F.col("o_orderdate").cast("timestamp").alias("order_ts"),
        F.to_date("o_orderdate").alias("order_date"),
    )


def fact_order_items(lineitem: DataFrame) -> DataFrame:
    return lineitem.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_partkey").alias("product_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
    )


def fact_events(events: DataFrame) -> DataFrame:
    return events.select(
        "event_id",
        F.col("user_id").alias("customer_key"),
        "event_type",
        F.col("ts").alias("event_ts"),
        F.to_date("ts").alias("event_date"),
        "value",
    )


GOLD_BUILDERS = {
    "dim_customer": ("customer", dim_customer),
    "dim_product": ("part", dim_product),
    "fact_orders": ("orders", fact_orders),
    "fact_order_items": ("lineitem", fact_order_items),
    "fact_events": ("events", fact_events),
}


def build_gold(
    spark: SparkSession, silver: dict[str, DataFrame], db: str = CURATED_DB
) -> dict[str, DataFrame]:
    """Build and register all five gold tables (the reference's five CTAS
    statements); returns the registered DataFrames."""
    out: dict[str, DataFrame] = {}
    for table, (source, builder) in GOLD_BUILDERS.items():
        save_as_table(builder(silver[source]), db, table)
        out[table] = spark.table(f"{db}.{table}")
    return out
