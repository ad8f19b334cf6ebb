"""The reference's own pipelines, verbatim, on Olist-shaped tables.

Where operators/{cleaning,analytics,star_schema}.py express the
reference's SEMANTICS over the driver's TPC-H-ish tables (for the DuckDB
oracle gate), this module reproduces the reference's exact column names
and transforms so a user of the reference can run the same pipeline
unchanged:

- G1 clean orders        (reference README.md:177-196)
- G2 clean clickstream   (reference README.md:219-244)
- G3 clean customers / products / order_items (reference README.md:213-217)
- G4 gold star schema    (reference README.md:259-344)
- G5 analytics suite     (reference README.md:357-403)

All pure DataFrame ops; dims are broadcast in the revenue join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EVENT_VOCAB = ("page_view", "view_product", "add_to_cart", "checkout", "purchase")


# --- G1-G3: silver cleaning -------------------------------------------------

def clean_orders(raw_orders: DataFrame) -> DataFrame:
    """Cast the purchase timestamp (NULL on parse failure — the pandas
    errors='coerce' semantics of generate_clickstream.py:56-59 require
    try_to_timestamp under ANSI mode), derive order_date, dedup on
    order_id (reference README.md:183-190)."""
    return (
        raw_orders.select(
            "order_id",
            "customer_id",
            F.try_to_timestamp("order_purchase_timestamp").alias("order_purchase_timestamp"),
            "order_status",
        )
        .withColumn("order_date", F.to_date(F.col("order_purchase_timestamp")))
        .dropDuplicates(["order_id"])
    )


def clean_customers(raw_customers: DataFrame) -> DataFrame:
    """Project id/city/state (reference README.md:213)."""
    return raw_customers.select("customer_id", "customer_city", "customer_state")


def clean_sellers(raw_sellers: DataFrame) -> DataFrame:
    """Silver treatment for the sellers dataset (the one Olist file the
    reference ingests but never cleans — its gold schema has no seller
    dim, so this is an additive extension, not a parity change): keep
    the zero-padded zip prefix as a STRING (dropping it to int loses
    leading zeros — the same trap the declared-schema CSV tests pin),
    trim/lowercase the city, uppercase the state."""
    return raw_sellers.select(
        "seller_id",
        F.col("seller_zip_code_prefix").cast("string").alias("seller_zip_prefix"),
        F.lower(F.trim("seller_city")).alias("seller_city"),
        F.upper(F.trim("seller_state")).alias("seller_state"),
    )


def dim_sellers(raw_sellers: DataFrame) -> DataFrame:
    """Gold seller dimension: cleaned sellers, deduplicated by id
    (deterministic keep-first on the cleaned projection)."""
    w = Window.partitionBy("seller_id").orderBy(
        "seller_zip_prefix", "seller_city", "seller_state"
    )
    return (
        clean_sellers(raw_sellers)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def clean_geolocation(raw_geo: DataFrame) -> DataFrame:
    """Silver treatment for the geolocation dataset (reference
    README.md:61 enumerates it; like sellers it never reaches the
    reference's gold schema, so this is an additive extension). The
    shipped blob is a git-lfs pointer upstream, so the contract is
    pinned on schema-identical fixture rows: zip prefix kept as STRING
    (leading zeros), lat/lng cast double, city/state normalized."""
    return raw_geo.select(
        F.col("geolocation_zip_code_prefix").cast("string").alias("geo_zip_prefix"),
        F.col("geolocation_lat").cast("double").alias("geo_lat"),
        F.col("geolocation_lng").cast("double").alias("geo_lng"),
        F.lower(F.trim("geolocation_city")).alias("geo_city"),
        F.upper(F.trim("geolocation_state")).alias("geo_state"),
    )


def dim_geolocation(raw_geo: DataFrame) -> DataFrame:
    """Gold geolocation dimension: ONE row per zip prefix — centroid
    lat/lng plus the modal (most frequent) city/state. The real file is
    ~1M points over ~19k prefixes; both aggregates shuffle prefix-level
    partials only (avg combines map-side, the mode is a count + one
    row_number over prefix partitions), so the dim stays broadcastable
    no matter how many raw points arrive."""
    g = clean_geolocation(raw_geo)
    coords = g.groupBy("geo_zip_prefix").agg(
        F.round(F.avg("geo_lat"), 6).alias("geo_lat"),
        F.round(F.avg("geo_lng"), 6).alias("geo_lng"),
        F.count(F.lit(1)).alias("n_points"),
    )
    city_counts = g.groupBy("geo_zip_prefix", "geo_city", "geo_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("geo_zip_prefix").orderBy(
        F.desc("n"), "geo_city", "geo_state"
    )
    modal = (
        city_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("geo_zip_prefix", "geo_city", "geo_state")
    )
    return coords.join(modal, "geo_zip_prefix")


def sellers_with_geo(raw_sellers: DataFrame, raw_geo: DataFrame) -> DataFrame:
    """Enrichment join: the seller dimension located via the prefix-level
    geolocation dim (broadcast — it is bounded by the zip-prefix space,
    never by raw point count)."""
    geo = dim_geolocation(raw_geo).withColumnRenamed("geo_zip_prefix", "seller_zip_prefix")
    return dim_sellers(raw_sellers).join(
        F.broadcast(geo), "seller_zip_prefix", "left"
    )


def clean_order_payments(raw_payments: DataFrame) -> DataFrame:
    """Silver treatment for the payments dataset — the last of the nine
    source CSVs the reference enumerates (reference README.md:58; the
    shipped file is a git-lfs pointer upstream, so like geolocation the
    contract is pinned on schema-identical fixture rows): sequential and
    installments cast int, payment_value cast double, payment_type
    normalized, deterministic dedup on the natural key
    (order_id, payment_sequential) keeping the highest-value row."""
    w = Window.partitionBy("order_id", "payment_sequential").orderBy(
        F.desc("payment_value"), "payment_type"
    )
    return (
        raw_payments.select(
            "order_id",
            F.col("payment_sequential").cast("int").alias("payment_sequential"),
            F.lower(F.trim("payment_type")).alias("payment_type"),
            F.col("payment_installments").cast("int").alias("payment_installments"),
            F.col("payment_value").cast("double").alias("payment_value"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def payment_mix(cleaned_payments: DataFrame, cleaned_orders: DataFrame) -> DataFrame:
    """Payment-type revenue mix over known orders: per type, payment and
    order counts, total value, and mean installment count. The join on
    order_id keeps only payments whose order survived silver cleaning
    (both sides shuffle-partition on order_id at scale — payments is
    order-cardinality, never broadcastable). Money sums run in integer
    cents (order-free partial aggregation; one final IEEE division), the
    repo's oracle-parity rule."""
    return (
        cleaned_payments.join(cleaned_orders.select("order_id"), "order_id")
        .groupBy("payment_type")
        .agg(
            F.count(F.lit(1)).alias("n_payments"),
            F.countDistinct("order_id").alias("n_orders"),
            (
                F.sum(F.round(F.col("payment_value") * 100).cast("long")) / 100.0
            ).alias("total_value"),
            F.round(
                F.sum("payment_installments") / F.count(F.lit(1)), 4
            ).alias("avg_installments"),
        )
        .orderBy("payment_type")
    )


def clean_products(raw_products: DataFrame) -> DataFrame:
    """Project id/category (reference README.md:215); NULL categories kept
    (the real Olist file has 610 of them — downstream grouping must not
    drop the NULL group silently)."""
    return raw_products.select("product_id", "product_category_name")


def clean_order_items(raw_items: DataFrame) -> DataFrame:
    """Project + cast price/freight to double (reference README.md:217,
    :462)."""
    return raw_items.select(
        "order_id",
        "product_id",
        F.col("price").cast("double").alias("price"),
        F.col("freight_value").cast("double").alias("freight_value"),
    )


def clean_clickstream(raw_events: DataFrame) -> DataFrame:
    """Cast event_ts, derive event_date, validate the event vocabulary
    (reference README.md:219-244; vocabulary README.md:75)."""
    return (
        raw_events.withColumn("event_ts", F.try_to_timestamp("event_ts"))
        .withColumn("event_date", F.to_date("event_ts"))
        .filter(F.col("event_type").isin(list(EVENT_VOCAB)))
    )


# --- G4: gold star schema ---------------------------------------------------

def build_star(
    cleaned_orders: DataFrame,
    cleaned_customers: DataFrame,
    cleaned_products: DataFrame,
    cleaned_items: DataFrame,
    cleaned_events: DataFrame,
) -> dict[str, DataFrame]:
    """The five gold CTAS projections (reference README.md:259-344)."""
    return {
        "dim_customer": cleaned_customers.select(
            "customer_id", "customer_city", "customer_state"
        ),
        "dim_product": cleaned_products.select("product_id", "product_category_name"),
        "fact_orders": cleaned_orders.select(
            "order_id", "customer_id", "order_status", "order_purchase_timestamp", "order_date"
        ),
        "fact_order_items": cleaned_items.select(
            "order_id", "product_id", "price", "freight_value"
        ),
        "fact_events": cleaned_events.select(
            "event_id", "session_id", "customer_id", "event_type", "event_ts",
            "product_id", "order_id", "device_type", "traffic_source",
            "is_authenticated", "event_date",
        ),
    }


# --- G5: the three showcase queries ----------------------------------------

def funnel(fact_events: DataFrame) -> DataFrame:
    """Sessions per event type, descending (reference README.md:363-369)."""
    return (
        fact_events.groupBy("event_type")
        .agg(F.countDistinct("session_id").alias("sessions"))
        .orderBy(F.desc("sessions"), "event_type")
    )


def conversion_by_traffic_source(fact_events: DataFrame) -> DataFrame:
    """Conversion rate per traffic source via LEFT JOIN to the DISTINCT
    purchase-session CTE; COUNT(DISTINCT right-key) skips the NULLs of
    unmatched sessions — the semantics pinned in SURVEY.md §7.4 hard
    part 1 (reference README.md:373-390)."""
    purchases = (
        fact_events.filter(F.col("event_type") == "purchase")
        .select(F.col("session_id").alias("p_session_id"))
        .distinct()
    )
    return (
        fact_events.join(
            F.broadcast(purchases),
            fact_events.session_id == purchases.p_session_id,
            "left",
        )
        .groupBy("traffic_source")
        .agg(
            F.countDistinct("session_id").alias("sessions"),
            F.countDistinct("p_session_id").alias("purchase_sessions"),
        )
        .withColumn(
            "conversion_rate_pct",
            F.round(100.0 * F.col("purchase_sessions") / F.col("sessions"), 4),
        )
        .orderBy("traffic_source")
    )


def top_categories_by_revenue(
    fact_order_items: DataFrame, dim_product: DataFrame, k: int = 10
) -> DataFrame:
    """Revenue per category, top k (reference README.md:393-402). The
    dim side is broadcast — a fact-scan-sized shuffle would be the 100 TB
    mistake here."""
    return (
        fact_order_items.join(F.broadcast(dim_product), "product_id")
        .groupBy("product_category_name")
        .agg(F.round(F.sum("price"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "product_category_name")
        .limit(k)
    )


# --- reviews + category translation (r13): the last two enumerated ---------
# Olist inputs (reference README.md:57,60) — neither reaches the
# reference's gold schema or queries, so both are additive extensions
# mirroring the sellers/geolocation treatment.

def clean_reviews(raw_reviews: DataFrame) -> DataFrame:
    """Silver treatment for ``olist_order_reviews_dataset.csv``: type
    the score (int), parse creation/answer timestamps with NULL on
    failure (try_to_timestamp — the errors='coerce' semantics every
    silver cast in this module uses), derive review_date, and
    deduplicate by (review_id, order_id) keep-first. The real file's
    quirk: a review_id can span MULTIPLE orders (~800 do), so deduping
    by review_id alone would silently drop legitimate order feedback —
    the key is the pair, and keep-first is made deterministic by
    ordering on the full remaining payload."""
    typed = raw_reviews.select(
        "review_id",
        "order_id",
        F.col("review_score").cast("int").alias("review_score"),
        "review_comment_title",
        F.try_to_timestamp("review_creation_date").alias("review_creation_ts"),
        F.try_to_timestamp("review_answer_timestamp").alias("review_answer_ts"),
    ).withColumn("review_date", F.to_date("review_creation_ts"))
    w = Window.partitionBy("review_id", "order_id").orderBy(
        "review_score", "review_creation_ts", "review_answer_ts"
    )
    return (
        typed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def review_score_by_status(
    cleaned_reviews: DataFrame, cleaned_orders: DataFrame
) -> DataFrame:
    """Review analytics over the silver tables: per order_status, the
    review count, exact average score (integer sum / count, rounded 4),
    share of reviews with an unparseable creation date, and titled-
    comment count. Joins on order_id with the REVIEW side as the
    build/broadcast candidate only if small — here both sides shuffle
    on order_id once; the aggregate carries status-level partials."""
    return (
        cleaned_reviews.join(
            cleaned_orders.select("order_id", "order_status"), "order_id"
        )
        .groupBy("order_status")
        .agg(
            F.count(F.lit(1)).alias("n_reviews"),
            F.round(
                F.sum("review_score") / F.count(F.lit(1)), 4
            ).alias("avg_score"),
            (F.count(F.lit(1)) - F.count("review_creation_ts")).alias(
                "n_bad_dates"
            ),
            F.count("review_comment_title").alias("n_titled"),
        )
        .orderBy("order_status")
    )


def dim_category_translation(raw_translation: DataFrame) -> DataFrame:
    """Gold dimension for ``product_category_name_translation.csv``:
    one row per Portuguese category with its English name,
    deterministically deduplicated (keep the smallest English name per
    category — the file should be unique, but a dim build must not
    depend on that)."""
    return (
        raw_translation.groupBy("product_category_name")
        .agg(
            F.min("product_category_name_english").alias(
                "product_category_name_english"
            )
        )
    )


def top_categories_by_revenue_en(
    fact_order_items: DataFrame,
    dim_product: DataFrame,
    translation: DataFrame,
    k: int = 10,
) -> DataFrame:
    """The reference's top-categories query (README.md:394-402) with
    the category translation applied — the stated purpose of the
    translation file (the Portuguese-named result is what README.md:60
    exists to fix). Untranslated categories fall back to their original
    name (COALESCE), so a partial translation file never drops revenue
    rows. Both dims broadcast; the fact scan never shuffles for the
    joins."""
    return (
        fact_order_items.join(F.broadcast(dim_product), "product_id")
        .join(F.broadcast(translation), "product_category_name", "left")
        .select(
            F.coalesce(
                "product_category_name_english", "product_category_name"
            ).alias("category_en"),
            "price",
        )
        .groupBy("category_en")
        .agg(F.round(F.sum("price"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "category_en")
        .limit(k)
    )
