"""Reference-faithful end-to-end: dirty Olist-shaped raw data ->
Lakehouse facade (ingest -> clean -> gold -> the three showcase
queries), with golden values on a handcrafted fixture.

Fixture design (FIXTURES.md §B): duplicated order_id, an unparseable
timestamp, an invalid event_type, a NULL product category — each
exercising one cleaning contract of the reference
(README.md:175/:223/:464)."""

import pytest
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.api import Lakehouse
from data_lake_for_e_commerce_analytics_spark.operators import olist


@pytest.fixture(scope="module")
def lake(spark):
    lake = Lakehouse(spark)
    raw_orders = spark.createDataFrame(
        [
            ("o1", "c1", "delivered", "2017-01-05 10:00:00"),
            ("o1", "c1", "delivered", "2017-01-05 10:00:00"),  # duplicate
            ("o2", "c2", "delivered", "not-a-timestamp"),       # -> NULL ts
            ("o3", "c1", "shipped", "2017-02-01 09:30:00"),
        ],
        ["order_id", "customer_id", "order_status", "order_purchase_timestamp"],
    )
    raw_customers = spark.createDataFrame(
        [("c1", "u1", "sao paulo", "SP"), ("c2", "u2", "campinas", "SP")],
        ["customer_id", "customer_unique_id", "customer_city", "customer_state"],
    )
    raw_products = spark.createDataFrame(
        [("p1", "eletronicos"), ("p2", "moveis"), ("p3", None)],  # NULL category
        ["product_id", "product_category_name"],
    )
    raw_items = spark.createDataFrame(
        [
            ("o1", "p1", "100.0", "10.0"),
            ("o1", "p2", "50.0", "5.0"),
            ("o3", "p1", "200.0", "20.0"),
            ("o3", "p3", "25.0", "2.5"),
        ],
        ["order_id", "product_id", "price", "freight_value"],
    )
    raw_events = spark.createDataFrame(
        [
            ("e1", "s1", "c1", "page_view", "2017-01-05 09:40:00", "", "", "desktop", "seo", 1),
            ("e2", "s1", "c1", "purchase", "2017-01-05 10:00:00", "", "o1", "desktop", "seo", 1),
            ("e3", "s2", "", "page_view", "2017-01-06 11:00:00", "", "", "mobile", "ads", 0),
            ("e4", "s2", "", "bogus_type", "2017-01-06 11:01:00", "", "", "mobile", "ads", 0),  # invalid
            ("e5", "s3", "c2", "page_view", "2017-01-07 12:00:00", "", "", "tablet", "seo", 1),
        ],
        ["event_id", "session_id", "customer_id", "event_type", "event_ts",
         "product_id", "order_id", "device_type", "traffic_source", "is_authenticated"],
    )
    lake.register_raw("orders", raw_orders)
    lake.register_raw("customers", raw_customers)
    lake.register_raw("products", raw_products)
    lake.register_raw("order_items", raw_items)
    lake.register_raw("clickstream", raw_events)

    lake.clean("orders", olist.clean_orders)
    lake.clean("customers", olist.clean_customers)
    lake.clean("products", olist.clean_products)
    lake.clean("order_items", olist.clean_order_items)
    lake.clean("clickstream", olist.clean_clickstream)
    lake.build_gold()
    return lake


def test_clean_orders_contract(lake):
    rows = {r["order_id"]: r for r in lake.spark.table("ecom_cleaned_db.orders").collect()}
    assert len(rows) == 3                                  # dup removed
    assert rows["o2"]["order_purchase_timestamp"] is None  # bad ts -> NULL
    assert rows["o1"]["order_date"] is not None            # derived date


def test_clean_clickstream_drops_invalid_vocab(lake):
    ev = lake.spark.table("ecom_cleaned_db.clickstream")
    assert ev.count() == 4
    assert ev.filter(F.col("event_type") == "bogus_type").isEmpty()


def test_gold_star_schema_fk_integrity(lake):
    fo = lake.spark.table("ecom_curated_db.fact_orders")
    dc = lake.spark.table("ecom_curated_db.dim_customer")
    assert fo.join(dc, "customer_id", "left_anti").isEmpty()
    foi = lake.spark.table("ecom_curated_db.fact_order_items")
    dp = lake.spark.table("ecom_curated_db.dim_product")
    assert foi.join(dp, "product_id", "left_anti").isEmpty()


def test_funnel_golden(lake):
    got = {r["event_type"]: r["sessions"] for r in lake.funnel().collect()}
    assert got == {"page_view": 3, "purchase": 1}


def test_conversion_golden(lake):
    got = {r["traffic_source"]: r for r in lake.conversion_by_traffic_source().collect()}
    # seo: sessions s1 (purchase) + s3 -> 50%; ads: s2 only -> 0%
    assert got["seo"]["sessions"] == 2
    assert got["seo"]["purchase_sessions"] == 1
    assert got["seo"]["conversion_rate_pct"] == 50.0
    assert got["ads"]["sessions"] == 1
    assert got["ads"]["purchase_sessions"] == 0
    assert got["ads"]["conversion_rate_pct"] == 0.0


def test_top_categories_golden(lake):
    rows = lake.top_categories_by_revenue().collect()
    # eletronicos: 100 (o1/p1) + 200 (o3/p1) = 300; moveis: 50; NULL: 25
    assert [(r["product_category_name"], r["revenue"]) for r in rows] == [
        ("eletronicos", 300.0),
        ("moveis", 50.0),
        (None, 25.0),
    ]


def test_sql_entry_point(lake):
    n = lake.sql("SELECT COUNT(*) AS n FROM ecom_curated_db.fact_orders").head()["n"]
    assert n == 3


def test_geolocation_dim_and_seller_enrichment(spark):
    """Geolocation silver/gold contract on schema-identical fixture rows
    (the upstream CSV is a git-lfs pointer blob): string zip prefixes
    keep leading zeros, the dim is one row per prefix with centroid
    coords and the modal city/state, and the seller enrichment join
    locates every seller with a known prefix."""
    raw_geo = spark.createDataFrame(
        [
            ("01037", -23.5456, -46.6393, "Sao Paulo ", "sp"),
            ("01037", -23.5460, -46.6400, "sao paulo", "sp"),
            ("01037", -23.5450, -46.6390, "osasco", "sp"),
            ("09790", -23.7100, -46.5500, "sao bernardo do campo", "sp"),
        ],
        [
            "geolocation_zip_code_prefix",
            "geolocation_lat",
            "geolocation_lng",
            "geolocation_city",
            "geolocation_state",
        ],
    )
    dim = {r["geo_zip_prefix"]: r for r in olist.dim_geolocation(raw_geo).collect()}
    assert set(dim) == {"01037", "09790"}  # leading zero survives
    sp = dim["01037"]
    assert sp["n_points"] == 3
    assert sp["geo_city"] == "sao paulo"  # modal (2 of 3), normalized
    assert sp["geo_state"] == "SP"
    assert abs(sp["geo_lat"] - round((-23.5456 - 23.5460 - 23.5450) / 3, 6)) < 1e-9

    raw_sellers = spark.createDataFrame(
        [("s1", "01037", "sao paulo", "sp"), ("s2", "99999", "nowhere", "xx")],
        ["seller_id", "seller_zip_code_prefix", "seller_city", "seller_state"],
    )
    located = {r["seller_id"]: r for r in olist.sellers_with_geo(raw_sellers, raw_geo).collect()}
    assert located["s1"]["geo_city"] == "sao paulo"
    assert located["s2"]["geo_city"] is None  # unmatched prefix -> left join NULLs


def test_clean_order_payments_and_mix(spark):
    """Payments silver/gold contract on schema-identical fixture rows
    (the upstream CSV is a git-lfs pointer blob): string casts land int/
    double, the type is normalized, the (order_id, payment_sequential)
    dedup keeps the highest-value row deterministically, and the mix
    aggregates in integer cents."""
    raw = spark.createDataFrame(
        [
            ("o1", "1", "credit_card", "3", "120.50"),
            ("o1", "2", "voucher", "1", "10.00"),
            ("o1", "2", "voucher", "1", "12.00"),  # dup key: keep 12.00
            ("o2", "1", " BOLETO ", "1", "55.25"),  # normalize type
            ("o3", "1", "credit_card", "10", "99.99"),
        ],
        [
            "order_id",
            "payment_sequential",
            "payment_type",
            "payment_installments",
            "payment_value",
        ],
    )
    cleaned = olist.clean_order_payments(raw)
    assert dict(cleaned.dtypes) == {
        "order_id": "string",
        "payment_sequential": "int",
        "payment_type": "string",
        "payment_installments": "int",
        "payment_value": "double",
    }
    rows = {(r["order_id"], r["payment_sequential"]): r for r in cleaned.collect()}
    assert len(rows) == 4  # dup collapsed
    assert rows[("o1", 2)]["payment_value"] == 12.00
    assert rows[("o2", 1)]["payment_type"] == "boleto"

    orders = spark.createDataFrame(
        [("o1",), ("o2",), ("o3",)], ["order_id"]
    )
    mix = {r["payment_type"]: r for r in olist.payment_mix(cleaned, orders).collect()}
    assert mix["credit_card"]["n_payments"] == 2
    assert mix["credit_card"]["n_orders"] == 2
    assert abs(mix["credit_card"]["total_value"] - 220.49) < 1e-9
    assert abs(mix["credit_card"]["avg_installments"] - 6.5) < 1e-9
    assert mix["voucher"]["total_value"] == 12.00


def test_synth_payments_split_sums_to_order_total(tables):
    """The 60/40 integer-cents split must reconstruct each order total
    exactly — the property that makes the payments relation an exact
    cross-engine oracle."""
    from data_lake_for_e_commerce_analytics_spark.operators import payments

    raw = payments.synth_order_payments(tables["orders"])
    cleaned = olist.clean_order_payments(raw)
    recon = (
        cleaned.groupBy("order_id")
        .agg(F.sum(F.round(F.col("payment_value") * 100).cast("long")).alias("cents"))
    )
    orders = tables["orders"].select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
    )
    bad = recon.join(orders, "order_id").filter(
        F.col("cents") != F.col("total_cents")
    )
    assert bad.count() == 0
    # split orders really produce two payments
    two = cleaned.groupBy("order_id").count().filter("count = 2").count()
    assert two > 0


def test_clean_reviews_dedup_types_and_bad_dates(tables):
    """Silver reviews contract (r13): score typed int 1..5, unparseable
    creation dates -> NULL (answer ts still parses), duplicate
    (review_id, order_id) pairs collapse keep-first (smaller score
    wins by the window order), and review_ids DO collide across
    orders without losing rows."""
    from data_lake_for_e_commerce_analytics_spark.operators import reviews

    raw = reviews.synth_order_reviews(tables["orders"])
    cleaned = olist.clean_reviews(raw)
    rows = cleaned.collect()
    # one row per (review_id, order_id)
    assert len({(r["review_id"], r["order_id"]) for r in rows}) == len(rows)
    # raw really contained pair duplicates (the %11 second copies)
    assert raw.count() > len(rows)
    # review_id collides across orders (the real-file quirk) — more
    # orders than distinct review ids, none dropped
    assert len({r["review_id"] for r in rows}) < len(rows)
    for r in rows:
        assert 1 <= r["review_score"] <= 5
        if int(r["order_id"]) % 17 == 0:
            assert r["review_creation_ts"] is None and r["review_date"] is None
        else:
            assert r["review_creation_ts"] is not None
        assert r["review_answer_ts"] is not None
        # keep-first = smaller score for duplicated pairs
        if int(r["order_id"]) % 11 == 0 and int(r["order_id"]) % 3 != 2:
            k = int(r["order_id"])
            s0, s1 = (k * 7 + 3) % 5 + 1, (k * 7 + 4) % 5 + 1
            assert r["review_score"] == min(s0, s1)


def test_category_translation_dim_and_english_top_categories(spark):
    """dim_category_translation dedups to one English name per
    category; top_categories_by_revenue_en groups by the translated
    name with COALESCE fallback for untranslated categories."""
    items = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0), (3, 2.0)],
        "product_id int, price double",
    )
    products = spark.createDataFrame(
        [(1, "beleza_saude"), (2, "moveis"), (3, "sem_traducao")],
        "product_id int, product_category_name string",
    )
    trans = spark.createDataFrame(
        [
            ("beleza_saude", "health_beauty"),
            ("beleza_saude", "zz_dup_ignored"),
            ("moveis", "furniture"),
        ],
        "product_category_name string, product_category_name_english string",
    )
    dim = olist.dim_category_translation(trans)
    assert dim.count() == 2  # dup collapsed deterministically (MIN)
    top = {
        r["category_en"]: r["revenue"]
        for r in olist.top_categories_by_revenue_en(items, products, dim).collect()
    }
    assert top == {"health_beauty": 15.0, "furniture": 7.0, "sem_traducao": 2.0}
