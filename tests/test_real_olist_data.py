"""Ingestion tests against the REAL Olist CSVs shipped with the
reference repo (data files, read-only): the measured quirks in
SURVEY.md §1.4 — mixed per-field quoting, zero-padded zip prefixes,
NULL categories — must survive our reader defaults."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_for_e_commerce_analytics_spark.operators import olist
from data_lake_for_e_commerce_analytics_spark.sources import csv_source

PRODUCTS = "/root/reference/olist_products_dataset.csv"
SELLERS = "/root/reference/olist_sellers_dataset.csv"

needs_data = pytest.mark.skipif(
    not (os.path.exists(PRODUCTS) and os.path.exists(SELLERS)),
    reason="reference Olist CSVs not present",
)


@needs_data
def test_products_csv_real_measurements(spark):
    """32,951 products, 610 NULL categories, product_id unique
    (SURVEY.md §1.4 measured facts)."""
    df = csv_source.read_csv_inferred(spark, PRODUCTS)
    assert df.count() == 32951
    assert df.filter(F.col("product_category_name").isNull()).count() == 610
    assert df.select("product_id").distinct().count() == 32951
    cleaned = olist.clean_products(df)
    assert cleaned.columns == ["product_id", "product_category_name"]
    # NULL categories are preserved, not dropped
    assert cleaned.filter(F.col("product_category_name").isNull()).count() == 610


@needs_data
def test_sellers_csv_zero_padded_zip_survives_declared_schema(spark):
    """Mixed quoting + zero-padded zips: declared StringType schema keeps
    '01310'-style prefixes intact (inference would int-ify them)."""
    schema = T.StructType(
        [
            T.StructField("seller_id", T.StringType()),
            T.StructField("seller_zip_code_prefix", T.StringType()),
            T.StructField("seller_city", T.StringType()),
            T.StructField("seller_state", T.StringType()),
        ]
    )
    df = csv_source.read_csv_declared(spark, SELLERS, schema)
    assert df.count() == 3095
    zips = df.select("seller_zip_code_prefix")
    padded = zips.filter(F.col("seller_zip_code_prefix").startswith("0")).count()
    assert padded > 0  # zero-padded prefixes exist and survived
    assert zips.filter(F.length("seller_zip_code_prefix") != 5).count() == 0
    # mixed per-field quoting parsed correctly: city names with no quotes
    assert df.filter(F.col("seller_city") == "campinas").count() >= 1


@needs_data
def test_ingest_raw_directory_registers_all_csvs(spark):
    """Crawler semantics: one call over the reference data directory
    registers every CSV as an external inferred-schema table in the raw
    DB, readable back through the catalog."""
    tables = csv_source.ingest_raw_directory(spark, "/root/reference", db="ecom_raw_db")
    assert len(tables) >= 2
    assert "olist_products_dataset" in tables
    assert "olist_sellers_dataset" in tables
    # catalog read-back, not just the returned handles
    prod = spark.table("ecom_raw_db.olist_products_dataset")
    sell = spark.table("ecom_raw_db.olist_sellers_dataset")
    assert prod.count() == 32951
    assert sell.count() > 0
    assert "product_id" in prod.columns
    # data stayed in place: external location, no copy
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED ecom_raw_db.olist_products_dataset")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    assert "reference" in loc


def test_clean_sellers_real_csv(spark):
    from data_lake_for_e_commerce_analytics_spark.operators import olist
    from data_lake_for_e_commerce_analytics_spark.sources.csv_source import (
        read_csv_inferred,
    )

    raw = read_csv_inferred(spark, SELLERS)
    dim = olist.dim_sellers(raw)
    rows = dim.collect()
    # 3,095 sellers in the shipped file, all ids distinct after dedup
    assert len(rows) == 3095
    assert len({r["seller_id"] for r in rows}) == 3095
    for r in rows[:200]:
        assert r["seller_state"] == r["seller_state"].upper()
        assert r["seller_city"] == r["seller_city"].strip().lower()
