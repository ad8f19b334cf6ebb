"""CSV scans and sinks (operators S1/S2/S7, reference README.md:135-152,
generate_clickstream.py:22-25/:275-276).

Two schema modes mirror the reference's hybrid schema system
(SURVEY.md §1.3): raw-zone reads infer like a Glue Crawler; declared
reads take an explicit StructType (the cleaned-zone DDL path) — which is
also the CSV-correctness answer for zero-padded id strings like the
sellers table's zip prefixes (SURVEY.md §7.4 hard part 5): declare
StringType instead of trusting inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_inferred(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Crawler-style CSV scan: header + schema inference (S1).

    Inference costs an extra pass over the data — acceptable at ingest
    time once, never in a query loop. At 100 TB, sample-based inference
    (``samplingRatio``) or a declared schema is the right call.
    """
    return spark.read.options(header=True, inferSchema=True, **options).csv(path)


def read_csv_declared(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    """Declared-schema CSV scan (S2 with fixed DDL): no inference pass;
    malformed cells become NULL (PERMISSIVE), matching the reference's
    pandas ``errors="coerce"`` semantics (generate_clickstream.py:56-59)."""
    return spark.read.options(header=True, mode="PERMISSIVE", **options).schema(schema).csv(path)


def ingest_raw_directory(
    spark: SparkSession, directory: str, db: str = "ecom_raw_db", suffix: str = ".csv"
) -> dict[str, DataFrame]:
    """Glue-Crawler-style raw-zone ingestion (reference README.md:135-152:
    the crawler walks the raw prefix and registers one inferred-schema
    table per dataset): discover every ``*.csv`` under ``directory`` and
    register each as an EXTERNAL CSV table ``db.<stem>`` — data stays in
    place, schema is inferred once at registration and pinned in the
    catalog, exactly the crawler contract. Returns {table_name: DataFrame}.

    Directory listing is driver-side (metadata scale, like the crawler
    itself); the scan of each table remains fully distributed. Inference
    is the raw-zone trade: zero-padded id strings (e.g. seller zip
    prefixes) infer as ints here — the cleaned zone re-reads with a
    declared schema (``read_csv_declared``), per SURVEY.md §7.4.
    """
    import os
    import re

    tables: dict[str, DataFrame] = {}
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for fname in sorted(os.listdir(directory)):
        if not fname.endswith(suffix):
            continue
        name = re.sub(r"[^0-9a-zA-Z_]", "_", fname[: -len(suffix)])
        path = os.path.join(directory, fname)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {db}.{name} "
            f"USING CSV OPTIONS (header 'true', inferSchema 'true') "
            f"LOCATION '{path}'"
        )
        tables[name] = spark.table(f"{db}.{name}")
    return tables


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (S7, generate_clickstream.py:275-276).
    Distributed write — one file per partition; callers wanting a single
    file coalesce(1) explicitly (a deliberate anti-scale choice)."""
    df.write.mode(mode).option("header", True).csv(path)
