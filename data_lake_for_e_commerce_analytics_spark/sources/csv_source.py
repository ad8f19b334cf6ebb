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


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (S7, generate_clickstream.py:275-276).
    Distributed write — one file per partition; callers wanting a single
    file coalesce(1) explicitly (a deliberate anti-scale choice)."""
    df.write.mode(mode).option("header", True).csv(path)
