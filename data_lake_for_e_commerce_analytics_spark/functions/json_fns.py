"""JSON column helpers (events.props is a JSON string column).

The reference has no JSON surface (SURVEY.md §2.9), but the driver's
events table motivates it. ``get_json_object``/``from_json`` are JVM
expressions — pushdown-safe and codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


def props_field(col: Column | str, field: str = "k") -> Column:
    """Extract one scalar field from a JSON string column."""
    return F.get_json_object(col, f"$.{field}")


def parse_props(events: DataFrame) -> DataFrame:
    """Parse events.props into a typed struct column via from_json."""
    return events.withColumn("props_struct", F.from_json("props", PROPS_SCHEMA))


def flatten_json(
    df: DataFrame, json_col: str, sample_rows: int = 100, prefix: str = ""
) -> DataFrame:
    """Flatten a JSON string column into typed top-level columns, with the
    schema DISCOVERED from a bounded sample: union the inferred schemas
    of up to ``sample_rows`` non-null values, then apply one
    ``from_json`` over the full relation.

    The sample is the only driver-side step and is bounded (metadata
    scale); the flatten itself is a single JVM ``from_json`` projection —
    no per-row Python, no schema inference pass over the full 100 TB
    column. Keys absent from a row become NULLs; keys absent from the
    sample are dropped (the documented trade-off of sampled discovery —
    raise ``sample_rows`` or pass an explicit schema for long-tail keys).
    """
    spark = df.sparkSession
    samples = [
        r[0]
        for r in df.select(json_col).filter(F.col(json_col).isNotNull()).limit(sample_rows).collect()
    ]
    if not samples:
        return df
    merged = T.StructType()
    # All samples infer in ONE job (one row, one column per sample) —
    # per-sample collect() launched 100 tiny jobs and dominated the
    # operator's wall clock.
    inferred_all = (
        spark.range(1)
        .select(
            *[
                F.schema_of_json(F.lit(s)).alias(f"s{i}")
                for i, s in enumerate(samples)
            ]
        )
        .collect()[0]
    )
    for inferred in inferred_all:
        # schema_of_json returns a DDL string; merge field-by-field
        struct = T.StructType.fromDDL(inferred)
        if isinstance(struct, T.StructType):
            for f in struct.fields:
                if f.name not in merged.fieldNames():
                    merged.add(f)
    if not merged.fields:
        return df
    parsed_col = F.from_json(F.col(json_col), merged)
    return df.select(
        "*",
        *[
            parsed_col.getField(f.name).alias(f"{prefix}{f.name}")
            for f in merged.fields
        ],
    )
