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
