"""JSON-lines source/sink.

Not in the reference's surface (CSV + parquet only, SURVEY.md §2.1) but
required for document corpora: the standard interchange format for text
pipelines is JSONL. Schema should be DECLARED for production scans —
inference reads the data twice and silently widens types; the helpers
accept an explicit StructType and only fall back to inference when asked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None, **options: str
) -> DataFrame:
    """Scan JSON-lines files; one JSON object per line. Malformed lines
    follow PERMISSIVE mode (NULL columns) unless mode is overridden."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as JSON lines (one object per row)."""
    df.write.mode(mode).json(path)
