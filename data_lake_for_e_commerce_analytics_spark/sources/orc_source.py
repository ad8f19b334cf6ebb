"""ORC source/sink + schema-evolution reads.

Not in the reference's surface (CSV + parquet only, SURVEY.md §2.1), but
a lake that ingests from Hive-era warehouses meets ORC constantly; Spark
carries a native vectorized ORC reader, so support costs one format
string. Schema-evolution reads cover the other interop reality: a table
whose parquet files were written across schema versions (columns added
over time) must scan as ONE relation with NULLs for the missing
columns — ``mergeSchema`` unions the footers at planning time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Scan ORC files (native vectorized reader — same pushdown/pruning
    behavior as the parquet scans downstream operators rely on)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zstd-compressed; ORC's default zlib trades ~15% size
    for slower scans)."""
    df.write.mode(mode).option("compression", "zstd").orc(path)


def read_parquet_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Scan a parquet directory written across SCHEMA VERSIONS as one
    relation: ``mergeSchema`` unions all footers, files missing a
    column yield NULLs for it. The planning cost is one footer read per
    file — at 100 TB pin the merged schema in a catalog table instead
    of re-merging per query (register once via
    catalog.register_external_table, then ALTER on evolution)."""
    return spark.read.option("mergeSchema", "true").parquet(path)
