"""Parquet table loaders for the driver's synthetic lake.

Ten tables per scale factor (TESTDATA.md): TPC-H-ish star schema
(`region nation customer supplier part orders lineitem`), an `events`
clickstream table, and the LLM-extension tables `documents`/`embeddings`.

At 100 TB these reads are partitioned parquet scans; everything downstream
relies on Catalyst pushing filters and pruning columns into these scans, so
loaders never materialize or cache — they return lazy DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns written as parquet TIMESTAMP(NANOS), which Spark's reader rejects
# outright (PARQUET_TYPE_ILLEGAL). With spark.sql.legacy.parquet.nanosAsLong
# they surface as bigint nanos; the loader restores micro-precision
# timestamps (matching what DuckDB yields for the same file).
_NANOS_TS_COLUMNS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table (operator S3-analog: named table scan)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Scan every table in the scale-factor directory."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def ensure_min_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Fan a low-parallelism scan out to the cluster before CPU-heavy
    per-row work (shingling, regex tokenization, hashing).

    Columnar compression makes text tables tiny on disk — a 600 KB
    parquet file arrives as ONE scan partition, which then serializes
    minutes of per-row codegen through a single core while the rest of
    the cluster idles. A round-robin repartition to the default
    parallelism moves only the (small, by definition) payload once and
    unlocks every core. At 100 TB the scan already yields thousands of
    partitions, so the branch is a no-op — this exists precisely for the
    small-file/CPU-heavy corner where Spark's size-based split planning
    mis-estimates compute cost.
    """
    target = max(int(df.sparkSession.sparkContext.defaultParallelism * min_factor), 1)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
