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


# The event-time column has been written differently across testdata
# generations: parquet TIMESTAMP(NANOS) (surfaced as bigint nanos under
# spark.sql.legacy.parquet.nanosAsLong) or TIMESTAMP(MICROS) with
# isAdjustedToUTC=false (surfaced as TIMESTAMP_NTZ). Downstream operators
# use instant functions (unix_micros, to_unix_timestamp) that require
# TIMESTAMP_LTZ, so the loader normalizes both encodings to session-local
# (UTC) timestamps — value-preserving, and identical to what DuckDB yields
# for the same file.
_EVENT_TS_COLUMNS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table (operator S3-analog: named table scan)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _EVENT_TS_COLUMNS.get(name, ()):
        if col not in df.columns:
            continue
        dtype = df.schema[col].dataType
        if isinstance(dtype, T.LongType):
            # nanosAsLong surfaces TIMESTAMP(NANOS) as epoch-nanos bigint.
            # `div 1000` assumes nanos: 2020s instants are ~1.7e18 nanos
            # vs ~1.7e15 micros, so a plain-micros INT64 column slipping
            # in here would be off by 1000x — fail loudly instead.
            df = df.withColumn(
                col,
                F.expr(
                    f"timestamp_micros(CASE WHEN {col} IS NULL"
                    f" OR abs({col}) >= 100000000000000000"
                    f" OR {col} = 0 THEN {col} div 1000"
                    f" ELSE raise_error('expected epoch-nanos magnitude in {name}.{col}') END)"
                ),
            )
        elif isinstance(dtype, T.TimestampNTZType):
            # NTZ wall-clock values are UTC instants in this lake. A
            # bare LTZ cast would interpret them in SESSION-local time
            # (shifting every instant on non-UTC sessions), and the
            # to_utc_timestamp/from_utc_timestamp pair only rewrites
            # wall clocks. Session-independent conversion: the NTZ wall
            # clock minus the NTZ epoch IS the UTC epoch offset.
            df = df.withColumn(
                col,
                F.expr(
                    f"timestamp_micros(timestampdiff(MICROSECOND,"
                    f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}))"
                ),
            )
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
