"""Catalog / zone management and Parquet table registration
(operators S4/S5/S6/S8/S9).

The reference's Glue Data Catalog + Athena DDL (reference
README.md:127-152, :199-211, :248-344) map onto the Spark session
catalog: databases are zones, CTAS is ``CREATE TABLE ... USING PARQUET
AS SELECT``, external registration is ``createTable`` with a path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Parquet sink, overwrite mode (S4, reference README.md:193-196)."""
    df.write.mode(mode).parquet(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned Parquet sink (S9, reference README.md:288/:468
    'monthly partitioning is optional').

    Partition columns become directory keys -> static & dynamic partition
    pruning downstream. At 100 TB choose low-cardinality date-derived
    keys (order_date month, event_date) so files stay >100 MB.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def register_external_table(
    spark: SparkSession, db: str, table: str, path: str
) -> None:
    """External-table registration over existing Parquet (S5, reference
    README.md:202-211): schema read from the footer, location pinned."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {db}.{table} USING PARQUET LOCATION '{path}'"
    )


def ctas(spark: SparkSession, db: str, table: str, select_sql: str, path: str | None = None) -> None:
    """CREATE TABLE AS SELECT into a zone (S6, reference README.md:259-344).
    With ``path``, the table is external (the Athena ``external_location``
    pattern); otherwise managed in the warehouse dir."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    location = f"LOCATION '{path}'" if path else ""
    spark.sql(f"CREATE TABLE {db}.{table} USING PARQUET {location} AS {select_sql}")


def clear_stale_table_location(spark: SparkSession, db: str, table: str) -> None:
    """Clear a STALE managed-table directory before a saveAsTable.

    The session catalog is in-memory: a previous session (or a process
    with a reused default ``spark.sql.warehouse.dir``) can leave
    ``<warehouse>/<db>.db/<table>`` on disk while the current catalog
    has never heard of the table — saveAsTable then fails with
    LOCATION_ALREADY_EXISTS instead of overwriting. A catalog-KNOWN
    table is left alone (overwrite mode handles it); only the
    orphaned-directory case is cleaned."""
    from .fs import delete_path, path_exists

    if spark.catalog.tableExists(f"{db}.{table}"):
        return
    wh = spark.conf.get("spark.sql.warehouse.dir")
    loc = f"{wh.rstrip('/')}/{db}.db/{table}"
    if path_exists(spark, loc):
        delete_path(spark, loc, recursive=True)


def save_as_table(df: DataFrame, db: str, table: str, mode: str = "overwrite") -> None:
    """DataFrame-API CTAS: saveAsTable into a zone database."""
    df.sparkSession.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    clear_stale_table_location(df.sparkSession, db, table)
    df.write.mode(mode).format("parquet").saveAsTable(f"{db}.{table}")


def analyze_table(
    spark: SparkSession, qualified_table: str, columns: list[str] | None = None
) -> None:
    """ANALYZE TABLE: collect table-level stats (row count, size) and,
    when ``columns`` is given, per-column min/max/NDV/null-count
    histograms. These feed Catalyst's cost-based optimizer — join
    reordering and broadcast decisions stop guessing from file sizes
    and use real cardinalities. On a 100 TB lake this runs as a cheap
    stats-only scan per zone refresh, not per query."""
    spark.sql(f"ANALYZE TABLE {qualified_table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(
            f"ANALYZE TABLE {qualified_table} COMPUTE STATISTICS FOR COLUMNS {cols}"
        )


def table_stats(spark: SparkSession, qualified_table: str) -> dict[str, str]:
    """Read back the statistics ANALYZE recorded (rowCount / sizeInBytes
    from DESCRIBE EXTENDED) — the hook tests and operators use to assert
    the CBO has real numbers to plan with."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {qualified_table}").collect()
    out: dict[str, str] = {}
    for r in rows:
        if r["col_name"] == "Statistics":
            out["statistics"] = r["data_type"]
    return out
