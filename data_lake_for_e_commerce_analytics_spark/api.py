"""Public engine facade: the three entry points SURVEY.md §3 derives
from the reference's architecture — (1) raw ingestion into a cataloged
zone, (2) silver cleaning, (3) gold star build + analytics/SQL — bound
to the three medallion namespaces (reference README.md:132/:161/:253).

    lake = Lakehouse(spark)
    lake.ingest_csv("orders", "/data/olist_orders_dataset.csv")
    lake.clean("orders", olist.clean_orders)
    gold = lake.build_gold()
    lake.sql("SELECT ... FROM ecom_curated_db.fact_orders ...")
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .operators import olist
from .session import CLEANED_DB, CURATED_DB, RAW_DB, create_zones
from .sources import csv_source
from .sources.catalog import clear_stale_table_location


def concurrent_ddl_safe(spark: SparkSession) -> bool:
    """True iff concurrent ``saveAsTable`` DDL against this session's
    catalog is safe. The in-memory catalog is thread-safe; concurrent
    DDL against an embedded-Derby Hive metastore can throw (Derby
    allows one connection), so the parallel-write fast path must fall
    back to sequential there (ADVICE r14)."""
    try:
        impl = spark.conf.get("spark.sql.catalogImplementation", "in-memory")
    except Exception:
        return False
    return impl == "in-memory"


def run_catalog_writes(spark: SparkSession, fn, items) -> None:
    """Run independent catalog-writing jobs — a 3-worker thread pool so
    each job's commit/tail back-fills the others (guide §2.6) when the
    catalog tolerates concurrent DDL, strictly sequential otherwise."""
    items = list(items)
    if concurrent_ddl_safe(spark):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            list(pool.map(fn, items))
    else:
        for it in items:
            fn(it)


class Lakehouse:
    """One session object mirroring the reference's three Glue databases."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        create_zones(spark)

    def _prepare_write(self, db: str, table: str) -> None:
        """See sources/catalog.clear_stale_table_location — the shared
        guard against LOCATION_ALREADY_EXISTS from a prior session's
        orphaned managed-table directory."""
        clear_stale_table_location(self.spark, db, table)

    # --- entry point 1: ingestion (reference README.md:127-152) ----------
    def ingest_csv(
        self, table: str, path: str, schema: T.StructType | None = None
    ) -> DataFrame:
        """CSV -> cataloged raw table. Schema inference mirrors the Glue
        crawler; pass an explicit StructType to pin string-typed ids/zips
        (SURVEY.md §7.4 hard part 5)."""
        df = (
            csv_source.read_csv_declared(self.spark, path, schema)
            if schema is not None
            else csv_source.read_csv_inferred(self.spark, path)
        )
        self._prepare_write(RAW_DB, table)
        df.write.mode("overwrite").saveAsTable(f"{RAW_DB}.{table}")
        return self.spark.table(f"{RAW_DB}.{table}")

    def register_raw(self, table: str, df: DataFrame) -> DataFrame:
        """Register an already-loaded DataFrame as a raw table."""
        self._prepare_write(RAW_DB, table)
        df.write.mode("overwrite").saveAsTable(f"{RAW_DB}.{table}")
        return self.spark.table(f"{RAW_DB}.{table}")

    # --- entry point 2: silver cleaning (reference README.md:164-197) ----
    def clean(
        self, table: str, transform: Callable[[DataFrame], DataFrame]
    ) -> DataFrame:
        """raw table -> transform -> cleaned Parquet table."""
        out = transform(self.spark.table(f"{RAW_DB}.{table}"))
        self._prepare_write(CLEANED_DB, table)
        out.write.mode("overwrite").format("parquet").saveAsTable(
            f"{CLEANED_DB}.{table}"
        )
        return self.spark.table(f"{CLEANED_DB}.{table}")

    # --- entry point 3: gold + analytics (reference README.md:248-403) ---
    def build_gold(self) -> dict[str, DataFrame]:
        """Silver -> the five gold star-schema tables, registered in the
        curated namespace."""
        t = lambda name: self.spark.table(f"{CLEANED_DB}.{name}")
        star = olist.build_star(
            t("orders"), t("customers"), t("products"), t("order_items"), t("clickstream")
        )

        # The five gold tables are independent writes — submit them from
        # a small thread pool so each job's tail back-fills the others
        # (guide §2.6); 3 in flight is enough to hide the driver-side
        # commit latency without fighting for executors. Sequential when
        # the catalog cannot take concurrent DDL (ADVICE r14).
        def write_one(item):
            name, df = item
            self._prepare_write(CURATED_DB, name)
            df.write.mode("overwrite").format("parquet").saveAsTable(
                f"{CURATED_DB}.{name}"
            )
            return name

        run_catalog_writes(self.spark, write_one, star.items())
        return {
            name: self.spark.table(f"{CURATED_DB}.{name}") for name in star
        }

    def sql(self, query: str) -> DataFrame:
        """Athena-analog SQL entry point over the cataloged zones."""
        return self.spark.sql(query)

    # the three showcase queries (reference README.md:357-403)
    def funnel(self) -> DataFrame:
        return olist.funnel(self.spark.table(f"{CURATED_DB}.fact_events"))

    def conversion_by_traffic_source(self) -> DataFrame:
        return olist.conversion_by_traffic_source(
            self.spark.table(f"{CURATED_DB}.fact_events")
        )

    def top_categories_by_revenue(self, k: int = 10) -> DataFrame:
        return olist.top_categories_by_revenue(
            self.spark.table(f"{CURATED_DB}.fact_order_items"),
            self.spark.table(f"{CURATED_DB}.dim_product"),
            k,
        )
