"""SparkSession factory.

The reference delegates execution to managed engines (Glue PySpark + Athena,
reference README.md:25-27); here the single Spark session plays both roles.
Configured for correctness-vs-DuckDB comparison (UTC session timezone) and
for scale-out behavior that survives a 100 TB cluster: AQE on (runtime
coalescing, skew-join splitting, join-strategy switching), Arrow for any
pandas exchange, and shuffle partitions sized from the environment.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

# Zone namespaces mirroring the reference's three Glue databases
# (reference README.md:132, :161, :253).
RAW_DB = "ecom_raw_db"
CLEANED_DB = "ecom_cleaned_db"
CURATED_DB = "ecom_curated_db"


def get_spark(
    app_name: str = "data_lake_for_e_commerce_analytics_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults follow the driver contract: ``local[$SPARK_GRAFT_CPUS]`` and
    shuffle partitions equal to the core count. On a real cluster, callers
    pass ``master=None`` with a pre-set config and a shuffle-partition count
    sized so each shuffle partition stays in the 100-200 MB range.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Deterministic comparisons against the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: coalesce post-shuffle partitions, split skewed
        # joins, switch sort-merge->broadcast at runtime. Free scale-out wins.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst: MEASURED A/B (r14, OPTIMIZATION_r14.md).
        # false (strict advisory-size coalescing) fixed the tiny-file
        # writes but also collapsed CPU-heavy small-byte post-shuffle
        # stages (jaccard/simhash pair verification, shingle maps) to
        # ONE task — seconds of serial compute AQE's size-only model
        # cannot see. true keeps those stages parallel, and the r14
        # write-sizing fix (repartitionByRange WITHOUT an explicit N
        # before every index write) still coalesces KB-scale writes to
        # single files under either setting (the 1 MB minPartitionSize
        # floor governs). Basket A/B at sf0.1: true 54.9 s vs false
        # 59.3 s over the 11 affected queries — keep the default.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Cost-based optimization: when ANALYZE TABLE stats exist
        # (sources/catalog.analyze_table), join reordering and broadcast
        # decisions use real cardinalities; without stats these are no-ops.
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        # Arrow-batched transfer for every pandas_udf / applyInPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bound Arrow batch ROWS: the default (10000) sizes batches by
        # row count, so payload-bearing stages (multimodal: ~48 KB of
        # PCM/PPM bytes per row) hand each task multi-hundred-MB
        # batches — 32 concurrent tasks x a 3-stage mapInPandas chain
        # OOMed the sf10 posture run. 512 rows keeps a payload batch
        # ~25 MB/task while costing scalar-column stages nothing
        # measurable (their batches are a few hundred KB either way).
        # At 100 TB this is the same rule: size Arrow batches by BYTES
        # of the widest column, not by rows.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        # 8g default; memory-hungry posture runs (sf10: 60M-row
        # lineitem in one JVM) opt in via SPARK_DRIVER_MEMORY=16g
        # rather than silently doubling every caller's heap target —
        # on a smaller host the bigger default pushed the driver
        # toward swap/OOM even though the Arrow batch-row cap (the
        # actual sf10 OOM fix) already bounds per-task memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # The session catalog is in-memory, so managed-table directories must
        # not outlive the metastore: a fixed warehouse dir leaves stale table
        # locations that collide (LOCATION_ALREADY_EXISTS) on the next run.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR")
            or tempfile.mkdtemp(prefix="spark-warehouse-"),
        )
        # Quieter driver logs during benchmarking.
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def create_zones(spark: SparkSession) -> None:
    """CREATE DATABASE IF NOT EXISTS for the three medallion zones
    (operator S8, reference README.md:132/:161/:253)."""
    for db in (RAW_DB, CLEANED_DB, CURATED_DB):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
