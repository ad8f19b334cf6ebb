"""PySpark-native analytics engine with the capabilities of the reference
e-commerce data-lake (kumarchitransh07/Data-Lake-for-E-Commerce-Analytics).

The reference is a medallion lakehouse on AWS (S3 + Glue Crawlers + Glue
PySpark jobs + Athena star schema; see /root/reference/README.md). This
package re-expresses every capability Spark-first:

- ``session``    : SparkSession factory (AQE on, tuned shuffle partitions).
- ``schemas``    : explicit StructTypes for raw/silver/gold tables.
- ``sources``    : CSV/Parquet scans & sinks, catalog (zone) management.
- ``operators``  : cleaning (silver), star-schema build (gold), analytics,
                   sampling, dedup, similarity, text analysis, multimodal,
                   clickstream synthesis.
- ``functions``  : vector math and JSON helpers built on pyspark.sql.functions.
- ``plans``      : plan-inspection utilities (pushdown/broadcast assertions).
- ``streaming``  : Structured Streaming extensions (sessionization).
"""

__version__ = "0.1.0"
