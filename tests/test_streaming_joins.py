"""End-to-end tests for stream-stream joins and streaming dedup:
file source -> stateful operator -> memory sink, with the batch
equivalent as the oracle."""

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.streaming import joins as sjoins
from data_lake_for_e_commerce_analytics_spark.streaming import sessionize


def _run_stream(df, name: str, spark, mode: str = "append") -> None:
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_stream_join_matches_batch(spark, tables, tmp_path):
    src = str(tmp_path / "ss_src")
    events = tables["events"]
    events.write.mode("overwrite").parquet(src)

    stream = sessionize.stream_events_from_parquet(spark, src, events.schema)
    joined = sjoins.clicks_to_purchases_join(stream, max_gap="1 hour")
    assert joined.isStreaming
    _run_stream(joined, "ss_join_test", spark)
    got = spark.sql("SELECT count(*) AS n FROM ss_join_test").head()["n"]

    # batch oracle: identical join on the static table
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    expect = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 hour")),
        )
    ).count()
    # all data is within one micro-batch and well inside the watermark,
    # so the streaming result must equal the batch join exactly
    assert got == expect
    assert got > 0


def test_streaming_dedup_suppresses_duplicates(spark, tables, tmp_path):
    src = str(tmp_path / "dedup_src")
    events = tables["events"].limit(500)
    # write the same rows twice -> two files, exact duplicates across files
    events.write.mode("overwrite").parquet(src)
    events.write.mode("append").parquet(src)

    stream = sessionize.stream_events_from_parquet(spark, src, events.schema)
    deduped = sjoins.streaming_dedup(stream, key_cols=("event_id",))
    _run_stream(deduped, "sdedup_test", spark)

    n = spark.sql("SELECT count(*) AS n FROM sdedup_test").head()["n"]
    n_distinct = spark.sql("SELECT count(DISTINCT event_id) AS n FROM sdedup_test").head()["n"]
    assert n == n_distinct == 500


def test_stream_merge_to_gold_matches_batch_merge(spark, tables, tmp_path):
    """Replaying the stream epoch-by-epoch through foreachBatch MERGE
    must produce the same gold table as one batch merge of the full
    history — including version precedence for updated keys."""
    from data_lake_for_e_commerce_analytics_spark.operators import upsert
    from data_lake_for_e_commerce_analytics_spark.streaming import upsert_stream

    src = str(tmp_path / "gold_src")
    gold = str(tmp_path / "gold_tbl")
    ckpt = str(tmp_path / "gold_ckpt")

    events = tables["events"].select("event_id", "ts", "user_id", "event_type", "value")
    part1 = events.filter(F.col("event_id") % 2 == 0)
    part1.write.mode("overwrite").parquet(src)

    stream = upsert_stream.stream_merge_to_gold(
        spark.readStream.schema(part1.schema).parquet(src),
        gold,
        key_cols=["event_id"],
        version_col="ts",
        checkpoint_dir=ckpt,
    )
    stream.awaitTermination(180)

    # epoch 2: the other half, plus UPDATES to 100 existing keys with a
    # newer ts and a sentinel value
    updates = (
        events.filter(F.col("event_id") % 2 == 0)
        .limit(100)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
        .withColumn("value", F.lit(-1.0))
    )
    part2 = events.filter(F.col("event_id") % 2 == 1).unionByName(updates)
    part2.write.mode("append").parquet(src)

    stream = upsert_stream.stream_merge_to_gold(
        spark.readStream.schema(part1.schema).parquet(src),
        gold,
        key_cols=["event_id"],
        version_col="ts",
        checkpoint_dir=ckpt,
    )
    stream.awaitTermination(180)

    got = spark.read.parquet(gold)
    want = upsert.merge_keep_latest(
        part1, part2, key_cols=["event_id"], version_col="ts"
    )
    assert got.count() == events.count()
    assert (
        sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    )
    # the 100 updated keys carry the sentinel
    assert got.filter(F.col("value") == -1.0).count() == 100
