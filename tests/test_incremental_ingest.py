"""Streaming ingestion guarded by the standing dedup index: two epochs
replayed through foreachBatch must equal the same two batches applied
sequentially with the batch operator, and the surviving corpus must be
free of exact duplicates."""

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import dedup
from data_lake_for_e_commerce_analytics_spark.streaming import incremental_ingest


def _expected_sequential(spark, seed_docs, batches, index_path):
    """Apply the SAME per-epoch logic in plain batch code: self-dedup,
    probe, append survivors to the index."""
    dedup.build_dedup_index(seed_docs, index_path)
    kept_ids = []
    for b in batches:
        b = incremental_ingest._batch_exact_dedup(b)
        verdicts = dedup.incremental_dedup(spark, b, index_path)
        kept = b.join(
            verdicts.filter(F.col("status") == "kept").select("doc_id"),
            "doc_id",
            "left_semi",
        ).localCheckpoint(eager=True)
        kept_ids.extend(r["doc_id"] for r in kept.select("doc_id").collect())
        docs, bands = dedup.dedup_index_frames(kept)
        docs.write.mode("append").parquet(f"{index_path}/docs")
        bands.write.mode("append").partitionBy("band_idx").parquet(
            f"{index_path}/bands"
        )
    return sorted(kept_ids)


def test_streamed_ingest_equals_sequential_batches(spark, tables, tmp_path):
    docs = tables["documents"].select("doc_id", "text").cache()
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    # epoch 2 re-sends two epoch-1 docs (shifted ids) and one seed doc:
    # all three must be rejected as exact dups of already-kept content
    resend = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .limit(1)
        .unionByName(b1.limit(2))
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    b2 = docs.filter(F.col("doc_id") % 3 == 2).unionByName(resend)

    idx_a = str(tmp_path / "idx_stream")
    idx_b = str(tmp_path / "idx_batch")
    corpus = str(tmp_path / "corpus")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    dedup.build_dedup_index(seed, idx_a)
    b1.write.mode("overwrite").parquet(src)
    q = incremental_ingest.run_incremental_ingest(
        spark.readStream.schema(b1.schema).parquet(src), idx_a, corpus, ckpt
    )
    q.awaitTermination(180)
    b2.write.mode("append").parquet(src)
    q = incremental_ingest.run_incremental_ingest(
        spark.readStream.schema(b1.schema).parquet(src), idx_a, corpus, ckpt
    )
    q.awaitTermination(180)

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").collect()
    )
    want = _expected_sequential(spark, seed, [b1, b2], idx_b)
    assert got == want
    # every re-sent duplicate was rejected
    assert not any(d >= 1000000 for d in got)
    # the surviving corpus carries no exact duplicates (vs itself or seed)
    final = spark.read.parquet(corpus).unionByName(seed)
    fps = final.select(dedup.fingerprint_col().alias("fp"))
    assert fps.count() == fps.distinct().count()
    docs.unpersist()


def test_streaming_drift_monitor_scores_batches(spark, tables, tmp_path):
    from data_lake_for_e_commerce_analytics_spark.streaming import monitor

    docs = tables["documents"].select("doc_id", "text")
    ref_path = str(tmp_path / "ref_hist")
    monitor.write_reference_histogram(docs, ref_path)
    # in-distribution batch vs a flooded (drifted) batch
    indist = docs.filter(F.col("doc_id") % 5 == 0)
    flood = spark.createDataFrame(
        [(99_000 + i, "zzqx " * 60) for i in range(40)], ["doc_id", "text"]
    )
    drifted = indist.unionByName(flood)
    src = str(tmp_path / "batches")
    indist.write.parquet(src + "/b=0")
    drifted.write.parquet(src + "/b=1")
    kl_in = monitor.batch_drift_record(indist, ref_path, 0).collect()[0]["kl_micro"]
    kl_out = monitor.batch_drift_record(drifted, ref_path, 1).collect()[0]["kl_micro"]
    assert kl_out > kl_in  # the flood is visible in the metric
    # the streaming route appends one metric row per (non-empty) batch
    stream = spark.readStream.schema(indist.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = monitor.run_drift_monitor(
        stream, ref_path, str(tmp_path / "metrics"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    metrics = spark.read.parquet(str(tmp_path / "metrics")).collect()
    assert len(metrics) >= 1
    # every micro-batch got a metric row covering all streamed tokens
    streamed_tokens = sum(r["n_tokens"] for r in metrics)
    expected = (
        indist.unionByName(drifted)
        .select(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n"))
        .collect()[0]["n"]
    )
    assert streamed_tokens == expected
    # KL(batch||ref) is >= 0 up to per-bucket micro-quantization error
    assert all(r["kl_micro"] > -1000 for r in metrics)
