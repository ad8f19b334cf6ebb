"""Streaming ingest into the segmented BM25 postings index: a real
maxFilesPerTrigger=1 stream through foreachBatch must build an index
that scores exactly like a one-shot build of the full corpus, auto-merge
must keep the segment count bounded, and a replayed epoch must no-op."""

import os

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import retrieval
from data_lake_for_e_commerce_analytics_spark.streaming import postings_ingest


def test_streamed_postings_equals_one_shot_build(spark, tables, tmp_path):
    docs = tables["documents"].select("doc_id", "text")
    src = str(tmp_path / "src")
    # three epoch files, disjoint doc_ids (the append contract)
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    q = postings_ingest.start_postings_ingest(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        idx,
        ckpt,
        merge_every=8,  # no merge in this test
    )
    q.awaitTermination(300)
    sc = retrieval.read_postings_sidecar(idx)
    assert len(sc["segments"]) == 3
    assert sc["n_docs"] == docs.count()

    query = "spark join fast data"
    want = [
        tuple(r) for r in retrieval.bm25_topk(docs, query, k=10).collect()
    ]
    got = [
        tuple(r)
        for r in retrieval.bm25_topk_segmented(spark, idx, query, k=10).collect()
    ]
    assert got == want

    # replay: re-applying an already-committed epoch no-ops
    sc_replay = postings_ingest.apply_postings_batch(
        docs.filter(F.col("doc_id") % 3 == 2), 2, idx
    )
    assert sc_replay == sc
    assert sorted(os.listdir(idx + "/segments")) == sorted(sc["segments"])


def test_streamed_postings_auto_merge_bounds_segments(spark, tables, tmp_path):
    docs = tables["documents"].select("doc_id", "text")
    idx = str(tmp_path / "idx2")
    # 5 epochs with merge_every=2: segment count must stay <= 3
    # (2 segments + the new one collapses on the trigger epoch)
    for i in range(5):
        postings_ingest.apply_postings_batch(
            docs.filter(F.col("doc_id") % 5 == i), i, idx, merge_every=2
        )
        sc = retrieval.read_postings_sidecar(idx)
        assert len(sc["segments"]) <= 3
    assert sc["n_docs"] == docs.count()
    query = "spark join fast data"
    want = [tuple(r) for r in retrieval.bm25_topk(docs, query, k=10).collect()]
    got = [
        tuple(r)
        for r in retrieval.bm25_topk_segmented(spark, idx, query, k=10).collect()
    ]
    assert got == want


def test_streamed_auto_merge_is_delete_aware(spark, tables, tmp_path):
    """r14: the in-epoch auto-merge routes through the size-tiered
    plain merge when no deletes are pending, and through the
    delete-aware compaction when tombstones exist — a tombstoned doc
    must stay dead through the auto-merge epoch."""
    docs = tables["documents"].select("doc_id", "text")
    idx = str(tmp_path / "idx3")
    postings_ingest.apply_postings_batch(
        docs.filter(F.col("doc_id") % 3 == 0), 0, idx, merge_every=2
    )
    postings_ingest.apply_postings_batch(
        docs.filter(F.col("doc_id") % 3 == 1), 1, idx, merge_every=2
    )
    # delete between epochs — unlike the ANN tier, postings deletes
    # ADVANCE last_batch_id, so they must ride INSIDE the monotone
    # keyspace (epoch 1 ran at spaced id 2; the next stream epoch will
    # use 4, leaving 3 free for maintenance)
    victims = [
        r[0]
        for r in docs.filter(F.col("doc_id") % 9 == 0)
        .select("doc_id")
        .collect()
    ]
    retrieval.delete_postings_docs(spark, idx, victims, batch_id=3)
    # epoch 2 pushes past merge_every -> auto-merge fires WITH pending
    # tombstones -> must take the compact path, not resurrect
    sc = postings_ingest.apply_postings_batch(
        docs.filter(F.col("doc_id") % 3 == 2), 2, idx, merge_every=2
    )
    assert len(sc["segments"]) == 1
    # tombstone log retired (the del-* epoch dirs are gone)
    assert retrieval._read_tombstones(spark, idx) is None
    query = "spark join fast data"
    live = docs.filter(~F.col("doc_id").isin(victims))
    want = [tuple(r) for r in retrieval.bm25_topk(live, query, k=10).collect()]
    got = [
        tuple(r)
        for r in retrieval.bm25_topk_segmented(spark, idx, query, k=10).collect()
    ]
    assert got == want
