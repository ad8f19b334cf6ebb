"""Multimodal plumbing (Arrow-batched mapInPandas over binary columns)
and Structured Streaming sessionization, driven end-to-end with file
sources and memory sinks."""

import pytest
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import multimodal
from data_lake_for_e_commerce_analytics_spark.streaming import sessionize


@pytest.fixture(scope="module")
def media(tables):
    return multimodal.synthesize_media(tables["documents"]).cache()


def test_media_schema_and_metadata_typing(media):
    assert dict(media.dtypes)["payload"] == "binary"
    images = media.filter(F.col("media_type") == "image")
    nonimg = media.filter(F.col("media_type") != "image")
    assert images.filter(F.col("width").isNull() | F.col("height").isNull()).count() == 0
    assert nonimg.filter(F.col("duration_ms").isNull()).count() == 0


def test_extract_features_batch_shape(media, tables):
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == tables["documents"].count()
    for r in rows[:20]:
        assert len(r["feature"]) == 8
        assert all(0 <= x <= 1 for x in r["feature"])
        assert r["payload_bytes"] > 0
        assert len(r["payload_sha256"]) == 64


def test_extract_features_deterministic(media):
    a = multimodal.extract_features(media).orderBy("media_id").collect()
    b = multimodal.extract_features(media).orderBy("media_id").collect()
    assert a == b


def test_decode_image_pixel_counts(media):
    out = multimodal.decode_image(media)
    assert out.filter(F.col("n_pixels") != F.col("width") * F.col("height")).count() == 0


def test_sample_video_frames_counts(media):
    frames = multimodal.sample_video_frames(media, every_ms=60_000)
    per = frames.groupBy("media_id").count()
    videos = media.filter(F.col("media_type") == "video").select(
        "media_id", (F.floor((F.col("duration_ms") - 1) / 60_000) + 1).alias("expect")
    )
    assert per.join(videos, "media_id").filter(F.col("count") != F.col("expect")).count() == 0


def test_streaming_session_window(spark, tables, tmp_path):
    """End-to-end micro-batch run: parquet file source -> session_window
    aggregation -> memory sink, compared against batch session counts."""
    src = str(tmp_path / "stream_src")
    events = tables["events"]
    events.write.mode("overwrite").parquet(src)

    stream = sessionize.stream_events_from_parquet(spark, src, events.schema)
    assert stream.isStreaming
    agg = sessionize.session_window_stats(stream, gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) FROM sess_test").head()[0]
    assert got > 0
    # every (user, session) has >= 1 event and consistent bounds
    bad = spark.sql(
        "SELECT count(*) FROM sess_test WHERE n_events < 1 OR session_end < session_start"
    ).head()[0]
    assert bad == 0
    # stream == batch, row for row: the batch replay of the SAME function
    # is oracle-gated (session_window_batch), so equality here chains the
    # streaming path to the DuckDB gap-and-islands oracle too
    batch = sessionize.session_window_stats(
        events.filter(F.col("ts").isNotNull()), gap="30 minutes"
    )
    stream_rows = {
        tuple(r)
        for r in spark.sql(
            "SELECT session_start, session_end, user_id, n_events, session_value"
            " FROM sess_test"
        ).collect()
    }
    batch_rows = {tuple(r) for r in batch.collect()}
    assert stream_rows == batch_rows


def test_streaming_windowed_counts_match_batch(spark, tables, tmp_path):
    src = str(tmp_path / "stream_src2")
    events = tables["events"]
    events.write.mode("overwrite").parquet(src)
    stream = sessionize.stream_events_from_parquet(spark, src, events.schema)
    agg = sessionize.windowed_event_counts(stream, window="1 day", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed_total = spark.sql("SELECT sum(n_events) FROM win_test").head()[0]
    assert streamed_total == events.count()


def test_stateful_funnel_tracker(spark, tables, tmp_path):
    """applyInPandasWithState: users whose stream contains a purchase are
    emitted exactly once as completed; stage never exceeds 3."""
    from data_lake_for_e_commerce_analytics_spark.streaming import sessionize

    src = str(tmp_path / "ev_state_src")
    out = str(tmp_path / "ev_state_out")
    ev = tables["events"].select("event_id", "ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").parquet(src)

    stream = sessionize.stream_events_from_parquet(spark, src, ev.schema)
    q = (
        sessionize.funnel_state_tracker(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["completed"] for r in rows)          # no timeouts in one batch
    assert all(r["max_stage"] == 3 for r in rows)     # purchase reached
    # exactly one emission per completed user
    assert got.groupBy("user_id").count().filter("count > 1").isEmpty()
    # completed set == users with a purchase event
    purchasers = {
        r["user_id"]
        for r in ev.filter("event_type = 'purchase'").select("user_id").distinct().collect()
    }
    assert {r["user_id"] for r in rows} == purchasers


def test_resize_preserves_aspect_and_caps(media):
    from data_lake_for_e_commerce_analytics_spark.operators import multimodal

    rows = multimodal.resize_image(media, 256, 256).collect()
    assert rows
    for r in rows:
        assert 1 <= r["out_width"] <= 256 and 1 <= r["out_height"] <= 256
        # no upscale
        assert r["out_width"] <= r["width"] and r["out_height"] <= r["height"]
        # aspect preserved within one pixel of floor slack on either axis
        if r["out_width"] < r["width"]:
            slack = 1 / r["out_width"] + 1 / r["out_height"]
            assert abs(r["out_width"] / r["width"] - r["out_height"] / r["height"]) <= slack


def test_audio_chunks_cover_duration(media):
    from pyspark.sql import functions as F
    from data_lake_for_e_commerce_analytics_spark.operators import multimodal

    chunks = multimodal.audio_chunks(media, 5_000)
    per = chunks.groupBy("media_id").agg(F.sum("chunk_len_ms").alias("total")).collect()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter("media_type = 'audio'").collect()
    }
    assert per
    for r in per:
        assert r["total"] == durations[r["media_id"]]


def test_stream_static_enrichment(spark, tables, tmp_path):
    from data_lake_for_e_commerce_analytics_spark.streaming import sessionize

    src = str(tmp_path / "ev_enrich_src")
    out = str(tmp_path / "ev_enrich_out")
    ev = tables["events"].select("event_id", "ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").parquet(src)
    dim = tables["customer"].select("c_custkey", "c_mktsegment")

    stream = sessionize.stream_events_from_parquet(spark, src, ev.schema)
    q = (
        sessionize.enrich_stream_with_dim(stream, dim)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == ev.count()
    # every event whose user exists in the dim got a segment
    n_matched = got.filter(F.col("c_mktsegment").isNotNull()).count()
    users_in_dim = ev.join(dim, ev.user_id == dim.c_custkey, "left_semi").count()
    assert n_matched == users_in_dim


def test_resize_image_decoded_real_resample(tables):
    """The codec path is REAL: resized payload bytes differ from the
    source, re-decode to exactly the JVM-planned output dims, and the
    top-left pixel survives nearest-neighbor resampling unchanged."""
    docs = tables["documents"].limit(20)
    media = multimodal.synthesize_ppm_images(docs)
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    out = multimodal.resize_image_decoded(media, max_w=8, max_h=8).collect()
    assert len(out) == len(src)
    for r in out:
        assert r["decode_ok"] is True
        resized = bytes(r["resized_payload"])
        assert resized != src[r["media_id"]]  # non-identity transform
        arr = multimodal._ppm_decode(resized)
        assert arr is not None
        assert arr.shape == (r["out_height"], r["out_width"], 3)
        src_arr = multimodal._ppm_decode(src[r["media_id"]])
        assert (arr[0, 0] == src_arr[0, 0]).all()


def test_resize_image_decoded_quarantines_undecodable(media):
    """Fake (non-PPM) payloads pass through flagged, never crash the
    job — the per-row quarantine contract."""
    out = multimodal.resize_image_decoded(media, max_w=8, max_h=8).collect()
    assert len(out) > 0
    assert all(r["decode_ok"] is False for r in out)


def test_video_frame_sampling_extracts_real_frames(spark, tables):
    from data_lake_for_e_commerce_analytics_spark.operators import multimodal as mm

    docs = tables["documents"].limit(20)
    videos = mm.synthesize_ppm_video(docs)
    frames = mm.sample_video_frames_decoded(videos).collect()
    assert frames
    assert all(r["decode_ok"] for r in frames)
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    vrows = {r["media_id"]: r for r in videos.collect()}
    for mid, rows in by_media.items():
        # one frame per second of duration
        assert len(rows) == vrows[mid]["duration_ms"] // 1000
        payloads = [bytes(r["frame_payload"]) for r in rows]
        # frames are distinct (animated), each a well-formed single P6
        assert len(set(payloads)) == len(payloads)
        for p in payloads:
            assert p.startswith(b"P6")
            assert len(mm._split_ppm_stream(p)) == 1
        # frames concatenate back to the original stream
        assert b"".join(
            bytes(r["frame_payload"])
            for r in sorted(rows, key=lambda r: r["frame_ms"])
        ) == bytes(vrows[mid]["payload"])


def test_audio_chunks_reconstruct_payload(spark, tables):
    from data_lake_for_e_commerce_analytics_spark.operators import multimodal as mm

    docs = tables["documents"].limit(20)
    audio = mm.synthesize_pcm_audio(docs)
    chunks = mm.audio_chunks_decoded(audio, chunk_ms=3_000).collect()
    assert chunks
    arows = {r["media_id"]: r for r in audio.collect()}
    by_media = {}
    for r in chunks:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["chunk_start_ms"])
        rebuilt = b"".join(bytes(r["chunk_payload"]) for r in rows)
        assert rebuilt == bytes(arows[mid]["payload"])
        for r in rows:
            assert len(bytes(r["chunk_payload"])) == r["n_samples"] * 2
            assert r["energy"] >= 0


def test_streaming_dedup_matches_batch(spark, tables, tmp_path):
    """Ingestion-side dedup guard: a document stream with injected exact
    duplicates, keyed on the SAME canonical fingerprint the batch dedup
    family uses (dedup.fingerprint_col), lands the same distinct set the
    batch dropDuplicates would."""
    from data_lake_for_e_commerce_analytics_spark.operators import dedup
    from data_lake_for_e_commerce_analytics_spark.streaming import joins as sjoins

    docs = tables["documents"].select("doc_id", "text").limit(200).withColumn(
        "ingest_ts", F.current_timestamp()
    )
    src = str(tmp_path / "doc_stream")
    docs.write.mode("overwrite").parquet(src)
    docs.limit(50).write.mode("append").parquet(src)  # duplicate re-send

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src).withColumn("fingerprint", dedup.fingerprint_col())
    deduped = sjoins.streaming_dedup(
        stream, key_cols=("fingerprint",), ts_col="ingest_ts", watermark="24 hours"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM dedup_stream_test").head()[0]
    batch_expect = (
        docs.withColumn("fingerprint", dedup.fingerprint_col())
        .dropDuplicates(["fingerprint"])
        .count()
    )
    assert got == batch_expect


def test_image_patches_sums_and_quarantine(spark, tables):
    import numpy as np

    from data_lake_for_e_commerce_analytics_spark.operators import multimodal

    media = multimodal.synthesize_ppm_images(tables["documents"].limit(20))
    out = multimodal.image_patches(media, patch=4).collect()
    assert out, "patch rows expected"
    # recompute one image's patch sums in python from the decoded payload
    one = media.limit(1).collect()[0]
    arr = multimodal._ppm_decode(bytes(one["payload"]))
    h, w = arr.shape[:2]
    hc, wc = h - h % 4, w - w % 4
    s = arr[:hc, :wc].astype(np.int64).reshape(hc // 4, 4, wc // 4, 4, 3).sum(axis=(1, 3))
    got = {(r["py"], r["px"]): (r["r_sum"], r["g_sum"], r["b_sum"])
           for r in out if r["media_id"] == one["media_id"]}
    for py in range(s.shape[0]):
        for px in range(s.shape[1]):
            assert got[(py, px)] == tuple(int(v) for v in s[py, px])
    # a non-P6 payload is skipped, not failed
    from pyspark.sql import functions as F

    junk = media.limit(1).withColumn("payload", F.lit(b"not a ppm"))
    assert multimodal.image_patches(junk).count() == 0


def test_hflip_involution_and_pixels(tables):
    """flip(flip(img)) must be byte-identical to the original payload,
    and a single flip must equal the numpy flip of the decoded array."""
    import numpy as np

    imgs = multimodal.synthesize_ppm_images(tables["documents"].limit(4))
    once = multimodal.hflip_images(imgs)
    twice = multimodal.hflip_images(once)
    orig = {r["media_id"]: bytes(r["payload"]) for r in imgs.collect()}
    back = {r["media_id"]: bytes(r["payload"]) for r in twice.collect()}
    assert orig == back
    flipped = {r["media_id"]: bytes(r["payload"]) for r in once.collect()}
    for mid, payload in orig.items():
        arr = multimodal._ppm_decode(payload)
        want = multimodal._ppm_encode(np.flip(arr, axis=1))
        assert flipped[mid] == want


def test_center_crop_matches_numpy_slice(tables):
    import numpy as np

    imgs = multimodal.synthesize_ppm_images(tables["documents"].limit(4))
    cropped = {
        r["media_id"]: (bytes(r["payload"]), r["width"], r["height"])
        for r in multimodal.center_crop_images(imgs, cw=6, ch=5).collect()
    }
    for r in imgs.collect():
        arr = multimodal._ppm_decode(bytes(r["payload"]))
        h, w = arr.shape[:2]
        tw, th = min(w, 6), min(h, 5)
        oy, ox = (h - th) // 2, (w - tw) // 2
        want = multimodal._ppm_encode(arr[oy : oy + th, ox : ox + tw])
        got, gw, gh = cropped[r["media_id"]]
        assert got == want and (gw, gh) == (tw, th)


def test_decimate_audio_matches_numpy(tables):
    import numpy as np

    audio = multimodal.synthesize_pcm_audio(tables["documents"].limit(4))
    dec = {
        r["media_id"]: bytes(r["payload"])
        for r in multimodal.decimate_audio(audio, factor=3).collect()
    }
    for r in audio.collect():
        wave = np.frombuffer(bytes(r["payload"]), dtype="<i2")
        assert dec[r["media_id"]] == wave[::3].tobytes()
    # energies are conserved under identity decimation (factor 1)
    base = multimodal.pcm_energy(audio).collect()
    ident = multimodal.pcm_energy(multimodal.decimate_audio(audio, 1)).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, ident))


def test_image_phash_catches_flip_and_reencode_not_unrelated(spark, tables):
    """The near-dup contract (r12): a horizontally flipped, re-encoded
    copy fingerprints IDENTICALLY (orientation canonicalization before
    the crop); a re-encoded verbatim copy too; unrelated images do not
    collide at hamming 0 in general."""
    from data_lake_for_e_commerce_analytics_spark.operators import dedup

    docs = tables["documents"].filter(F.col("doc_id") < 60)
    media = multimodal.synthesize_ppm_images(docs).filter(
        (F.col("width") >= 9) & (F.col("height") >= 8)
    )
    fps = {r["media_id"]: r["phash"] for r in multimodal.image_phash(media).collect()}
    assert len(fps) >= 20

    # flipped + re-encoded copy: identical fingerprint
    flipped = multimodal.hflip_images(media).withColumn(
        "media_id", F.col("media_id") + F.lit(500000)
    )
    ffps = {
        r["media_id"] - 500000: r["phash"]
        for r in multimodal.image_phash(flipped).collect()
    }
    assert ffps == fps

    # re-encoded verbatim copy (double flip = identity through the
    # codec loop twice): identical fingerprint
    twice = multimodal.hflip_images(multimodal.hflip_images(media))
    tfps = {r["media_id"]: r["phash"] for r in multimodal.image_phash(twice).collect()}
    assert tfps == fps

    # unrelated images: not all pairwise-identical (the hash carries
    # signal, not a constant)
    assert len(set(fps.values())) > len(fps) // 2

    # banded join over the union finds every (original, flip) pair at
    # hamming 0 — the factored machinery end-to-end
    union = media.unionByName(flipped)
    pairs = dedup.banded_hamming_pairs(
        multimodal.image_phash(union),
        max_hamming=0, n_blocks=4, id_col="media_id", fp_col="phash",
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    for mid in fps:
        assert (mid, mid + 500000) in got


def test_image_phash_half_sum_tie_canonicalizes_mirror(spark):
    """ADVICE r12: when the left- and right-half luma sums are EQUAL the
    half-sum rule is mirror-invariant and cannot canonicalize — the
    tiebreak (hash both orientations, keep the smaller signed
    fingerprint) must make an asymmetric tied image and its mirror
    fingerprint identically."""
    import numpy as np

    # 8x9 grayscale rows [2,0,0,0, 3, 0,1,0,1]: lsum = 2 = rsum (center
    # column excluded from both halves), yet the image is NOT mirror-
    # symmetric, so plain dHash would differ between the two.
    row = np.array([2, 0, 0, 0, 3, 0, 1, 0, 1], dtype=np.uint8)
    arr = np.repeat(row[None, :, None], 8, axis=0).repeat(3, axis=2)
    mirror = arr[:, ::-1, :]
    assert not np.array_equal(arr, mirror)
    media = spark.createDataFrame(
        [
            (1, "image", multimodal._ppm_encode(arr), multimodal.PPM_MIME, 9, 8, None),
            (2, "image", multimodal._ppm_encode(mirror), multimodal.PPM_MIME, 9, 8, None),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    fps = {r["media_id"]: r["phash"] for r in multimodal.image_phash(media).collect()}
    assert fps[1] == fps[2]


def test_image_phash_skips_undersized_and_undecodable(spark, tables):
    """Quarantine contract: h < 8 or w < 9 images and non-P6 payloads
    produce no fingerprint rather than a failure."""
    docs = tables["documents"].filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_ppm_images(docs)
    small = media.filter((F.col("width") < 9) | (F.col("height") < 8))
    n_small = small.count()
    assert n_small > 0  # the fixture does contain undersized images
    out = multimodal.image_phash(media)
    assert out.count() == media.count() - n_small
    junk = spark.createDataFrame(
        [(1, "image", b"not a ppm", multimodal.PPM_MIME, 4, 4, None)],
        multimodal.MEDIA_SCHEMA,
    )
    assert multimodal.image_phash(junk).count() == 0


def test_image_dedup_keep_first_semantics(spark, tables):
    """End-to-end image dedup: every fingerprinted image is accounted
    for exactly once across clusters, the keeper is its cluster's
    minimum id (so an original always beats its +offset flipped copy),
    and cluster members really are near-dups (<= max_hamming via the
    rep graph's transitivity is NOT claimed — only connectivity)."""
    import __spark_entry__ as entry_mod
    from data_lake_for_e_commerce_analytics_spark.operators import dedup as dd

    sf = "/root/testdata/sf0.001"
    out = entry_mod._q_image_dedup_keep_first(spark, sf).collect()
    media = multimodal.synthesize_ppm_images(
        entry_mod._t(spark, sf, "documents")
    )
    copies = multimodal.hflip_images(
        media.filter(F.col("media_id") % 7 == 0)
    ).withColumn("media_id", F.col("media_id") + F.lit(1000000))
    fps = multimodal.image_phash(media.unionByName(copies))
    n_total = fps.count()
    assert sum(r["n_images"] for r in out) == n_total
    kept = {r["kept_media_id"] for r in out}
    assert len(kept) == len(out)
    # a flipped copy (id >= 1e6) is kept only if its original was not
    # fingerprinted at all (undersized quarantine) — otherwise the
    # original's smaller id wins the min-label rule
    originals = {r["media_id"] for r in fps.collect() if r["media_id"] < 1000000}
    for kid in kept:
        if kid >= 1000000:
            assert (kid - 1000000) not in originals
    # clusters with n_images > 1 really collapse: fewer keepers than images
    assert len(kept) < n_total


def test_demoted_enumerating_phash_gate_expands_grouped_gate(spark):
    """_q_image_phash_neardup was demoted from the production registry
    (r13 — quadratic output in clique size); it stays alive at the
    test/oracle-contract tier: its enumerated pair count must equal the
    expansion implied by the registered grouped gate, and every
    enumerated pair must be at hamming <= 2."""
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    pairs = entry_mod._q_image_phash_neardup(spark, sf).collect()
    grouped = entry_mod._q_image_phash_neardup_grouped(spark, sf).collect()
    implied = 0
    for r in grouped:
        if r["rep_a"] == r["rep_b"]:
            implied += r["n_a"] * (r["n_a"] - 1) // 2
        else:
            implied += r["n_a"] * r["n_b"]
    assert len(pairs) == implied
    assert all(0 <= r["hamming"] <= 2 for r in pairs)
