"""Multimodal column support: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
pandas iterators (``mapInPandas``).

The Spark-side plumbing — schema, batch iteration, partition sizing —
is real and tested; the actual codec work is STUBBED with deterministic
fakes because no image/audio libraries exist in this container (marked
``# STUB:`` below). Swapping a stub for PIL/librosa changes only the
inner function body; the dataflow is unchanged.

Scale design: payload bytes never leave the executor JVM except through
Arrow batches (zero-copy into pandas); per-batch processing keeps peak
memory at ``maxRecordsPerBatch`` x payload size; derived features are
small typed columns so downstream analytics never reshuffle the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),  # NULL for audio
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),  # NULL for image
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: the text
    bytes stand in for an encoded payload. Lets every downstream operator
    run for real against driver data."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), mt).alias("mime"),
        F.when(mt == "image", (F.pmod(F.xxhash64("doc_id", F.lit("w")), F.lit(1920)) + 1).cast("int")).alias("width"),
        F.when(mt == "image", (F.pmod(F.xxhash64("doc_id", F.lit("h")), F.lit(1080)) + 1).cast("int")).alias("height"),
        F.when(mt != "image", (F.pmod(F.xxhash64("doc_id", F.lit("d")), F.lit(600_000)) + 1).cast("int")).alias("duration_ms"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    # STUB: deterministic digest-derived vector in place of a real
    # decode->model-embed step (no codec/model libs in this container).
    # A real implementation decodes the payload (PIL/ffmpeg) and runs a
    # feature extractor here; signature and batch shape stay identical.
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas streams record batches through Python once; everything
    after this projection is small typed data. This is the ONE place the
    engine pays the JVM->Python boundary, and it's vectorized.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": payloads.map(len).astype("int64"),
                    "payload_sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": payloads.map(lambda b: _fake_feature(b, feature_dim)),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Image decode -> (width, height, n_pixels). STUB: real decode needs
    an image codec; here metadata passes through and pixel count derives
    from it. Raises for non-image rows at plan time via filter."""
    images = media.filter(F.col("media_type") == "image")
    return images.select(
        "media_id",
        "width",
        "height",
        (F.col("width").cast("long") * F.col("height")).alias("n_pixels"),
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame timestamp (explode over a generated sequence — the real frame
    grab is a STUB'd identity on the payload)."""
    videos = media.filter(F.col("media_type") == "video")
    stamps = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    return videos.select(
        "media_id",
        F.explode(stamps).alias("frame_ms"),
        F.col("payload").alias("frame_payload"),  # STUB: would be the decoded frame
    )


def resize_image(media: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Aspect-preserving resize plan: target dims are pure JVM expressions
    on the metadata; the pixel resample itself is a STUB (identity on the
    payload — a real impl swaps in PIL inside one mapInPandas, with the
    same schema). Keeping the geometry math JVM-side means the Python
    stage receives exact output shapes and never re-decides them."""
    images = media.filter(F.col("media_type") == "image")
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    return images.select(
        "media_id",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("out_width"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("out_height"),
        F.col("payload").alias("resized_payload"),  # STUB: would be resampled bytes
    )


def audio_chunks(media: DataFrame, chunk_ms: int = 5_000) -> DataFrame:
    """Chunking plan for audio rows: one row per fixed-length window
    (explode over a generated sequence), the decode/slice being a STUB.
    The explode keeps chunk rows colocated with their source partition —
    no shuffle until an aggregation asks for one."""
    audio = media.filter(F.col("media_type") == "audio")
    stamps = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(chunk_ms))
    return audio.select(
        "media_id",
        F.explode(stamps).alias("chunk_start_ms"),
        F.least(F.col("duration_ms") - F.col("chunk_start_ms"), F.lit(chunk_ms)).alias("chunk_len_ms"),
        F.col("payload").alias("chunk_payload"),  # STUB: would be sliced samples
    )
