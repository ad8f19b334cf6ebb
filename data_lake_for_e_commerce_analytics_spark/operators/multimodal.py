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

from ..sources.tables import ensure_min_parallelism

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
    """Image metadata plan -> (width, height, n_pixels): pure JVM
    expressions over the typed metadata columns, no payload touched.
    Real pixel decode lives in the PPM codec path
    (``decode_ppm_images`` / ``resize_image_decoded`` below)."""
    images = media.filter(F.col("media_type") == "image")
    return images.select(
        "media_id",
        "width",
        "height",
        (F.col("width").cast("long") * F.col("height")).alias("n_pixels"),
    )


def _video_frame_plan(media: DataFrame, every_ms: int, with_payload: bool) -> DataFrame:
    videos = media.filter(F.col("media_type") == "video")
    stamps = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    cols = ["media_id", "duration_ms"]
    if with_payload:
        cols.append("payload")
    return videos.select(*cols, F.explode(stamps).alias("frame_ms"))


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling PLAN for video rows: one output row per sampled
    frame timestamp (explode over a generated JVM sequence). Emits
    geometry only — the actual frame bytes come from
    ``sample_video_frames_decoded``, which shares this plan shape and
    slices real PPM-stream payloads."""
    return _video_frame_plan(media, every_ms, with_payload=False)


def _resize_plan(media: DataFrame, max_w: int, max_h: int, with_payload: bool) -> DataFrame:
    images = media.filter(F.col("media_type") == "image")
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    cols = ["media_id", "width", "height"]
    if with_payload:
        cols.append("payload")
    return images.select(
        *cols,
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("out_width"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("out_height"),
    )


def resize_image(media: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Aspect-preserving resize PLAN: target dims are pure JVM expressions
    on the metadata; no payload column is emitted. The real resample
    lives in ``resize_image_decoded``, which shares this plan and
    decodes/resamples/re-encodes PPM payloads. Keeping the geometry
    math JVM-side means the Python stage receives exact output shapes and
    never re-decides them."""
    return _resize_plan(media, max_w, max_h, with_payload=False)


# --- real codec path (P6 PPM, pure numpy — no external library) -----------
#
# PPM is a real, widely-supported image format (netpbm) whose codec is
# simple enough to implement without PIL/ffmpeg, so at least one payload
# transform in this module is genuinely non-identity even in a container
# with no imaging libraries. Swapping PPM for JPEG/PNG later changes only
# _ppm_decode/_ppm_encode; the Spark dataflow is already the real one.

PPM_MIME = "image/x-portable-pixmap"


def _ppm_encode(arr) -> bytes:
    """Encode an HxWx3 uint8 array as binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_decode(payload: bytes):
    """Decode binary PPM (P6) to an HxWx3 uint8 array, or None if the
    payload is not a well-formed P6 image (the honest fallback signal)."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        return None
    w, h = int(m.group(1)), int(m.group(2))
    data = payload[m.end() :]
    if w <= 0 or h <= 0 or len(data) < w * h * 3:
        return None
    return np.frombuffer(data[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def synthesize_ppm_images(documents: DataFrame, max_src: int = 48) -> DataFrame:
    """REAL image payloads (P6 PPM), deterministically derived from
    doc_id: dims from xxhash64 (JVM-side), pixels a reproducible gradient
    generated in one Arrow pass. Produces MEDIA_SCHEMA rows so every
    image operator runs against decodable payloads."""
    import numpy as np

    # fan the tiny documents scan out BEFORE the Python codec stage
    # (r15 opt, guide §2.5 — the source_overlap fix): a 600 KB parquet
    # arrives as ONE split and serializes every downstream decode
    # through a single Arrow worker; a no-op at scan sizes that split
    base = ensure_min_parallelism(documents).select(
        F.col("doc_id").alias("media_id"),
        (F.pmod(F.xxhash64("doc_id", F.lit("w")), F.lit(max_src)) + 4).cast("int").alias("width"),
        (F.pmod(F.xxhash64("doc_id", F.lit("h")), F.lit(max_src)) + 4).cast("int").alias("height"),
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for mid, w, h in zip(pdf["media_id"], pdf["width"], pdf["height"]):
                i = np.arange(int(h))[:, None]
                j = np.arange(int(w))[None, :]
                r = (i * 7 + j * 13 + int(mid)) % 256
                g = (i * 3 + j * 5 + int(mid) * 2) % 256
                b = (i * 11 + j * 2 + int(mid) * 3) % 256
                payloads.append(
                    _ppm_encode(np.stack([r, g, b], axis=2).astype(np.uint8))
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": "image",
                    "payload": payloads,
                    "mime": PPM_MIME,
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "duration_ms": pd.array([None] * len(pdf), dtype="Int32"),
                }
            )

    return base.mapInPandas(gen, MEDIA_SCHEMA)


PATCH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
    ]
)


def image_patches(media: DataFrame, patch: int = 4) -> DataFrame:
    """ViT-style patch extraction over the REAL decode path: each P6
    payload is decoded, cropped to a multiple of ``patch`` (bottom/right
    remainder dropped — the standard pre-embedding crop), and split into
    non-overlapping patch x patch blocks; per block the integer channel
    SUMS are emitted (sums, not float means, so the result is exact and
    cross-engine checkable — downstream divides by ``n_px`` at
    embedding time). Flat (media_id, py, px) rows: the layout an
    embedding stage consumes batch-wise.

    Python touches only payload decode + one vectorized reshape-sum per
    image (Arrow batches, no per-pixel Python). Non-P6 payloads are
    skipped, not failed — same quarantine contract as
    resize_image_decoded.
    """
    import numpy as np

    src = media.filter(F.col("mime") == PPM_MIME).select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, pys, pxs, rs, gs, bs = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _ppm_decode(bytes(payload))
                if arr is None:
                    continue
                h, w = arr.shape[:2]
                hc, wc = h - h % patch, w - w % patch
                if hc == 0 or wc == 0:
                    continue
                a = arr[:hc, :wc].astype(np.int64)
                s = a.reshape(hc // patch, patch, wc // patch, patch, 3).sum(
                    axis=(1, 3)
                )
                ny, nx = s.shape[:2]
                grid_y, grid_x = np.meshgrid(
                    np.arange(ny), np.arange(nx), indexing="ij"
                )
                mids.extend([int(mid)] * (ny * nx))
                pys.extend(grid_y.ravel().tolist())
                pxs.extend(grid_x.ravel().tolist())
                rs.extend(s[:, :, 0].ravel().tolist())
                gs.extend(s[:, :, 1].ravel().tolist())
                bs.extend(s[:, :, 2].ravel().tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.array(mids, dtype="int64"),
                    "py": pd.array(pys, dtype="int32"),
                    "px": pd.array(pxs, dtype="int32"),
                    "n_px": pd.array([patch * patch] * len(mids), dtype="int64"),
                    "r_sum": pd.array(rs, dtype="int64"),
                    "g_sum": pd.array(gs, dtype="int64"),
                    "b_sum": pd.array(bs, dtype="int64"),
                }
            )

    return src.mapInPandas(batches, PATCH_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("resized_payload", T.BinaryType()),
    ]
)


def resize_image_decoded(media: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """REAL aspect-preserving resize: the target geometry is the same
    JVM-side expression set as ``resize_image`` (Python never re-decides
    shapes), and the Python stage decodes the PPM payload, resamples with
    a nearest-neighbor index grid, and re-encodes — a genuinely
    non-identity payload transform. Payloads that are not valid P6
    (e.g. the fake payloads of ``synthesize_media``) pass through with
    ``decode_ok = false`` rather than failing the job — the per-row
    error-quarantine pattern a 100 TB media pipeline needs anyway."""
    import numpy as np

    planned = _resize_plan(media, max_w, max_h, with_payload=True)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs, oks = [], []
            for payload, ow, oh in zip(pdf["payload"], pdf["out_width"], pdf["out_height"]):
                raw = bytes(payload)
                arr = _ppm_decode(raw)
                if arr is None:
                    outs.append(raw)
                    oks.append(False)
                    continue
                yi = np.arange(int(oh)) * arr.shape[0] // int(oh)
                xi = np.arange(int(ow)) * arr.shape[1] // int(ow)
                outs.append(_ppm_encode(arr[yi][:, xi]))
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": pdf["out_width"],
                    "out_height": pdf["out_height"],
                    "decode_ok": oks,
                    "resized_payload": outs,
                }
            )

    return planned.mapInPandas(batches, RESIZED_SCHEMA)


def audio_chunks(
    media: DataFrame, chunk_ms: int = 5_000, sample_rate: int | None = None
) -> DataFrame:
    """Chunking plan for audio rows: one row per fixed-length window
    (explode over a generated sequence). With ``sample_rate`` set the
    payload slice is REAL and runs JVM-side — binary ``substring`` at
    exact sample boundaries — so each chunk row carries only its own
    bytes (exploding the full payload per row cost ~3x the whole
    operator at sf0.1, and at 100 TB would multiply Arrow transfer by
    the chunk count). Without a rate the payload passes through
    untouched (format-agnostic plan-only mode).

    The explode keeps chunk rows colocated with their source partition —
    no shuffle until an aggregation asks for one."""
    audio = media.filter(F.col("media_type") == "audio")
    stamps = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(chunk_ms))
    len_ms = F.least(
        F.col("duration_ms") - F.col("chunk_start_ms"), F.lit(chunk_ms)
    )
    exploded = audio.select(
        "media_id",
        "payload",
        F.explode(stamps).alias("chunk_start_ms"),
        "duration_ms",
    ).select("media_id", "payload", "chunk_start_ms", len_ms.alias("chunk_len_ms"))
    return exploded.select(
        "media_id",
        "chunk_start_ms",
        "chunk_len_ms",
        (
            F.expr(
                f"substring(payload, chunk_start_ms * {sample_rate} div 1000 * 2"
                f" + 1, chunk_len_ms * {sample_rate} div 1000 * 2)"
            )
            if sample_rate
            else F.col("payload")
        ).alias("chunk_payload"),
    )


# --- real video/audio codec paths (PPM frame streams, PCM s16le) ----------
#
# Same philosophy as the PPM image path: pick real formats whose codecs
# are implementable with numpy alone (a PPM-frame concatenation is how
# netpbm tooling streams video; raw PCM s16le is WAV's payload), so the
# frame-grab and chunk-slice transforms below are genuinely non-identity.

PPM_VIDEO_MIME = "video/x-portable-pixmap-stream"
PCM_MIME = "audio/L16"
PCM_RATE = 2000  # samples per second — low for a synthetic corpus: the
# pipeline shape is rate-independent and 8 kHz payloads spent more bench
# time serializing synthetic sine bytes than exercising the operator


def synthesize_ppm_video(
    documents: DataFrame, fps: int = 1, max_frames: int = 6, side: int = 16
) -> DataFrame:
    """REAL video payloads: a concatenation of P6 PPM frames (an animated
    deterministic gradient, one frame per second at ``fps``=1), dims and
    frame count derived from doc_id JVM-side."""
    import numpy as np

    base = ensure_min_parallelism(documents).select(
        F.col("doc_id").alias("media_id"),
        # pure integer derivation (not xxhash64) so a SQL oracle can
        # replay the frame plan exactly
        (F.col("doc_id") * 31 % (max_frames - 1) + 2).cast("int").alias("n_frames"),
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for mid, n in zip(pdf["media_id"], pdf["n_frames"]):
                frames = []
                i = np.arange(side)[:, None]
                j = np.arange(side)[None, :]
                for t in range(int(n)):
                    r = (i * 5 + j * 3 + int(mid) + t * 17) % 256
                    g = (i * 2 + j * 7 + int(mid) * 2 + t * 29) % 256
                    b = (i * 13 + j * 11 + int(mid) * 3 + t * 43) % 256
                    frames.append(
                        _ppm_encode(np.stack([r, g, b], axis=2).astype(np.uint8))
                    )
                payloads.append(b"".join(frames))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": "video",
                    "payload": payloads,
                    "mime": PPM_VIDEO_MIME,
                    "width": side,
                    "height": side,
                    "duration_ms": (pdf["n_frames"] * (1000 // fps)).astype("int32"),
                }
            )

    return base.mapInPandas(gen, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def _split_ppm_stream(payload: bytes) -> list[bytes]:
    """Split a concatenated P6 stream into individual frame payloads."""
    import re

    frames = []
    pos = 0
    while True:
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload[pos:])
        if not m:
            break
        body = int(m.group(1)) * int(m.group(2)) * 3
        end = pos + m.end() + body
        if end > len(payload):
            break
        frames.append(payload[pos:end])
        pos = end
    return frames


def sample_video_frames_decoded(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling: consumes the JVM frame-timestamp plan from
    ``sample_video_frames`` and extracts each requested frame's bytes
    from the P6 stream (Python never re-decides which frames to grab).
    Non-stream payloads pass through flagged ``decode_ok = false`` — the
    same per-row quarantine as ``resize_image_decoded``."""
    planned = _video_frame_plan(media, every_ms, with_payload=True)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs, oks = [], []
            for payload, ms in zip(pdf["payload"], pdf["frame_ms"]):
                raw = bytes(payload)
                frames = _split_ppm_stream(raw)
                idx = int(ms) // every_ms
                if idx < len(frames):
                    outs.append(frames[idx])
                    oks.append(True)
                else:
                    outs.append(raw)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ms": pdf["frame_ms"],
                    "decode_ok": oks,
                    "frame_payload": outs,
                }
            )

    return planned.mapInPandas(batches, FRAME_SCHEMA)


def synthesize_pcm_audio(documents: DataFrame, max_secs: int = 12) -> DataFrame:
    """REAL audio payloads: raw PCM s16le (WAV's body) at ``PCM_RATE`` Hz,
    a deterministic integer sawtooth keyed by doc_id; duration derived
    JVM-side."""
    import numpy as np

    base = ensure_min_parallelism(documents).select(
        F.col("doc_id").alias("media_id"),
        # pure integer derivation (not xxhash64) so a SQL oracle can
        # replay the chunk plan and energies exactly
        (F.col("doc_id") * 37 % (max_secs - 1) + 2).cast("int").alias("secs"),
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for mid, secs in zip(pdf["media_id"], pdf["secs"]):
                t = np.arange(int(secs) * PCM_RATE, dtype=np.int64)
                wave = ((t * (int(mid) % 97 + 3)) % 2048 - 1024).astype("<i2")
                payloads.append(wave.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": "audio",
                    "payload": payloads,
                    "mime": PCM_MIME,
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                    "duration_ms": (pdf["secs"] * 1000).astype("int32"),
                }
            )

    return base.mapInPandas(gen, MEDIA_SCHEMA)


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("chunk_start_ms", T.IntegerType()),
        T.StructField("chunk_len_ms", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("chunk_payload", T.BinaryType()),
    ]
)


def audio_chunks_decoded(
    media: DataFrame, chunk_ms: int = 5_000, keep_payload: bool = True
) -> DataFrame:
    """REAL audio chunking: the JVM plan from ``audio_chunks`` slices the
    PCM payload at exact sample boundaries (binary substring — each
    chunk row arrives carrying only its own bytes), and the Arrow stage
    decodes samples for per-chunk count and integer absolute energy
    (drift-free). Concatenating the emitted chunks reconstructs the
    original payload byte-for-byte — pinned by a test.

    ``keep_payload=False`` drops the chunk bytes from the OUTPUT batch:
    Spark cannot column-prune through a mapInPandas schema, so an
    analytics consumer that only wants the scalar columns would
    otherwise pay the full payload a second Arrow crossing
    (Python->JVM) just to project it away."""
    import numpy as np

    planned = audio_chunks(media, chunk_ms, sample_rate=PCM_RATE)
    schema = (
        CHUNK_SCHEMA
        if keep_payload
        else T.StructType([f for f in CHUNK_SCHEMA.fields if f.name != "chunk_payload"])
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            counts, energies = [], []
            for payload in pdf["chunk_payload"]:
                wave = np.frombuffer(bytes(payload), dtype="<i2")
                counts.append(len(wave))
                energies.append(int(np.abs(wave.astype(np.int64)).sum()))
            out = {
                "media_id": pdf["media_id"],
                "chunk_start_ms": pdf["chunk_start_ms"],
                "chunk_len_ms": pdf["chunk_len_ms"],
                "n_samples": counts,
                "energy": energies,
            }
            if keep_payload:
                out["chunk_payload"] = pdf["chunk_payload"]
            yield pd.DataFrame(out)

    return planned.mapInPandas(batches, schema)


def _augment_ppm(media: DataFrame, transform) -> DataFrame:
    """Shared decode -> numpy transform -> re-encode shape for image
    augmentation: Arrow batches, one vectorized array op per image,
    non-P6 payloads quarantined (skipped) like every decoded path."""
    src = media.filter(F.col("mime") == PPM_MIME)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "media_id", "media_type", "payload", "mime",
                "width", "height", "duration_ms",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _ppm_decode(bytes(payload))
                if arr is None:
                    continue
                out = transform(arr)
                if out is None or out.size == 0:
                    continue
                rows["media_id"].append(int(mid))
                rows["media_type"].append("image")
                rows["payload"].append(_ppm_encode(out))
                rows["mime"].append(PPM_MIME)
                rows["width"].append(int(out.shape[1]))
                rows["height"].append(int(out.shape[0]))
                rows["duration_ms"].append(None)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(rows["media_id"], dtype="int64"),
                    "media_type": rows["media_type"],
                    "payload": rows["payload"],
                    "mime": rows["mime"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "duration_ms": pd.array(rows["duration_ms"], dtype="Int32"),
                }
            )

    return src.mapInPandas(batches, MEDIA_SCHEMA)


def hflip_images(media: DataFrame) -> DataFrame:
    """Horizontal-flip augmentation through the REAL codec path: decode
    P6, reverse each pixel row, re-encode. Deterministic (a flip is a
    bijection, not a random crop), so the flipped corpus is exactly
    replayable — the `image_flip_patches` oracle regenerates every
    flipped pixel from the synthesis rule with j -> (w-1-j).

    Scale: linear per-image Arrow work, embarrassingly parallel; the
    payload never shuffles (mapInPandas is a narrow transform)."""
    import numpy as np

    return _augment_ppm(media, lambda arr: np.flip(arr, axis=1))


def center_crop_images(media: DataFrame, cw: int = 16, ch: int = 16) -> DataFrame:
    """Center-crop augmentation through the real codec path: crop to
    ``min(w, cw) x min(h, ch)`` anchored at the floor-center offset
    (``(h-ch)//2, (w-cw)//2``) — the standard eval-time transform.
    Deterministic; pixel equality vs a numpy slice is pytest-pinned."""

    def crop(arr):
        h, w = arr.shape[:2]
        tw, th = min(w, cw), min(h, ch)
        oy, ox = (h - th) // 2, (w - tw) // 2
        return arr[oy : oy + th, ox : ox + tw]

    return _augment_ppm(media, crop)


def decimate_audio(media: DataFrame, factor: int = 4) -> DataFrame:
    """Audio downsampling augmentation through the REAL PCM path: decode
    s16le, keep every ``factor``-th sample (the integer-decimation
    resampler — no filter, deterministic), re-encode. ``duration_ms``
    is unchanged (decimation lowers the sample rate, not the wall-clock
    length). Linear per-payload Arrow work, payload never shuffles."""
    import numpy as np

    src = media.filter(F.col("mime") == PCM_MIME)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for payload in pdf["payload"]:
                wave = np.frombuffer(bytes(payload), dtype="<i2")
                payloads.append(wave[::factor].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "mime": pdf["mime"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return src.mapInPandas(batches, MEDIA_SCHEMA)


PCM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def pcm_energy(media: DataFrame) -> DataFrame:
    """Integer sample count + total |amplitude| energy per PCM payload —
    the exact, cross-engine-checkable summary of an audio corpus (the
    audio analogue of image_patches' integer channel sums)."""
    import numpy as np

    src = media.filter(F.col("mime") == PCM_MIME).select("media_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, ns, es = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                wave = np.frombuffer(bytes(payload), dtype="<i2").astype(np.int64)
                mids.append(int(mid))
                ns.append(int(wave.size))
                es.append(int(np.abs(wave).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(mids, dtype="int64"),
                    "n_samples": pd.array(ns, dtype="int64"),
                    "energy": pd.array(es, dtype="int64"),
                }
            )

    return src.mapInPandas(batches, PCM_STATS_SCHEMA)


# --- perceptual hashing (r12) ------------------------------------------------

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def image_phash(media: DataFrame) -> DataFrame:
    """64-bit difference-hash (dHash) perceptual fingerprint through the
    REAL decode path — the image-pipeline analog of minhash text dedup:
    near-duplicate images (re-encodes, flips, light edits) land within
    a small Hamming distance and feed the same banded-Hamming join as
    SimHash text fingerprints (`dedup.banded_hamming_pairs`).

    Contract (all integer arithmetic, exactly replayable in SQL):

    - decode P6; ORIENTATION CANONICALIZATION on the FULL image first:
      if the left half-columns' luma outsums the right half's, mirror
      the image; if the two half sums are EQUAL (mirroring preserves
      the tie, so the half-sum rule alone cannot canonicalize — an
      asymmetric tied image and its mirror would keep different
      orientations and the flip near-dup would be missed, ADVICE r12),
      hash BOTH orientations and keep the smaller signed fingerprint.
      Canonicalizing BEFORE the crop matters: the dHash crop
      drops the rightmost ``w % 9`` columns, so a flipped copy cropped
      in its own frame would cover the original's LEFT remainder — the
      two crops would differ and the copy would be missed. On the
      canonical image a horizontally flipped copy produces the
      IDENTICAL fingerprint (hamming 0), which plain dHash never gives;
    - crop the canonical image to ``8*floor(h/8) x 9*floor(w/9)``
      (images with h < 8 or w < 9 are skipped — quarantine, like
      `image_patches`);
    - integer luma ``r + g + b`` summed over an 8 x 9 grid of equal
      ``(hc/8) x (wc/9)`` blocks (equal pixel counts, so comparing
      block SUMS is comparing means — no division, no floats);
    - bit (i, j) = block[i][j] > block[i][j+1], packed little-endian
      into one signed 64-bit long.

    Python touches one vectorized reshape-sum per image (Arrow
    batches); output is 16 bytes per image, so the downstream pair
    join shuffles fingerprints, never pixels."""
    import numpy as np

    src = media.filter(F.col("mime") == PPM_MIME).select("media_id", "payload")

    def dhash(luma, hc, wc):
        blocks = luma[:hc, :wc].reshape(8, hc // 8, 9, wc // 9).sum(axis=(1, 3))
        bits = blocks[:, :8] > blocks[:, 1:]
        fp = 0
        for pos in np.nonzero(bits.ravel())[0]:
            fp |= 1 << int(pos)
        if fp >= 1 << 63:
            fp -= 1 << 64
        return fp

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids, fps = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _ppm_decode(bytes(payload))
                if arr is None:
                    continue
                h, w = arr.shape[:2]
                hc, wc = h - h % 8, w - w % 9
                if hc == 0 or wc == 0:
                    continue
                luma = arr.astype(np.int64).sum(axis=2)
                half = w // 2
                lsum = int(luma[:, :half].sum())
                rsum = int(luma[:, w - half:].sum())
                if lsum > rsum:
                    fp = dhash(luma[:, ::-1], hc, wc)
                elif lsum < rsum:
                    fp = dhash(luma, hc, wc)
                else:
                    # half-sum tie: mirror-invariant, so hash both
                    # orientations and keep the smaller signed value —
                    # a deterministic rule an image and its mirror
                    # agree on (ADVICE r12)
                    fp = min(dhash(luma, hc, wc), dhash(luma[:, ::-1], hc, wc))
                mids.append(int(mid))
                fps.append(fp)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(mids, dtype="int64"),
                    "phash": pd.array(fps, dtype="int64"),
                }
            )

    return src.mapInPandas(batches, PHASH_SCHEMA)
