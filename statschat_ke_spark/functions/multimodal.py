"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

A 100 TB training-data pipeline carries media as ``binary`` payload columns
with typed metadata structs; decode / resize / feature-extract / frame-sample
run as Arrow-batched ``mapInPandas`` stages. The reference has no media path
(it is PDF-text only, /root/reference/statschat/pdf_processing/pdf_to_json.py)
— this module is the training-pipeline extension mandated by the build brief.

The actual codec step is STUBBED: this container has no image/audio
libraries, so ``_decode_payload`` tries Pillow and, when absent, falls back
to a clearly-marked DETERMINISTIC FAKE that expands the payload bytes into a
(h, w, c) uint8 array. Everything around the stub — schemas, Arrow batch
iteration, partition sizing, vectorized numpy transforms — is real and
tested; swapping in a real codec changes one function.

Scale notes: payloads make rows wide, so decode stages must bound Arrow batch
size (``spark.sql.execution.arrow.maxRecordsPerBatch``, set per-session by
``recommended_arrow_conf``) and repartition by a key, not by file, so one
4K-video row cannot skew a whole task.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META, False),
    ]
)


def recommended_arrow_conf(avg_payload_bytes: int, target_batch_bytes: int = 64 << 20) -> dict:
    """Arrow batch sizing for wide binary rows: keep a decode batch near
    ``target_batch_bytes`` so executor memory stays bounded at 100 TB."""
    rows = max(1, target_batch_bytes // max(1, avg_payload_bytes))
    return {"spark.sql.execution.arrow.maxRecordsPerBatch": str(rows)}


# --------------------------------------------------------------------------
# stubbed codec
# --------------------------------------------------------------------------


def _decode_payload(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Decode an image payload → (height, width, channels) uint8 array.

    Tries a real codec (Pillow); otherwise DETERMINISTIC FAKE: the payload
    bytes are tiled to fill the pixel buffer. Deterministic per payload, so
    every downstream transform is exactly testable.
    """
    try:  # pragma: no cover - real codec absent in this container
        import io

        from PIL import Image  # type: ignore

        arr = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        return arr
    except Exception:
        raw = np.frombuffer(payload, dtype=np.uint8)
        need = height * width * channels
        if raw.size == 0:
            raw = np.zeros(1, dtype=np.uint8)
        reps = int(np.ceil(need / raw.size))
        return np.tile(raw, reps)[:need].reshape(height, width, channels)


def _fake_waveform(payload: bytes, n_samples: int) -> np.ndarray:
    """DETERMINISTIC FAKE audio decode → float32 waveform in [-1, 1]."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        raw = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(n_samples / raw.size))
    return (np.tile(raw, reps)[:n_samples].astype(np.float32) - 127.5) / 127.5


# --------------------------------------------------------------------------
# pipeline stages (mapInPandas — Arrow-batched, no per-row Python at the API)
# --------------------------------------------------------------------------

PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), False),
    ]
)


def decode_images(media: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """image rows → raw pixel buffers (stubbed codec, real plumbing)."""
    src = media.filter(F.col("kind") == "image").select(
        "media_id", "payload", "meta.width", "meta.height", "meta.channels"
    )
    if num_partitions:
        src = src.repartition(num_partitions, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # Emit the dims of the DECODED array, not the metadata hints: a
            # real codec (Pillow, when present) returns the image's actual
            # (h, w, 3) regardless of what meta claims, and downstream
            # reshape(h, w, c) must describe the buffer it accompanies —
            # trusting meta dims here broke every real-codec decode whose
            # metadata disagreed with the file.
            arrs = [
                _decode_payload(p, int(w), int(h), int(c))
                for p, w, h, c in zip(
                    pdf["payload"], pdf["width"], pdf["height"], pdf["channels"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": np.array([a.shape[1] for a in arrs], dtype=np.int32),
                    "height": np.array([a.shape[0] for a in arrs], dtype=np.int32),
                    "channels": np.array([a.shape[2] for a in arrs], dtype=np.int32),
                    "pixels": [a.tobytes() for a in arrs],
                }
            )

    return src.mapInPandas(run, schema=PIXELS_SCHEMA)


def resize_images(pixels: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize, vectorized numpy per row buffer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for buf, w, h, c in zip(pdf["pixels"], pdf["width"], pdf["height"], pdf["channels"]):
                arr = np.frombuffer(buf, dtype=np.uint8).reshape(int(h), int(w), int(c))
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                out.append(arr[yi][:, xi].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": np.full(len(pdf), out_w, dtype=np.int32),
                    "height": np.full(len(pdf), out_h, dtype=np.int32),
                    "channels": pdf["channels"].astype("int32").to_numpy(),
                    "pixels": out,
                }
            )

    return pixels.mapInPandas(run, schema=PIXELS_SCHEMA)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mean_intensity", T.DoubleType(), False),
        T.StructField("std_intensity", T.DoubleType(), False),
        T.StructField("channel_means", T.ArrayType(T.DoubleType()), False),
    ]
)


def image_features(pixels: DataFrame) -> DataFrame:
    """Per-image intensity statistics (training-data quality filters)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            means, stds, chans = [], [], []
            for buf, w, h, c in zip(pdf["pixels"], pdf["width"], pdf["height"], pdf["channels"]):
                arr = np.frombuffer(buf, dtype=np.uint8).reshape(int(h), int(w), int(c))
                means.append(float(arr.mean()))
                stds.append(float(arr.std()))
                chans.append([float(x) for x in arr.mean(axis=(0, 1))])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "mean_intensity": means,
                    "std_intensity": stds,
                    "channel_means": chans,
                }
            )

    return pixels.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  frame_w: int = 32, frame_h: int = 32) -> DataFrame:
    """video rows → one row per sampled frame (stubbed frame decode).

    Row explosion happens executor-side inside the Arrow batch — the
    pattern for video-to-frames at scale (never collect, never per-row UDF).
    """
    src = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "meta.duration_ms"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, idxs, tss, frames = [], [], [], []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                n_frames = max(1, int(dur) // every_ms)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    # FAKE frame decode: deterministic slice of the payload
                    frames.append(
                        _decode_payload(
                            payload[i % max(1, len(payload)):] + payload[: i % max(1, len(payload))],
                            frame_w, frame_h, 3,
                        ).tobytes()
                    )
            yield pd.DataFrame(
                {
                    "media_id": np.array(ids, dtype=np.int64),
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "ts_ms": np.array(tss, dtype=np.int32),
                    "frame": frames,
                }
            )

    return src.mapInPandas(run, schema=FRAMES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossing_rate", T.DoubleType(), False),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """audio rows → waveform statistics (stubbed decode, real math)."""
    src = media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "meta.sample_rate", "meta.duration_ms"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ns, rms, zcr = [], [], []
            for payload, sr, dur in zip(pdf["payload"], pdf["sample_rate"], pdf["duration_ms"]):
                n = max(1, int(sr) * int(dur) // 1000)
                w = _fake_waveform(payload, n)
                ns.append(n)
                rms.append(float(np.sqrt(np.mean(w * w))))
                zcr.append(float(np.mean(np.signbit(w[1:]) != np.signbit(w[:-1]))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_samples": np.array(ns, dtype=np.int32),
                    "rms": rms,
                    "zero_crossing_rate": zcr,
                }
            )

    return src.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


# --------------------------------------------------------------------------
# deterministic synthetic media table (tests + contract queries)
# --------------------------------------------------------------------------


def media_from_documents(docs: DataFrame, id_col: str | None = None) -> DataFrame:
    """Derive a deterministic media table from any documents table: payload =
    utf-8 text bytes, kind cycles image/audio/video, meta derived from
    doc stats. Lets the media pipeline run over the driver's sf tables.

    ``id_col``: use an existing column as media_id (ANSI-SQL-expressible —
    the contract oracle needs it); default derives xxhash64(text)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("media_id"), F.lit(3)) + 1).cast("int"),
    )
    media_id = (
        F.col(id_col).cast("long") if id_col else F.xxhash64("text")
    )
    base = docs.select(
        media_id.alias("media_id"),
        F.coalesce(F.col("url"), F.col("doc_id").cast("string")).alias("url")
        if "url" in docs.columns
        else F.col("doc_id").cast("string").alias("url"),
        F.encode("text", "utf-8").alias("payload"),
        F.length("text").alias("_len"),
    )
    return base.select(
        "media_id",
        "url",
        kind.alias("kind"),
        "payload",
        F.struct(
            (F.pmod("_len", F.lit(48)) + 16).cast("int").alias("width"),
            (F.pmod("_len", F.lit(32)) + 16).cast("int").alias("height"),
            F.lit(3).cast("int").alias("channels"),
            F.lit(8000).cast("int").alias("sample_rate"),
            (F.pmod("_len", F.lit(4000)) + 1000).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )
