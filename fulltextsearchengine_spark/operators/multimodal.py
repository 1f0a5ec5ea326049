"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads + typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition-parallel
decode, frame explosion — is real and tested. The actual media CODECS
are stubbed (this container ships no PIL/ffmpeg/librosa): ``decode_*``
raise ``NotImplementedError`` unless ``fake=True`` selects the
deterministic fake decoder (seeded from the payload bytes), which keeps
every downstream shape/partitioning/UDF contract testable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                payload,
                int(rng.integers(16, 256)) if kind == "image" else None,
                int(rng.integers(16, 256)) if kind == "image" else None,
                int(rng.integers(1000, 60000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake 'decode': pseudo pixels from sha256-seeded
    bytes — stands in for PIL.Image.open until the real codec lands."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, mean_byte double, std_byte double, histogram array<long>"


def extract_byte_features(media: DataFrame) -> DataFrame:
    """Codec-free feature extraction over the raw payload (real, not a
    stub): per-media byte stats + 16-bin histogram, vectorized per Arrow
    batch. The pattern for any 'bytes → features' multimodal stage."""

    def feats(batches):
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                a = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(a >> 4, minlength=16).astype(np.int64)
                out.append((mid, kind, len(a), float(a.mean()), float(a.std()), hist.tolist()))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "mean_byte", "std_byte", "histogram"]
            )

    return media.mapInPandas(feats, schema=FEATURE_SCHEMA)


DECODE_SCHEMA = "media_id long, width int, height int, channels int, mean_r double, mean_g double, mean_b double"


def decode_images(media: DataFrame, fake: bool = False) -> DataFrame:
    """Image decode → per-channel means. ``fake=False`` requires a real
    codec (PIL) and raises NotImplementedError in this container."""
    if not fake:
        # Unconditional: the decode body below is the deterministic stub,
        # so fabricated pixel stats must NEVER masquerade as a real decode
        # even on a machine where PIL happens to be importable. A real
        # build replaces _fake_pixels with PIL.Image.open and removes this.
        raise NotImplementedError(
            "real image decode is not implemented in this container (no "
            "PIL/ffmpeg); run with fake=True for the deterministic stub "
            "decoder — Spark-side plumbing (schema/batching/partitioning) "
            "is identical"
        )

    def decode(batches):
        for pdf in batches:
            sel = pdf[pdf["kind"] == "image"]
            out = []
            for mid, payload, w, h in zip(sel["media_id"], sel["payload"], sel["width"], sel["height"]):
                px = _fake_pixels(payload, int(w), int(h))
                m = px.reshape(-1, 3).mean(axis=0)
                out.append((mid, int(w), int(h), 3, float(m[0]), float(m[1]), float(m[2])))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "channels", "mean_r", "mean_g", "mean_b"]
            )

    return media.mapInPandas(decode, schema=DECODE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: explode each video payload into n_frames
    evenly-spaced chunks (the real partition-parallel explode shape; a
    real build swaps the chunker for ffmpeg keyframe extraction)."""

    def frames(batches):
        for pdf in batches:
            sel = pdf[pdf["kind"] == "video"]
            out = []
            for mid, payload in zip(sel["media_id"], sel["payload"]):
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    chunk = payload[i * step : (i + 1) * step]
                    if chunk:
                        out.append((mid, i, bytes(chunk)))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_payload"])

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


def media_with_embeddings(media: DataFrame, dim: int = 32) -> DataFrame:
    """payload → deterministic pseudo-embedding (sha-seeded unit vector):
    the plumbing for 'embed then ANN-join' multimodal dedup, feeding
    operators/similarity.py."""

    def embed(batches):
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
                v = np.random.default_rng(seed).standard_normal(dim)
                v /= np.linalg.norm(v)
                out.append((mid, v.astype(np.float32).tolist()))
            yield pd.DataFrame(out, columns=["media_id", "embedding"])

    return media.mapInPandas(embed, schema="media_id long, embedding array<float>")
