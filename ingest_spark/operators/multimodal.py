"""Multimodal columns: opaque binary media + typed metadata.

Images/audio/video are treated as ``binary`` columns with a typed
metadata struct — the Spark-side plumbing (schemas, partition-size
awareness, Arrow batch shapes, UDF signatures) is real and tested;
the codec step itself is STUBBED because no imaging/audio libraries
exist in this container:

- ``decode_image`` raises NotImplementedError unless a real decoder is
  importable (PIL gate) — callers choose ``fake=True`` for the
  deterministic fake decoder, which derives a stable pseudo-pixel
  tensor from the bytes (so downstream shape/partition logic is
  exercised end-to-end).
- ``resize`` / ``frame_sample`` / ``feature_extract`` operate on the
  decoded tensor representation (list of channel-major floats) with
  correct batch semantics under ``mapInPandas``.

Media rows are large: the operators repartition by byte-size budget
(``bytes_per_partition``) before Python stages so Arrow batches stay
bounded — the 100 TB consideration that matters here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("content", BinaryType(), False),      # opaque encoded bytes
    StructField("mime", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
    StructField("n_bytes", LongType(), False),
])

try:  # pragma: no cover — not installed in this container
    from PIL import Image as _PIL  # type: ignore
    HAVE_PIL = True
except ImportError:
    _PIL = None
    HAVE_PIL = False


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: content bytes derived from the id
    (so every pipeline stage is reproducible)."""
    df = spark.range(0, n).withColumnRenamed("id", "media_id")
    i = F.col("media_id")
    kind = F.when(i % 3 == 0, "image").when(i % 3 == 1, "audio").otherwise("video")
    payload = F.encode(
        F.concat(F.lit("MEDIA:"), F.sha2(i.cast("string"), 256), F.lit(":"), i), "UTF-8"
    )
    return df.select(
        "media_id",
        kind.alias("kind"),
        payload.alias("content"),
        F.when(kind == "image", "image/png")
        .when(kind == "audio", "audio/wav")
        .otherwise("video/mp4").alias("mime"),
        F.when(kind != "audio", (16 + i % 16).cast("int")).alias("width"),
        F.when(kind != "audio", (16 + (i * 7) % 16).cast("int")).alias("height"),
        F.when(kind != "image", (1000 + i % 9000).cast("int")).alias("duration_ms"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def repartition_by_bytes(
    media: DataFrame, bytes_per_partition: int = 64 * 1024 * 1024
) -> DataFrame:
    """Size-aware repartition so Python/Arrow stages see bounded batches
    even with multi-MB rows (total_bytes / budget partitions)."""
    total = media.agg(F.sum("n_bytes")).first()[0] or 0
    parts = max(1, int(total // bytes_per_partition) + 1)
    return media.repartition(parts)


def _fake_pixels(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-decode: bytes → (h, w, 3) float32 in [0,1]."""
    seed = int.from_bytes(content[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    return rng.random((height, width, 3), dtype=np.float32)


DECODED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("height", IntegerType(), False),
    StructField("width", IntegerType(), False),
    StructField("pixels", ArrayType(FloatType()), False),  # h*w*3 row-major
])


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """image rows → pixel tensors. Real decoding needs PIL (absent
    here): raises NotImplementedError unless ``fake=True`` (deterministic
    fake) or PIL is importable."""
    if not fake and not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL (not available in this environment); "
            "pass fake=True for the deterministic fake decoder"
        )

    use_fake = fake or not HAVE_PIL

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "image"]
            rows = {"media_id": [], "height": [], "width": [], "pixels": []}
            # decode is inherently per-image; iterate plain numpy arrays
            # (no per-row pandas Series construction)
            for mid, content, w0, h0 in zip(
                pdf["media_id"].to_numpy(),
                pdf["content"].to_numpy(),
                pdf["width"].to_numpy(),
                pdf["height"].to_numpy(),
            ):
                w = int(w0) if not pd.isna(w0) else 16
                h = int(h0) if not pd.isna(h0) else 16
                if use_fake:
                    px = _fake_pixels(bytes(content), w, h)
                else:  # pragma: no cover
                    import io
                    px = np.asarray(
                        _PIL.open(io.BytesIO(bytes(content))).convert("RGB"),
                        dtype=np.float32,
                    ) / 255.0
                    h, w = px.shape[:2]
                rows["media_id"].append(int(mid))
                rows["height"].append(h)
                rows["width"].append(w)
                rows["pixels"].append(px.reshape(-1).tolist())
            yield pd.DataFrame(rows)

    return media.mapInPandas(_decode, DECODED_SCHEMA)


def resize(decoded: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize of decoded tensors (pure numpy)."""
    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "height": [], "width": [], "pixels": []}
            for mid, h, w, pixels in zip(
                pdf["media_id"].to_numpy(), pdf["height"].to_numpy(),
                pdf["width"].to_numpy(), pdf["pixels"].to_numpy(),
            ):
                h, w = int(h), int(w)
                px = np.asarray(pixels, dtype=np.float32).reshape(h, w, 3)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                rs = px[yi][:, xi]
                out["media_id"].append(int(mid))
                out["height"].append(out_h)
                out["width"].append(out_w)
                out["pixels"].append(rs.reshape(-1).tolist())
            yield pd.DataFrame(out)

    return decoded.mapInPandas(_resize, DECODED_SCHEMA)


FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("embedding", ArrayType(FloatType()), False),
])


def feature_extract(decoded: DataFrame, dim: int = 16) -> DataFrame:
    """Stub feature extractor: channel-mean + downsampled grid stats →
    fixed-dim vector (a real model slot; deterministic here)."""
    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "embedding": []}
            for mid, h, w, pixels in zip(
                pdf["media_id"].to_numpy(), pdf["height"].to_numpy(),
                pdf["width"].to_numpy(), pdf["pixels"].to_numpy(),
            ):
                h, w = int(h), int(w)
                px = np.asarray(pixels, dtype=np.float32).reshape(h, w, 3)
                means = px.mean(axis=(0, 1))  # 3
                grid = px.mean(axis=2)
                qh = max(1, h // 2)
                qw = max(1, w // 2)
                quads = [
                    grid[:qh, :qw].mean(), grid[:qh, qw:].mean(),
                    grid[qh:, :qw].mean(), grid[qh:, qw:].mean(),
                ]
                vec = np.concatenate([means, quads, grid.std(axis=0)[: dim - 7]])
                vec = np.pad(vec, (0, max(0, dim - len(vec))))[:dim]
                out["media_id"].append(int(mid))
                out["embedding"].append(vec.astype(np.float32).tolist())
            yield pd.DataFrame(out)

    return decoded.mapInPandas(_feat, FEATURES_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("ts_ms", IntegerType(), False),
])


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp
    (decode stubbed; the explode/batch plumbing is the real part)."""
    frames = F.sequence(
        F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0))
    )
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(frames).alias("frame_idx", "_i"),
        )
        .select(
            "media_id", "frame_idx",
            (F.col("frame_idx") * every_ms).cast("int").alias("ts_ms"),
        )
    )
