"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. The codec step is import-gated because
this container ships no image/audio libraries: with PIL present the
real decoder runs ('real' forces it, 'strict' uses it when available);
without it, ``decode_mode='fake'`` produces a deterministic fake
(metro64-seeded pixel/pcm block of the declared shape) so downstream
feature extraction and tests exercise the full pipeline, and
``decode_mode='strict'`` raises NotImplementedError rather than ever
silently faking.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cuckoo_filter_spark.hashing import metro64_batch

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)


def _try_real_image_decoder():
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode_images(payloads: pd.Series, widths, heights) -> np.ndarray | list:
    """Deterministic fake decode: seeded uint8 HxWx3 per payload."""
    seeds = metro64_batch(payloads)
    out = []
    for s, w, h in zip(seeds, widths, heights):
        rng = np.random.default_rng(int(s))
        out.append(rng.integers(0, 256, size=(int(h), int(w), 3), dtype=np.uint8))
    return out


def _real_decode_images(payloads: pd.Series) -> list:
    """PIL decode: payload bytes → uint8 HxWx3 RGB arrays."""
    import io

    from PIL import Image

    out = []
    for p in payloads:
        with Image.open(io.BytesIO(bytes(p))) as im:
            out.append(np.asarray(im.convert("RGB"), dtype=np.uint8))
    return out


def decode_image_features(decode_mode: str = "fake"):
    """mapInPandas fn: media rows → (media_id, mean_r, mean_g, mean_b,
    luma_std).

    decode_mode:
    * 'fake' — deterministic metro64-seeded pixels of the declared
      shape; payloads need not be valid images (pipeline tests).
    * 'real' — decode payload bytes with PIL (ImportError if absent).
    * 'strict' — real decode when PIL is present, NotImplementedError
      otherwise (never silently fake).
    """
    if decode_mode not in ("fake", "real", "strict"):
        raise ValueError(f"unknown decode_mode {decode_mode!r}")
    has_real = _try_real_image_decoder()
    if decode_mode == "real" and not has_real:
        raise ImportError("decode_mode='real' requires PIL")
    use_real = decode_mode == "real" or (decode_mode == "strict" and has_real)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            if len(img) == 0:
                continue
            if decode_mode == "strict" and not has_real:
                raise NotImplementedError(
                    "image decode requires PIL (not in this container); "
                    "use decode_mode='fake' for pipeline testing"
                )
            if use_real:
                arrays = _real_decode_images(img["payload"])
            else:
                arrays = _fake_decode_images(
                    img["payload"], img["width"], img["height"])
            means = np.array([a.reshape(-1, 3).mean(axis=0) for a in arrays])
            luma = np.array(
                [float((0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]).std())
                 for a in arrays]
            )
            yield pd.DataFrame(
                {
                    "media_id": img["media_id"].to_numpy(),
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "luma_std": luma,
                }
            )

    return fn


def image_features(df: DataFrame, decode_mode: str = "fake") -> DataFrame:
    return df.mapInPandas(
        decode_image_features(decode_mode),
        "media_id long, mean_r double, mean_g double, mean_b double, luma_std double",
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: expands (media_id, n_frames) into
    sampled frame indices JVM-side (sequence+filter); the per-frame
    decode is the stubbed step."""
    vids = df.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("n_frames") - 1),
                lambda i: i % every_n == 0,
            )
        ).alias("frame_idx"),
    )


def resize_plan(df: DataFrame, target: int = 224) -> DataFrame:
    """Resize planning (aspect-preserving short-side) — pure column math
    so Catalyst handles it; actual pixel resample is the stubbed step."""
    short = F.least("width", "height").cast("double")
    scale = F.lit(float(target)) / short
    return df.where(F.col("kind") == "image").select(
        "media_id",
        F.round(F.col("width") * scale).cast("int").alias("out_w"),
        F.round(F.col("height") * scale).cast("int").alias("out_h"),
    )


def synth_media(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for pipeline tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(64)
        rows.append(
            (
                i, kind, bytearray(payload),
                int(rng.integers(32, 256)) if kind == "image" else 0,
                int(rng.integers(32, 256)) if kind == "image" else 0,
                16000 if kind == "audio" else 0,
                int(rng.integers(30, 300)) if kind == "video" else 0,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
