"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. Codec availability differs by modality:

* image — import-gated: with PIL present the real decoder runs ('real'
  forces it, 'strict' uses it when available); without it 'strict'
  raises NotImplementedError rather than ever silently faking.
* audio — WAV decodes FOR REAL via the stdlib ``wave`` module (no
  external library); other codecs (mp3/flac/ogg) raise wave.Error in
  real/strict modes rather than silently faking.
* video — per-frame decode remains plumbing-only (frame indices expand
  JVM-side; no video codec ships in this container).

``decode_mode='fake'`` always produces a deterministic fake
(metro64-seeded pixel/PCM block of the declared shape) so downstream
feature extraction and tests exercise the full pipeline shape.
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
    """Deterministic fake decode: seeded uint8 HxWx3 per payload.
    Declared dimensions are metadata, not ground truth — NULL or
    non-positive dims fail LOUD here (a (0,0,3) array would flow NaN
    means silently downstream; same guard class as resize_plan)."""
    seeds = metro64_batch(payloads)
    out = []
    for s, w, h in zip(seeds, widths, heights):
        if pd.isna(w) or pd.isna(h) or int(w) <= 0 or int(h) <= 0:
            raise ValueError(
                f"fake image decode needs positive declared dims, got "
                f"width={w!r} height={h!r} — corrupt media metadata")
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
    if decode_mode == "real" and not _try_real_image_decoder():
        # fast driver-side fail for the explicit mode; the probe below
        # re-runs on the EXECUTOR (where the decode actually executes) —
        # a driver/executor PIL mismatch must honor the error contract,
        # not die with a raw ImportError inside a task
        raise ImportError("decode_mode='real' requires PIL")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        has_real = _try_real_image_decoder()  # probed where the work runs
        if decode_mode == "real" and not has_real:
            raise ImportError(
                "decode_mode='real' requires PIL on the EXECUTORS "
                "(present on the driver, absent here)")
        use_real = decode_mode == "real" or (decode_mode == "strict" and has_real)
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


def _real_decode_wav(payloads: pd.Series) -> list[tuple[np.ndarray, int]]:
    """WAV decode via the stdlib ``wave`` module (no external codec
    needed): payload bytes → (float64 mono PCM in [-1, 1], sample_rate).
    Handles all PCM widths wave can read — 8-bit unsigned, 16/32-bit
    signed, and 3-byte 24-bit (sign-extended manually; numpy has no
    int24 dtype)."""
    import io
    import wave

    out = []
    for p in payloads:
        with wave.open(io.BytesIO(bytes(p))) as w:
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
            if width == 3:  # 24-bit PCM: assemble + sign-extend
                b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
                arr = (b[:, 0].astype(np.int64)
                       | (b[:, 1].astype(np.int64) << 8)
                       | (b[:, 2].astype(np.int64) << 16))
                arr = ((arr ^ 0x800000) - 0x800000).astype(np.float64)
            else:
                dt = {1: np.uint8, 2: "<i2", 4: "<i4"}.get(width)
                if dt is None:
                    raise wave.Error(
                        f"unsupported PCM sample width {width} bytes")
                arr = np.frombuffer(raw, dtype=dt).astype(np.float64)
                if width == 1:
                    arr -= 128.0
            ch = w.getnchannels()
            if ch > 1:
                arr = arr.reshape(-1, ch).mean(axis=1)
            out.append((arr / float(1 << (8 * width - 1)),
                        w.getframerate()))
    return out


def _fake_decode_audio(payloads: pd.Series, sample_rates) -> list[np.ndarray]:
    """Deterministic fake decode: 1 second of metro64-seeded uniform PCM
    in [-1, 1] at the declared sample rate."""
    seeds = metro64_batch(payloads)
    out = []
    for s, sr in zip(seeds, sample_rates):
        rng = np.random.default_rng(int(s))
        out.append(rng.uniform(-1.0, 1.0, size=max(int(sr), 1)))
    return out


AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_sec double, rms double, peak double, "
    "zero_cross_rate double"
)


def decode_audio_features(decode_mode: str = "fake"):
    """mapInPandas fn: audio media rows → (media_id, duration_sec, rms,
    peak, zero_cross_rate).

    decode_mode:
    * 'fake' — deterministic metro64-seeded PCM of the declared rate;
      payloads need not be valid audio (pipeline tests).
    * 'real' / 'strict' — stdlib ``wave`` decode: WAV payloads decode
      for real with NO external library (unlike images, where PIL is
      import-gated). Non-WAV codecs (mp3/flac/ogg) are not shipped in
      this container: wave.Error propagates rather than silently
      faking, which is the 'strict' contract.
    """
    if decode_mode not in ("fake", "real", "strict"):
        raise ValueError(f"unknown decode_mode {decode_mode!r}")
    use_real = decode_mode in ("real", "strict")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            aud = pdf[pdf["kind"] == "audio"]
            if len(aud) == 0:
                continue
            if use_real:
                decoded = _real_decode_wav(aud["payload"])
                pcm = [d[0] for d in decoded]
                srs = [d[1] for d in decoded]
            else:
                if aud["sample_rate"].isna().any():
                    raise ValueError(
                        "fake audio decode needs a declared sample_rate "
                        "on every audio row (NULL found — corrupt media "
                        "metadata)")
                srs = [max(int(s), 1) for s in aud["sample_rate"]]
                pcm = _fake_decode_audio(aud["payload"], srs)
            dur = np.array([len(a) / sr for a, sr in zip(pcm, srs)])
            rms = np.array([float(np.sqrt(np.mean(a * a))) if len(a) else 0.0
                            for a in pcm])
            peak = np.array([float(np.abs(a).max()) if len(a) else 0.0
                             for a in pcm])
            zcr = np.array(
                [float(np.mean(np.signbit(a[1:]) != np.signbit(a[:-1])))
                 if len(a) > 1 else 0.0 for a in pcm])
            yield pd.DataFrame(
                {
                    "media_id": aud["media_id"].to_numpy(),
                    "duration_sec": dur,
                    "rms": rms,
                    "peak": peak,
                    "zero_cross_rate": zcr,
                }
            )

    return fn


def audio_features(df: DataFrame, decode_mode: str = "fake") -> DataFrame:
    return df.mapInPandas(decode_audio_features(decode_mode),
                          AUDIO_FEATURES_SCHEMA)


def synth_wav(freq_hz: float = 440.0, seconds: float = 0.25,
              sample_rate: int = 16000, amplitude: float = 0.5) -> bytes:
    """A real 16-bit mono WAV payload (stdlib wave) — deterministic sine
    tone, for exercising the REAL audio decode branch in tests."""
    import io
    import wave

    t = np.arange(int(sample_rate * seconds)) / sample_rate
    pcm = (amplitude * np.sin(2 * np.pi * freq_hz * t)
           * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: expands (media_id, n_frames) into
    sampled frame indices JVM-side (sequence+filter); the per-frame
    decode is the stubbed step."""
    # n_frames > 0 guard: sequence(0, -1) yields the DESCENDING [0, -1],
    # so a zero-frame video (corrupt / probe-failed metadata) would emit
    # a phantom frame_idx=0 targeting a frame that does not exist
    vids = df.where((F.col("kind") == "video") & (F.col("n_frames") > 0))
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
    # dimensions > 0 guard: 0 is this schema's in-band "not applicable"
    # value (synth_media uses it for non-image kinds), and under Spark
    # 4's default ANSI mode 224.0/0.0 would kill the whole job with
    # DIVIDE_BY_ZERO; a zero-dimension image cannot be resized — drop it
    return df.where((F.col("kind") == "image")
                    & (F.col("width") > 0) & (F.col("height") > 0)).select(
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
