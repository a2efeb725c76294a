"""Multimodal payload columns: audio & video as opaque binary + typed
metadata, processed by Arrow-vectorized UDFs.

The same architecture the image pipeline uses (SURVEY.md §1.2: payloads
stay ``binary`` at the Spark layer; decoding happens only inside
``mapInPandas``) extended to the other training-data modalities:

- **audio**: ``(audio_id, bytes, sample_rate, n_samples, fmt,
  caption)``. ``fmt="pcm16"`` (raw little-endian int16) decodes for
  real; compressed codecs (mp3/opus/flac) are STUBBED behind an
  import-try — the decode libraries are not in this container, but the
  Spark-side plumbing (schema, batching, UDF signatures) is identical
  and tested.
- **video**: ``(video_id, bytes, w, h, fps, n_frames, fmt, caption)``.
  ``fmt="rawgray8"`` (frame-major uint8 planes) decodes for real;
  ``h264``/``vp9`` are stubbed the same way.

Feature extraction is pure NumPy (no external DSP deps): RMS energy,
zero-crossing rate and FFT spectral centroid for audio; per-frame
luma statistics and frame-to-frame motion energy for video.
Frame sampling (every k-th frame) is the decode-side analogue of
column pruning: it happens before any further compute and shrinks the
payload by ~k×.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_SCHEMA = ("audio_id string, bytes binary, sample_rate int, "
                "n_samples int, fmt string, caption string")
VIDEO_SCHEMA = ("video_id string, bytes binary, w int, h int, fps double, "
                "n_frames int, fmt string, caption string")

AUDIO_FEATURE_SCHEMA = ("audio_id string, caption string, duration_sec double, "
                        "rms double, zero_cross_rate double, "
                        "spectral_centroid_hz double")
VIDEO_FEATURE_SCHEMA = ("video_id string, caption string, n_frames_sampled int, "
                        "mean_luma double, luma_std double, "
                        "motion_energy double")


# ----------------------------------------------------------- decode ----

def decode_audio(payload: bytes, fmt: str) -> np.ndarray:
    """binary → float32 waveform in [-1, 1]."""
    if fmt == "pcm16":
        return np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32768.0
    # compressed codecs need external decoders not present in this
    # container; the plumbing around this call is real and tested
    try:  # pragma: no cover - exercised only where the lib exists
        import soundfile  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"audio codec {fmt!r} needs an external decoder (soundfile); "
            "only 'pcm16' decodes in this environment")
    raise NotImplementedError(f"audio codec {fmt!r} not wired")


def decode_video(payload: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """binary → (n_frames, h, w) uint8 luma frames."""
    if fmt == "rawgray8":
        return np.frombuffer(payload, dtype=np.uint8).reshape(-1, h, w)
    try:  # pragma: no cover
        import av  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"video codec {fmt!r} needs an external decoder (PyAV); "
            "only 'rawgray8' decodes in this environment")
    raise NotImplementedError(f"video codec {fmt!r} not wired")


def encode_video(frames: np.ndarray) -> bytes:
    return np.ascontiguousarray(frames.astype(np.uint8)).tobytes()


# --------------------------------------------------------- kernels ----

def audio_features_np(wave: np.ndarray, sample_rate: int) -> dict:
    n = len(wave)
    rms = float(np.sqrt(np.mean(wave**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(wave[1:]) != np.signbit(wave[:-1]))) if n > 1 else 0.0
    if n:  # rfft raises on 0 points; empty payloads degrade, not crash
        spec = np.abs(np.fft.rfft(wave))
        freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
        denom = spec.sum()
    else:
        freqs = spec = np.array([0.0])
        denom = 0.0
    centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
    return {"duration_sec": n / sample_rate, "rms": rms,
            "zero_cross_rate": zcr, "spectral_centroid_hz": centroid}


def frame_sample_np(frames: np.ndarray, every_k: int) -> np.ndarray:
    """Deterministic temporal subsampling (every k-th frame, frame 0
    anchored) — decode-side pruning."""
    return frames[::max(int(every_k), 1)]


def video_features_np(frames: np.ndarray) -> dict:
    f = frames.astype(np.float64)
    motion = (np.mean(np.abs(np.diff(f, axis=0)))
              if len(f) > 1 else 0.0)
    return {"n_frames_sampled": int(len(f)),
            "mean_luma": float(f.mean()) if f.size else 0.0,
            "luma_std": float(f.std()) if f.size else 0.0,
            "motion_energy": float(motion)}


# ------------------------------------------------------ spark layer ----

def audio_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the audio table."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                wave = decode_audio(r.bytes, r.fmt)
                feats = audio_features_np(wave, r.sample_rate)
                rows.append({"audio_id": r.audio_id, "caption": r.caption,
                             **feats})
            yield pd.DataFrame(rows)
    return df.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def video_features(df: DataFrame, sample_every_k: int = 1) -> DataFrame:
    """Frame-sample then extract per-clip features (one fused pass —
    the same fusion policy as mask∘composite)."""
    k = int(sample_every_k)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frames = frame_sample_np(
                    decode_video(r.bytes, r.w, r.h, r.fmt), k)
                rows.append({"video_id": r.video_id, "caption": r.caption,
                             **video_features_np(frames)})
            yield pd.DataFrame(rows)
    return df.mapInPandas(run, schema=VIDEO_FEATURE_SCHEMA)


def resize_video(df: DataFrame, out_w: int, out_h: int,
                 method: str = "bilinear") -> DataFrame:
    """Per-frame spatial resize using the warp kernels (shared with the
    image path) — narrow map, schema-preserving."""
    from vrtility_spark.warp import resample_plane

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for r in pdf.itertuples(index=False):
                frames = decode_video(r.bytes, r.w, r.h, r.fmt)
                if len(frames) == 0:  # zero-frame clips pass through
                    payloads.append(b"")
                    continue
                out = np.stack([
                    np.clip(np.round(resample_plane(f, out_h, out_w, method)),
                            0, 255)
                    for f in frames])
                payloads.append(encode_video(out))
            pdf = pdf.copy()
            pdf["bytes"] = payloads
            pdf["w"] = out_w
            pdf["h"] = out_h
            yield pdf
    return df.mapInPandas(run, schema=df.schema)


# ------------------------------------------------ deterministic fixtures ----

def audio_pandas(n: int = 12, sample_rate: int = 8000,
                 duration_sec: float = 0.5) -> pd.DataFrame:
    """Seeded synthetic PCM clips: tone + harmonic + noise, frequency a
    deterministic function of the clip index."""
    rng = np.random.default_rng(7)
    rows = []
    ns = int(sample_rate * duration_sec)
    t = np.arange(ns) / sample_rate
    for i in range(n):
        f0 = 220.0 * (1 + i % 5)
        wave = (0.6 * np.sin(2 * np.pi * f0 * t)
                + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
                + 0.05 * rng.standard_normal(ns))
        pcm = np.clip(wave * 32767, -32768, 32767).astype("<i2")
        rows.append({"audio_id": f"a{i:04d}", "bytes": pcm.tobytes(),
                     "sample_rate": sample_rate, "n_samples": ns,
                     "fmt": "pcm16", "caption": f"clip {i} tone {f0:.0f}Hz"})
    return pd.DataFrame(rows)


def video_pandas(n: int = 6, w: int = 24, h: int = 16,
                 n_frames: int = 10) -> pd.DataFrame:
    """Seeded synthetic clips: a moving bright square over noise, speed
    a deterministic function of the clip index."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(n):
        frames = (rng.integers(0, 40, (n_frames, h, w))).astype(np.uint8)
        speed = 1 + i % 3
        for f in range(n_frames):
            x = (f * speed) % (w - 4)
            frames[f, 4:8, x:x + 4] = 250
        rows.append({"video_id": f"v{i:04d}", "bytes": encode_video(frames),
                     "w": w, "h": h, "fps": 10.0, "n_frames": n_frames,
                     "fmt": "rawgray8", "caption": f"clip {i} speed {speed}"})
    return pd.DataFrame(rows)
