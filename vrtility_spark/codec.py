"""Pixel payload codecs: ``bytes`` column <-> NumPy ``(bands, h, w)``.

The engine keeps pixels as opaque ``binary`` at the Spark layer (the
reference keeps them inside GDAL/NumPy and only metadata in R,
/root/reference/R/vrt-block.R:10-45); decoding happens only inside
Arrow-vectorized UDFs, whole batches at a time.

Formats (the ``fmt`` column):

- ``raw16``  — band-sequential little-endian **uint16** planes (lossless
  fast path; zero-copy ``np.frombuffer``).
- ``raw16s`` — same, **int16** (HLS-style profile, nodata -9999).
- ``png``    — a real 16-bit greyscale PNG, bands stacked vertically
  (lossless, zlib-compressed; pure-stdlib codec, no PIL).
- ``png8``   — 8-bit PNG after quantization by 257 (lossy path; PSNR vs
  the uint16 original ≈ 58 dB >= the 40 dB gate in BASELINE.json).
- ``rawf32`` — band-sequential little-endian **float32** planes with
  NaN nodata — the storage of derived bands (the reference forces
  derived bands to Float32, /root/reference/R/vrt-derived-block.R:123).
- ``rawf64`` — band-sequential little-endian **float64** planes: the
  label/identifier payload (watershed basin ids encode global pixel
  coordinates, exact only up to 2**53 — past float32).

All encoders/decoders are deterministic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_Q8 = 257  # 65535 / 255 — exact for full-range uint16


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _png_encode_gray(img: np.ndarray, bitdepth: int) -> bytes:
    """Encode a 2-D uint8/uint16 array as greyscale PNG (filter 0)."""
    h, w = img.shape
    if bitdepth == 16:
        raw = img.astype(">u2").tobytes()
        stride = w * 2
    else:
        raw = img.astype(np.uint8).tobytes()
        stride = w
    lines = bytearray()
    for r in range(h):
        lines.append(0)  # filter type 0 (None)
        lines += raw[r * stride : (r + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )


def _png_decode_gray(buf: bytes) -> np.ndarray:
    """Decode a greyscale filter-0 PNG produced by :func:`_png_encode_gray`."""
    assert buf[:8] == _PNG_SIG, "not a PNG"
    pos, w, h, bitdepth, idat = 8, 0, 0, 0, b""
    while pos < len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bitdepth, color = struct.unpack(">IIBB", payload[:10])
            assert color == 0, "greyscale only"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * (2 if bitdepth == 16 else 1)
    out = np.empty((h, stride), dtype=np.uint8)
    for r in range(h):
        line = raw[r * (stride + 1) : (r + 1) * (stride + 1)]
        assert line[0] == 0, "only filter 0 supported"
        out[r] = np.frombuffer(line, dtype=np.uint8, count=stride, offset=1)
    if bitdepth == 16:
        return np.frombuffer(out.tobytes(), dtype=">u2").reshape(h, w).astype(np.uint16)
    return out.reshape(h, w)


def encode(arr: np.ndarray, fmt: str) -> bytes:
    """``(bands, h, w)`` ndarray → payload bytes."""
    assert arr.ndim == 3, "expected (bands, h, w)"
    if fmt == "raw16":
        return arr.astype("<u2").tobytes()
    if fmt == "raw16s":
        return arr.astype("<i2").tobytes()
    if fmt == "rawf32":
        return arr.astype("<f4").tobytes()
    if fmt == "rawf64":
        return arr.astype("<f8").tobytes()
    b, h, w = arr.shape
    stacked = arr.reshape(b * h, w)
    if fmt == "png":
        return _png_encode_gray(stacked.astype(np.uint16), 16)
    if fmt == "png8":
        q = np.clip(np.round(stacked.astype(np.float64) / _Q8), 0, 255)
        return _png_encode_gray(q.astype(np.uint8), 8)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Payload bytes → ``(bands, h, w)`` ndarray (uint16/int16)."""
    if fmt == "raw16":
        a = np.frombuffer(buf, dtype="<u2")
        return a.reshape(-1, h, w)
    if fmt == "raw16s":
        a = np.frombuffer(buf, dtype="<i2")
        return a.reshape(-1, h, w)
    if fmt == "rawf32":
        a = np.frombuffer(buf, dtype="<f4")
        return a.reshape(-1, h, w)
    if fmt == "rawf64":
        a = np.frombuffer(buf, dtype="<f8")
        return a.reshape(-1, h, w)
    if fmt not in ("png", "png8"):
        raise ValueError(f"unknown fmt {fmt!r}")
    img = _png_decode_gray(bytes(buf))
    if fmt == "png":
        return img.reshape(-1, h, w)
    if fmt == "png8":
        return (img.astype(np.uint16) * _Q8).reshape(-1, h, w)
    raise ValueError(f"unknown fmt {fmt!r}")


def _per_plane(nodata, ndim: int) -> np.ndarray:
    """Scalar or per-band nodata → array broadcastable over (B, H, W).
    Per-band sentinels mirror the reference's type-dependent per-band
    NoDataValue (/root/reference/R/gdalraster-tools.R:118-135)."""
    nd = np.asarray(nodata, dtype=np.float64)
    if nd.ndim == 0:
        return nd
    return nd.reshape(-1, *([1] * (ndim - 1)))


def to_float_masked(arr: np.ndarray, nodata) -> np.ndarray:
    """Sentinel-nodata → NaN float64 (the reference's masked-array step,
    /root/reference/R/zvrt-pixel-funs-composite.R:16-24). ``nodata``
    may be a scalar or a per-band sequence aligned with ``arr``'s
    leading axis. A NaN sentinel (rawf32 payloads) needs no rewrite —
    NaN propagates (and NaN == x is always false, so the comparison is
    a no-op for NaN entries of a per-band array)."""
    out = arr.astype(np.float64)
    nd = _per_plane(nodata, arr.ndim)
    out[arr == nd] = np.nan
    return out


def from_float(arr: np.ndarray, nodata, dtype: str) -> np.ndarray:
    """NaN → sentinel (scalar or per-band), cast back to storage dtype."""
    nd = _per_plane(nodata, arr.ndim)
    out = np.where(np.isnan(arr), nd, arr)
    if np.issubdtype(np.dtype(dtype), np.floating):
        return out.astype(dtype)  # float storage: NaN sentinel, no clip
    info = np.iinfo(dtype)
    return np.clip(np.round(out), info.min, info.max).astype(dtype)


_RAW_ITEMSIZE = {"raw16": 2, "raw16s": 2, "rawf32": 4, "rawf64": 8}


def plane_count(buf: bytes, w: int, h: int, fmt: str) -> int | None:
    """Number of band planes in a payload WITHOUT decoding it — raw
    band-sequential formats derive it from the byte length. Returns
    ``None`` for compressed formats (png/png8), where the caller must
    decode. Used by the composite hot path: decoding a scene just to
    count planes costs a full extra decode per group."""
    itemsize = _RAW_ITEMSIZE.get(fmt)
    if itemsize is None:
        return None
    return len(buf) // (itemsize * w * h)


def nodata_scalar(v) -> float:
    """Scalar nodata with NULL tolerated: a NaN sentinel surfaces as a
    NULL ``nodata`` column through the Arrow grouped-map boundary (see
    :mod:`terrain`'s module header), and externally-written tables may
    carry nullable nodata — both mean "NaN is the sentinel", so the
    fallback is NaN, not a TypeError from ``float(None)``."""
    return float("nan") if v is None or pd_isna(v) else float(v)


def row_band_meta(row, nb: int, col: str, fallback) -> np.ndarray | float:
    """Per-band metadata for one row: the ``band_scale`` /
    ``band_offset`` / ``band_nodata`` array when present and aligned
    with the plane count, else the row's scalar (back-compat: payloads
    whose plane count diverged from the recorded arrays — e.g. an
    appended ML mask plane without metadata — fall back to the scalar
    convention)."""
    return band_meta_or_scalar(getattr(row, col, None), nb, fallback)


def band_meta_or_scalar(v, nb: int, fallback) -> np.ndarray | float:
    """The array-vs-scalar fallback of :func:`row_band_meta` on a raw
    value instead of a row attribute — the ONE definition of the
    per-band-metadata convention, for callers that already hold the
    cell (zipped columns, struct fields)."""
    if v is None or (np.isscalar(v) and pd_isna(v)):
        return fallback
    v = np.asarray(v, dtype=np.float64)
    if v.ndim != 1 or len(v) != nb:
        return fallback
    return v


def pd_isna(v) -> bool:
    try:
        import pandas as pd
        return bool(pd.isna(v))
    except Exception:
        return False


def band_nodata_keys(pdf) -> set:
    """Distinct normalized ``band_nodata`` values across a pandas
    frame: ``None`` / scalar-NaN collapse to ``None``; arrays compare
    by their float64 byte image. One element ⇔ the group agrees on its
    per-band sentinels — the profile check shared by grouped-map
    operators (trend/harmonic/gapfill/remedian/overviews)."""
    import pandas as pd
    col = getattr(pdf, "band_nodata", pd.Series([None] * len(pdf)))
    return {None if v is None or (np.isscalar(v) and pd_isna(v))
            else np.asarray(v, dtype=np.float64).tobytes()
            for v in col}


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 65535.0) -> float:
    """Peak signal-to-noise ratio in dB (the lossy-format gate)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def dtype_for(fmt: str) -> str:
    if fmt == "rawf32":
        return "float32"
    if fmt == "rawf64":
        return "float64"
    return "int16" if fmt == "raw16s" else "uint16"
