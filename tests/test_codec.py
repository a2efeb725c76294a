from __future__ import annotations

import numpy as np
import pytest

from vrtility_spark import codec


@pytest.fixture
def arr():
    rng = np.random.default_rng(3)
    return rng.integers(0, 65535, size=(5, 16, 16)).astype(np.uint16)


def test_raw16_roundtrip(arr):
    buf = codec.encode(arr, "raw16")
    assert codec.decode(buf, 16, 16, "raw16").shape == (5, 16, 16)
    assert (codec.decode(buf, 16, 16, "raw16") == arr).all()


def test_raw16s_roundtrip():
    rng = np.random.default_rng(4)
    a = rng.integers(-30000, 30000, size=(4, 8, 8)).astype(np.int16)
    buf = codec.encode(a, "raw16s")
    assert (codec.decode(buf, 8, 8, "raw16s") == a).all()


def test_png_lossless_roundtrip(arr):
    buf = codec.encode(arr, "png")
    out = codec.decode(buf, 16, 16, "png")
    assert (out == arr).all()
    # it is a real PNG
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"


def test_png8_psnr_gate(arr):
    """Lossy path must clear the 40 dB PSNR gate of BASELINE.json."""
    buf = codec.encode(arr, "png8")
    out = codec.decode(buf, 16, 16, "png8")
    assert codec.psnr(arr, out) >= 40.0
    assert len(buf) < len(codec.encode(arr, "png"))


def test_nodata_nan_roundtrip():
    a = np.array([[[0, 5], [7, 0]]], dtype=np.uint16)
    f = codec.to_float_masked(a, 0)
    assert np.isnan(f[0, 0, 0]) and np.isnan(f[0, 1, 1])
    back = codec.from_float(f, 0, "uint16")
    assert (back == a).all()
