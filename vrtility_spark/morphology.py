"""Grayscale / binary morphology over the distributed cell grid:
erode, dilate, open, close, morphological gradient, top-hat and
black-hat — the mask-conditioning toolbox (speckle removal, cloud-mask
opening, footprint growing) GDAL users reach through
``gdal_sieve``-adjacent filters and OTB/scikit-image morphology.

Reference parity: the reference's buffered mask (P10,
/root/reference/R/vrt-set-mask.R buffer step) IS a binary dilation;
this module generalizes that one hard-coded step into the full
morphology family over any plane (:mod:`masks` keeps its fused
fast path).

Distribution: morphology is a focal operator, so tiles only need
``pad``-pixel neighbor strips — :func:`focal.focal_filter`'s halo
exchange. The composite ops (open/close/top-hat/black-hat) are the
interesting part: run naively they would be TWO halo exchanges
(erode's output re-shuffled for dilate); here both stages FUSE into
one kernel over a ``2r`` halo — the intermediate never leaves the
worker, halving the shuffle count (the same trick as
:mod:`pansharpen`'s in-map upsample).

NaN semantics follow the focal contract: reductions run over VALID
samples (``np.fmin``/``np.fmax`` accumulate through NaN), an all-NaN
window yields NaN, and missing neighbor tiles behave like the domain
edge. Erode/dilate/open/close preserve the input's value set, so
integer payloads stay integer; gradient/top-hat/black-hat are
differences and re-type to ``rawf32`` with the ``-9999`` sentinel.
``shape="disk"`` restricts the structuring element to
``dy² + dx² <= r²`` (the isotropic element); ``"square"`` is the full
Chebyshev window.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

MORPH_OPS = ("erode", "dilate", "open", "close", "gradient",
             "tophat", "blackhat")
_TWO_STAGE = ("open", "close", "tophat", "blackhat")
OUT_NODATA = -9999.0


def _offsets(r: int, shape: str):
    if shape not in ("square", "disk"):
        raise KeyError(f"unknown shape {shape!r}; square | disk")
    return [(dy, dx)
            for dy in range(-r, r + 1) for dx in range(-r, r + 1)
            if shape == "square" or dy * dy + dx * dx <= r * r]


def _reduce(A: np.ndarray, r: int, shape: str, fn) -> np.ndarray:
    """NaN-skipping min/max over the structuring element: ``(B, Hp,
    Wp)`` → ``(B, Hp−2r, Wp−2r)``. ``fn`` is np.fmin or np.fmax. The
    square window is SEPARABLE (min/max over the box = 1-D pass along
    x then along y): 2·(2r+1) slice reductions instead of (2r+1)² —
    NaN-skipping composes because the valid set of the box is the
    union of its rows. The disk element is not separable and keeps the
    per-offset loop."""
    B, Hp, Wp = A.shape
    H, W = Hp - 2 * r, Wp - 2 * r
    if H <= 0 or W <= 0:
        raise ValueError(f"padded array {Hp}x{Wp} too small for radius {r}")
    if shape == "square":
        tmp = np.full((B, Hp, W), np.nan)
        for dx in range(-r, r + 1):
            tmp = fn(tmp, A[:, :, r + dx:r + dx + W])
        out = np.full((B, H, W), np.nan)
        for dy in range(-r, r + 1):
            out = fn(out, tmp[:, r + dy:r + dy + H, :])
        return out
    out = np.full((B, H, W), np.nan)
    for dy, dx in _offsets(r, shape):
        out = fn(out, A[:, r + dy:r + dy + H, r + dx:r + dx + W])
    return out


def pad_for(op: str, radius: int) -> int:
    """Halo width the op needs (two-stage ops fuse over 2r)."""
    if op not in MORPH_OPS:
        raise KeyError(f"unknown morphology op {op!r}; known: {MORPH_OPS}")
    return 2 * int(radius) if op in _TWO_STAGE else int(radius)


def morph_np(P: np.ndarray, op: str, radius: int,
             shape: str = "square") -> np.ndarray:
    """One morphology op on a PADDED ``(B, H+2·pad, W+2·pad)`` array
    (NaN = invalid/outside; ``pad = pad_for(op, radius)``) → the
    ``(B, H, W)`` output."""
    r = int(radius)
    if r < 1:
        raise ValueError("radius must be >= 1")
    pad = pad_for(op, r)
    if op == "erode":
        return _reduce(P, r, shape, np.fmin)
    if op == "dilate":
        return _reduce(P, r, shape, np.fmax)
    if op == "gradient":
        return (_reduce(P, r, shape, np.fmax)
                - _reduce(P, r, shape, np.fmin))
    center = P[:, pad:P.shape[1] - pad, pad:P.shape[2] - pad]
    if op == "open":
        return _reduce(_reduce(P, r, shape, np.fmin), r, shape, np.fmax)
    if op == "close":
        return _reduce(_reduce(P, r, shape, np.fmax), r, shape, np.fmin)
    if op == "tophat":
        return center - morph_np(P, "open", r, shape)
    if op == "blackhat":
        return morph_np(P, "close", r, shape) - center
    raise KeyError(f"unknown morphology op {op!r}; known: {MORPH_OPS}")


def morphology(df: DataFrame, op: str = "open", radius: int = 1,
               shape: str = "square", fill: bool = False,
               key: str = "cell_id") -> DataFrame:
    """Apply a morphology op to every plane of a one-row-per-cell tile
    table through ONE halo exchange (two-stage ops ship a ``2r`` halo
    instead of exchanging twice). Value-preserving ops keep the input
    payload format; difference ops re-type to ``rawf32`` with the
    ``-9999`` sentinel. ``fill=False`` keeps the input nodata mask
    (morphology must not grow the data footprint through holes);
    ``fill=True`` lets dilation-style ops compute wherever the window
    sees one valid sample."""
    if op not in MORPH_OPS:
        raise KeyError(f"unknown morphology op {op!r}; known: {MORPH_OPS}")
    _offsets(1, shape)  # validate shape early
    r = int(radius)
    if r < 1:
        raise ValueError("radius must be >= 1")
    from vrtility_spark.focal import focal_filter

    def kernel(P: np.ndarray, meta: dict) -> np.ndarray:
        return morph_np(P, op, r, shape)

    diff = op in ("gradient", "tophat", "blackhat")
    return focal_filter(
        df, op=kernel, radius=pad_for(op, r), fill=fill, key=key,
        out_fmt="rawf32" if diff else None,
        out_nodata=OUT_NODATA if diff else None)
