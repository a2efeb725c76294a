"""GLCM (gray-level co-occurrence matrix) texture metrics — Haralick
1973's `contrast` / `dissimilarity` / `homogeneity` / `energy` /
`entropy` over a moving window, the classic remote-sensing texture
layer (GEE ``glcmTexture``, Orfeo ``HaralickTextures``, scikit-image
``graycomatrix`` family).

Semantics:

- the plane is quantized onto ``levels`` equal-width bins over an
  EXPLICIT ``[lo, hi]`` range (values clip into the end bins;
  non-finite pixels are invalid).  An explicit range keeps the
  operator deterministic and tile-independent — derive ``lo/hi`` from
  a global stats pass (e.g. :mod:`vrtility_spark.stretch`'s histogram
  aggregate) when they aren't known a priori;
- for every output pixel, co-occurrence pairs are tallied over the
  ``(2·radius+1)²`` window of FIRST-pixel positions, for every offset
  in ``offsets`` plus (by default) its negation — the standard
  symmetric GLCM.  Pairs touching an invalid pixel drop; the matrix
  normalizes over the pairs that remain, so nodata holes and domain
  edges shrink the sample instead of biasing it.  No valid pair →
  nodata;
- metrics over the normalized matrix ``p(i,j)``: ``contrast =
  Σ p·(i−j)²``, ``dissimilarity = Σ p·|i−j|``, ``homogeneity =
  Σ p/(1+(i−j)²)``, ``energy = Σ p²`` (angular second moment),
  ``entropy = −Σ p·log2 p``.

Distribution: rides :func:`vrtility_spark.focal.focal_filter`'s halo
exchange with radius ``radius + max offset reach`` — strips shuffle,
tile payloads don't, and results are identical to computing on one
seamless mosaic (pinned in tests).  All window tallies are integral-
image box sums (O(H·W) per plane regardless of radius); the linear
metrics need ONE weighted box sum, energy/entropy stream the
``levels²`` pair codes one indicator plane at a time (never
materializing a per-pixel histogram), using ``energy = Σn² / c²`` and
``entropy = log2 c − (Σ n·log2 n)/c``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from vrtility_spark import focal

#: the four canonical GLCM directions (dy, dx); negations are added by
#: ``symmetric=True``, giving the standard 8-neighbor symmetric matrix
OFFSETS_4 = ((0, 1), (1, 1), (1, 0), (1, -1))

GLCM_METRICS = ("contrast", "dissimilarity", "homogeneity", "energy",
                "entropy")


def quantize_np(P: np.ndarray, lo: float, hi: float,
                levels: int) -> np.ndarray:
    """Quantize onto ``levels`` equal-width bins over ``[lo, hi]``
    (clipping); non-finite → −1 (invalid). int16 output."""
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    with np.errstate(invalid="ignore"):
        q = np.floor((np.asarray(P, np.float64) - lo)
                     / (hi - lo) * levels)
    q = np.clip(q, 0, levels - 1)
    out = np.where(np.isfinite(P), q, -1.0)
    return out.astype(np.int16)


def _expand_offsets(offsets, symmetric: bool):
    offs = [(int(dy), int(dx)) for dy, dx in offsets]
    if any(o == (0, 0) for o in offs):
        raise ValueError("offset (0, 0) pairs a pixel with itself")
    if symmetric:
        offs = offs + [(-dy, -dx) for dy, dx in offs]
    if len(set(offs)) != len(offs):
        raise ValueError(f"duplicate offsets after symmetrizing: {offs}")
    return offs


def glcm_np(Pp: np.ndarray, radius: int, levels: int, lo: float,
            hi: float, metric: str, offsets=OFFSETS_4,
            symmetric: bool = True) -> np.ndarray:
    """Windowed GLCM metric over the PADDED ``(B, H+2R, W+2R)`` array,
    ``R = radius + max offset reach`` (NaN = invalid / outside
    domain), returning ``(B, H, W)``.  Pure NumPy integral-image box
    sums — deterministic on any host."""
    if metric not in GLCM_METRICS:
        raise KeyError(f"unknown GLCM metric {metric!r}; "
                       f"known: {GLCM_METRICS}")
    r = int(radius)
    if r < 1:
        raise ValueError("radius must be >= 1")
    levels = int(levels)
    if levels < 2:
        raise ValueError("levels must be >= 2")
    offs = _expand_offsets(offsets, symmetric)
    om = max(max(abs(dy), abs(dx)) for dy, dx in offs)
    R = r + om
    B, Hp, Wp = Pp.shape
    H, W = Hp - 2 * R, Wp - 2 * R
    if H <= 0 or W <= 0:
        raise ValueError(f"padded array {Hp}x{Wp} too small for "
                         f"radius {r} + offset reach {om}")
    q = quantize_np(Pp, lo, hi, levels)
    k = 2 * r + 1
    Hf, Wf = H + 2 * r, W + 2 * r   # first-pixel plane extent

    def first(A):                    # trim to first-pixel positions
        return A[:, om:om + Hf, om:om + Wf]

    def second(A, dy, dx):           # offset partner of each first pixel
        return A[:, om + dy:om + dy + Hf, om + dx:om + dx + Wf]

    q1 = first(q)
    pair_q2 = [second(q, dy, dx) for dy, dx in offs]
    pair_ok = [(q1 >= 0) & (q2 >= 0) for q2 in pair_q2]

    cnt = focal._win_sum(
        sum(ok.astype(np.float64) for ok in pair_ok), k)

    with np.errstate(invalid="ignore", divide="ignore"):
        if metric in ("contrast", "dissimilarity", "homogeneity"):
            wsum = np.zeros_like(q1, dtype=np.float64)
            for q2, ok in zip(pair_q2, pair_ok):
                d = (q1 - q2).astype(np.float64)
                if metric == "contrast":
                    wv = d * d
                elif metric == "dissimilarity":
                    wv = np.abs(d)
                else:
                    wv = 1.0 / (1.0 + d * d)
                wsum += np.where(ok, wv, 0.0)
            out = focal._win_sum(wsum, k) / cnt
        else:
            # stream pair codes: n_v per window via one box sum each
            s2 = np.zeros((B, H, W))
            slg = np.zeros((B, H, W))
            for v0 in range(levels):
                m1 = q1 == v0
                for v1 in range(levels):
                    ind = np.zeros_like(q1, dtype=np.float64)
                    for q2, ok in zip(pair_q2, pair_ok):
                        ind += np.where(ok & m1 & (q2 == v1), 1.0, 0.0)
                    n = focal._win_sum(ind, k)
                    s2 += n * n
                    nz = n > 0
                    slg += np.where(nz, n * np.log2(np.where(nz, n, 1.0)),
                                    0.0)
            if metric == "energy":
                out = s2 / (cnt * cnt)
            else:
                out = np.log2(cnt) - slg / cnt
    out[cnt == 0] = np.nan
    return out


def glcm_texture(df: DataFrame, metric: str = "contrast",
                 radius: int = 2, levels: int = 8, lo: float = 0.0,
                 hi: float = 1.0, offsets=OFFSETS_4,
                 symmetric: bool = True, fill: bool = False,
                 key: str = "cell_id") -> DataFrame:
    """Distributed GLCM texture over a one-row-per-cell tile table
    (every band gets its own texture plane).  Plugs :func:`glcm_np`
    into the focal halo exchange with radius ``radius + offset
    reach``; output payloads are ``rawf32`` with the finite ``-9999``
    sentinel (same contract as :mod:`vrtility_spark.terrain`).

    ``fill=False`` (default, the GEE ``glcmTexture`` convention) keeps
    the input's data footprint: a nodata pixel stays nodata even when
    its window holds valid pairs; ``fill=True`` emits texture wherever
    at least one valid pair exists."""
    if metric not in GLCM_METRICS:
        raise KeyError(f"unknown GLCM metric {metric!r}; "
                       f"known: {GLCM_METRICS}")
    offs = _expand_offsets(offsets, symmetric)
    om = max(max(abs(dy), abs(dx)) for dy, dx in offs)

    def kernel(P: np.ndarray, meta: dict) -> np.ndarray:
        return glcm_np(P, radius, levels, lo, hi, metric,
                       offsets=offsets, symmetric=symmetric)

    return focal.focal_filter(df, op=kernel, radius=int(radius) + om,
                              fill=fill, key=key, out_fmt="rawf32",
                              out_nodata=-9999.0)
