"""Proximity raster: per-pixel distance to the nearest target-class
pixel, capped at ``max_dist`` — gdal_proximity's semantics
(DISTUNITS, MAXDIST, fixed-value-beyond) on the distributed cell grid.

Burned-area distance maps, water-distance features, edge buffers: all
are "how far is the nearest pixel of class V", and at 100 TB the
answer must cross tile boundaries without gathering a mosaic. The cap
is what makes the operator local: any target farther than ``max_dist``
pixels cannot influence a clipped result, so tiles only need their
``r = ceil(max_dist)``-pixel neighbor strips — exactly what
:func:`focal.focal_filter`'s halo exchange ships (one cell-keyed
shuffle of edge strips, ~4r/w of tile bytes; tile payloads never
shuffle). Within the padded window the kernel computes the EXACT
Euclidean distance transform, separably:

1. per-row scan: distance along x to the nearest in-row target (two
   cumulative passes, vectorized over all rows);
2. per-column windowed min-plus with the parabola ``dy²`` over
   ``y' ∈ [y−r, y+r]`` (a sliding-window view, O(H·W·r)) — restricting
   to ±r is exact because anything farther already exceeds the cap.

Distances are exact for every pixel whose nearest target lies within
``max_dist``; everything else is ``max_dist`` (``beyond="clip"``) or
nodata (``beyond="nodata"``). Missing neighbor tiles behave like the
domain edge (their targets are unknown → distances near a coverage
hole can only overestimate), the same contract as every focal window.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame

from vrtility_spark import cells, codec
from vrtility_spark.focal import focal_filter

OUT_NODATA = -9999.0


def proximity_np(P: np.ndarray, values: Sequence[float],
                 max_dist: float) -> np.ndarray:
    """Exact capped EDT of a padded ``(B, Hp, Wp)`` array (NaN =
    unknown/outside): per plane, distance in PIXELS from each pixel
    center to the nearest pixel whose value is in ``values``; capped
    at ``max_dist`` (greater distances return ``inf`` for the caller
    to clip or null). The pad must be ``ceil(max_dist)`` for exactness
    at tile seams."""
    if not float(max_dist) >= 1.0:
        raise ValueError("max_dist must be >= 1 pixel")
    r = int(np.ceil(float(max_dist)))
    B, Hp, Wp = P.shape
    tgt = np.isin(P, np.asarray(list(values), dtype=np.float64))
    G = np.full((B, Hp, Wp), np.inf)
    G[tgt] = 0.0
    for i in range(1, Wp):  # left→right scan (vector ops over B, Hp)
        np.minimum(G[:, :, i], G[:, :, i - 1] + 1.0, out=G[:, :, i])
    for i in range(Wp - 2, -1, -1):
        np.minimum(G[:, :, i], G[:, :, i + 1] + 1.0, out=G[:, :, i])
    G2 = np.minimum(G, float(r) + 1.0) ** 2  # cap before squaring: no inf²
    pad = np.full((B, Hp + 2 * r, Wp), np.inf)
    pad[:, r:r + Hp, :] = G2
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(pad, 2 * r + 1, axis=1)  # (B, Hp, Wp, 2r+1)
    dy2 = (np.arange(-r, r + 1, dtype=np.float64) ** 2)
    D2 = (win + dy2).min(axis=-1)
    D = np.sqrt(D2)
    D[D > float(max_dist)] = np.inf
    return D


def allocation_np(P: np.ndarray, V: np.ndarray,
                  values: Sequence[float],
                  max_dist: float) -> np.ndarray:
    """Euclidean ALLOCATION (GRASS ``r.grow.distance`` value output /
    ArcGIS ``EucAllocation``): for each pixel of the padded single
    ``(Hp, Wp)`` class plane ``P``, the VALUE (from plane ``V``) of
    the nearest pixel whose class is in ``values``, NaN beyond
    ``max_dist``. Same separable scans as :func:`proximity_np`, with
    the argmin carried: row passes keep the nearest in-row target's
    x (left wins exact ties), the column pass keeps the first-minimum
    dy in ``-r..r`` order — so the tie rule is (min d², then
    northernmost row, then leftmost target), replicated by the naive
    oracle in tests."""
    if not float(max_dist) >= 1.0:
        raise ValueError("max_dist must be >= 1 pixel")
    r = int(np.ceil(float(max_dist)))
    Hp, Wp = P.shape
    tgt = np.isin(P, np.asarray(list(values), dtype=np.float64))
    G = np.full((Hp, Wp), np.inf)
    IX = np.full((Hp, Wp), -1, dtype=np.int64)
    ys, xs = np.nonzero(tgt)
    G[tgt] = 0.0
    IX[ys, xs] = xs
    for i in range(1, Wp):
        better = G[:, i - 1] + 1.0 < G[:, i]
        G[:, i] = np.where(better, G[:, i - 1] + 1.0, G[:, i])
        IX[:, i] = np.where(better, IX[:, i - 1], IX[:, i])
    for i in range(Wp - 2, -1, -1):
        better = G[:, i + 1] + 1.0 < G[:, i]   # strict: left wins ties
        G[:, i] = np.where(better, G[:, i + 1] + 1.0, G[:, i])
        IX[:, i] = np.where(better, IX[:, i + 1], IX[:, i])
    G2 = np.minimum(G, float(r) + 1.0) ** 2
    pad = np.full((Hp + 2 * r, Wp), np.inf)
    pad[r:r + Hp, :] = G2
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(pad, 2 * r + 1, axis=0)  # (Hp, Wp, 2r+1)
    dy2 = (np.arange(-r, r + 1, dtype=np.float64) ** 2)
    tot = win + dy2
    amin = tot.argmin(axis=-1)               # first min: lowest dy
    best = np.take_along_axis(tot, amin[..., None], -1)[..., 0]
    src_y = np.clip(np.arange(Hp)[:, None] + amin - r, 0, Hp - 1)
    src_x = IX[src_y, np.arange(Wp)[None, :]]
    ok = (best <= float(max_dist) ** 2) & (src_x >= 0)
    out = np.full((Hp, Wp), np.nan)
    oy, ox = np.nonzero(ok)
    out[oy, ox] = V[src_y[oy, ox], src_x[oy, ox]]
    return out


def allocation(df: DataFrame, band: int = 0,
               value_band: int | None = None,
               values: Sequence[float] = (1.0,),
               max_dist: float = 8.0,
               key: str = "cell_id") -> DataFrame:
    """Distributed Euclidean allocation: every pixel labeled with the
    VALUE of its nearest target-class pixel within ``max_dist``
    pixels (nodata beyond) — the straight-line sibling of
    :func:`vrtility_spark.costdist.cost_distance`'s
    backlink→basins cost allocation. ``band`` picks the class plane,
    ``value_band`` the plane whose value is propagated (default: the
    class plane itself — rasterized AOI ids give "nearest AOI per
    pixel"). Rides the SAME focal halo exchange as :func:`proximity`
    with a two-plane strip (class + value); output rawf32/-9999."""
    md = float(max_dist)
    r = int(np.ceil(md))
    vals = tuple(float(v) for v in values)
    vb = int(value_band) if value_band is not None else int(band)

    def kernel(P: np.ndarray, meta: dict) -> np.ndarray:
        h, w = meta["h"], meta["w"]
        if h != w:
            raise ValueError(
                "allocation: tile has non-square pixels on a square "
                "cell; resample to a square grid first")
        out = allocation_np(P[0], P[1], vals, md)
        return out[r:r + h, r:r + w][None]

    from vrtility_spark.bands import subset_band_indices
    two = subset_band_indices(df, [int(band), vb])
    return focal_filter(two, op=kernel, radius=r, fill=True, key=key,
                        out_fmt="rawf32", out_nodata=OUT_NODATA)


def proximity(df: DataFrame, band: int = 0,
              values: Sequence[float] = (1.0,), max_dist: float = 8.0,
              units: str = "pixels", beyond: str = "clip",
              key: str = "cell_id") -> DataFrame:
    """Distance-to-class tiles from a one-row-per-cell tile table.

    ``band`` picks the class plane; ``values`` is the target class
    set; ``max_dist`` is in PIXELS (it also sets the halo radius).
    ``units="geo"`` multiplies the output by the pixel edge length in
    world units (cells.cell_frame_np — exact binary floats).
    ``beyond="clip"`` writes ``max_dist`` where no target is within
    range; ``"nodata"`` writes the -9999 sentinel. Output is a
    single-plane ``rawf32`` tile table, chainable with every
    cell-keyed operator (zonal over it = distance statistics per AOI).
    """
    if beyond not in ("clip", "nodata"):
        raise KeyError(f"unknown beyond={beyond!r}; clip | nodata")
    if units not in ("pixels", "geo"):
        raise KeyError(f"unknown units={units!r}; pixels | geo")
    vals = tuple(float(v) for v in values)
    md = float(max_dist)
    r = int(np.ceil(md))
    band_i = int(band)

    def kernel(P: np.ndarray, meta: dict) -> np.ndarray:
        # the class plane was subset BEFORE the halo exchange, so the
        # padded window is always single-plane here
        h, w = meta["h"], meta["w"]
        if h != w:
            raise ValueError(
                f"proximity: tile {w}x{h} has non-square pixels on a "
                "square cell — pixel-space distances would not be "
                "Euclidean in world units; resample to a square grid "
                "first")
        D = proximity_np(P[0][None], vals, md)
        out = D[:, r:r + h, r:r + w]
        if units == "geo":
            _, _, size = cells.cell_frame_np(meta["cell_id"])
            out = out * (float(size) / w)
            cap = md * (float(size) / w)
        else:
            cap = md
        out = np.where(np.isinf(out),
                       cap if beyond == "clip" else np.nan, out)
        return out

    # subset to the class plane BEFORE the halo exchange: strips carry
    # one plane, not the whole band stack
    from vrtility_spark.bands import subset_band_index
    one = subset_band_index(df, band_i)
    return focal_filter(one, op=kernel, radius=r, fill=True, key=key,
                        out_fmt="rawf32", out_nodata=OUT_NODATA)
