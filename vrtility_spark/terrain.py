"""Terrain derivatives — the gdaldem menu over tiled rasters:
slope / aspect / hillshade / D8 flowdir / TPI / TRI / roughness,
plus Zevenbergen–Thorne total/profile/plan curvature (the ArcGIS
Curvature tool gdaldem lacks).

The gdaldem family as distributed operators: Horn's 3x3 finite
differences (the GDAL default) for the gradient products, plus the
3x3 neighborhood indices (TPI = z - mean of the 8 neighbors, TRI =
Riley sqrt-sum-of-squares or Wilson mean-|dz|, roughness = window
max - min), computed per tile with the focal halo exchange
(:func:`focal.focal_filter`), so windows at tile edges see their
neighbors' pixels exactly as they would on one mosaic — the
boundary condition a tile-at-a-time port silently gets wrong on every
tile seam.  The reference leaves terrain products to GDAL utilities
outside its pipeline; here they are cell-keyed stages chainable with
every other operator (one shuffle, tile-sized halo strips).

Conventions (this engine's pixel grid, row 0 = the ymin/SOUTH edge):

* gradients are in world coordinates (z per metre; ``pixel_size``
  derives from the cell's resolution unless given);
* ``aspect`` is the compass azimuth of the DOWNSLOPE direction,
  degrees clockwise from north (+y), 0 <= a < 360; flat pixels are
  NaN (nodata), the gdaldem flat convention;
* ``hillshade`` is ``255 * max(0, cos(zenith)cos(slope) +
  sin(zenith)sin(slope)cos(azimuth - aspect))`` with the sun at
  ``azimuth`` (default 315 deg, NW) and ``altitude`` (45 deg);
* a pixel whose 3x3 window touches ANY invalid sample (nodata or the
  domain edge) is NaN — gdaldem's strict edge semantics (no
  ``-compute_edges``): derivatives are never invented from partial
  windows.

Outputs re-type to ``rawf32`` payloads with the classic ``-9999``
sentinel — slope in [0, 90] degrees would be destroyed by integer
quantization, and a NaN sentinel would surface as a NULL ``nodata``
column through Arrow.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from vrtility_spark import cells
from vrtility_spark.focal import focal_filter

TERRAIN_OPS = ("slope", "aspect", "hillshade", "hillshade_md",
               "illumination", "flowdir", "tpi", "tri", "roughness",
               "curvature", "profile_curvature", "plan_curvature")


# ------------------------------------------------------ NumPy kernels ----

def horn_gradients_np(P: np.ndarray, sx: float, sy: float):
    """Horn (1981) 3x3 gradients of the padded ``(B, H+2, W+2)`` array
    → ``(dz/dx, dz/dy)`` each ``(B, H, W)``, NaN wherever the window
    holds any invalid sample.  Row index increases with y (south-up
    padding handled by the caller's grid convention)."""
    from numpy.lib.stride_tricks import sliding_window_view
    W = sliding_window_view(P, (3, 3), axis=(1, 2))  # (B, H, W, 3, 3)
    zSW, zS, zSE = W[..., 0, 0], W[..., 0, 1], W[..., 0, 2]
    zW_, zE_ = W[..., 1, 0], W[..., 1, 2]
    zNW, zN, zNE = W[..., 2, 0], W[..., 2, 1], W[..., 2, 2]
    dzdx = ((zNE + 2 * zE_ + zSE) - (zNW + 2 * zW_ + zSW)) / (8.0 * sx)
    dzdy = ((zNW + 2 * zN + zNE) - (zSW + 2 * zS + zSE)) / (8.0 * sy)
    bad = np.isnan(W).any(axis=(-2, -1))  # strict: center column too
    dzdx[bad] = np.nan
    dzdy[bad] = np.nan
    return dzdx, dzdy


def slope_np(P: np.ndarray, sx: float, sy: float,
             units: str = "degrees") -> np.ndarray:
    """Slope of the padded array: ``degrees`` (default) or ``percent``."""
    dzdx, dzdy = horn_gradients_np(P, sx, sy)
    m = np.sqrt(dzdx * dzdx + dzdy * dzdy)
    if units == "degrees":
        return np.degrees(np.arctan(m))
    if units == "percent":
        return 100.0 * m
    raise ValueError(f"unknown slope units {units!r}")


def aspect_np(P: np.ndarray, sx: float, sy: float) -> np.ndarray:
    """Downslope azimuth, degrees clockwise from north; flat → NaN."""
    dzdx, dzdy = horn_gradients_np(P, sx, sy)
    with np.errstate(invalid="ignore"):
        az = np.degrees(np.arctan2(-dzdx, -dzdy)) % 360.0
        az[(dzdx == 0) & (dzdy == 0)] = np.nan
    return az


def illumination_np(P: np.ndarray, sx: float, sy: float,
                    azimuth: float = 315.0,
                    altitude: float = 45.0) -> np.ndarray:
    """Cosine of the local solar incidence angle, ``cos(i) ∈ [−1, 1]``
    — the raw illumination raster hillshade scales to [0, 255] and the
    input to topographic correction (algebra.topo_correct): ``cos(i) =
    cos(θz)cos(s) + sin(θz)sin(s)cos(φa − a)``. NaN where gradients
    are."""
    dzdx, dzdy = horn_gradients_np(P, sx, sy)
    slope_r = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
    with np.errstate(invalid="ignore"):
        aspect_r = np.arctan2(-dzdx, -dzdy)  # flat → 0, harmless: sin=0
    zen = np.radians(90.0 - altitude)
    az = np.radians(azimuth)
    return (np.cos(zen) * np.cos(slope_r)
            + np.sin(zen) * np.sin(slope_r) * np.cos(az - aspect_r))


def hillshade_np(P: np.ndarray, sx: float, sy: float,
                 azimuth: float = 315.0,
                 altitude: float = 45.0) -> np.ndarray:
    """Shaded relief in [0, 255] (float); NaN where gradients are."""
    hs = illumination_np(P, sx, sy, azimuth=azimuth, altitude=altitude)
    return 255.0 * np.clip(hs, 0.0, 1.0)


def hillshade_md_np(P: np.ndarray, sx: float, sy: float,
                    altitude: float = 45.0) -> np.ndarray:
    """Multidirectional shaded relief (gdaldem hillshade
    -multidirectional, after Mark 1992): hillshades from azimuths
    225/270/315/360 combined with weights ``sin²(aspect − azimuth)``.
    The four azimuths form two orthogonal pairs, so the weights sum to
    exactly 2 everywhere and the combination is the weighted sum
    halved — no per-pixel normalization term. Output in [0, 255],
    NaN where gradients are."""
    dzdx, dzdy = horn_gradients_np(P, sx, sy)
    slope_r = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
    with np.errstate(invalid="ignore"):
        aspect_r = np.arctan2(-dzdx, -dzdy)
    zen = np.radians(90.0 - altitude)
    acc = np.zeros_like(slope_r)
    for az_deg in (225.0, 270.0, 315.0, 360.0):
        az = np.radians(az_deg)
        hs = np.clip(np.cos(zen) * np.cos(slope_r)
                     + np.sin(zen) * np.sin(slope_r)
                     * np.cos(az - aspect_r), 0.0, 1.0)
        acc += np.sin(aspect_r - az) ** 2 * hs
    return 255.0 * np.clip(acc / 2.0, 0.0, 1.0)


#: D8 neighbor codes (ESRI convention), (code, dy, dx) on this grid
#: (row 0 = ymin/SOUTH ⇒ north is +dy): E=1, SE=2, S=4, SW=8, W=16,
#: NW=32, N=64, NE=128
D8_CODES = ((1, 0, 1), (2, -1, 1), (4, -1, 0), (8, -1, -1),
            (16, 0, -1), (32, 1, -1), (64, 1, 0), (128, 1, 1))


def flow_direction_np(P: np.ndarray, sx: float, sy: float) -> np.ndarray:
    """D8 flow direction of the padded ``(B, H+2, W+2)`` array: each
    pixel points at the neighbor with the steepest positive descent
    ``(z − z_nb) / distance`` (diagonals pay their √2·pixel length,
    anisotropic pixels their true hypot). Flat pixels and sinks (no
    positive drop) are 0; ties keep the SMALLEST code (deterministic);
    windows touching any invalid sample are NaN — the same strict edge
    semantics as the other terrain kernels."""
    from numpy.lib.stride_tricks import sliding_window_view
    Wv = sliding_window_view(P, (3, 3), axis=(1, 2))
    z = Wv[..., 1, 1]
    bad = np.isnan(Wv).any(axis=(-2, -1))
    best = np.full(z.shape, -np.inf)
    code = np.zeros(z.shape)
    for c, dy, dx in D8_CODES:  # ascending codes: first strict winner
        nb = Wv[..., 1 + dy, 1 + dx]
        drop = (z - nb) / float(np.hypot(dx * sx, dy * sy))
        better = drop > best
        code = np.where(better, float(c), code)
        best = np.where(better, drop, best)
    out = np.where(best > 0, code, 0.0)
    out[bad] = np.nan
    return out


def _window_3x3(P: np.ndarray):
    """Shared 3x3 view of the padded ``(B, H+2, W+2)`` array →
    ``(windows (B, H, W, 3, 3), center (B, H, W), any-invalid mask)``
    under the same strict edge semantics as the gradient kernels."""
    from numpy.lib.stride_tricks import sliding_window_view
    Wv = sliding_window_view(P, (3, 3), axis=(1, 2))
    return Wv, Wv[..., 1, 1], np.isnan(Wv).any(axis=(-2, -1))


def tpi_np(P: np.ndarray, sx: float = 1.0, sy: float = 1.0) -> np.ndarray:
    """Topographic position index (gdaldem TPI): center elevation minus
    the mean of its 8 neighbors — positive on ridges, negative in
    valleys, ~0 on constant slopes.  Unitless in z; ``sx``/``sy`` are
    accepted for kernel-signature uniformity and ignored."""
    Wv, z, bad = _window_3x3(P)
    nb_mean = (Wv.sum(axis=(-2, -1)) - z) / 8.0
    out = z - nb_mean
    out[bad] = np.nan
    return out


def tri_np(P: np.ndarray, sx: float = 1.0, sy: float = 1.0,
           alg: str = "riley") -> np.ndarray:
    """Terrain ruggedness index (gdaldem TRI): ``riley`` (the GDAL >=
    3.3 default) is sqrt(sum((z - z_nb)^2)) over the 8 neighbors
    (Riley et al. 1999); ``wilson`` is mean(|z - z_nb|) (Wilson et
    al. 2007, the bathymetric variant).  z units; pixel size ignored."""
    Wv, z, bad = _window_3x3(P)
    d = Wv - z[..., None, None]
    if alg == "riley":
        out = np.sqrt((d * d).sum(axis=(-2, -1)))  # center term is 0
    elif alg == "wilson":
        out = np.abs(d).sum(axis=(-2, -1)) / 8.0
    else:
        raise ValueError(f"unknown TRI alg {alg!r}; known: riley, wilson")
    out[bad] = np.nan
    return out


def roughness_np(P: np.ndarray, sx: float = 1.0,
                 sy: float = 1.0) -> np.ndarray:
    """Roughness (gdaldem roughness): max - min of the full 3x3
    window (center included).  z units; pixel size ignored."""
    Wv, _z, bad = _window_3x3(P)
    out = Wv.max(axis=(-2, -1)) - Wv.min(axis=(-2, -1))
    out[bad] = np.nan
    return out


def _zt_coeffs(P: np.ndarray, sx: float, sy: float):
    """Zevenbergen & Thorne (1987) partial-quartic coefficients of the
    padded ``(B, H+2, W+2)`` array: ``(D, E, F, G, H, any-invalid)``
    each ``(B, H, W)``.  D/E are the half second derivatives along
    x/y, F the twist, G/H the central first derivatives — the five
    terms every curvature product is built from.  Anisotropic
    spacings supported; row 0 is the SOUTH edge (the engine's grid
    convention), and every curvature product below is invariant to
    that choice (F and H flip sign together under a y-flip)."""
    Wv, z, bad = _window_3x3(P)
    zSW, zS, zSE = Wv[..., 0, 0], Wv[..., 0, 1], Wv[..., 0, 2]
    zW_, zE_ = Wv[..., 1, 0], Wv[..., 1, 2]
    zNW, zN, zNE = Wv[..., 2, 0], Wv[..., 2, 1], Wv[..., 2, 2]
    D = ((zW_ + zE_) / 2.0 - z) / (sx * sx)
    E = ((zN + zS) / 2.0 - z) / (sy * sy)
    Fc = (-zNW + zNE + zSW - zSE) / (4.0 * sx * sy)
    G = (zE_ - zW_) / (2.0 * sx)
    H = (zN - zS) / (2.0 * sy)
    return D, E, Fc, G, H, bad


def curvature_np(P: np.ndarray, sx: float, sy: float,
                 mode: str = "total") -> np.ndarray:
    """Surface curvature (Zevenbergen & Thorne 1987; the classic
    ArcGIS Curvature tool, ×100 output convention, which gdaldem
    lacks) of the padded ``(B, H+2, W+2)`` array.

    * ``total``  : ``-200·(D + E)`` — positive where the surface is
      upwardly convex (a peak), negative in a bowl;
    * ``profile``: curvature in the steepest-descent direction,
      ``200·(D·G² + E·H² + F·G·H)/(G² + H²)`` — positive where flow
      DEcelerates (upwardly concave along the slope line), the sign
      convention of the Esri tool; flat pixels (G = H = 0) are 0;
    * ``plan``   : curvature across the slope (of the contour line),
      ``-200·(D·H² + E·G² − F·G·H)/(G² + H²)`` — negative where flow
      converges (hollows), positive on noses; flat pixels are 0.

    Units are 1/(100·length-unit) (the ×100 makes metre DEMs read in
    round numbers).  NaN under the same strict any-invalid-sample
    window rule as every gradient product."""
    D, E, Fc, G, H, bad = _zt_coeffs(P, sx, sy)
    if mode == "total":
        out = -200.0 * (D + E)
    else:
        den = G * G + H * H
        with np.errstate(invalid="ignore", divide="ignore"):
            if mode == "profile":
                out = 200.0 * (D * G * G + E * H * H + Fc * G * H) / den
            elif mode == "plan":
                out = -200.0 * (D * H * H + E * G * G - Fc * G * H) / den
            else:
                raise ValueError(
                    f"unknown curvature mode {mode!r}; "
                    "known: total, profile, plan")
        out = np.where(den == 0.0, 0.0, out)  # Esri flat convention
    out = np.asarray(out, dtype=np.float64)
    out[bad] = np.nan
    return out


def terrain_np(P: np.ndarray, op: str, sx: float, sy: float,
               units: str = "degrees", azimuth: float = 315.0,
               altitude: float = 45.0, alg: str = "riley") -> np.ndarray:
    if op == "slope":
        return slope_np(P, sx, sy, units=units)
    if op == "aspect":
        return aspect_np(P, sx, sy)
    if op == "hillshade":
        return hillshade_np(P, sx, sy, azimuth=azimuth, altitude=altitude)
    if op == "illumination":
        return illumination_np(P, sx, sy, azimuth=azimuth,
                               altitude=altitude)
    if op == "hillshade_md":
        return hillshade_md_np(P, sx, sy, altitude=altitude)
    if op == "flowdir":
        return flow_direction_np(P, sx, sy)
    if op == "tpi":
        return tpi_np(P, sx, sy)
    if op == "tri":
        return tri_np(P, sx, sy, alg=alg)
    if op == "roughness":
        return roughness_np(P, sx, sy)
    if op == "curvature":
        return curvature_np(P, sx, sy, mode="total")
    if op == "profile_curvature":
        return curvature_np(P, sx, sy, mode="profile")
    if op == "plan_curvature":
        return curvature_np(P, sx, sy, mode="plan")
    raise KeyError(f"unknown terrain op {op!r}; known: {TERRAIN_OPS}")


# ------------------------------------------------- distributed driver ----

def terrain(df: DataFrame, op: str, units: str = "degrees",
            azimuth: float = 315.0, altitude: float = 45.0,
            pixel_size: float | tuple[float, float] | None = None,
            alg: str = "riley",
            key: str = "cell_id") -> DataFrame:
    """Distributed terrain derivative over a one-row-per-cell tile
    table (every plane is treated as a DEM; subset to the elevation
    band first for a classic single-band product).

    Plugs :func:`terrain_np` into the focal halo exchange as a custom
    kernel — radius-1 strips shuffle, gradients cross tile seams
    exactly, domain edges go NaN.  ``pixel_size`` (metres; scalar or
    ``(sx, sy)``) defaults to each cell's own ground sample distance
    ``cell_size(res) / (w, h)`` — correct even for mixed-resolution
    tables (e.g. overview levels).  Output payloads are ``rawf32``
    with the FINITE ``-9999`` sentinel as nodata (gdaldem's classic
    default; NaN would surface as a NULL nodata column through the
    Arrow grouped-map path — see the module header).
    """
    if op not in TERRAIN_OPS:
        raise KeyError(f"unknown terrain op {op!r}; known: {TERRAIN_OPS}")
    if units not in ("degrees", "percent"):
        raise ValueError(f"unknown slope units {units!r}")
    if alg not in ("riley", "wilson"):
        raise ValueError(f"unknown TRI alg {alg!r}; known: riley, wilson")
    ps = pixel_size
    if ps is not None and np.isscalar(ps):
        ps = (float(ps), float(ps))

    def kernel(P: np.ndarray, meta: dict) -> np.ndarray:
        if ps is None:
            _, res, _, _ = (int(v) for v in
                            cells.decode_np(meta["cell_id"]))
            size = cells.cell_size(res)
            sx, sy = size / meta["w"], size / meta["h"]
        else:
            sx, sy = ps
        return terrain_np(P, op, sx, sy, units=units, azimuth=azimuth,
                          altitude=altitude, alg=alg)

    # finite sentinel (gdaldem's classic -9999): NaN would surface as a
    # NULL nodata column through the Arrow grouped-map path, breaking
    # float(row.nodata) in downstream cell-keyed operators; -9999 is
    # outside the angular/shading products' ranges (slope [0,90]/
    # percent>=0, aspect [0,360), hillshade [0,255], flowdir codes) and
    # tri/roughness are >= 0; tpi alone is z-difference-valued and could
    # in principle hit -9999 exactly — only with a 9999-z local relief,
    # far outside any reflectance/DEM tile this engine composes
    return focal_filter(df, op=kernel, radius=1, fill=True, key=key,
                        out_fmt="rawf32", out_nodata=-9999.0)


# ---------------------------------------------------- color relief ----

def color_relief_np(A: np.ndarray, ramp, interpolate: bool = True,
                    nv_color=(0, 0, 0)) -> np.ndarray:
    """Map one ``(H, W)`` value plane (NaN = nodata) to ``(3, H, W)``
    RGB through a color ramp ``[(value, r, g, b), ...]`` — gdaldem
    color-relief semantics: linear interpolation between entries,
    clamped to the end colors outside the ramp (``interpolate=True``,
    the default), or nearest-entry (``-nearest_color_entry``);
    nodata pixels take ``nv_color`` (the ``nv`` ramp line)."""
    entries = sorted((float(v), float(r), float(g), float(b))
                     for v, r, g, b in ramp)
    if len(entries) < 2:
        raise ValueError("color ramp needs >= 2 entries")
    xs = np.asarray([e[0] for e in entries])
    if len(np.unique(xs)) != len(xs):
        raise ValueError("color ramp values must be distinct")
    chans = [np.asarray([e[c] for e in entries]) for c in (1, 2, 3)]
    bad = np.isnan(A)
    Az = np.where(bad, xs[0], A)
    out = np.empty((3,) + A.shape)
    if interpolate:
        for c in range(3):
            out[c] = np.interp(Az, xs, chans[c])
    else:
        mids = (xs[:-1] + xs[1:]) / 2.0
        idx = np.searchsorted(mids, Az)  # nearest entry (ties → upper)
        for c in range(3):
            out[c] = chans[c][idx]
    for c in range(3):
        out[c][bad] = float(nv_color[c])
    return out


def color_relief(df: DataFrame, ramp, band: int = 0,
                 interpolate: bool = True,
                 nv_color=(0, 0, 0)) -> DataFrame:
    """Distributed gdaldem color-relief: map ``band`` of every tile to
    a 3-plane RGB payload through the color ramp.  Purely per-pixel —
    a narrow Arrow map, ZERO shuffle (no halo needed, unlike the
    window products above).  Output planes are uint16 0-255 in
    ``raw16`` (this codec has no 8-bit raster format; the values are
    byte-ranged), ``bands`` become red/green/blue where the column
    exists, and the output ``nodata`` sentinel is 65535 — outside the
    color range, so nv-colored pixels remain ordinary data exactly as
    gdaldem emits them.  The reference delegates this to gdaldem
    outside its pipeline (R/gdal-options.R)."""
    import pandas as pd
    from vrtility_spark import codec

    entries = [(float(v), float(r), float(g), float(b))
               for v, r, g, b in ramp]
    color_relief_np(np.zeros((1, 1)), entries)  # validate eagerly
    names = [f.name for f in df.schema.fields]
    has_bands = "bands" in names

    def run(batches):
        for pdf in batches:
            out_rows = []
            for row in pdf.itertuples(index=False):
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nb = len(arr)
                i = band if band >= 0 else nb + band
                if not 0 <= i < nb:
                    raise ValueError(
                        f"color_relief band {band} out of range for "
                        f"{nb}-plane tile")
                nd = codec.row_band_meta(row, nb, "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)[i]
                rgb = color_relief_np(A, entries,
                                      interpolate=interpolate,
                                      nv_color=nv_color)
                d = {n: getattr(row, n) for n in names}
                d["bytes"] = codec.encode(
                    codec.from_float(rgb, 65535.0, "uint16"), "raw16")
                d["fmt"] = "raw16"
                d["nodata"] = 65535.0
                if has_bands:
                    d["bands"] = ["red", "green", "blue"]
                for c in ("band_nodata", "band_scale", "band_offset"):
                    if c in names:
                        d[c] = None  # plane count changed: scalar rules
                out_rows.append(d)
            yield pd.DataFrame(out_rows, columns=names) if out_rows \
                else pdf.iloc[:0]

    return df.mapInPandas(run, schema=df.schema)
