"""Mask kernels — parity with the reference's mask pixel functions.

Reference semantics (/root/reference/R/zvrt-pixel-funs-mask.R):

- ``build_intmask`` (:128-141): mask plane holds integer class codes;
  pixels whose class is in ``mask_values`` are invalid →
  ``np.where(np.isin(band, vals), 0, 1)``.
- ``build_bitmask`` (:193-210): mask plane holds bit flags; a pixel is
  invalid if ANY listed bit is set.
- ``set_mask`` (:68-97): given data band + 0/1 mask, output
  ``np.where(mask > 0, data, nodata)``; with ``buffer_size > 0`` the
  invalid region is first dilated with an 8-connectivity structuring
  element for ``buffer_size`` iterations.

Two execution paths, mirroring the reference's Python-vs-muparser dual
implementation (R/vrt-set-mask.R:26-30): a NumPy path used inside the
image UDFs, and a Spark ``Column`` expression path (Catalyst codegen)
for scalar mask columns. Tests assert both produce identical results
(the reference does the same, test-vrt-set-mask.R:270-282).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec

# ------------------------------------------------------------- numpy ----

def build_intmask_np(band: np.ndarray, mask_values: Sequence[int]) -> np.ndarray:
    """0 where the class code is invalid, 1 where valid."""
    return np.where(np.isin(band, list(mask_values)), 0, 1).astype(np.uint8)


def build_bitmask_np(band: np.ndarray, bit_positions: Sequence[int]) -> np.ndarray:
    """0 where any listed bit is set, 1 otherwise."""
    b = band.astype(np.int64)
    invalid = np.zeros(band.shape, dtype=bool)
    for bit in bit_positions:
        invalid |= (b & (1 << int(bit))) > 0
    return np.where(invalid, 0, 1).astype(np.uint8)


def binary_dilation_np(mask: np.ndarray, iterations: int) -> np.ndarray:
    """8-connectivity binary dilation (scipy-free).

    Equivalent to ``scipy.ndimage.binary_dilation(mask,
    generate_binary_structure(2, 2), iterations=n)`` as used at
    zvrt-pixel-funs-mask.R:85-86: one iteration ORs the 8 neighbours.
    """
    out = mask.astype(bool).copy()
    for _ in range(int(iterations)):
        padded = np.pad(out, 1, mode="constant")
        acc = out.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                acc |= padded[1 + dy : 1 + dy + out.shape[0],
                              1 + dx : 1 + dx + out.shape[1]]
        out = acc
    return out


def apply_mask_np(data: np.ndarray, mask01: np.ndarray, nodata,
                  buffer_size: int = 0) -> np.ndarray:
    """``set_mask`` parity: data planes (B,H,W) × 0/1 mask (H,W) →
    masked planes; buffered variant dilates the invalid region first.
    ``nodata`` may be a scalar or per-band (aligned with ``data``)."""
    nd = np.asarray(nodata, dtype=data.dtype)
    if nd.ndim == 1:
        nd = nd.reshape(-1, 1, 1)
    if buffer_size > 0:
        invalid = binary_dilation_np(mask01 == 0, buffer_size)
        return np.where(invalid[None], nd, data)
    return np.where((mask01 > 0)[None], data, nd)


# ----------------------------------------------- spark expression path ----

def intmask_col(mask: Column, mask_values: Sequence[int]) -> Column:
    """Catalyst twin of :func:`build_intmask_np` (muparser analogue,
    zvrt-pixel-funs-mask.R:149-156)."""
    return F.when(mask.isin(*[int(v) for v in mask_values]), 0).otherwise(1)


def bitmask_col(mask: Column, bit_positions: Sequence[int]) -> Column:
    """Catalyst twin of :func:`build_bitmask_np` via built-in bitwise ops
    (the reference emulates this with fmod, :217-228 — Spark has real
    bitwiseAND so no emulation is needed)."""
    cond = F.lit(False)
    for bit in bit_positions:
        cond = cond | (mask.cast("long").bitwiseAND(F.lit(1 << int(bit))) > 0)
    return F.when(cond, 0).otherwise(1)


def set_mask_col(value: Column, mask01: Column, nodata: Column | float) -> Column:
    """``{mask} != 0 ? {value} : NODATA`` (set_mask_muparser, :51-55)."""
    nd = nodata if isinstance(nodata, Column) else F.lit(nodata)
    return F.when(mask01 != 0, value).otherwise(nd)


# -------------------------------------------------- image-payload path ----

def make_scene_maskfun(maskfun: str, mask_values: Sequence[int],
                       buffer_size: int = 0, drop_mask_band: bool = False):
    """Scene-level mask closure ``fn(arr (B,H,W), nodata) -> arr`` for
    FUSION into downstream grouped reducers: the reference never runs
    masking as its own materialized pass — the nested VRT evaluates
    mask ∘ composite per block in ONE read
    (/root/reference/R/gdalraster-async.r:99-112). Applying the mask
    inside the composite's grouped UDF skips a full decode→encode
    rewrite of every payload (the scaling bottleneck at high
    parallelism is exactly this memory traffic)."""
    assert maskfun in ("int", "bit")
    vals = [int(v) for v in mask_values]
    buf = int(buffer_size)
    drop = bool(drop_mask_band)

    def fn(arr: np.ndarray, nodata) -> np.ndarray:
        mask01 = (build_intmask_np(arr[-1], vals) if maskfun == "int"
                  else build_bitmask_np(arr[-1], vals))
        nd = np.asarray(nodata, dtype=np.float64)
        nd_data = nd[:-1] if nd.ndim == 1 else nodata  # drop mask entry
        data = apply_mask_np(arr[:-1], mask01, nd_data, buf)
        return data if drop else np.concatenate([data, arr[-1:]], axis=0)
    return fn


def chain_scene_fns(fns):
    """Compose scene closures left-to-right (= sequential eager passes)."""
    def fn(arr: np.ndarray, nodata: float) -> np.ndarray:
        for f in fns:
            arr = f(arr, nodata)
        return arr
    return fn


def vrt_set_maskfun(df: DataFrame, maskfun: str, mask_values: Sequence[int],
                    buffer_size: int = 0, drop_mask_band: bool = False) -> DataFrame:
    """Apply a mask built from the last band plane to every data plane.

    Spark-first shape of ``vrt_set_maskfun`` (R/vrt-set-mask.R:52-318):
    in the reference the mask band is injected as a second source into
    every band's VRT XML; here the mask plane already travels inside the
    same ``bytes`` payload, so this is a **zero-shuffle mapInPandas** —
    a narrow transformation fused with adjacent stages by Arrow batch
    pipelining.

    ``maskfun``: ``"int"`` (class codes, S2/SCL) or ``"bit"``
    (bit flags, HLS/Fmask).
    """
    drop = bool(drop_mask_band)
    scene_fn = make_scene_maskfun(maskfun, mask_values, buffer_size, drop)
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for row in pdf.itertuples(index=False):
                arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         row.nodata)
                keep = scene_fn(arr, nd)
                out_bytes.append(codec.encode(keep.astype(arr.dtype), row.fmt))
            pdf = pdf.copy()
            pdf["bytes"] = out_bytes
            if drop:
                if "bands" in pdf.columns:  # null bands stay null
                    pdf["bands"] = pdf["bands"].map(
                        lambda b: None if b is None else list(b)[:-1])
                for c in ("band_scale", "band_offset", "band_nodata"):
                    if c in pdf.columns:
                        pdf[c] = pdf[c].map(
                            lambda v: None if v is None else list(v)[:-1])
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------- cloud shadows ----
#
# Geometric cloud-shadow projection (the s2cloudless / Fmask
# cloud-shadow-displacement step; reference masking stops at the cloud
# classes themselves — R/zvrt-pixel-funs-mask.R — so shadow geometry
# extends the family): a cloud at height h with the sun at (azimuth,
# elevation) casts its shadow displaced d = h / tan(elevation) metres
# AWAY from the sun. A cloud-BASE height range sweeps the displacement
# along the shadow ray; a pixel is shadow if any sampled height maps a
# cloud pixel onto it. Rides the focal halo exchange as a callable
# kernel — the displacement bounds the radius, strips shuffle, cloud
# tiles do not.

def shadow_shifts(azimuth: float, elevation: float, cloud_height,
                  sx: float, sy: float,
                  max_steps: int = 64) -> list[tuple[int, int]]:
    """Integer ``(dy, dx)`` pixel displacements of the shadow across
    the cloud-base height range (scalar or ``(hmin, hmax)`` metres),
    sampled at most ~1 px apart along the ray (deduplicated, sorted —
    deterministic). ``+dy`` is north (+row on this grid). A sweep
    needing more than ``max_steps`` samples RAISES rather than
    silently leaving gaps in the shadow swath — project on a coarser
    grid / overview level (the displacement would exceed any sane
    halo radius anyway) or raise ``max_steps`` explicitly."""
    el = float(np.radians(elevation))
    if not 0.0 < float(elevation) < 90.0:
        raise ValueError(
            f"sun elevation must be in (0, 90) degrees, got {elevation}")
    if int(max_steps) < 1:
        raise ValueError(f"max_steps must be >= 1, got {max_steps}")
    az = float(np.radians(azimuth))
    if np.isscalar(cloud_height):
        hmin = hmax = float(cloud_height)
    else:
        hmin, hmax = sorted(float(h) for h in cloud_height)
    if hmin < 0:
        raise ValueError(f"cloud height must be >= 0, got {hmin}")
    t = np.tan(el)
    d_min, d_max = hmin / t, hmax / t
    n = max(1, int(np.ceil((d_max - d_min) / min(sx, sy))) + 1)
    if n > int(max_steps):
        raise ValueError(
            f"cloud-height sweep needs {n} ~1-px samples but max_steps"
            f"={max_steps}: an undersampled ray would leave gaps in "
            "the shadow mask. Project on a coarser grid/overview "
            "level, or raise max_steps.")
    shifts = set()
    for k in range(n):
        h_k = hmin + (hmax - hmin) * (k / (n - 1) if n > 1 else 0.0)
        d = h_k / t
        east, north = -d * np.sin(az), -d * np.cos(az)
        shifts.add((int(np.round(north / sy)), int(np.round(east / sx))))
    return sorted(shifts)


def cloud_shadow_np(P: np.ndarray, shifts, r: int,
                    union: bool = False) -> np.ndarray:
    """Shadow plane(s) from a NaN-padded ``(B, H+2r, W+2r)`` 0/1 cloud
    array: 1 where any shift maps a cloud pixel here, else 0 (NaN and
    beyond-coverage neighbors count as clear — absence of evidence;
    the focal driver re-imposes the center nodata mask afterwards).
    ``union=True`` ORs the cloud itself in — the combined
    cloud-or-shadow invalid mask most pipelines feed to set_mask."""
    B, Hp, Wp = P.shape
    H, W = Hp - 2 * r, Wp - 2 * r
    cld = np.where(np.isnan(P), 0.0, P) > 0
    out = np.zeros((B, H, W))
    for dy, dx in shifts:
        if max(abs(int(dy)), abs(int(dx))) > r:
            raise ValueError(
                f"shift ({dy},{dx}) exceeds halo radius {r}")
        src = cld[:, r - dy:r - dy + H, r - dx:r - dx + W]
        out = np.maximum(out, src.astype(np.float64))
    if union:
        out = np.maximum(out, cld[:, r:r + H, r:r + W].astype(np.float64))
    return out


def cloud_shadow(df: DataFrame, azimuth: float, elevation: float,
                 cloud_height, pixel_size=None, union: bool = False,
                 max_steps: int = 64, key: str = "cell_id") -> DataFrame:
    """Distributed shadow projection over a one-row-per-cell 0/1
    cloud-mask tile table (e.g. ``algebra.classify`` output, or a
    mask plane): output schema == input schema with the payload
    replaced by ``rawf32`` 0/1 shadow (or cloud-or-shadow with
    ``union=True``) planes, ``-9999`` sentinel nodata.

    ``pixel_size`` (metres, scalar or ``(sx, sy)``) defaults to the
    grid's ground sample distance derived from ONE driver-inspected
    row (the table must share a single warp grid — every cell-keyed
    composite output does). The halo radius is the largest sampled
    displacement, so tiles must be at least that many pixels wide —
    at 10 m pixels and a 2 km cloud base that is a ~350 px halo:
    project shadows on overview levels or coarse grids, exactly as
    the single-node tools do."""
    from vrtility_spark import cells
    if pixel_size is None:
        probe = df.select(key, "w", "h").limit(1).collect()
        if not probe:
            raise ValueError("cloud_shadow: empty input table")
        _, res, _, _ = (int(v) for v in
                        cells.decode_np(probe[0][key]))
        size = cells.cell_size(res)
        sx, sy = size / int(probe[0].w), size / int(probe[0].h)
    elif np.isscalar(pixel_size):
        sx = sy = float(pixel_size)
    else:
        sx, sy = (float(v) for v in pixel_size)
    shifts = shadow_shifts(azimuth, elevation, cloud_height, sx, sy,
                           max_steps=max_steps)
    r = max(1, max(max(abs(dy), abs(dx)) for dy, dx in shifts))

    def kernel(P: np.ndarray, meta: dict) -> np.ndarray:
        return cloud_shadow_np(P, shifts, r, union=union)

    from vrtility_spark.focal import focal_filter
    return focal_filter(df, op=kernel, radius=r, fill=False, key=key,
                        out_fmt="rawf32", out_nodata=-9999.0)
