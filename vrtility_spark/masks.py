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
