"""Per-pixel temporal trend: ordinary-least-squares slope/intercept of
each pixel's time series — the classic EO change-rate product
(vegetation greening/browning maps, deforestation rate).

The reference's time-series surface is per-timestep filtering
(src/hampel-filter-matrix.cpp, R/singleband-many-to-many.R); the trend
is its natural reduction twin: one fit per (pixel, band) over the whole
stack, emitted as a composite-shaped tile with three planes per input
band — ``slope`` (units/year), ``intercept`` (value at ``TREND_EPOCH``),
``n_obs`` (valid observations used).

Spark-first shape: the fit is DECOMPOSABLE — the per-pixel sufficient
statistics ``(n, Σt, Σt², Σy, Σt·y)`` fold scene-by-scene, so the
default path streams scenes through per-partition running accumulators
(one narrow ``mapInPandas``) and shuffles only O(partitions × cells)
fixed-size partial rows, never a scene stack: group memory and shuffle
volume are independent of the number of scenes per cell, the same
bound the incremental composite proves (composite.incremental_partials).
``mode="stack"`` keeps the direct grouped-stack computation for
bit-parity debugging at small T.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from vrtility_spark import codec
from vrtility_spark.composite import (
    MAX_ACTIVE_BYTES, MAX_STACK_BYTES, _profile_key)

#: fixed time origin: ``t`` is fractional Julian years since this
#: instant, so intercepts are comparable across jobs and the partial
#: sums are deterministic (no data-dependent centering).
TREND_EPOCH = pd.Timestamp("2020-01-01")
_EPOCH_NS = np.int64(TREND_EPOCH.value)
_YEAR_NS = 365.25 * 86400.0 * 1e9

#: denominators below this are treated as degenerate (all valid
#: observations at one timestamp): n·Σt² − (Σt)² grows like
#: n²·var(t_years), so any real multi-date series clears this easily.
_DEN_EPS = 1e-12

TREND_SCHEMA = (
    "cell_id long, bytes binary, w int, h int, fmt string, n_scenes int, "
    "datetime_min timestamp, datetime_max timestamp, nodata double"
)

_PARTIAL_SCHEMA = (
    "cell_id long, w int, h int, fmt string, nodata double, "
    "band_nodata array<double>, nb int, n_scenes int, acc binary, "
    "dt_min timestamp, dt_max timestamp"
)


def t_years(ts_ns) -> np.ndarray:
    """Nanosecond timestamps → fractional years since TREND_EPOCH."""
    return (np.asarray(ts_ns, dtype=np.int64) - _EPOCH_NS) / _YEAR_NS


def trend_finalize(acc: np.ndarray) -> np.ndarray:
    """``(5, B, H, W)`` sufficient statistics → ``(3B, H, W)`` planes.

    acc rows: ``n, Σt, Σt², Σy, Σt·y`` (per pixel, NaN-masked adds).
    Output planes: ``slope_0..B-1, intercept_0..B-1, n_obs_0..B-1``;
    slope/intercept are NaN where fewer than 2 observations or all
    observations share one timestamp (degenerate denominator).
    """
    n, st, stt, sy, sty = acc
    den = n * stt - st * st
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (n * sty - st * sy) / den
        bad = (n < 2) | ~(den > _DEN_EPS)
        slope = np.where(bad, np.nan, slope)
        icept = np.where(bad, np.nan, (sy - np.where(bad, 0.0, slope) * st) / n)
    return np.concatenate([slope, icept, n], axis=0)


def trend_np(ts_years: np.ndarray, stack: np.ndarray) -> np.ndarray:
    """OLS trend of a ``(T, B, H, W)`` NaN-masked float stack against
    times ``(T,)`` (years) — vectorized closed form, all pixels at
    once. Returns ``(3B, H, W)`` float64 (see :func:`trend_finalize`)."""
    t = np.asarray(ts_years, dtype=np.float64).reshape(-1, 1, 1, 1)
    ok = ~np.isnan(stack)
    y = np.where(ok, stack, 0.0)
    okf = ok.astype(np.float64)
    acc = np.stack([
        okf.sum(axis=0),
        (t * okf).sum(axis=0),
        (t * t * okf).sum(axis=0),
        y.sum(axis=0),
        (t * y).sum(axis=0),
    ])
    return trend_finalize(acc)


def _check_profile(pdf: pd.DataFrame, key: str) -> None:
    bn_keys = codec.band_nodata_keys(pdf)
    if (pdf.w.nunique() > 1 or pdf.h.nunique() > 1
            or pdf.fmt.nunique() > 1
            or pdf.nodata.nunique(dropna=False) > 1 or len(bn_keys) > 1):
        raise ValueError(
            f"cell {int(pdf[key].iloc[0])}: scenes disagree on pixel "
            "grid/codec/nodata/band_nodata; normalize them onto one "
            "target grid/profile first")


def _decoded(row, scene_fn):
    arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
    nd = codec.row_band_meta(row, len(arr), "band_nodata", row.nodata)
    if scene_fn is not None:
        n0 = len(arr)
        arr = scene_fn(arr, nd)
        # plane-dropping scene_fns (drop_mask_band=True) drop TRAILING
        # planes; trim the per-band sentinel array alongside
        if isinstance(nd, np.ndarray) and len(arr) != n0:
            nd = nd[: len(arr)]
    return codec.to_float_masked(arr, nd)


#: finite output sentinel (gdaldem's classic -9999, same rationale as
#: terrain.py:149): a NaN ``nodata`` double surfaces as NULL through
#: the Arrow grouped-map boundary, breaking float(row.nodata) in
#: downstream cell-keyed operators.
OUT_NODATA = -9999.0


def _out_row(cell_id, planes, w, h, n, dt_min, dt_max):
    payload = codec.from_float(planes, OUT_NODATA, "float32")
    return {
        "cell_id": int(cell_id),
        "bytes": codec.encode(payload, "rawf32"),
        "w": int(w), "h": int(h), "fmt": "rawf32",
        "n_scenes": int(n), "datetime_min": dt_min,
        "datetime_max": dt_max, "nodata": OUT_NODATA,
    }


def trend_stack(df: DataFrame, key: str = "cell_id",
                scene_fn: Callable | None = None,
                max_stack_bytes: int | None = MAX_STACK_BYTES) -> DataFrame:
    """Direct grouped-stack path: materializes the (T,B,H,W) stack per
    cell (same RAM guard as the holistic composites) — the bit-parity
    reference for :func:`trend_incremental` at small T."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = (pdf.sort_values("datetime", kind="mergesort")
               .reset_index(drop=True))
        _check_profile(pdf, key)
        w, h, fmt = int(pdf.w.iloc[0]), int(pdf.h.iloc[0]), pdf.fmt.iloc[0]
        nb = codec.plane_count(pdf.bytes.iloc[0], w, h, fmt) or 1
        est = len(pdf) * nb * h * w * 8
        if max_stack_bytes is not None and est > max_stack_bytes:
            raise ValueError(
                f"cell {int(pdf[key].iloc[0])}: trend stack needs "
                f"~{est / 2**30:.2f} GiB, over max_stack_bytes "
                f"({max_stack_bytes / 2**30:.2f} GiB). Use "
                "mode='incremental' (never stacks) or split spatially "
                "with composite.split_to_child_cells first.")
        stack = np.stack([_decoded(r, scene_fn)
                          for r in pdf.itertuples(index=False)])
        ts = t_years(pdf.datetime.values.astype("datetime64[ns]")
                     .astype(np.int64))
        planes = trend_np(ts, stack)
        return pd.DataFrame([_out_row(
            pdf[key].iloc[0], planes, w, h, len(pdf),
            pdf.datetime.min(), pdf.datetime.max())])

    return df.groupBy(key).applyInPandas(run, schema=TREND_SCHEMA)


def trend_partials(df: DataFrame, key: str = "cell_id",
                   scene_fn: Callable | None = None,
                   max_active_cells: int = 64,
                   max_active_bytes: int = MAX_ACTIVE_BYTES) -> DataFrame:
    """Stage 1: narrow per-partition accumulator map. Each state is a
    ``(5, B, H, W)`` float64 sufficient-statistics block; states flush
    early past either working-set bound (cells or bytes), so task
    memory is capped regardless of scenes per cell — and this stage's
    output is the ONLY thing the trend shuffles."""

    def partials(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        states: dict[int, list] = {}  # cell -> [profile, acc, n, lo, hi]

        def flush(keys=None):
            keys = list(states) if keys is None else keys
            if not keys:
                return None
            rows = []
            for c in keys:
                profile, acc, n, lo, hi = states.pop(c)
                w, h, fmt, nd, bn = profile
                rows.append({
                    "cell_id": int(c), "w": w, "h": h, "fmt": fmt,
                    # NaN profile keys are the STRING "nan" (see
                    # composite._profile_key); the Arrow double column
                    # needs the float back
                    "nodata": float("nan") if isinstance(nd, str) else nd,
                    "band_nodata": (None if bn is None else
                                    list(np.frombuffer(bn, "<f8"))),
                    "nb": int(acc.shape[1]), "n_scenes": int(n),
                    "acc": acc.astype("<f8").tobytes(),
                    "dt_min": lo, "dt_max": hi,
                })
            return pd.DataFrame(rows)

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                cell = int(getattr(row, key))
                data = _decoded(row, scene_fn)
                st = states.get(cell)
                if st is None:
                    acc = np.zeros((5,) + data.shape)
                    st = states[cell] = [
                        _profile_key(row), acc, 0,
                        row.datetime, row.datetime]
                elif st[0] != _profile_key(row):
                    raise ValueError(
                        f"cell {cell}: scenes disagree on pixel grid/"
                        "codec/nodata/band_nodata; normalize them onto "
                        "one target grid/profile first")
                elif data.shape != st[1].shape[1:]:
                    raise ValueError(
                        f"cell {cell}: scene plane shape {data.shape} "
                        f"disagrees with the accumulator "
                        f"{st[1].shape[1:]} (mixed band counts)")
                t = float(t_years(np.int64(pd.Timestamp(row.datetime).value)))
                ok = ~np.isnan(data)
                y = np.where(ok, data, 0.0)
                acc = st[1]
                acc[0] += ok
                acc[1] += t * ok
                acc[2] += (t * t) * ok
                acc[3] += y
                acc[4] += t * y
                st[2] += 1
                if row.datetime < st[3]:
                    st[3] = row.datetime
                if row.datetime > st[4]:
                    st[4] = row.datetime
            tot = sum(s[1].nbytes for s in states.values())
            if len(states) > max_active_cells or tot >= max_active_bytes:
                yield flush()
        tail = flush()
        if tail is not None:
            yield tail

    return df.mapInPandas(partials, schema=_PARTIAL_SCHEMA)


def trend_incremental(df: DataFrame, key: str = "cell_id",
                      scene_fn: Callable | None = None,
                      max_active_cells: int = 64,
                      max_active_bytes: int = MAX_ACTIVE_BYTES) -> DataFrame:
    """Bounded-memory trend: partial sufficient statistics per
    partition, merged per cell (elementwise sum), finalized in closed
    form — scenes never shuffle and no stack is ever materialized."""
    part = trend_partials(df, key=key, scene_fn=scene_fn,
                          max_active_cells=max_active_cells,
                          max_active_bytes=max_active_bytes)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        bn_keys = codec.band_nodata_keys(pdf)
        if (pdf.w.nunique() > 1 or pdf.h.nunique() > 1
                or pdf.fmt.nunique() > 1 or pdf.nb.nunique() > 1
                or pdf.nodata.nunique(dropna=False) > 1
                or len(bn_keys) > 1):
            raise ValueError(
                f"cell {int(pdf.cell_id.iloc[0])}: partials disagree on "
                "pixel grid/codec/nodata/band_nodata")
        first = pdf.iloc[0]
        shape = (5, int(first.nb), int(first.h), int(first.w))
        acc = np.zeros(shape)
        for b in pdf.acc:
            acc += np.frombuffer(b, "<f8").reshape(shape)
        planes = trend_finalize(acc)
        return pd.DataFrame([_out_row(
            first.cell_id, planes, first.w, first.h,
            int(pdf.n_scenes.sum()), pdf.dt_min.min(), pdf.dt_max.max())])

    return part.groupBy("cell_id").applyInPandas(merge, schema=TREND_SCHEMA)


def trend(df: DataFrame, key: str = "cell_id",
          scene_fn: Callable | None = None,
          mode: str = "auto", **kw) -> DataFrame:
    """Per-pixel OLS trend router: ``auto``/``incremental`` stream
    scene-by-scene (the 100-TB shape); ``stack`` materializes the
    grouped stack (RAM-guarded) for bit-parity checks."""
    if mode in ("auto", "incremental"):
        return trend_incremental(df, key=key, scene_fn=scene_fn, **kw)
    if mode == "stack":
        return trend_stack(df, key=key, scene_fn=scene_fn, **kw)
    raise KeyError(f"unknown trend mode {mode!r}; "
                   "choose auto | incremental | stack")
