"""Histogram matching: the LUT kernel vs a per-pixel quantile loop,
identity/monotonicity properties, and the two-pass distributed path vs
the mosaic twin — the matched collection must carry the reference's
distribution exactly at the distinct-value level."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, histmatch
from vrtility_spark.histmatch import histogram_match, match_lut, match_np
from vrtility_spark.stretch import _SENTINEL

RNG = np.random.default_rng(41)

ZONE, RES = 31, 3
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def naive_match(P: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Per-pixel quantile transform (the deliberately-naive oracle)."""
    out = np.full(P.shape, np.nan)
    for b in range(P.shape[0]):
        src = np.sort(P[b][np.isfinite(P[b])])
        ref = np.sort(R[b][np.isfinite(R[b])])
        if src.size == 0 or ref.size == 0:
            continue
        rv, rc = np.unique(ref, return_counts=True)
        ref_q = np.cumsum(rc) / rc.sum()
        for i in range(P.shape[1]):
            for j in range(P.shape[2]):
                v = P[b, i, j]
                if not np.isfinite(v):
                    continue
                q = np.searchsorted(src, v, side="right") / len(src)
                out[b, i, j] = np.interp(q, ref_q, rv)
    return out


def test_match_np_matches_naive():
    P = RNG.integers(0, 50, (2, 9, 11)).astype(float)
    R = (RNG.integers(0, 30, (2, 13, 7)) * 3 + 100).astype(float)
    P[RNG.random(P.shape) < 0.1] = np.nan
    R[RNG.random(R.shape) < 0.1] = np.nan
    np.testing.assert_allclose(match_np(P, R), naive_match(P, R),
                               rtol=0, atol=1e-12)


def test_match_np_identity_and_monotone():
    P = RNG.integers(0, 200, (1, 16, 16)).astype(float)
    np.testing.assert_array_equal(match_np(P, P), P)  # self-match = id
    R = (RNG.gamma(2.0, 40.0, (1, 16, 16))).astype(np.int64).astype(float)
    sv, sc = np.unique(P[0], return_counts=True)
    rv, rc = np.unique(R[0], return_counts=True)
    lut = match_lut(sv, sc, rv, rc)
    assert (np.diff(lut) >= 0).all()                  # monotone
    assert lut.min() >= rv.min() and lut.max() <= rv.max()


def test_match_np_transfers_distribution():
    # matching a uniform source onto a shifted/scaled reference puts
    # every matched quantile on the reference's inverse CDF
    P = np.arange(400, dtype=float).reshape(1, 20, 20)
    R = (np.arange(400, dtype=float) * 2 + 1000).reshape(1, 20, 20)
    M = match_np(P, R)
    np.testing.assert_allclose(np.quantile(M, [0.25, 0.5, 0.75]),
                               np.quantile(R, [0.25, 0.5, 0.75]),
                               rtol=0, atol=2.5)


# ------------------------------------------------- distributed paths ----

def _tiles(h, w, n, value_fn, seed, fmt="raw16"):
    rng = np.random.default_rng(seed)
    rows, planes = [], []
    for i in range(n):
        arr = value_fn(rng, h, w)
        # sprinkle nodata (value 0 for raw16 fixtures)
        arr[0][rng.random((h, w)) < 0.05] = 0
        cid = int(cells.encode_np(ZONE, RES, i % 4, i // 4))
        enc = (arr.astype(np.uint16) if fmt == "raw16"
               else arr.astype(np.float32))
        rows.append({"cell_id": cid, "bytes": codec.encode(enc, fmt),
                     "w": w, "h": h, "fmt": fmt, "nodata": 0.0})
        planes.append(codec.to_float_masked(
            codec.decode(rows[-1]["bytes"], w, h, fmt), 0.0))
    return rows, np.concatenate(planes, axis=2)  # (B, h, w*n) mosaic


def test_distributed_matches_mosaic_twin(spark):
    h = w = 12
    src_rows, SRC = _tiles(
        h, w, 5, lambda r, hh, ww: r.integers(1, 300, (2, hh, ww)), 7)
    ref_rows, REF = _tiles(
        h, w, 4, lambda r, hh, ww: r.integers(500, 900, (2, hh, ww)), 9)
    df = spark.createDataFrame(pd.DataFrame(src_rows), TILE_SCHEMA)
    ref = spark.createDataFrame(pd.DataFrame(ref_rows), TILE_SCHEMA)
    got = {r["cell_id"]: (codec.decode(r["bytes"], w, h, r["fmt"]), r)
           for r in histogram_match(df, ref).collect()}
    WANT = match_np(SRC, REF)          # collection-global mosaic twin
    for i, srow in enumerate(src_rows):
        arr, row = got[srow["cell_id"]]
        assert row["fmt"] == "rawf32" and row["nodata"] == _SENTINEL
        want = WANT[:, :, i * w:(i + 1) * w]
        enc = codec.from_float(want, _SENTINEL, "float32")
        np.testing.assert_array_equal(arr, enc)
    # matched values live in the reference's range
    valid = np.concatenate([a[a != np.float32(_SENTINEL)]
                            for a, _ in got.values()])
    assert valid.min() >= 500 and valid.max() <= 899


def test_distributed_rawf32_binned_regime(spark):
    h = w = 10
    src_rows, SRC = _tiles(
        h, w, 3, lambda r, hh, ww: r.random((1, hh, ww)) * 50 + 1, 11,
        fmt="rawf32")
    ref_rows, REF = _tiles(
        h, w, 3, lambda r, hh, ww: r.integers(200, 260, (1, hh, ww)), 13)
    df = spark.createDataFrame(pd.DataFrame(src_rows), TILE_SCHEMA)
    ref = spark.createDataFrame(pd.DataFrame(ref_rows), TILE_SCHEMA)
    out = {r["cell_id"]: codec.decode(r["bytes"], w, h, r["fmt"])
           for r in histogram_match(df, ref).collect()}
    vals = np.concatenate([a[a != np.float32(_SENTINEL)]
                           for a in out.values()]).astype(np.float64)
    # binned source still lands on the reference range, monotonically:
    # larger source pixels never map below smaller ones
    assert vals.min() >= 200 and vals.max() <= 259
    src_list, got_list = [], []
    for i, r in enumerate(src_rows):
        s = SRC[0][:, i * w:(i + 1) * w]
        m = np.isfinite(s)
        src_list.append(s[m])
        got_list.append(out[r["cell_id"]][0][m])
    src_flat = np.concatenate(src_list)
    got_flat = np.concatenate(got_list).astype(np.float64)
    order = np.argsort(src_flat, kind="mergesort")
    assert (np.diff(got_flat[order]) >= -1e-9).all()


def test_sentinel_collision_refused(spark):
    # a reference whose values include the -9999 output sentinel would
    # turn matched pixels into silent nodata — must raise loudly
    h = w = 8
    src_rows, _ = _tiles(h, w, 2,
                         lambda r, hh, ww: r.integers(1, 9, (1, hh, ww)),
                         5)
    ref_rows, _ = _tiles(
        h, w, 2,
        lambda r, hh, ww: np.full((1, hh, ww), -9999.0), 6, fmt="rawf32")
    A = spark.createDataFrame(pd.DataFrame(src_rows), TILE_SCHEMA)
    B = spark.createDataFrame(pd.DataFrame(ref_rows), TILE_SCHEMA)
    with pytest.raises(Exception, match="sentinel"):
        histogram_match(A, B)


def test_validation(spark):
    h = w = 8
    a_rows, _ = _tiles(h, w, 2,
                       lambda r, hh, ww: r.integers(1, 9, (2, hh, ww)), 3)
    b_rows, _ = _tiles(h, w, 2,
                       lambda r, hh, ww: r.integers(1, 9, (1, hh, ww)), 4)
    A = spark.createDataFrame(pd.DataFrame(a_rows), TILE_SCHEMA)
    B = spark.createDataFrame(pd.DataFrame(b_rows), TILE_SCHEMA)
    with pytest.raises(Exception, match="bands"):
        histogram_match(A, B)
