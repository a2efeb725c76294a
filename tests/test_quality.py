"""PSNR/MSE fidelity metrics: kernel vs per-pixel loop, identity and
known-noise closed forms, valid-intersection semantics, and the
distributed join path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, quality

RNG = np.random.default_rng(53)


def test_kernel_matches_loop_and_closed_forms():
    A = RNG.uniform(0, 60000, (3, 8, 8))
    B = A + RNG.normal(0, 10, A.shape)
    A[0, 0, 0] = np.nan
    B[1, 2, 3] = np.nan
    got = quality.psnr_np(A, B)
    for bi, (n, mse, psnr, ident) in enumerate(got):
        m = np.isfinite(A[bi]) & np.isfinite(B[bi])
        assert n == int(m.sum())
        want_mse = float(((A[bi][m] - B[bi][m]) ** 2).mean())
        np.testing.assert_allclose(mse, want_mse, rtol=1e-12)
        np.testing.assert_allclose(
            psnr, 10 * np.log10(65535.0 ** 2 / want_mse), rtol=1e-12)
        assert ident == 0
    # identical planes: mse 0, psnr NaN, identical flag set
    n, mse, psnr, ident = quality.psnr_np(A, A.copy())[2]
    assert mse == 0.0 and np.isnan(psnr) and ident == 1
    # uniform +eps noise: psnr = 10*log10(peak^2/eps^2) exactly
    C = np.full((1, 4, 4), 100.0)
    n, mse, psnr, ident = quality.psnr_np(C, C + 2.0, peak=200.0)[0]
    np.testing.assert_allclose(mse, 4.0)
    np.testing.assert_allclose(psnr, 10 * np.log10(200.0 ** 2 / 4.0))
    # disjoint validity: no common pixel
    D = np.full((1, 2, 2), np.nan)
    D[0, 0, 0] = 1.0
    E = np.full((1, 2, 2), np.nan)
    E[0, 1, 1] = 1.0
    n, mse, psnr, ident = quality.psnr_np(D, E)[0]
    assert n == 0 and np.isnan(mse) and np.isnan(psnr)
    with pytest.raises(ValueError, match="shapes"):
        quality.psnr_np(A, A[:, :4])
    with pytest.raises(ValueError, match="peak"):
        quality.psnr_np(A, B, peak=0)


TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def test_distributed_psnr(spark):
    zone, res = 70, 3
    rows_l, rows_r, truth = [], [], {}
    for ix in range(3):
        cid = int(cells.encode_np(zone, res, ix, 0))
        A = np.round(RNG.uniform(100, 50000, (2, 8, 8)))
        noise = np.round(RNG.normal(0, 20, A.shape))
        B = np.clip(A + noise, 1, 65535)
        A[RNG.random(A.shape) < 0.1] = 0.0
        rows_l.append({"cell_id": cid,
                       "bytes": codec.encode(A.astype(np.uint16),
                                             "raw16"),
                       "w": 8, "h": 8, "fmt": "raw16", "nodata": 0.0})
        rows_r.append({"cell_id": cid,
                       "bytes": codec.encode(B.astype(np.uint16),
                                             "raw16"),
                       "w": 8, "h": 8, "fmt": "raw16", "nodata": 0.0})
        Af = A.astype(np.float64)
        Af[Af == 0] = np.nan
        Bf = B.astype(np.float64)
        Bf[Bf == 0] = np.nan
        truth[cid] = quality.psnr_np(Af, Bf)
    left = spark.createDataFrame(pd.DataFrame(rows_l), TILE_SCHEMA)
    right = spark.createDataFrame(pd.DataFrame(rows_r), TILE_SCHEMA)
    out = quality.tile_psnr(left, right, broadcast_right=True)
    got = {(r.cell_id, r.band): r for r in out.collect()}
    assert len(got) == 3 * 2
    for cid, bands in truth.items():
        for bi, (n, mse, psnr, ident) in enumerate(bands):
            r = got[(cid, bi)]
            assert r.n == n and r.identical == ident
            np.testing.assert_allclose(r.mse, mse, rtol=1e-9)
            np.testing.assert_allclose(r.psnr, psnr, rtol=1e-9)
    # self-comparison: every band identical
    self_rows = quality.tile_psnr(left, left).collect()
    assert all(r.identical == 1 and r.mse == 0.0 for r in self_rows)
    with pytest.raises(ValueError, match="missing column"):
        quality.tile_psnr(left.drop("nodata"), right)
