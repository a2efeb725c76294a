"""PSNR/MSE fidelity metrics: kernel vs per-pixel loop, identity and
known-noise closed forms, valid-intersection semantics, and the
distributed join path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

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


# ------------------------------------------------------------- SSIM ----

def _ssim_loop(Pa, Pb, r, peak=65535.0, k1=0.01, k2=0.03):
    """Deliberately-naive per-window SSIM twin of quality.ssim_np."""
    B, Hp, Wp = Pa.shape
    H, W = Hp - 2 * r, Wp - 2 * r
    out = np.full((B, H, W), np.nan)
    c1, c2 = (k1 * peak) ** 2, (k2 * peak) ** 2
    for bi in range(B):
        for y in range(H):
            for x in range(W):
                wa = Pa[bi, y:y + 2 * r + 1, x:x + 2 * r + 1]
                wb = Pb[bi, y:y + 2 * r + 1, x:x + 2 * r + 1]
                m = np.isfinite(wa) & np.isfinite(wb)
                if m.sum() < 2 or not m[r, r]:
                    continue
                a, b = wa[m].astype(np.float64), wb[m].astype(np.float64)
                mu_a, mu_b = a.mean(), b.mean()
                va = max((a * a).mean() - mu_a ** 2, 0.0)
                vb = max((b * b).mean() - mu_b ** 2, 0.0)
                cov = (a * b).mean() - mu_a * mu_b
                out[bi, y, x] = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
                    (mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2))
    return out


def test_ssim_kernel_matches_loop_and_closed_forms():
    r = 2
    A = np.round(RNG.uniform(100, 60000, (2, 11, 12)))
    B = np.clip(np.round(A + RNG.normal(0, 500, A.shape)), 0, 65535)
    A[0, 3, 4] = np.nan
    B[1, 7, 2] = np.nan
    got = quality.ssim_np(A, B, r)
    want = _ssim_loop(A, B, r)
    np.testing.assert_allclose(got, want, rtol=1e-10, equal_nan=True)
    # identity: SSIM of a plane with itself is exactly 1 wherever valid
    self_map = quality.ssim_np(A, A.copy(), r)
    v = self_map[np.isfinite(self_map)]
    np.testing.assert_allclose(v, np.ones_like(v), rtol=0, atol=1e-12)
    # constant shift: closed form ((2*mu_a*mu_b+c1)/(mu_a^2+mu_b^2+c1))
    # * (c2/c2) with zero variance on both sides
    C = np.full((1, 9, 9), 1000.0)
    D = C + 500.0
    m = quality.ssim_np(C, D, r, peak=65535.0)
    c1 = (0.01 * 65535.0) ** 2
    want_v = (2 * 1000.0 * 1500.0 + c1) / (1000.0 ** 2 + 1500.0 ** 2 + c1)
    np.testing.assert_allclose(m[np.isfinite(m)], want_v, rtol=1e-12)
    # interior pixels of an all-NaN pair stay NaN; shape mismatch raises
    assert np.isnan(quality.ssim_np(
        np.full((1, 7, 7), np.nan), np.full((1, 7, 7), np.nan), r)).all()
    with pytest.raises(ValueError, match="shapes"):
        quality.ssim_np(A, A[:, :6], r)
    with pytest.raises(ValueError, match="peak"):
        quality.ssim_np(A, B, r, peak=0.0)


def test_distributed_ssim_matches_mosaic_twin(spark):
    """3x1 tile strip: the joined-stack halo exchange must equal
    ssim_np run on the assembled mosaics (seam windows included)."""
    zone, res, r = 70, 3, 2
    w = h = 8
    GA = np.round(RNG.uniform(100, 60000, (2, h, 3 * w)))
    GB = np.clip(np.round(GA + RNG.normal(0, 800, GA.shape)), 1, 65535)
    GA[RNG.random(GA.shape) < 0.08] = 0.0  # nodata holes
    rows_l, rows_r = [], []
    for ix in range(3):
        cid = int(cells.encode_np(zone, res, ix, 0))
        for rows, G in ((rows_l, GA), (rows_r, GB)):
            rows.append({"cell_id": cid,
                         "bytes": codec.encode(
                             G[:, :, ix * w:(ix + 1) * w].astype(np.uint16),
                             "raw16"),
                         "w": w, "h": h, "fmt": "raw16", "nodata": 0.0})
    left = spark.createDataFrame(pd.DataFrame(rows_l), TILE_SCHEMA)
    right = spark.createDataFrame(pd.DataFrame(rows_r), TILE_SCHEMA)
    out = {r_.cell_id: r_ for r_ in
           quality.tile_ssim_map(left, right, radius=r).collect()}
    # mosaic twin: NaN-masked globals, NaN ring of r, one ssim_np call
    Af = GA.astype(np.float64); Af[Af == 0] = np.nan
    Bf = GB.astype(np.float64); Bf[Bf == 0] = np.nan
    PA = np.full((2, h + 2 * r, 3 * w + 2 * r), np.nan)
    PB = np.full_like(PA, np.nan)
    PA[:, r:r + h, r:r + 3 * w] = Af
    PB[:, r:r + h, r:r + 3 * w] = Bf
    want = quality.ssim_np(PA, PB, r)
    for ix in range(3):
        cid = int(cells.encode_np(zone, res, ix, 0))
        row = out[cid]
        assert row.fmt == "rawf32" and row.nodata == -9999.0
        got = codec.decode(row.bytes, w, h, "rawf32").astype(np.float64)
        exp = want[:, :, ix * w:(ix + 1) * w].astype(np.float32)
        exp = np.where(np.isnan(exp), -9999.0, exp).astype(np.float64)
        np.testing.assert_array_equal(got, exp)
    # aggregate: (band, n, mssim) equals the mosaic-twin reduction
    agg = {r_.band: r_ for r_ in
           quality.tile_ssim(left, right, radius=r).collect()}
    for bi in range(2):
        v = want[bi][np.isfinite(want[bi])].astype(np.float32)
        assert agg[bi].n == v.size
        np.testing.assert_allclose(
            agg[bi].mssim, v.astype(np.float64).mean(), rtol=1e-9)
    # band-count mismatch raises inside the stack map
    with pytest.raises(Exception, match="band counts"):
        quality.tile_ssim_map(
            left, right.withColumn(
                "bytes", F.concat("bytes", "bytes")), radius=r).collect()
