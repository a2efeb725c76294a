"""Spatial autocorrelation: kernels vs naive double-loop oracles,
checkerboard/constant closed forms, and the distributed two-pass
aggregation vs the single-mosaic twin (seam pairs included)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import autocorr, cells, codec

RNG = np.random.default_rng(57)

TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def _pad(A):
    P = np.full((A.shape[0], A.shape[1] + 2, A.shape[2] + 2), np.nan)
    P[:, 1:-1, 1:-1] = A
    return P


def _loop_autocorr(A):
    """Deliberately-naive per-pair Moran/Geary twin (queen weights)."""
    out = []
    for bi in range(A.shape[0]):
        X = A[bi]
        H, W = X.shape
        pts = [(y, x) for y in range(H) for x in range(W)
               if np.isfinite(X[y, x])]
        n = len(pts)
        mu = np.mean([X[p] for p in pts])
        zz = sum((X[p] - mu) ** 2 for p in pts)
        s0 = num_i = num_c = 0.0
        for (y, x) in pts:
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < H and 0 <= xx < W and \
                            np.isfinite(X[yy, xx]):
                        s0 += 1
                        num_i += (X[y, x] - mu) * (X[yy, xx] - mu)
                        num_c += (X[y, x] - X[yy, xx]) ** 2
        out.append((n, int(s0), (n / s0) * num_i / zz,
                    ((n - 1) * num_c) / (2 * s0 * zz)))
    return out


def _loop_gi_star(A, n, mu, s):
    out = np.full(A.shape, np.nan)
    for bi in range(A.shape[0]):
        X = A[bi]
        H, W = X.shape
        for y in range(H):
            for x in range(W):
                if not np.isfinite(X[y, x]):
                    continue
                vals = [X[y + dy, x + dx]
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                        if 0 <= y + dy < H and 0 <= x + dx < W
                        and np.isfinite(X[y + dy, x + dx])]
                wi = len(vals)
                var = (n[bi] * wi - wi * wi) / (n[bi] - 1)
                den = s[bi] * np.sqrt(var)
                if den > 0:
                    out[bi, y, x] = (sum(vals) - mu[bi] * wi) / den
    return out


def _loop_local_moran(A, n, mu, m2):
    li = np.full(A.shape, np.nan)
    quad = np.full(A.shape, np.nan)
    for bi in range(A.shape[0]):
        X = A[bi]
        H, W = X.shape
        for y in range(H):
            for x in range(W):
                if not np.isfinite(X[y, x]) or m2[bi] <= 0:
                    continue
                vals = [X[y + dy, x + dx]
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                        if (dy, dx) != (0, 0)
                        and 0 <= y + dy < H and 0 <= x + dx < W
                        and np.isfinite(X[y + dy, x + dx])]
                if not vals:
                    continue
                z = X[y, x] - mu[bi]
                lag = sum(v - mu[bi] for v in vals)
                li[bi, y, x] = z * lag / m2[bi]
                quad[bi, y, x] = (1 if lag > 0 else 3) if z > 0 \
                    else (4 if lag > 0 else 2)
    return li, quad


def test_kernels_match_loops():
    A = np.round(RNG.uniform(0, 200, (2, 7, 9)))
    A[0, 2, 3] = np.nan
    A[1, 5, 1] = np.nan
    got = autocorr.autocorr_np(_pad(A))
    want = _loop_autocorr(A)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        np.testing.assert_allclose(g[2], w[2], rtol=1e-10)
        np.testing.assert_allclose(g[3], w[3], rtol=1e-10)
        np.testing.assert_allclose(g[4], -1.0 / (g[0] - 1))
    n = np.array([np.isfinite(A[b]).sum() for b in range(2)], float)
    mu = np.array([np.nanmean(A[b]) for b in range(2)])
    s = np.array([np.nanstd(A[b]) for b in range(2)])
    np.testing.assert_allclose(
        autocorr.gi_star_np(_pad(A), n, mu, s),
        _loop_gi_star(A, n, mu, s), rtol=1e-10, equal_nan=True)
    m2 = s * s
    L = autocorr.local_moran_np(_pad(A), n, mu, m2)
    li, quad = _loop_local_moran(A, n, mu, m2)
    np.testing.assert_allclose(L[:2], li, rtol=1e-10, equal_nan=True)
    np.testing.assert_array_equal(np.isnan(L[2:]), np.isnan(quad))
    np.testing.assert_allclose(L[2:], quad, equal_nan=True)
    # local <-> global consistency: sum of I_i equals S0 * global I
    for bi in range(2):
        s0, i_g = got[bi][1], got[bi][2]
        np.testing.assert_allclose(np.nansum(L[bi]), s0 * i_g,
                                   rtol=1e-10)


def test_closed_forms():
    # checkerboard: negative autocorrelation under QUEEN weights is
    # mild (the 4 rook neighbors oppose, the diagonals agree) but the
    # dissimilarity statistic is unambiguous: I below e_i, C well
    # above 1; smooth gradient: strong positive, I > 0, C < 1
    yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    board = (((yy + xx) % 2) * 100.0)[None]
    # closed form: n=64, s0=420 queen links, zz=64*50^2; the 224
    # ordered rook pairs each differ by 100 -> C = 63*224e4/(2*420*
    # 16e4) = 1.05 exactly
    (n_b, s0_b, i_b, c_b, e_b), = autocorr.autocorr_np(_pad(board))
    assert (n_b, s0_b) == (64, 420)
    assert i_b < e_b
    np.testing.assert_allclose(c_b, 1.05, rtol=1e-12)
    grad = (yy * 10.0 + xx)[None]
    (_, _, i_g, c_g, _), = autocorr.autocorr_np(_pad(grad))
    assert i_g > 0.5 and c_g < 0.5
    # constant plane: zero variance -> NaN stats, e_i defined
    n, s0, i_c, c_c, e = autocorr.autocorr_np(
        _pad(np.full((1, 5, 5), 7.0)))[0]
    assert np.isnan(i_c) and np.isnan(c_c)
    np.testing.assert_allclose(e, -1.0 / (n - 1))
    # gi*: a single hot block in a flat-noise field scores high z at
    # the block, near zero far away
    X = np.round(RNG.uniform(100, 110, (1, 12, 12)))
    X[0, 5:8, 5:8] = 1000.0
    n = np.array([144.0])
    mu = np.array([X[0].mean()])
    s = np.array([X[0].std()])
    z = autocorr.gi_star_np(_pad(X), n, mu, s)
    assert z[0, 6, 6] > 3.0 and abs(z[0, 0, 0]) < 1.0
    # LISA on the same plant: HH (code 1) at the block center, strong
    # positive I_i there; the pixels ringing the block are LH (low
    # value whose lag is pulled high by the block) — code 4
    L = autocorr.local_moran_np(_pad(X), n, mu, s * s)
    assert L[0, 6, 6] > 1.0 and L[1, 6, 6] == 1.0
    assert L[1, 4, 6] == 4.0
    # checkerboard closed form under QUEEN weights: interior lag is
    # EXACTLY zero (4 rook opponents cancel 4 diagonal allies), so
    # interior I_i == 0; at each corner the 2 rook opponents outvote
    # the 1 diagonal ally -> lag = ∓50, I_i = -1 exactly (outlier)
    yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    board = (((yy + xx) % 2) * 100.0)[None]
    nb = np.array([64.0])
    mub = np.array([50.0])
    Lb = autocorr.local_moran_np(_pad(board), nb, mub,
                                 np.array([2500.0]))
    assert (Lb[0, 1:-1, 1:-1] == 0.0).all()
    for cy, cx in ((0, 0), (0, 7), (7, 0), (7, 7)):
        np.testing.assert_allclose(Lb[0, cy, cx], -1.0)
        assert Lb[1, cy, cx] in (3.0, 4.0)
    # zero variance -> all-NaN planes
    Lc = autocorr.local_moran_np(_pad(np.full((1, 4, 4), 9.0)),
                                 np.array([16.0]), np.array([9.0]),
                                 np.array([0.0]))
    assert np.isnan(Lc).all()


def _tile_rows(G, zone, res, w, h):
    rows = []
    for ix in range(G.shape[2] // w):
        for iy in range(G.shape[1] // h):
            cid = int(cells.encode_np(zone, res, ix, iy))
            t = G[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
            rows.append({"cell_id": cid,
                         "bytes": codec.encode(t.astype(np.uint16),
                                               "raw16"),
                         "w": w, "h": h, "fmt": "raw16", "nodata": 0.0})
    return rows


def test_distributed_matches_mosaic_twin(spark):
    """2x2 tile grid with nodata holes: the two-pass aggregation and
    the Gi* map must equal the kernels run on the assembled mosaic —
    cross-seam neighbor pairs are the point."""
    zone, res, w, h = 70, 3, 8, 8
    G = np.round(RNG.uniform(1, 60000, (2, 2 * h, 2 * w)))
    G[RNG.random(G.shape) < 0.07] = 0.0
    df = spark.createDataFrame(
        pd.DataFrame(_tile_rows(G, zone, res, w, h)), TILE_SCHEMA)
    Gf = G.astype(np.float64)
    Gf[Gf == 0] = np.nan
    want = autocorr.autocorr_np(_pad(Gf))
    got = {r.band: r for r in autocorr.global_autocorr(df).collect()}
    assert len(got) == 2
    for bi, (n, s0, i_, c_, e_) in enumerate(want):
        r = got[bi]
        assert r.n == n and r.s0 == s0
        np.testing.assert_allclose(r.moran_i, i_, rtol=1e-12)
        np.testing.assert_allclose(r.geary_c, c_, rtol=1e-12)
        np.testing.assert_allclose(r.e_i, e_, rtol=1e-12)
    # hotspot map parity through the rawf32/-9999 round trip
    n = np.array([np.isfinite(Gf[b]).sum() for b in range(2)], float)
    mu = np.array([np.nanmean(Gf[b]) for b in range(2)])
    s = np.array([np.nanstd(Gf[b]) for b in range(2)])
    zmap = autocorr.gi_star_np(_pad(Gf), n, mu, s)
    out = {r.cell_id: r for r in autocorr.hotspots(df).collect()}
    for ix in range(2):
        for iy in range(2):
            cid = int(cells.encode_np(zone, res, ix, iy))
            row = out[cid]
            assert row.fmt == "rawf32" and row.nodata == -9999.0
            dec = codec.decode(row.bytes, w, h, "rawf32")
            exp = zmap[:, iy * h:(iy + 1) * h,
                       ix * w:(ix + 1) * w].astype(np.float32)
            exp = np.where(np.isnan(exp), np.float32(-9999.0), exp)
            np.testing.assert_array_equal(dec, exp)
    # moments exactness: integer payloads -> exact integer totals
    m = {r.band: r for r in autocorr.moments(df).collect()}
    for bi in range(2):
        v = Gf[bi][np.isfinite(Gf[bi])]
        assert m[bi].n == v.size
        assert m[bi].sum == float(v.sum())
        assert m[bi].sumsq == float((v * v).sum())
    with pytest.raises(ValueError, match="missing column"):
        autocorr.moments(df.drop("nodata"))
    with pytest.raises(ValueError, match="empty"):
        autocorr.hotspots(df.filter("cell_id < 0"))


def test_local_moran_distributed(spark, tmp_path):
    """LISA map ≡ kernel on the assembled mosaic through the
    rawf32/-9999 round trip (2B stacked planes, cross-seam lags), and
    the Pipeline verb bundles/replays byte-identically."""
    from vrtility_spark.pipeline import Pipeline

    zone, res, w, h = 70, 3, 8, 8
    G = np.round(RNG.uniform(1, 60000, (2, 2 * h, 2 * w)))
    G[RNG.random(G.shape) < 0.07] = 0.0
    df = spark.createDataFrame(
        pd.DataFrame(_tile_rows(G, zone, res, w, h)), TILE_SCHEMA)
    Gf = G.astype(np.float64)
    Gf[Gf == 0] = np.nan
    n = np.array([np.isfinite(Gf[b]).sum() for b in range(2)], float)
    mu = np.array([np.nanmean(Gf[b]) for b in range(2)])
    m2 = np.array([np.nanvar(Gf[b]) for b in range(2)])
    zmap = autocorr.local_moran_np(_pad(Gf), n, mu, m2)
    out = {r.cell_id: r for r in autocorr.local_moran(df).collect()}
    for ix in range(2):
        for iy in range(2):
            cid = int(cells.encode_np(zone, res, ix, iy))
            row = out[cid]
            assert row.fmt == "rawf32" and row.nodata == -9999.0
            dec = codec.decode(row.bytes, w, h, "rawf32")
            assert dec.shape[0] == 4  # 2 bands -> I planes + quadrants
            exp = zmap[:, iy * h:(iy + 1) * h,
                       ix * w:(ix + 1) * w].astype(np.float32)
            exp = np.where(np.isnan(exp), np.float32(-9999.0), exp)
            np.testing.assert_array_equal(dec, exp)
    # bundle replay
    p = Pipeline(df).local_moran()
    path = str(tmp_path / "lisa.json")
    p.to_bundle(path)
    replay = Pipeline.from_bundle(path, df)
    a = {r.cell_id: bytes(r.bytes) for r in p.df.collect()}
    b = {r.cell_id: bytes(r.bytes) for r in replay.df.collect()}
    assert a == b
    with pytest.raises(ValueError, match="empty"):
        autocorr.local_moran(df.filter("cell_id < 0"))


def test_constant_and_empty_band_guards(spark):
    """Zero-variance band → NULL I/C (not a crash); e_i still set."""
    zone, res, w, h = 70, 3, 8, 8
    G = np.full((1, h, 2 * w), 500.0)
    df = spark.createDataFrame(
        pd.DataFrame(_tile_rows(G, zone, res, w, h)), TILE_SCHEMA)
    r = autocorr.global_autocorr(df).collect()[0]
    assert r.moran_i is None and r.geary_c is None
    np.testing.assert_allclose(r.e_i, -1.0 / (r.n - 1))
