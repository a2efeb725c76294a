"""IR-MAD change detection: special functions vs closed forms, the
canonical solve vs CCA identities, identical-input and planted-change
closed forms, linear-transform invariance of the χ² plane, and the
distributed fit/apply vs the mosaic twin (bit-deterministic decimal
partials, reshard invariance)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, mad

RNG = np.random.default_rng(23)

TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def test_special_functions():
    x = np.linspace(0.01, 30, 57)
    # chi2(2): CDF = 1 - exp(-x/2) exactly
    np.testing.assert_allclose(mad.chi2_cdf(x, 2),
                               1 - np.exp(-x / 2), rtol=1e-12)
    # chi2(4): 1 - exp(-x/2)(1 + x/2)
    np.testing.assert_allclose(mad.chi2_cdf(x, 4),
                               1 - np.exp(-x / 2) * (1 + x / 2),
                               rtol=1e-10, atol=1e-15)
    # gammainc_p(1/2, x) = erf(sqrt(x))
    np.testing.assert_allclose(
        mad.gammainc_p(0.5, x),
        [math.erf(math.sqrt(v)) for v in x], rtol=1e-10, atol=1e-15)
    assert mad.gammainc_p(2.5, np.array([0.0]))[0] == 0.0
    with pytest.raises(ValueError, match="a > 0"):
        mad.gammainc_p(0.0, x)


def _sample_moments(X, Y):
    U = np.concatenate([X.reshape(X.shape[0], -1),
                        Y.reshape(Y.shape[0], -1)], axis=0)
    s0 = U.shape[1]
    s1 = U.sum(axis=1)
    s2 = U @ U.T
    return s0, s1, s2


def test_solve_mad_cca_identities():
    """On a correlated Gaussian sample the solve must satisfy the CCA
    normalization and correlation identities."""
    nb, n = 3, 4000
    X = RNG.normal(size=(nb, n))
    R = np.array([[0.9, 0.1, 0.0], [0.0, 0.8, 0.2], [0.1, 0.0, 0.7]])
    Y = R @ X + 0.5 * RNG.normal(size=(nb, n))
    s0, s1, s2 = _sample_moments(X[:, None, :], Y[:, None, :])
    m = mad.solve_mad(float(s0), s1, s2, nb)
    mu = s1 / s0
    cov = s2 / s0 - np.outer(mu, mu)
    sxx, syy, sxy = cov[:nb, :nb], cov[nb:, nb:], cov[:nb, nb:]
    for i in range(nb):
        np.testing.assert_allclose(m.a[i] @ sxx @ m.a[i], 1.0,
                                   rtol=1e-9)
        np.testing.assert_allclose(m.b[i] @ syy @ m.b[i], 1.0,
                                   rtol=1e-9)
        np.testing.assert_allclose(m.a[i] @ sxy @ m.b[i], m.rho[i],
                                   rtol=1e-7, atol=1e-12)
    assert (np.diff(m.rho) <= 1e-12).all()  # descending
    assert ((m.rho >= 0) & (m.rho <= 1)).all()
    np.testing.assert_allclose(m.sig2, np.maximum(
        2 * (1 - m.rho), mad._SIG2_FLOOR))
    # cross-canonical correlations vanish: a_i' Sxy b_j ~ 0 for i != j
    C = m.a @ sxy @ m.b.T
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 1e-7


def test_identical_and_planted_change():
    """Y == X → all-zero MAD planes and χ² == 0; a planted offset
    block scores far higher χ² than the unchanged background."""
    X = RNG.uniform(100, 1000, (2, 24, 24))
    m = mad.irmad_np(X, X.copy(), n_iter=0)
    np.testing.assert_allclose(m.rho, 1.0, atol=1e-9)
    planes = mad.mad_np(X, X.copy(), m)
    np.testing.assert_allclose(planes, 0.0, atol=1e-6)
    # planted change
    Y = X + RNG.normal(0, 5, X.shape)
    Y[:, 8:16, 8:16] += 300.0
    m2 = mad.irmad_np(X, Y, n_iter=2)
    p2 = mad.mad_np(X, Y, m2)
    chi2 = p2[-1]
    block = chi2[8:16, 8:16].mean()
    bg = np.concatenate([chi2[:8].ravel(), chi2[16:].ravel()]).mean()
    assert block > 10 * bg
    # iteration sharpens: background no-change probability mass grows
    m0 = mad.irmad_np(X, Y, n_iter=0)
    assert m2.n_eff < m0.n_eff  # weights < 1 somewhere
    # NaN propagation: a hole in either side is NaN in every plane
    Xh = X.copy()
    Xh[0, 3, 4] = np.nan
    ph = mad.mad_np(Xh, Y, m2)
    assert np.isnan(ph[:, 3, 4]).all()
    assert np.isfinite(ph[:, 3, 5]).all()


def test_chi2_invariance_under_linear_transform():
    """The χ² change plane is invariant when one side is re-expressed
    in different band units (per-band affine) — the multivariate
    property diff/ratio change maps lack."""
    X = RNG.uniform(0, 100, (3, 16, 16))
    Y = X + RNG.normal(0, 3, X.shape)
    m1 = mad.irmad_np(X, Y, n_iter=0)
    Y2 = Y * np.array([2.0, 0.5, 7.0]).reshape(-1, 1, 1) + \
        np.array([100.0, -40.0, 3.0]).reshape(-1, 1, 1)
    m2 = mad.irmad_np(X, Y2, n_iter=0)
    c1 = mad.mad_np(X, Y, m1)[-1]
    c2 = mad.mad_np(X, Y2, m2)[-1]
    np.testing.assert_allclose(c1, c2, rtol=1e-5, atol=1e-7)


def test_degenerate_guards():
    X = np.full((2, 8, 8), 7.0)  # constant band -> singular
    Y = RNG.uniform(0, 1, (2, 8, 8))
    with pytest.raises(ValueError, match="singular"):
        mad.irmad_np(X, Y, n_iter=0)
    with pytest.raises(ValueError, match="n_iter"):
        mad.fit_irmad(None, None, n_iter=-1)


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
    """Distributed fit over 2x2 tiles (with nodata holes) must equal
    irmad_np replaying the same per-tile quantization; the applied
    tile map must equal mad_np on the mosaic byte-for-byte through
    the rawf32/-9999 round trip; resharding must not move a bit."""
    zone, res, w, h = 70, 3, 8, 8
    G1 = np.round(RNG.uniform(1, 60000, (2, 2 * h, 2 * w)))
    G2 = np.round(np.clip(
        G1 + RNG.normal(0, 500, G1.shape), 1, 60000))
    G2[:, 4:8, 4:8] = np.round(RNG.uniform(1, 60000, (2, 4, 4)))
    holes = RNG.random(G1.shape[1:]) < 0.05
    G1[:, holes] = 0.0
    left = spark.createDataFrame(
        pd.DataFrame(_tile_rows(G1, zone, res, w, h)), TILE_SCHEMA)
    right = spark.createDataFrame(
        pd.DataFrame(_tile_rows(G2, zone, res, w, h)), TILE_SCHEMA)
    F1 = G1.astype(np.float64)
    F1[F1 == 0] = np.nan
    F2 = G2.astype(np.float64)
    F2[F2 == 0] = np.nan
    wins = [(iy * h, (iy + 1) * h, ix * w, (ix + 1) * w)
            for ix in range(2) for iy in range(2)]
    want = mad.irmad_np(F1, F2, n_iter=1, tiles=wins)
    out, got = mad.irmad(left, right, n_iter=1)
    np.testing.assert_allclose(got.mu, want.mu, rtol=1e-9)
    np.testing.assert_allclose(got.rho, want.rho, rtol=1e-9)
    np.testing.assert_allclose(got.a, want.a, rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(got.b, want.b, rtol=1e-7, atol=1e-12)
    # apply parity through the storage round trip, with the SAME model
    zmap = mad.mad_np(F1, F2, got)
    rows = {r.cell_id: r for r in out.collect()}
    for ix in range(2):
        for iy in range(2):
            cid = int(cells.encode_np(zone, res, ix, iy))
            r = rows[cid]
            assert r.fmt == "rawf32" and r.nodata == -9999.0
            dec = codec.decode(r.bytes, w, h, "rawf32")
            assert dec.shape[0] == 3  # 2 MADs + chi2
            exp = zmap[:, iy * h:(iy + 1) * h,
                       ix * w:(ix + 1) * w].astype(np.float32)
            exp = np.where(np.isnan(exp), np.float32(-9999.0), exp)
            np.testing.assert_array_equal(dec, exp)
    # bit-exact reshard invariance (decimal partials)
    m7 = mad.fit_irmad(left.repartition(7), right.repartition(5),
                       n_iter=1)
    assert (m7.rho == got.rho).all() and (m7.a == got.a).all()
    # cache path agrees too
    mc = mad.fit_irmad(left, right, n_iter=1, cache=True)
    assert (mc.rho == got.rho).all()
    with pytest.raises(ValueError, match="empty"):
        mad.fit_irmad(left.filter("cell_id < 0"), right, n_iter=0)
    with pytest.raises(ValueError, match="missing column"):
        mad.fit_irmad(left.drop("nodata"), right)


def _np_weighted_radcal(F1, F2, wins, n_iter):
    """Driver replay of fit_radcal: irmad fit (per-tile quantized)
    then one weighted moments pass through the same blocks."""
    m = mad.irmad_np(F1, F2, n_iter=n_iter, tiles=wins)
    acc = None
    for (y0, y1, x0, x1) in wins:
        blk = mad.pair_moments_np(F1[:, y0:y1, x0:x1],
                                  F2[:, y0:y1, x0:x1], m)
        acc = blk if acc is None else acc + blk
    nb = F1.shape[0]
    nb2 = 2 * nb
    s0 = acc[0]
    s1 = acc[1:1 + nb2]
    s2 = np.zeros((nb2, nb2))
    iu = np.triu_indices(nb2)
    s2[iu] = acc[1 + nb2:]
    s2 = s2 + np.triu(s2, 1).T
    return mad.solve_radcal(s0, s1, s2, nb), m


def test_radcal_exact_affine():
    """Y = 2X + 100 exactly → gains 2 / offsets 100 recovered to
    machine precision and the corrected Y equals X."""
    X = RNG.uniform(100, 5000, (3, 16, 16))
    Y = 2.0 * X + 100.0
    wins = [(0, 16, 0, 16)]
    rc, _m = _np_weighted_radcal(X, Y, wins, n_iter=0)
    np.testing.assert_allclose(rc.gain, 2.0, rtol=1e-9)
    np.testing.assert_allclose(rc.offset, 100.0, rtol=1e-6)
    np.testing.assert_allclose(rc.corr, 1.0, rtol=1e-9)
    np.testing.assert_allclose(mad.radcal_np(Y, rc), X, rtol=1e-9)


def test_radcal_change_robustness():
    """A planted change block must not drag the gain: the IR-MAD
    weighted fit stays near the true affine while the unweighted
    (all-pixels) orthogonal regression drifts visibly further."""
    X = np.round(RNG.uniform(500, 5000, (2, 32, 32)))
    Y = 1.5 * X + 50.0 + RNG.normal(0, 10, X.shape)
    Y[:, 8:24, 8:24] += 4000.0  # 25% of pixels changed
    wins = [(0, 32, 0, 32)]
    rc, _ = _np_weighted_radcal(X, Y, wins, n_iter=3)
    # unweighted twin: moments with no model (weights = 1)
    blk = mad.pair_moments_np(X, Y, None)
    nb2 = 4
    s2 = np.zeros((nb2, nb2))
    iu = np.triu_indices(nb2)
    s2[iu] = blk[1 + nb2:]
    s2 = s2 + np.triu(s2, 1).T
    naive = mad.solve_radcal(blk[0], blk[1:1 + nb2], s2, 2)
    err_w = np.abs(rc.gain - 1.5).max()
    err_n = np.abs(naive.gain - 1.5).max()
    assert err_w < 0.05
    assert err_w < err_n / 2


def test_radcal_distributed(spark):
    """Distributed fit_radcal ≡ the driver replay; the applied
    normalization is byte-exact vs radcal_np through the
    rawf32/-9999 round trip; degenerate correlation raises."""
    zone, res, w, h = 70, 3, 8, 8
    G1 = np.round(RNG.uniform(500, 50000, (2, 2 * h, 2 * w)))
    G2 = np.round(np.clip(1.2 * G1 + 300.0
                          + RNG.normal(0, 200, G1.shape), 1, 60000))
    left = spark.createDataFrame(
        pd.DataFrame(_tile_rows(G1, zone, res, w, h)), TILE_SCHEMA)
    right = spark.createDataFrame(
        pd.DataFrame(_tile_rows(G2, zone, res, w, h)), TILE_SCHEMA)
    F1 = G1.astype(np.float64)
    F2 = G2.astype(np.float64)
    wins = [(iy * h, (iy + 1) * h, ix * w, (ix + 1) * w)
            for ix in range(2) for iy in range(2)]
    want, _wm = _np_weighted_radcal(F1, F2, wins, n_iter=1)
    out, rc, _mm = mad.radcal(left, right, n_iter=1)
    np.testing.assert_allclose(rc.gain, want.gain, rtol=1e-7)
    np.testing.assert_allclose(rc.offset, want.offset, rtol=1e-5)
    assert abs(rc.gain[0] - 1.2) < 0.05
    zmap = mad.radcal_np(F2, rc)
    rows = {r.cell_id: r for r in out.collect()}
    for ix in range(2):
        for iy in range(2):
            cid = int(cells.encode_np(zone, res, ix, iy))
            r = rows[cid]
            assert r.fmt == "rawf32" and r.nodata == -9999.0
            dec = codec.decode(r.bytes, w, h, "rawf32")
            exp = zmap[:, iy * h:(iy + 1) * h,
                       ix * w:(ix + 1) * w].astype(np.float32)
            np.testing.assert_array_equal(dec, exp)
    # degenerate (constant) side -> loud refusal (no usable
    # correlation to calibrate on; surfaces as the singular-covariance
    # guard inside the shared IR-MAD fit)
    G3 = np.full(G1.shape, 777.0)
    other = spark.createDataFrame(
        pd.DataFrame(_tile_rows(G3, zone, res, w, h)), TILE_SCHEMA)
    with pytest.raises(ValueError, match="radcal band|singular"):
        mad.fit_radcal(left, other, n_iter=0)
    # the per-band guard itself: zero cross-covariance moments
    s2z = np.diag([1.0, 1.0, 1.0, 1.0])
    with pytest.raises(ValueError, match="radcal band"):
        mad.solve_radcal(1.0, np.zeros(4), s2z, 2)
