"""Spectral unmixing: the shared normal-equation operator equals the
SVD pseudoinverse, the vectorized kernel matches a per-pixel lstsq
loop, clip/renorm behave as the documented projection, NaN and
sentinel plumbing hold through the distributed map, and the Pipeline
verb bundles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, unmix

RNG = np.random.default_rng(11)

ZONE, RES = 70, 3
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")

E4 = np.asarray(unmix.EXAMPLE_ENDMEMBERS)  # (4, 3)


def test_unmix_matrix_equals_pinv():
    for seed in (0, 1, 2):
        E = np.random.default_rng(seed).uniform(100, 5000, (6, 4))
        np.testing.assert_allclose(unmix.unmix_matrix(E),
                                   np.linalg.pinv(E), rtol=1e-9)
    # rank-deficient (duplicate endmember) must raise, not emit noise
    Ebad = np.column_stack([E4[:, 0], E4[:, 0], E4[:, 1]])
    with pytest.raises(ValueError, match="rank-deficient"):
        unmix.unmix_matrix(Ebad)
    with pytest.raises(ValueError, match="underdetermined"):
        unmix.unmix_matrix(np.ones((2, 3)))


def test_unmix_np_matches_per_pixel_lstsq_loop():
    A = RNG.uniform(0, 12000, (4, 7, 5))
    A[:, 2, 3] = np.nan          # fully invalid pixel
    A[1, 4, 4] = np.nan          # single-band hole → pixel invalid
    out = unmix.unmix_np(A, E4, clip=False, renorm=False)
    assert out.shape == (4, 7, 5)
    for y in range(7):
        for x in range(5):
            p = A[:, y, x]
            if not np.isfinite(p).all():
                assert np.isnan(out[:, y, x]).all()
                continue
            f, *_ = np.linalg.lstsq(E4, p, rcond=None)
            np.testing.assert_allclose(out[:3, y, x], f, rtol=1e-8)
            r = E4 @ f - p
            np.testing.assert_allclose(out[3, y, x],
                                       np.sqrt(np.mean(r * r)),
                                       rtol=1e-8, atol=1e-12)


def test_clip_renorm_projection_properties():
    A = RNG.uniform(-2000, 15000, (4, 6, 6))  # negatives force clipping
    out = unmix.unmix_np(A, E4, clip=True, renorm=True)
    fr = out[:3].reshape(3, -1)
    assert np.nanmin(fr) >= 0.0
    s = fr.sum(axis=0)
    ok = s > 0
    np.testing.assert_allclose(s[ok], 1.0, rtol=1e-12)
    # rmse reflects the EMITTED (projected) fractions, so it is >= the
    # unconstrained residual
    un = unmix.unmix_np(A, E4, clip=False)
    assert np.all(out[3] >= un[3] - 1e-9)
    # pure endmember pixels recover the unit vertex exactly
    P = np.stack([np.tile(E4[:, k, None, None], (1, 2, 2))
                  for k in range(3)], axis=0)
    for k in range(3):
        o = unmix.unmix_np(P[k], E4)
        want = np.zeros(3)
        want[k] = 1.0
        np.testing.assert_allclose(o[:3, 0, 0], want, atol=1e-9)
        np.testing.assert_allclose(o[3], 0.0, atol=1e-6)


def test_band_count_mismatch_raises():
    with pytest.raises(ValueError, match="bands"):
        unmix.unmix_np(np.zeros((3, 2, 2)), E4)


def _tile_rows(positions, seed, nodata=0.0, h=8, w=8):
    rng = np.random.default_rng(seed)
    rows, arrs = [], {}
    for ix, iy in positions:
        arr = np.round(rng.uniform(1, 12000, size=(4, h, w)))
        arr[rng.random(arr.shape) < 0.1] = nodata
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), "raw16"),
                     "w": w, "h": h, "fmt": "raw16", "nodata": nodata})
        A = arr.astype(np.float64)
        A[A == nodata] = np.nan
        arrs[cid] = A
    return rows, arrs


def test_distributed_unmix_matches_kernel_and_never_shuffles(spark):
    rows, arrs = _tile_rows([(0, 0), (1, 0), (0, 1)], seed=5)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out_df = unmix.unmix(df, E4)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle narrow map
    out = {r.cell_id: r for r in out_df.collect()}
    assert set(out) == set(arrs)
    for cid, r in out.items():
        assert r.fmt == "rawf32" and r.nodata == -9999.0
        got = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        want = unmix.unmix_np(arrs[cid], E4).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True)
    # eager driver-side validation: no job runs for a bad matrix
    with pytest.raises(ValueError, match="rank-deficient"):
        unmix.unmix(df, np.ones((4, 2)))


def test_pipeline_verb_and_bundle_roundtrip(spark, tiny_images, tmp_path):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline

    def run(p):
        return (p.set_maskfun("int", datagen.S2_MASK_VALUES)
                .warp(cell_res=datagen.TILE_RES)
                .composite("median")
                .unmix(E4.tolist(), bands=(0, 1, 2, 3)))

    ran = run(Pipeline(tiny_images))
    rows = {r.cell_id: r for r in ran.df.collect()}
    assert len(rows) == 12
    one = next(iter(rows.values()))
    dec = codec.decode(one.bytes, one.w, one.h, one.fmt)
    assert dec.shape[0] == 4  # 3 fractions + rmse
    path = str(tmp_path / "unmix_bundle.json")
    ran.to_bundle(path)
    replay = {r.cell_id: r for r in
              Pipeline.from_bundle(path, tiny_images).df.collect()}
    assert set(replay) == set(rows)
    for cid in rows:
        assert replay[cid].bytes == rows[cid].bytes
