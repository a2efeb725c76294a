"""Periodic gap-filling: per-cell naive-loop parity, fill semantics
(nodata borrows the nearest preceding period; leading gaps need
backfill), metadata passthrough, and the budget guard."""

from __future__ import annotations

import numpy as np
import pytest

from vrtility_spark import codec, composite, datagen, timeseries, warp


@pytest.fixture(scope="module")
def quarterly(spark, tiny_images):
    df = warp.assign_cells(tiny_images, datagen.TILE_RES)
    from vrtility_spark import masks
    fn = masks.make_scene_maskfun("int", datagen.S2_MASK_VALUES)
    return composite.composite_by_period(
        df, "median", period="quarter", scene_fn=fn).cache()


def _tiles(rows):
    out = {}
    for r in rows:
        nd = np.asarray(r.band_nodata, dtype=np.float64)
        arr = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), nd)
        out[(r.cell_id, r.period)] = (arr, r)
    return out


def test_gapfill_matches_naive_loop(spark, quarterly):
    before = _tiles(quarterly.collect())
    after = _tiles(timeseries.gapfill_periods(quarterly).collect())
    assert before.keys() == after.keys()
    cells = {c for c, _ in before}
    filled_somewhere = False
    for c in cells:
        periods = sorted(p for cc, p in before if cc == c)
        prev = None
        for p in periods:
            b, a = before[(c, p)][0], after[(c, p)][0]
            want = b.copy()
            if prev is not None:
                gap = np.isnan(want)
                want[gap] = prev[gap]
            # naive expectation: this period's value, else carried one
            np.testing.assert_array_equal(
                np.where(np.isnan(a), -1.0, a),
                np.where(np.isnan(want), -1.0, want))
            if prev is not None and np.isnan(b).any():
                filled_somewhere = filled_somewhere or (
                    np.isnan(b) & ~np.isnan(a)).any()
            prev = want  # carried values keep propagating
    # the fixture's masked quarters must actually exercise the fill
    assert filled_somewhere


def test_gapfill_leading_gaps_and_backfill(spark, quarterly):
    before = _tiles(quarterly.collect())
    fwd = _tiles(timeseries.gapfill_periods(quarterly).collect())
    both = _tiles(timeseries.gapfill_periods(
        quarterly, backfill=True).collect())
    cells = {c for c, _ in before}
    for c in cells:
        periods = sorted(p for cc, p in before if cc == c)
        first = periods[0]
        b0, f0 = before[(c, first)][0], fwd[(c, first)][0]
        # forward-only: the first period can never gain pixels
        np.testing.assert_array_equal(np.isnan(b0), np.isnan(f0))
        # backfill: a leading gap with ANY later observation fills
        later = np.zeros_like(b0, dtype=bool)
        for p in periods[1:]:
            later |= ~np.isnan(before[(c, p)][0])
        expect_nan = np.isnan(b0) & ~later
        assert (np.isnan(both[(c, first)][0]) == expect_nan).all()


def test_gapfill_passthrough_and_order(spark, quarterly):
    got = {(r.cell_id, r.period): r
           for r in timeseries.gapfill_periods(quarterly).collect()}
    for r in quarterly.collect():
        g = got[(r.cell_id, r.period)]
        assert g.n_scenes == r.n_scenes
        assert g.caption_agg == r.caption_agg
        assert g.datetime_median == r.datetime_median
        assert (g.w, g.h, g.fmt) == (r.w, r.h, r.fmt)


def test_gapfill_budget_guard(spark, quarterly):
    with pytest.raises(Exception, match="max_stack_bytes"):
        timeseries.gapfill_periods(quarterly, max_stack_bytes=64).collect()


def test_gapfill_pipeline_verb_and_bundle(spark, tiny_images, tmp_path):
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite_period("median", period="quarter")
         .gapfill())
    n = p.df.count()
    assert n > 0
    path = str(tmp_path / "b.json")
    p.to_bundle(path)
    assert Pipeline.from_bundle(path, tiny_images).df.count() == n
