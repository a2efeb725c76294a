"""Composable pipeline facade — the ``vrt_*`` verb chain, Spark-first.

The reference composes lazy VRT XML documents
(``vrt_collect |> vrt_set_maskfun |> vrt_warp |> vrt_stack |>
vrt_set_py_pixelfun |> vrt_compute``, /root/reference/README.md:136-150).
Here the lazy IR is Catalyst's logical plan: every verb is a DataFrame
transformation; ``compute()`` is the single action. There is no VRT
cache directory — lineage *is* the nested-VRT tree (SURVEY.md §1.1) —
and no one-pixfun-per-band limit (R/vrt-tools.R:116-127 is a GDAL
constraint we deliberately relax).

Masking is recorded LAZILY and fused into the next grouped reducer
(composite), mirroring how the reference's nested VRT evaluates
mask ∘ composite per block in one read
(R/gdalraster-async.r:99-112) instead of materializing a masked copy.
Verbs that need the masked payload itself (band math, warp-to-grid,
time-series ops, a plain ``compute``) flush the pending masks as an
explicit pass first, preserving eager semantics exactly.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import composite as _composite
from vrtility_spark import focal as _focal
from vrtility_spark import join as _join
from vrtility_spark import masks as _masks
from vrtility_spark import overviews as _overviews
from vrtility_spark import timeseries as _ts
from vrtility_spark import warp as _warp


class Pipeline:
    """Chainable wrapper over an images DataFrame.

    >>> (Pipeline(images_df)
    ...   .cloud_filter(40)
    ...   .set_maskfun("int", [0,1,2,3,8,9,10,11], buffer_size=1)
    ...   .warp(cell_res=4, out_w=32, out_h=32)
    ...   .composite("median")
    ...   .compute("/tmp/out"))
    """

    #: verbs whose params cannot be serialized into a bundle
    _UNBUNDLEABLE = object()

    #: transformation verbs a bundle may replay (sinks and file-writing
    #: methods are deliberately absent)
    _BUNDLE_VERBS = frozenset([
        "cloud_filter", "orbit_filter", "drop_duplicates", "date_range",
        "quality_filter",
        "set_maskfun", "create_mlmask", "subset_bands", "derived_band",
        "thin",
        "set_scale", "reproject", "warp", "regrid", "feather",
        "composite",
        "composite_period", "trend", "mk_trend", "break_detect",
        "harmonic", "gapfill",
        "hampel", "savgol", "whittaker", "decompose", "split_cells",
        "focal",
        "morphology", "sieve",
        "proximity", "fillnodata", "chips", "overview_level",
        "overviews", "terrain", "texture", "color_relief", "stretch",
        "classify", "kmeans", "flow_accumulation", "fill_sinks",
        "basins", "stream_order", "flow_length",
        "upstream_flow_length", "twi", "cloud_shadow",
        "unmix", "hotspots",
        "local_moran", "cost_distance", "auto_threshold",
        "allocation"])

    def __init__(self, df: DataFrame, mask_specs: tuple = (),
                 log: tuple = (), mask_dropped: bool = False):
        self._df = df
        # pending lazy masks: (maskfun, values, buffer_size, drop)
        self._mask_specs = tuple(mask_specs)
        # verb chain: (verb_name, json_params | _UNBUNDLEABLE) — the
        # serialized-plan twin of the reference's vrt_save/vrt_bundle
        # (R/vrt-save.R:51-109, R/vrt-bundle.R:19-143)
        self._log = tuple(log)
        # sticky: a drop_mask_band spec leaves the payload WITHOUT a
        # trailing class plane even after the spec is flushed — later
        # mask_plane defaults must remember that, not just consult the
        # pending (unflushed) specs
        self._mask_dropped = bool(mask_dropped) or any(
            s[3] for s in self._mask_specs)

    def _next(self, df: DataFrame, mask_specs, verb: str, params):
        return Pipeline(df, mask_specs, self._log + ((verb, params),),
                        self._mask_dropped)

    @property
    def df(self) -> DataFrame:
        """The underlying DataFrame, with any pending masks applied."""
        return self._flushed()._df

    def _flushed(self) -> "Pipeline":
        if not self._mask_specs:
            return self
        df = self._df
        for spec in self._mask_specs:
            df = _masks.vrt_set_maskfun(df, *spec)
        return Pipeline(df, (), self._log, self._mask_dropped)

    def _scene_fn(self):
        if not self._mask_specs:
            return None
        return _masks.chain_scene_fns(
            [_masks.make_scene_maskfun(*s) for s in self._mask_specs])

    # ------------------------------------------------ filters (P3-P6)
    def cloud_filter(self, max_cloud: float) -> "Pipeline":
        return self._next(_join.cloud_filter(self._df, max_cloud),
                          self._mask_specs, "cloud_filter",
                          {"max_cloud": max_cloud})

    def quality_filter(self, min_entropy: float | None = None,
                       min_blur_var: float | None = None,
                       max_dark_frac: float | None = None,
                       max_bright_frac: float | None = None,
                       min_valid_frac: float | None = None,
                       lo: float = 0.0, hi: float = 65535.0,
                       clip_frac: float = 0.02,
                       bands=None) -> "Pipeline":
        """Content-based curation gate (imagestats.quality_filter):
        keep scenes where EVERY gated band passes every threshold —
        blur (variance of Laplacian), entropy, exposure clipping,
        footprint validity. ``bands`` selects the gated planes (gate
        the data bands, not the low-entropy QA/mask plane). One
        zero-shuffle stats pass + a semi join; runs BEFORE
        warp/composite so every downstream stage sees a smaller
        corpus. Bundleable."""
        from vrtility_spark import imagestats as _imagestats
        params = {"min_entropy": min_entropy,
                  "min_blur_var": min_blur_var,
                  "max_dark_frac": max_dark_frac,
                  "max_bright_frac": max_bright_frac,
                  "min_valid_frac": min_valid_frac,
                  "lo": lo, "hi": hi, "clip_frac": clip_frac,
                  "bands": None if bands is None
                  else [int(b) for b in bands]}
        return self._next(
            _imagestats.quality_filter(self._df, **params),
            self._mask_specs, "quality_filter", params)

    def orbit_filter(self, states: Sequence[str]) -> "Pipeline":
        return self._next(_join.orbit_filter(self._df, states),
                          self._mask_specs, "orbit_filter",
                          {"states": list(states)})

    def drop_duplicates(self) -> "Pipeline":
        return self._next(_join.drop_duplicates_stac(self._df),
                          self._mask_specs, "drop_duplicates", {})

    def date_range(self, start, end) -> "Pipeline":
        return self._next(
            self._df.where(F.col("datetime").between(start, end)),
            self._mask_specs, "date_range",
            {"start": str(start), "end": str(end)})

    # -------------------------------------------------- masking (P7-P11)
    def set_maskfun(self, maskfun: str, mask_values, buffer_size: int = 0,
                    drop_mask_band: bool = False) -> "Pipeline":
        assert maskfun in ("int", "bit")
        spec = (maskfun, tuple(int(v) for v in mask_values),
                int(buffer_size), bool(drop_mask_band))
        return self._next(self._df, self._mask_specs + (spec,),
                          "set_maskfun",
                          {"maskfun": maskfun,
                           "mask_values": [int(v) for v in mask_values],
                           "buffer_size": int(buffer_size),
                           "drop_mask_band": bool(drop_mask_band)})

    def create_mlmask(self, bands=("B04", "B03", "B08"),
                      model: str = "fake") -> "Pipeline":
        from vrtility_spark.mlmask import create_mlmask
        params = ({"bands": list(bands), "model": model}
                  if isinstance(model, str) else self._UNBUNDLEABLE)
        return self._next(create_mlmask(self.df, bands, model), (),
                          "create_mlmask", params)

    # ------------------------------------------- band ops (P2/O5-O7/F1-F3)
    def subset_bands(self, keep) -> "Pipeline":
        from vrtility_spark import bands as _b
        return self._next(_b.subset_bands(self.df, keep), (),
                          "subset_bands", {"keep": list(keep)})

    def derived_band(self, name, formula, replace=False,
                     keep_mask_plane: bool | None = None) -> "Pipeline":
        from vrtility_spark import bands as _b
        if keep_mask_plane is None:  # dropped-mask payloads have no QA plane
            keep_mask_plane = not self._mask_dropped
        expr = formula if isinstance(formula, str) \
            else getattr(formula, "expr", None)
        params = ({"name": name, "formula": expr, "replace": bool(replace),
                   "keep_mask_plane": bool(keep_mask_plane)}
                  if expr is not None else self._UNBUNDLEABLE)
        return self._next(_b.derived_band(self.df, name, formula, replace,
                                          keep_mask_plane), (),
                          "derived_band", params)

    def spectral_index(self, index: str, name: str | None = None,
                       replace: bool = False, **roles: str) -> "Pipeline":
        """Append a named spectral index (bands.SPECTRAL_INDICES —
        NDVI/EVI/NBR/NDWI/SAVI/…) by mapping its band roles onto this
        collection's band names: ``.spectral_index("ndvi", nir="B08",
        red="B04")``.  Logs as a plain derived_band verb (the rendered
        formula string), so bundles replay it with zero extra
        machinery."""
        from vrtility_spark import bands as _b
        return self.derived_band(name or index,
                                 _b.index_formula(index, **roles),
                                 replace=replace)

    def set_scale(self, scale, offset=0.0) -> "Pipeline":
        from vrtility_spark import bands as _b
        to_j = (lambda v: v if np.isscalar(v) else list(v))
        return self._next(_b.set_scale(self.df, scale, offset), (),
                          "set_scale",
                          {"scale": to_j(scale), "offset": to_j(offset)})

    # ------------------------------------------------------- warp (J1/J5)
    def reproject(self, target_zone: int) -> "Pipeline":
        """Unify a mixed-zone collection onto one zone's frame (the
        reference's cross-CRS vrt_warp step, R/vrt-warp.R:34-246) —
        metadata-only Column arithmetic, so pending lazy masks commute."""
        return self._next(_warp.reproject_zone(self._df, target_zone),
                          self._mask_specs, "reproject",
                          {"target_zone": int(target_zone)})

    def warp(self, cell_res: int, out_w: int | None = None,
             out_h: int | None = None, resampling: str = "bilinear",
             prefix_k: int = 2, mask_plane: bool | None = None) -> "Pipeline":
        params = {"cell_res": cell_res, "out_w": out_w, "out_h": out_h,
                  "resampling": resampling, "prefix_k": prefix_k,
                  "mask_plane": mask_plane}
        if out_w is not None:
            # resampling reads pixels: masks must land before the kernel.
            # If a recorded mask spec dropped the mask band, the last
            # plane is DATA — don't force it to nearest
            if mask_plane is None:
                mask_plane = not self._mask_dropped
            df = _warp.assign_cells(self.df, cell_res, prefix_k)
            return self._next(
                _warp.warp_to_grid(df, out_w, out_h or out_w,
                                   resampling, mask_plane),
                (), "warp", params)
        # cell assignment is metadata-only — pending masks commute
        return self._next(_warp.assign_cells(self._df, cell_res, prefix_k),
                          self._mask_specs, "warp", params)

    def regrid(self, cell_res: int, out_w: int, out_h: int | None = None,
               resampling: str | dict = "bilinear", prefix_k: int = 2,
               mask_plane: bool | None = None) -> "Pipeline":
        """General warp: ARBITRARY scene footprints → one aligned,
        sentinel-padded tile per covering cell (the full vrt_warp
        target-grid normalization; use :meth:`warp` when footprints
        already tile the grid). Pending masks FUSE into the regrid's
        decode pass (one Arrow stage, no materialized masked copy).

        Caption provenance: a scene straddling N cells contributes its
        caption to each of those N cells — a later
        :meth:`composite`'s ``caption_agg`` lists the scene once PER
        CELL it feeds pixels into (per-cell provenance), not once
        globally (see ``warp.regrid_to_cells`` and
        tests/test_regrid.py::test_straddling_scene_splits_into_padded_tiles)."""
        if mask_plane is None:
            mask_plane = not self._mask_dropped
        return self._next(
            _warp.regrid_to_cells(self._df, cell_res, out_w,
                                  out_h or out_w, resampling,
                                  mask_plane, prefix_k,
                                  scene_fn=self._scene_fn()),
            (), "regrid",
            {"cell_res": cell_res, "out_w": out_w, "out_h": out_h,
             "resampling": resampling, "prefix_k": prefix_k,
             "mask_plane": mask_plane})

    # -------------------------------------------------- spatial (J4-J6)
    def feather(self, cell_res: int, out_w: int, out_h: int | None = None,
                cap_px: float = 8.0,
                resampling: str | dict = "bilinear") -> "Pipeline":
        """Feathered mosaic (feather.feather_mosaic): regrid arbitrary
        footprints onto the cell grid and blend overlapping scenes
        with analytic distance-to-footprint-edge weights clipped to
        ``cap_px`` — seams become cap_px-wide ramps instead of hard
        switches; interior pixels blend with equal weights (plain
        mean). One cover explode + narrow Arrow map + ONE cell-keyed
        grouped blend (the composite shuffle). Pending masks fuse into
        the regrid decode; output is COMPOSITE_SCHEMA."""
        from vrtility_spark import feather as _feather
        return self._next(
            _feather.feather_mosaic(
                self._df, cell_res, out_w, out_h,
                cap_px=float(cap_px), resampling=resampling,
                scene_fn=self._scene_fn(),
                mask_plane=not self._mask_dropped),
            (), "feather",
            {"cell_res": cell_res, "out_w": out_w, "out_h": out_h,
             "cap_px": float(cap_px), "resampling": resampling})

    def intersecting(self, aoi: DataFrame, **kw) -> "Pipeline":
        return self._next(_join.spatial_semi_join(self._df, aoi, **kw),
                          self._mask_specs, "intersecting",
                          self._UNBUNDLEABLE)

    # -------------------------------------------------- reduce (A1-A13)
    def thin(self, n: int, period: str | None = None,
             seed: int = 0) -> "Pipeline":
        """Deterministic scene thinning: keep at most ``n`` scenes per
        cell (per calendar ``period`` — "month"/"quarter"/"year" — when
        given), chosen by content hash with image_id tiebreak
        (sampling.stratified_sample_n). Dense-revisit cells otherwise
        dominate composite cost for no statistical gain; hash-range
        membership keeps the kept set reshard/retry/append-proof.
        Requires cells assigned (:meth:`warp` first)."""
        from vrtility_spark import sampling as _sampling
        if "cell_id" not in self._df.columns:
            raise ValueError("thin() needs cell_id — warp() first")
        df = self._df
        strata = ["cell_id"]
        if period is not None:
            trunc = {"month": "month", "quarter": "quarter",
                     "year": "year"}
            if period not in trunc:
                raise KeyError(f"unknown period {period!r}; "
                               "month | quarter | year")
            df = df.withColumn(
                "_thin_period",
                F.date_trunc(trunc[period], F.col("datetime")))
            strata = ["cell_id", "_thin_period"]
        out = _sampling.stratified_sample_n(
            df, strata, int(n), ["image_id"], seed=int(seed),
            rank_col="_thin_rk") \
            .drop("_thin_rk", "_thin_period")
        return self._next(out, self._mask_specs, "thin",
                          {"n": int(n), "period": period,
                           "seed": int(seed)})

    def composite(self, reducer="median", mode: str = "auto",
                  max_stack_bytes: int | None = None) -> "Pipeline":
        """Temporal composite. ``mode``/``max_stack_bytes`` carry the
        memory policy (composite.MAX_STACK_BYTES default) into bundles
        so a replayed plan keeps its RAM budget.

        ``caption_agg`` provenance: the rollup is PER CELL — after a
        :meth:`regrid`, a scene straddling N cells appears in up to N
        cells' caption lists (it fed pixels into each); dedupe across
        cells only if a corpus-global list is wanted. Capped at
        composite.CAPTION_CAP entries plus an overflow count."""
        params = ({"reducer": reducer, "mode": mode,
                   "max_stack_bytes": max_stack_bytes}
                  if isinstance(reducer, str) else self._UNBUNDLEABLE)
        kw = {} if max_stack_bytes is None else \
            {"max_stack_bytes": max_stack_bytes}
        return self._next(_composite.composite(self._df, reducer,
                                               scene_fn=self._scene_fn(),
                                               mode=mode, **kw),
                          (), "composite", params)

    def composite_period(self, reducer="median", period: str = "month",
                         mode: str = "auto") -> "Pipeline":
        """Periodic composites (composite.composite_by_period): one
        composite per (cell, calendar period) — monthly/quarterly/
        annual mosaics in ONE scan and one shuffle (the period folds
        into the group key; no per-period re-scan loop). Output adds a
        ``period`` string column. Masks fuse in exactly as for
        :meth:`composite`."""
        params = ({"reducer": reducer, "period": period, "mode": mode}
                  if isinstance(reducer, str) else self._UNBUNDLEABLE)
        return self._next(
            _composite.composite_by_period(self._df, reducer,
                                           period=period,
                                           scene_fn=self._scene_fn(),
                                           mode=mode),
            (), "composite_period", params)

    def gapfill(self, backfill: bool = False) -> "Pipeline":
        """Cloud-gap filling over periodic composites
        (timeseries.gapfill_periods): nodata pixels borrow the nearest
        preceding period's value per pixel (``backfill=True`` also
        fills leading gaps from the following period). Call after
        :meth:`composite_period`; group size is the period count,
        never the scene count."""
        from vrtility_spark import timeseries as _ts
        return self._next(
            _ts.gapfill_periods(self._df, backfill=backfill),
            (), "gapfill", {"backfill": backfill})

    def trend(self, mode: str = "auto") -> "Pipeline":
        """Per-pixel OLS temporal trend (trend.trend): slope (units/
        year), intercept (value at trend.TREND_EPOCH) and valid-
        observation count per (pixel, band), as three planes per input
        band in a ``rawf32`` tile. Masks fuse into the scene decode
        exactly as for :meth:`composite`; the default mode streams
        per-partition sufficient statistics and shuffles only
        fixed-size partials (never a scene stack)."""
        from vrtility_spark import trend as _trend
        return self._next(
            _trend.trend(self._df, scene_fn=self._scene_fn(), mode=mode),
            (), "trend", {"mode": mode})

    def break_detect(self, min_seg: int = 3) -> "Pipeline":
        """Per-pixel structural break detection (breaks.breaks_stack):
        single most-likely breakpoint by piecewise OLS — break_t
        (years since trend.TREND_EPOCH), magnitude (level shift at the
        break), score (1 − SSE_split/SSE_null) and n_obs, four planes
        per input band in a ``rawf32`` tile — the change-DETECTION
        twin of :meth:`trend`. The candidate search needs per-scene
        prefixes, so this is a grouped-stack (holistic) operator with
        the composite RAM guard; masks fuse into the scene decode."""
        from vrtility_spark import breaks as _breaks
        return self._next(
            _breaks.breaks_stack(self._df, min_seg=int(min_seg),
                                 scene_fn=self._scene_fn()),
            (), "break_detect", {"min_seg": int(min_seg)})

    def mk_trend(self) -> "Pipeline":
        """Per-pixel Mann–Kendall trend test + Theil–Sen slope
        (mktrend.mk_trend): sen (units/year), Kendall tau, tie-corrected
        normal score z and valid-observation count per (pixel, band), as
        four planes per input band in a ``rawf32`` tile — the
        non-parametric, outlier-robust twin of :meth:`trend`. Rank
        statistics have no fixed-size per-scene partial, so this is a
        grouped-stack (holistic) operator with the same RAM guard as
        geomedian; masks fuse into the scene decode."""
        from vrtility_spark import mktrend as _mk
        return self._next(
            _mk.mk_trend(self._df, scene_fn=self._scene_fn()),
            (), "mk_trend", {})

    def harmonic(self, n_harmonics: int = 1, period_years: float = 1.0,
                 mode: str = "auto") -> "Pipeline":
        """Per-pixel harmonic (seasonal) regression
        (harmonic.harmonic): intercept/slope, per-harmonic sin/cos
        coefficients plus amplitude & phase, RMSE and n_obs planes per
        input band in a ``rawf32`` tile. The generalized-basis twin of
        :meth:`trend` (its K=0 case); the default mode streams
        fixed-size normal-equation partials — scenes never stack or
        shuffle."""
        from vrtility_spark import harmonic as _harmonic
        return self._next(
            _harmonic.harmonic(self._df, n_harmonics=int(n_harmonics),
                               period_years=float(period_years),
                               scene_fn=self._scene_fn(), mode=mode),
            (), "harmonic", {"n_harmonics": int(n_harmonics),
                             "period_years": float(period_years),
                             "mode": mode})

    def split_cells(self, k: int = 1) -> "Pipeline":
        """Spatial sub-tiling (composite.split_to_child_cells): scenes
        split into their 4^k child cells so downstream groups shrink
        4^k-fold — the reference's nsplits knob (R/tiling.R:41-64)."""
        return self._next(
            _composite.split_to_child_cells(self.df, k), (),
            "split_cells", {"k": int(k)})

    def focal(self, op: str = "mean", radius: int = 1, weights=None,
              normalize: bool | None = None, fill: bool = False) -> "Pipeline":
        """Spatial focal statistic over a one-row-per-cell tile table
        (typically after :meth:`composite`) with distributed halo
        exchange — neighbor tiles contribute their ``radius``-pixel
        edge strips through one cell-keyed shuffle (focal.focal_filter).
        Pending masks flush first: a focal window must see the masked
        pixels, not the raw payload."""
        w_list = None if weights is None else \
            np.asarray(weights, np.float64).tolist()
        return self._next(
            _focal.focal_filter(self.df, op=op, radius=int(radius),
                                weights=weights, normalize=normalize,
                                fill=fill),
            (), "focal", {"op": op, "radius": int(radius),
                          "weights": w_list, "normalize": normalize,
                          "fill": bool(fill)})

    def morphology(self, op: str = "open", radius: int = 1,
                   shape: str = "square", fill: bool = False) -> "Pipeline":
        """Grayscale/binary morphology (erode/dilate/open/close/gradient/
        tophat/blackhat — morphology.morphology) over a one-row-per-cell
        tile table. Composite ops fuse both stages into ONE halo
        exchange over a ``2r`` strip; the intermediate never leaves the
        worker. Generalizes the reference's buffered-mask dilation (P10,
        R/vrt-set-mask.R) to the full family over any plane. Pending
        masks flush first, same as :meth:`focal`."""
        from vrtility_spark import morphology as _morph
        return self._next(
            _morph.morphology(self.df, op=op, radius=int(radius),
                              shape=shape, fill=fill),
            (), "morphology", {"op": op, "radius": int(radius),
                               "shape": shape, "fill": bool(fill)})

    def chips(self, chip: int = 8, min_valid: float | None = None,
              splits=None, seed: int = 0) -> "Pipeline":
        """Slice tiles into ``chip×chip`` training chips
        (chips.make_chips): one narrow Arrow map, ZERO shuffle — every
        metadata column (incl. caption_agg) rides along, making each
        row an image+caption training pair. ``min_valid`` drops
        mostly-masked chips by their all-bands-valid pixel fraction (a
        plain Catalyst predicate); ``splits`` (e.g. ``{"train": 0.8,
        "val": 0.2}``) adds a deterministic md5 hash-range ``split``
        column on (cell, chip_x, chip_y) via sampling.assign_splits —
        reshard-proof and stable as the corpus grows."""
        from vrtility_spark import chips as _chips
        from vrtility_spark import sampling as _sampling
        out = _chips.make_chips(self.df, chip=int(chip))
        if min_valid is not None:
            out = out.filter(F.col("valid_frac") >= float(min_valid))
        if splits:
            out = _sampling.assign_splits(
                out, ["cell_id", "chip_x", "chip_y"], splits,
                seed=int(seed))
        return self._next(
            out, (), "chips",
            {"chip": int(chip), "min_valid": min_valid,
             "splits": None if splits is None else dict(splits),
             "seed": int(seed)})

    def stretch(self, pct_cut=None, minmax=None) -> "Pipeline":
        """Per-band normalize to [0, 1] against ONE collection-global
        range (stretch.stretch — the reference's plotting
        normalization, F7): explicit ``minmax``, type-7 percentile
        ``pct_cut`` (exact histogram quantiles for integer payloads),
        or global min/max. Output re-types to rawf32 with the finite
        -9999 sentinel. Pending masks flush first (masked pixels must
        not feed the quantiles)."""
        from vrtility_spark import stretch as _stretch
        mm = (None if minmax is None else
              [np.atleast_1d(np.asarray(m, dtype=np.float64)).tolist()
               for m in minmax])
        return self._next(
            _stretch.stretch(self._flushed().df, pct_cut=pct_cut,
                             minmax=minmax),
            (), "stretch",
            {"pct_cut": (None if pct_cut is None
                         else [float(p) for p in pct_cut]),
             "minmax": mm})

    def sieve(self, min_pixels: int, band: int = 0, values=None,
              fill: str = "largest_neighbor", rounds: int = 1) -> "Pipeline":
        """Remove regions smaller than ``min_pixels`` (regions.sieve —
        gdal_sieve's cleanup): each small region is rewritten to its
        largest neighbour's value (or nodata), using global region
        sizes and a distributed adjacency graph; per-cell patch lists
        travel back to the tiles, tile bytes never shuffle. Pending
        masks flush first."""
        from vrtility_spark import regions as _regions
        return self._next(
            _regions.sieve(self._flushed().df, band=band,
                           min_pixels=int(min_pixels), values=values,
                           fill=fill, rounds=int(rounds)),
            (), "sieve", {"min_pixels": int(min_pixels),
                          "band": int(band),
                          "values": (None if values is None
                                     else [float(v) for v in values]),
                          "fill": fill, "rounds": int(rounds)})

    def polygonize(self, band: int = 0, values=None,
                   reliable: bool = False) -> DataFrame:
        """Terminal raster→vector step: extract equal-valued 4-connected
        regions across tile boundaries (regions.polygonize — per-tile
        labeling, seam matching, distributed component merge). Returns
        the region TABLE (regions.REGION_SCHEMA), not a Pipeline: the
        output is vector rows, no longer tiles. Pending masks flush
        first so nodata pixels never join a region."""
        from vrtility_spark import regions as _regions
        return _regions.polygonize(self._flushed().df, band=band,
                                   values=values, reliable=reliable)

    def unmix(self, endmembers, clip: bool = True, renorm: bool = True,
              bands=None) -> "Pipeline":
        """Linear spectral unmixing (unmix.unmix): per-pixel endmember
        fraction planes + RMSE against a fixed (bands, K) endmember
        matrix — one zero-shuffle Arrow map (the tiny matrix rides the
        closure); validates rank eagerly on the driver. ``bands``
        picks plane indices (drop a mask plane a composite carried).
        Output rawf32 with the -9999 sentinel. Pending masks flush
        first."""
        from vrtility_spark import unmix as _unmix
        E = [[float(v) for v in row] for row in endmembers]
        sel = None if bands is None else [int(b) for b in bands]
        return self._next(
            _unmix.unmix(self._flushed().df, E, clip=bool(clip),
                         renorm=bool(renorm), bands=sel),
            (), "unmix", {"endmembers": E, "clip": bool(clip),
                          "renorm": bool(renorm), "bands": sel})

    def classify(self, breaks, band: int = 0) -> "Pipeline":
        """Digitize a continuous band into level indices
        (algebra.classify) — a narrow no-shuffle Arrow map; the
        classified single-plane rawf32 tiles chain into polygonize /
        sieve / zonal. Pending masks flush first."""
        from vrtility_spark import algebra as _algebra
        br = [float(b) for b in breaks]
        return self._next(
            _algebra.classify(self._flushed().df, br, band=int(band)),
            (), "classify", {"breaks": br, "band": int(band)})

    def contour(self, breaks, band: int = 0,
                reliable: bool = False) -> DataFrame:
        """Terminal contour extraction (regions.contour_polygons —
        gdal_contour -p): digitize at ``breaks`` and polygonize the
        equal-level regions. Returns the region TABLE with level
        bounds, not a Pipeline. Pending masks flush first."""
        from vrtility_spark import regions as _regions
        return _regions.contour_polygons(
            self._flushed().df, [float(b) for b in breaks],
            band=int(band), reliable=reliable)

    def sample_points(self, points: DataFrame,
                      method: str = "nearest", **kw) -> DataFrame:
        """Terminal point sampling (pointsample.point_sample — the
        gdallocationinfo twin): per-band values at point locations,
        bilinear stencils crossing tile seams with zero halo. Returns
        the long-form value TABLE, not a Pipeline. Pending masks flush
        first (sample the MASKED surface)."""
        from vrtility_spark import pointsample as _pointsample
        return _pointsample.point_sample(self._flushed().df, points,
                                         method=method, **kw)

    def proximity(self, band: int = 0, values=(1.0,),
                  max_dist: float = 8.0, units: str = "pixels",
                  beyond: str = "clip") -> "Pipeline":
        """Distance-to-class raster (proximity.proximity): exact
        Euclidean distance to the nearest target-class pixel, capped
        at ``max_dist`` — the cap bounds the focal halo radius, which
        is what makes a global transform tile-local. Single-plane
        rawf32 output, chainable (e.g. into :meth:`intersecting` +
        zonal). Pending masks flush first."""
        from vrtility_spark import proximity as _proximity
        vals = [float(v) for v in values]
        return self._next(
            _proximity.proximity(self._flushed().df, band=int(band),
                                 values=vals, max_dist=float(max_dist),
                                 units=units, beyond=beyond),
            (), "proximity", {"band": int(band), "values": vals,
                              "max_dist": float(max_dist),
                              "units": units, "beyond": beyond})

    def fillnodata(self, max_dist: float, power: float = 2.0,
                   smoothing: int = 0) -> "Pipeline":
        """Spatial nodata interpolation (fillnodata.fillnodata, the
        gdal_fillnodata twin): IDW-fill holes from valid pixels within
        ``max_dist`` pixels, then ``smoothing`` 3x3 relaxations of the
        filled pixels only; valid pixels pass through bit-exact and
        unreachable holes stay nodata. One cell-keyed halo shuffle;
        output keeps the input format. Pending masks flush first (the
        classic chain: mask → composite → fillnodata)."""
        from vrtility_spark import fillnodata as _fillnodata
        return self._next(
            _fillnodata.fillnodata(self._flushed().df,
                                   max_dist=float(max_dist),
                                   power=float(power),
                                   smoothing=int(smoothing)),
            (), "fillnodata", {"max_dist": float(max_dist),
                               "power": float(power),
                               "smoothing": int(smoothing)})

    def pansharpen(self, pan: DataFrame, method: str = "brovey",
                   ms_bands=None, weights=None,
                   resampling: str = "bilinear") -> "Pipeline":
        """Fuse with a higher-resolution pan tile table
        (pansharpen.pansharpen): one cell-keyed equi-join + a narrow
        Arrow map with the upsample inside it. Unbundleable (carries a
        live DataFrame, like :meth:`algebra`). Pending masks flush
        first."""
        from vrtility_spark import pansharpen as _pansharpen
        return self._next(
            _pansharpen.pansharpen(self._flushed().df, pan,
                                   method=method, ms_bands=ms_bands,
                                   weights=weights,
                                   resampling=resampling),
            (), "pansharpen", self._UNBUNDLEABLE)

    def algebra(self, other: DataFrame, op="diff",
                broadcast_right: bool = False) -> "Pipeline":
        """Pixel-wise raster algebra against another tile table
        (algebra.tile_algebra): diff/abs_diff/ratio/ndiff or a callable
        — change detection as ONE cell-keyed equi-join + a narrow Arrow
        map; output rawf32/-9999. Unbundleable (carries a live
        DataFrame). Pending masks flush first."""
        from vrtility_spark import algebra as _algebra
        return self._next(
            _algebra.tile_algebra(self.df, other, op=op,
                                  broadcast_right=bool(broadcast_right)),
            (), "algebra", self._UNBUNDLEABLE)

    def clip(self, aoi: DataFrame, res: int, invert: bool = False,
             aoi_id=None) -> "Pipeline":
        """Cutline clip (rasterize.clip_tiles): NaN out pixels whose
        centers fall outside the AOI polygons (``invert=True``:
        inside), dropping tiles the AOI never covers. Broadcast cover
        join — tile bytes never shuffle. Unbundleable (carries a live
        AOI DataFrame). Pending masks flush first."""
        from vrtility_spark import rasterize as _rasterize
        return self._next(
            _rasterize.clip_tiles(self.df, aoi, int(res),
                                  invert=bool(invert), aoi_id=aoi_id),
            (), "clip", self._UNBUNDLEABLE)

    def terrain(self, op: str, units: str = "degrees",
                azimuth: float = 315.0, altitude: float = 45.0,
                pixel_size=None, alg: str = "riley") -> "Pipeline":
        """Terrain derivative (slope/aspect/hillshade/flowdir/tpi/tri/
        roughness — the full gdaldem menu, Horn 3x3 for the gradient
        ops) over a one-row-per-cell tile table via the focal halo
        exchange (terrain.terrain) — windows cross tile seams exactly;
        output re-types to rawf32 with the finite -9999 sentinel as
        nodata (not NaN — see terrain.py module header). ``alg`` picks
        the TRI formula (riley/wilson). Pending masks flush first."""
        from vrtility_spark import terrain as _terrain
        psz = pixel_size if (pixel_size is None or np.isscalar(pixel_size)) \
            else list(pixel_size)
        return self._next(
            _terrain.terrain(self.df, op, units=units, azimuth=azimuth,
                             altitude=altitude, pixel_size=pixel_size,
                             alg=alg),
            (), "terrain", {"op": op, "units": units,
                            "azimuth": float(azimuth),
                            "altitude": float(altitude),
                            "pixel_size": psz, "alg": alg})

    def cloud_shadow(self, azimuth: float, elevation: float,
                     cloud_height, pixel_size=None,
                     union: bool = False,
                     max_steps: int = 64) -> "Pipeline":
        """Geometric cloud-shadow projection (masks.cloud_shadow) over
        a 0/1 cloud-mask tile table (chain ``.classify`` or a mask
        plane first): the sun-geometry displacement sweep riding the
        focal halo exchange — displacement strips shuffle, cloud
        tiles never do. ``union=True`` emits the combined
        cloud-or-shadow invalid mask. Output rawf32 0/1 with the
        -9999 sentinel. Pending masks flush first."""
        from vrtility_spark import masks as _masks
        ch = (float(cloud_height) if np.isscalar(cloud_height)
              else [float(v) for v in cloud_height])
        psz = pixel_size if (pixel_size is None or np.isscalar(pixel_size)) \
            else list(pixel_size)
        return self._next(
            _masks.cloud_shadow(self.df, float(azimuth),
                                float(elevation), cloud_height,
                                pixel_size=pixel_size,
                                union=bool(union),
                                max_steps=int(max_steps)),
            (), "cloud_shadow",
            {"azimuth": float(azimuth), "elevation": float(elevation),
             "cloud_height": ch, "pixel_size": psz,
             "union": bool(union), "max_steps": int(max_steps)})

    def flow_accumulation(self, max_rounds: int = 128,
                          reliable: bool = False,
                          checkpoint_dir: str | None = None) -> "Pipeline":
        """D8 flow accumulation (hydrology.flow_accumulation) over a
        flow-direction tile table (chain ``.terrain('flowdir')``
        first): per-pixel upstream counts via the local frontier push
        + cross-tile boundary-mass rounds — only perimeter mass
        records and per-touched-tile receipt planes ever shuffle.
        Output rawf32 with the -9999 sentinel. Bundleable (the
        durability knobs are runtime policy, not plan semantics).
        Pending masks flush first."""
        from vrtility_spark import hydrology as _hydro
        return self._next(
            _hydro.flow_accumulation(self.df, max_rounds=int(max_rounds),
                                     reliable=bool(reliable),
                                     checkpoint_dir=checkpoint_dir),
            (), "flow_accumulation", {"max_rounds": int(max_rounds)})

    def fill_sinks(self, eps: float = 0.0, max_rounds: int = 128,
                   reliable: bool = False,
                   checkpoint_dir: str | None = None) -> "Pipeline":
        """Depression filling (hydrology.fill_sinks) over a DEM tile
        table — the whole-DEM preconditioner before
        ``.terrain('flowdir')``: every interior pit fills to its spill
        level (+``eps`` per step for the Planchon–Darboux drainage
        gradient) via chaotic relaxation rounds that shuffle only
        1-pixel boundary strips and per-touched-tile state planes.
        Output rawf32 with the -9999 sentinel. Bundleable (durability
        knobs are runtime policy). Pending masks flush first."""
        from vrtility_spark import hydrology as _hydro
        return self._next(
            _hydro.fill_sinks(self.df, eps=float(eps),
                              max_rounds=int(max_rounds),
                              reliable=bool(reliable),
                              checkpoint_dir=checkpoint_dir),
            (), "fill_sinks", {"eps": float(eps),
                               "max_rounds": int(max_rounds)})

    def flow_length(self, pixel_size=None, max_rounds: int = 64,
                    reliable: bool = False,
                    checkpoint_dir: str | None = None) -> "Pipeline":
        """Downstream flow length (hydrology.flow_length) over a
        flow-direction tile table (chain ``.terrain('flowdir')``
        first): per-pixel along-path distance to the drainage stop via
        in-tile pointer doubling with EXACT packed step counts +
        cross-tile pointer jumping (O(log chain) rounds, perimeter
        node rows only). Output rawf32 metres with the -9999
        sentinel. Bundleable. Pending masks flush first."""
        from vrtility_spark import hydrology as _hydro
        ps = None if pixel_size is None else (
            float(pixel_size) if not isinstance(pixel_size, (tuple, list))
            else tuple(float(v) for v in pixel_size))
        return self._next(
            _hydro.flow_length(self.df, pixel_size=ps,
                               max_rounds=int(max_rounds),
                               reliable=bool(reliable),
                               checkpoint_dir=checkpoint_dir),
            (), "flow_length", {"pixel_size": (list(ps) if isinstance(
                ps, tuple) else ps), "max_rounds": int(max_rounds)})

    def upstream_flow_length(self, pixel_size=None,
                             max_rounds: int = 128,
                             reliable: bool = False,
                             checkpoint_dir: str | None = None
                             ) -> "Pipeline":
        """Upstream (longest-headwater-path) flow length
        (hydrology.upstream_flow_length) over a flow-direction tile
        table: the stream_order topological wavefront carrying
        flow_length's exact packed step counts — distributed output
        matches the mosaic kernel bit-for-bit. Output rawf32 metres,
        -9999 sentinel. Bundleable. Pending masks flush first."""
        from vrtility_spark import hydrology as _hydro
        ps = None if pixel_size is None else (
            float(pixel_size) if not isinstance(pixel_size, (tuple, list))
            else tuple(float(v) for v in pixel_size))
        return self._next(
            _hydro.upstream_flow_length(self.df, pixel_size=ps,
                                        max_rounds=int(max_rounds),
                                        reliable=bool(reliable),
                                        checkpoint_dir=checkpoint_dir),
            (), "upstream_flow_length",
            {"pixel_size": (list(ps) if isinstance(ps, tuple) else ps),
             "max_rounds": int(max_rounds)})

    def twi(self, pixel_size: float | None = None,
            min_tanb: float = 1e-3, fill: bool = True) -> "Pipeline":
        """Topographic wetness index from the current table as a DEM
        (hydrology.twi_from_dem): optional depression filling → D8
        flowdir → distributed flow accumulation ‖ slope → ONE
        cell-keyed join + narrow TWI combine. rawf32 output, -9999
        sentinel. Bundleable. Pending masks flush first."""
        from vrtility_spark import hydrology as _hydro
        return self._next(
            _hydro.twi_from_dem(self.df,
                                pixel_size=(None if pixel_size is None
                                            else float(pixel_size)),
                                min_tanb=float(min_tanb),
                                fill=bool(fill)),
            (), "twi", {"pixel_size": (None if pixel_size is None
                                       else float(pixel_size)),
                        "min_tanb": float(min_tanb),
                        "fill": bool(fill)})

    def basins(self, max_rounds: int = 64, reliable: bool = False,
               checkpoint_dir: str | None = None) -> "Pipeline":
        """D8 watershed labeling (hydrology.basins) over a
        flow-direction tile table (chain ``.terrain('flowdir')``
        first): every valid pixel gets the zone-global id of the
        terminal pixel its drainage path stops at, via in-tile
        vectorized pointer doubling + cross-tile pointer jumping on
        the boundary graph (O(log chain) rounds, only perimeter-sized
        node rows shuffle). Output rawf64 labels with the -9999
        sentinel. Bundleable. Pending masks flush first."""
        from vrtility_spark import hydrology as _hydro
        return self._next(
            _hydro.basins(self.df, max_rounds=int(max_rounds),
                          reliable=bool(reliable),
                          checkpoint_dir=checkpoint_dir),
            (), "basins", {"max_rounds": int(max_rounds)})

    def cost_distance(self, cost_band: int = 0, source_band: int = 1,
                      source_threshold: float = 1.0,
                      cost_scale: float = 1.0, cost_offset: float = 0.0,
                      backlink: bool = False,
                      max_rounds: int = 256, reliable: bool = False,
                      checkpoint_dir: str | None = None) -> "Pipeline":
        """Cost-distance accumulation (costdist.cost_distance — GRASS
        r.cost / ArcGIS CostDistance): minimum accumulated cost from
        every pixel to the nearest source along 8-connected paths,
        stepping at ``dist * (friction[a] + friction[b]) / 2``.
        ``cost_band`` holds the (affine-rescaled, strictly positive)
        friction, ``source_band >= source_threshold`` marks sources;
        nodata in either band is a barrier. Chaotic-relaxation rounds
        shuffle only 1-pixel boundary strips and touched-tile states.
        Output a rawf32 accumulated-cost plane (-9999 sentinel where
        nodata/barrier or unreachable), plus a D8 predecessor-code
        plane when ``backlink=True`` (chain ``.subset_bands([1])`` →
        ``.basins()`` for ArcGIS-style cost allocation). Bundleable
        (durability knobs are runtime policy). Pending masks flush
        first."""
        from vrtility_spark import costdist as _cd
        return self._next(
            _cd.cost_distance(self.df, cost_band=int(cost_band),
                              source_band=int(source_band),
                              source_threshold=float(source_threshold),
                              cost_scale=float(cost_scale),
                              cost_offset=float(cost_offset),
                              backlink=bool(backlink),
                              max_rounds=int(max_rounds),
                              reliable=bool(reliable),
                              checkpoint_dir=checkpoint_dir),
            (), "cost_distance",
            {"cost_band": int(cost_band),
             "source_band": int(source_band),
             "source_threshold": float(source_threshold),
             "cost_scale": float(cost_scale),
             "cost_offset": float(cost_offset),
             "backlink": bool(backlink),
             "max_rounds": int(max_rounds)})

    def auto_threshold(self, band: int = 0, method: str = "otsu",
                       bins: int | None = None) -> "Pipeline":
        """Automatic histogram thresholding
        (threshold.threshold_classify — scikit-image threshold_otsu /
        threshold_isodata): the exact global histogram of ``band``
        (one combinable value-count agg), the Otsu/IsoData cut, and a
        zero-shuffle 0/1 classify with the cut riding as a
        ``threshold`` provenance column. Bundleable. Pending masks
        flush first."""
        from vrtility_spark import threshold as _th
        return self._next(
            _th.threshold_classify(self.df, band=int(band),
                                   method=method,
                                   bins=None if bins is None
                                   else int(bins)),
            (), "auto_threshold",
            {"band": int(band), "method": str(method),
             "bins": None if bins is None else int(bins)})

    def allocation(self, band: int = 0, value_band: int | None = None,
                   values=(1.0,), max_dist: float = 8.0) -> "Pipeline":
        """Euclidean allocation (proximity.allocation — GRASS
        r.grow.distance value output / ArcGIS EucAllocation): every
        pixel within ``max_dist`` px of a target-class pixel takes its
        nearest seed's value (argmin-carrying capped separable EDT
        over the focal halo, deterministic min-d²/northernmost/
        leftmost tie rule). Output rawf32/-9999. Bundleable. Pending
        masks flush first."""
        from vrtility_spark import proximity as _px
        return self._next(
            _px.allocation(self.df, band=int(band),
                           value_band=None if value_band is None
                           else int(value_band),
                           values=tuple(float(v) for v in values),
                           max_dist=float(max_dist)),
            (), "allocation",
            {"band": int(band),
             "value_band": None if value_band is None
             else int(value_band),
             "values": [float(v) for v in values],
             "max_dist": float(max_dist)})

    def stream_order(self, max_rounds: int = 128,
                     reliable: bool = False,
                     checkpoint_dir: str | None = None) -> "Pipeline":
        """Strahler stream order (hydrology.stream_order) over a
        flow-direction tile table (chain ``.terrain('flowdir')``
        first): headwaters are order 1, a confluence of two equal
        orders promotes — propagated as a cross-tile topological
        wavefront where only perimeter-sized DECL/ORD records shuffle
        and only tiles receiving new arrivals re-solve. Output rawf32
        orders with the -9999 sentinel. Bundleable. Pending masks
        flush first."""
        from vrtility_spark import hydrology as _hydro
        return self._next(
            _hydro.stream_order(self.df, max_rounds=int(max_rounds),
                                reliable=bool(reliable),
                                checkpoint_dir=checkpoint_dir),
            (), "stream_order", {"max_rounds": int(max_rounds)})

    def hotspots(self) -> "Pipeline":
        """Getis-Ord Gi* hot-spot z-score map (autocorr.hotspots) over
        a one-row-per-cell tile table: a tiny per-band global-moments
        agg (collected — a few floats, never payloads) closed over one
        radius-1 halo-exchange kernel. Output rawf32 z-scores with the
        -9999 sentinel, ready for a |z| >= 1.96 threshold predicate.
        Bundleable. Pending masks flush first."""
        from vrtility_spark import autocorr as _autocorr
        return self._next(_autocorr.hotspots(self.df), (),
                          "hotspots", {})

    def local_moran(self) -> "Pipeline":
        """Local Moran's I cluster/outlier map (autocorr.local_moran,
        Anselin 1995 LISA): same moments-closure + radius-1 halo
        exchange as hotspots; output stacks 2B rawf32/-9999 bands —
        I_i value planes then HH/LL/HL/LH quadrant codes. Bundleable.
        Pending masks flush first."""
        from vrtility_spark import autocorr as _autocorr
        return self._next(_autocorr.local_moran(self.df), (),
                          "local_moran", {})

    def texture(self, metric: str = "contrast", radius: int = 2,
                levels: int = 8, lo: float = 0.0, hi: float = 1.0,
                offsets=None, symmetric: bool = True,
                fill: bool = False) -> "Pipeline":
        """GLCM texture metric (texture.glcm_texture — Haralick
        contrast/dissimilarity/homogeneity/energy/entropy) per band
        over a one-row-per-cell tile table via the focal halo exchange
        with radius + offset reach; quantization onto an explicit
        [lo, hi) range keeps the operator deterministic and
        tile-independent.  Output rawf32 / -9999 sentinel."""
        from vrtility_spark import texture as _texture
        offs = (_texture.OFFSETS_4 if offsets is None
                else tuple((int(a), int(b)) for a, b in offsets))
        return self._next(
            _texture.glcm_texture(self.df, metric, radius=radius,
                                  levels=levels, lo=lo, hi=hi,
                                  offsets=offs, symmetric=symmetric,
                                  fill=fill),
            (), "texture", {"metric": metric, "radius": int(radius),
                            "levels": int(levels), "lo": float(lo),
                            "hi": float(hi),
                            "offsets": [list(o) for o in offs],
                            "symmetric": bool(symmetric),
                            "fill": bool(fill)})

    def kmeans(self, k: int, n_per_tile: int = 64,
               max_cells: int | None = None, iters: int = 20,
               seed: int = 0) -> "Pipeline":
        """Unsupervised per-pixel k-means classification
        (cluster.fit_kmeans + classify_kmeans — the GEE
        ee.Clusterer.wekaKMeans / .cluster() pattern): train on a
        bounded deterministic pixel sample (hash-selected cells ×
        n_per_tile hash-permuted pixels each), then broadcast the tiny
        codebook and assign every pixel in one zero-shuffle Arrow map.
        Output is a single raw16 class plane (0..k-1,
        cluster.NODATA_CLASS sentinel).  Fitting is deterministic
        given the input table, so bundle replay reproduces the exact
        classes."""
        from vrtility_spark import cluster as _cluster
        C = _cluster.fit_kmeans(self.df, k, n_per_tile=n_per_tile,
                                max_cells=max_cells, iters=iters,
                                seed=seed)
        return self._next(
            _cluster.classify_kmeans(self.df, C), (),
            "kmeans", {"k": int(k), "n_per_tile": int(n_per_tile),
                       "max_cells": (None if max_cells is None
                                     else int(max_cells)),
                       "iters": int(iters), "seed": int(seed)})

    def color_relief(self, ramp, band: int = 0,
                     interpolate: bool = True,
                     nv_color=(0, 0, 0)) -> "Pipeline":
        """gdaldem color-relief (terrain.color_relief): map one plane
        to 3-plane RGB through a color ramp — per-pixel narrow Arrow
        map, zero shuffle. Pending masks flush first."""
        from vrtility_spark import terrain as _terrain
        ramp_l = [[float(x) for x in e] for e in ramp]
        nv = [float(x) for x in nv_color]
        return self._next(
            _terrain.color_relief(self._flushed().df, ramp_l,
                                  band=int(band),
                                  interpolate=bool(interpolate),
                                  nv_color=nv),
            (), "color_relief", {"ramp": ramp_l, "band": int(band),
                                 "interpolate": bool(interpolate),
                                 "nv_color": nv})

    def overview_level(self, method="average") -> "Pipeline":
        """One overview level up (2x coarser ground resolution): every
        2x2 block of sibling tiles reduces to its parent cell's tile
        through one parent-keyed shuffle (overviews.build_level — the
        distributed twin of the COG driver's embedded overviews,
        R/gdal-options.R:124-146). ``method`` is one of
        ``overviews.OVERVIEW_METHODS`` or a per-plane list (keep class
        planes ``mode``). Pending masks flush first."""
        m = method if isinstance(method, str) else list(method)
        return self._next(
            _overviews.build_level(self.df, method=method),
            (), "overview_level", {"method": m})

    def overviews(self, levels: int, method="average",
                  include_base: bool = True) -> "Pipeline":
        """The full overview pyramid as one table with a ``level``
        column (overviews.build_pyramid): level ``l`` is ``2^l``x
        coarser, built level-from-level so each step shuffles 4x fewer
        bytes. Pending masks flush first."""
        m = method if isinstance(method, str) else list(method)
        return self._next(
            _overviews.build_pyramid(self.df, int(levels), method=method,
                                     include_base=bool(include_base)),
            (), "overviews", {"levels": int(levels), "method": m,
                              "include_base": bool(include_base)})

    # ------------------------------------------------- m2m / W1-W2
    def hampel(self, k: int, t0: float = 3.0, impute_na: bool = False) -> "Pipeline":
        return self._next(_ts.hampel(self.df, k, t0, impute_na), (),
                          "hampel", {"k": int(k), "t0": float(t0),
                                     "impute_na": bool(impute_na)})

    def savgol(self, window: int = 5, polyorder: int = 2) -> "Pipeline":
        """Per-pixel Savitzky–Golay smoothing along the time axis
        (timeseries.savgol): least-squares polynomial fit per centered
        window, edge rows and NaN-touched windows preserved."""
        return self._next(_ts.savgol(self.df, window, polyorder), (),
                          "savgol", {"window": int(window),
                                     "polyorder": int(polyorder)})

    def decompose(self, period: int,
                  component: str = "trend") -> "Pipeline":
        """Per-pixel classical seasonal decomposition along the time
        axis (timeseries.decompose): centered full-period moving
        average trend, NaN-skipping per-phase seasonal indices
        centered to sum 0, residual = x - trend - seasonal; rawf32
        per-timestep outputs (signed components)."""
        return self._next(_ts.decompose(self.df, period, component),
                          (), "decompose",
                          {"period": int(period),
                           "component": str(component)})

    def whittaker(self, lam: float = 5.0, d: int = 2) -> "Pipeline":
        """Per-pixel Whittaker–Eilers smoothing + NaN gap interpolation
        along the time axis (timeseries.whittaker): penalized
        least squares with a λ-weighted d-th-difference roughness
        penalty, solved per pixel by a deterministic banded Cholesky."""
        return self._next(_ts.whittaker(self.df, lam, d), (),
                          "whittaker", {"lam": float(lam), "d": int(d)})

    def m2m(self, fun: Callable[[np.ndarray], np.ndarray]) -> "Pipeline":
        return self._next(_ts.singleband_m2m(self.df, fun), (),
                          "m2m", self._UNBUNDLEABLE)

    # -------------------------------------------------------- sinks (S8)
    def compute(self, path: str, partition_by: Sequence[str] = ()) -> None:
        """Materialize — the single action (vrt_compute,
        R/vrt-compute.R:133-246). Executors write their own partitions;
        the reference's single-writer funnel
        (R/gdalraster-async.r:41-50) intentionally does not exist here.
        """
        writer = self.df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

    def explain(self, mode: str = "formatted") -> "Pipeline":
        self.df.explain(mode)
        return self

    # ------------------------------------------- plan bundles (S9)
    def to_bundle(self, path: str) -> dict:
        """Serialize the verb chain to a portable JSON bundle — the
        twin of the reference's ``vrt_save``/``vrt_bundle``
        (R/vrt-save.R:51-109, R/vrt-bundle.R:19-143): re-run the same
        verbs elsewhere against any source table. Verbs with
        non-serializable params (DataFrame args, opaque callables)
        refuse loudly — pass string formulas / named reducers to keep
        a pipeline bundleable."""
        import json
        bad = [v for v, p in self._log if p is self._UNBUNDLEABLE]
        if bad:
            raise ValueError(
                f"pipeline contains non-serializable verbs {bad}; use "
                "string band formulas / named reducers, and apply "
                "DataFrame-argument verbs (intersecting) outside the "
                "bundled chain")
        bundle = {"format": "vrtility_spark.bundle", "version": 1,
                  "verbs": [{"verb": v, "params": p} for v, p in self._log]}
        with open(path, "w") as f:
            json.dump(bundle, f, indent=1)
        return bundle

    @classmethod
    def from_bundle(cls, path: str, df: DataFrame) -> "Pipeline":
        """Rebuild a pipeline from a bundle and replay it on ``df``."""
        import json
        with open(path) as f:
            bundle = json.load(f)
        if bundle.get("format") != "vrtility_spark.bundle":
            raise ValueError(f"{path} is not a vrtility_spark bundle")
        p = cls(df)
        for step in bundle["verbs"]:
            # bundles are untrusted portable files: only TRANSFORMATION
            # verbs replay (the same trust boundary as the AST-hardened
            # band formulas) — a bundle naming compute/to_bundle could
            # otherwise overwrite arbitrary paths on load
            if step["verb"] not in cls._BUNDLE_VERBS:
                raise ValueError(
                    f"bundle verb {step['verb']!r} is not replayable; "
                    f"allowed: {sorted(cls._BUNDLE_VERBS)}")
            p = getattr(p, step["verb"])(**step["params"])
        return p
