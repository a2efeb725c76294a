"""Point sampling: raster values at point locations — the
gdallocationinfo / `terra::extract(points)` twin over the distributed
cell grid.

Ground-truth joins ("what does the composite say at these 10⁴ field
plots?"), training-label extraction, and spot checks all reduce to:
given a one-row-per-cell tile table and a point table, return each
point's per-band pixel value, ``nearest`` or ``bilinear``.

Spark-first plan — the tile table is the 100-TB side, so IT must not
move:

1. each point expands to its ≤ 4-pixel interpolation stencil with
   PURE expressions (global pixel index → owning cell by integer
   division — whole-stage codegen, no UDF). The stencil is what makes
   bilinear across tile seams work with ZERO halo exchange: a stencil
   pixel in the neighbour tile is simply a stencil row keyed by the
   neighbour's cell id;
2. stencil rows pre-aggregate to one list per cell (the aggregation
   runs on the SMALL side only) and **broadcast**-join onto the tile
   scan — tile payloads never shuffle, never duplicate;
3. a narrow Arrow map decodes each hit tile once and emits weighted
   per-band partials ``(point, band, w·v, w_valid)``;
4. ``groupBy(point, band)`` sums partials (map-side combine) and the
   weight renormalization ``Σwv / Σw_valid`` makes nodata pixels,
   missing tiles, and coverage holes all behave identically: excluded
   from the average, NULL when nothing valid remains (GDAL's
   nodata-excluding bilinear).

Edge semantics: stencils of IN-ZONE points clamp at the ZONE edge
(GDAL's dataset-edge replication for the sub-half-pixel overhang); a
point whose own coordinate lies outside the zone frame yields NULL
(gdallocationinfo's "location off this file"); a stencil pixel inside
the zone but over a missing tile contributes nothing (coverage hole ≡
nodata). ``sample_np`` is the mosaic twin used by the loop oracle and
the constants generator.

For point sets too large to broadcast (≫10⁷), pass
``broadcast_points=False``: the join falls back to a shuffled hash
join (tile bytes shuffle once — co-locate with bucketing on the cell
key to avoid even that).

Reference parity: the reference pipes ad-hoc inspection through
gdallocationinfo / terra on materialized rasters outside its pipeline;
here sampling is a first-class distributed verb.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import cells, codec

PARTIAL_SCHEMA = "point_id long, band int, wv double, wvalid double"


def sample_np(G: np.ndarray, n_global: int, xs, ys, pxsize: float,
              method: str = "bilinear", origin=(0.0, 0.0)) -> np.ndarray:
    """Mosaic twin of the distributed sampler: ``G`` is a NaN-masked
    ``(nb, H, W)`` array whose [0,0] pixel's outer corner sits at
    ``origin`` (zone coords), ``n_global`` the zone-wide pixel count
    per axis (clamping bound). Returns ``(npts, nb)`` float64 with NaN
    where no valid pixel contributes. Stencil pixels outside ``G``
    (missing tiles) are excluded exactly like nodata. Edge replication
    clamps in the ABSOLUTE zone frame (``origin`` offsets the clamp,
    so a sub-mosaic anchored mid-zone never replicates its own column
    0 for pixels that exist in a neighbour); a point whose own
    coordinate lies outside the zone frame entirely is NaN —
    gdallocationinfo's "location off this file"."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    nb, H, W = G.shape
    ox, oy = origin[0] / pxsize, origin[1] / pxsize
    gx = xs / pxsize - ox
    gy = ys / pxsize - oy
    off = ((gx + ox < 0) | (gx + ox >= n_global)
           | (gy + oy < 0) | (gy + oy >= n_global))
    if method == "nearest":
        corners = [(0, 0)]
        bx, by = np.floor(gx), np.floor(gy)
        fx = fy = np.zeros_like(gx)
    elif method == "bilinear":
        corners = [(0, 0), (1, 0), (0, 1), (1, 1)]
        bx, by = np.floor(gx - 0.5), np.floor(gy - 0.5)
        fx, fy = (gx - 0.5) - bx, (gy - 0.5) - by
    else:
        raise KeyError(f"unknown method {method!r}; nearest | bilinear")
    wv = np.zeros((len(xs), nb))
    wsum = np.zeros((len(xs), nb))
    for dx, dy in corners:
        ax = np.clip(bx + dx + ox, 0, n_global - 1)
        ay = np.clip(by + dy + oy, 0, n_global - 1)
        px = np.floor(ax - ox).astype(np.int64)
        py = np.floor(ay - oy).astype(np.int64)
        wt = ((fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
              if method == "bilinear" else np.ones_like(fx))
        inside = (px >= 0) & (px < W) & (py >= 0) & (py < H) & ~off
        v = np.full((len(xs), nb), np.nan)
        v[inside] = G[:, py[inside], px[inside]].T
        ok = np.isfinite(v) & (wt > 0)[:, None]
        wv[ok] += (wt[:, None] * np.nan_to_num(v))[ok]
        wsum[ok] += np.broadcast_to(wt[:, None], v.shape)[ok]
    with np.errstate(invalid="ignore"):
        out = wv / wsum
    out[wsum == 0] = np.nan
    return out


def demo_points(n: int = 48, zones=(30, 31, 27),
                span: float = 131072.0):
    """Deterministic sample-point list ``[(point_id, zone, x, y)]`` for
    driver queries and the constants oracle: a low-discrepancy integer
    lattice (×2 → exact binary floats, so stencil weights are dyadic
    and the whole pipeline is bit-exact regardless of partial-sum
    order), deliberately overshooting ``span`` by ~10% so some points
    land outside coverage (NULL path), with every 9th x / 11th y
    snapped onto a tile seam (cross-tile stencil path)."""
    pts = []
    lim = int(span * 1.1) // 2
    for i in range(n):
        zone = zones[i % len(zones)]
        x = float(((i * 40961 + 12289) % lim) * 2)
        y = float(((i * 24593 + 4099) % lim) * 2)
        if i % 9 == 0:
            x = span / 2.0
        if i % 11 == 0:
            y = span / 2.0
        pts.append((i, zone, x, y))
    return pts


def _tile_meta(tiles: DataFrame, key: str):
    row = tiles.select(key, "w", "h", "bytes", "fmt").limit(1).collect()
    if not row:
        raise ValueError("point_sample: empty tile table")
    r = row[0]
    res = int(cells.decode_np(np.asarray([r[key]]))[1][0])
    nb = codec.plane_count(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"])
    if nb is None:  # compressed payload: one decode on the probe row
        nb = codec.decode(r["bytes"], int(r["w"]), int(r["h"]),
                          r["fmt"]).shape[0]
    return res, int(r["w"]), int(r["h"]), nb


def point_sample(tiles: DataFrame, points: DataFrame,
                 method: str = "nearest", key: str = "cell_id",
                 id_col: str = "point_id", zone_col: str = "zone",
                 x_col: str = "x", y_col: str = "y",
                 broadcast_points: bool = True,
                 grid: tuple | None = None) -> DataFrame:
    """``(point_id, band, value)`` per point × band; ``value`` is NULL
    when no valid pixel contributes (point over a coverage hole, or a
    fully-nodata stencil). The tile grid (res, w, h, band count) is
    probed from one row — pass ``grid=(res, w, h, nb)`` when you know
    it to skip the probe (a ``limit(1)`` still evaluates part of an
    unmaterialized upstream pipeline, so skipping it halves the cost
    of sampling straight off a composite). Every decoded tile is
    checked against the grid — mixed grids must be regridded first."""
    if method not in ("nearest", "bilinear"):
        raise KeyError(f"unknown method {method!r}; nearest | bilinear")
    if grid is not None:
        res, w, h, nb = (int(v) for v in grid)
    else:
        res, w, h, nb = _tile_meta(tiles, key)
    if w != h:
        raise ValueError(
            f"point_sample: {w}x{h} tiles on square cells have "
            "non-square pixels; resample first")
    size = cells.cell_size(res)
    px = size / w
    n_global = (1 << res) * w
    zone = F.col(zone_col).cast("long")
    gx = F.col(x_col) / F.lit(px)
    gy = F.col(y_col) / F.lit(px)
    if method == "nearest":
        corners, bx, by = [(0, 0)], F.floor(gx), F.floor(gy)
        fx = fy = F.lit(0.0)
    else:
        corners = [(0, 0), (1, 0), (0, 1), (1, 1)]
        bx, by = F.floor(gx - 0.5), F.floor(gy - 0.5)
        fx, fy = (gx - 0.5) - bx, (gy - 0.5) - by
    stencil = F.array(*[
        F.struct(
            F.greatest(F.lit(0), F.least(F.lit(n_global - 1),
                                         (bx + dx).cast("long"))).alias("px"),
            F.greatest(F.lit(0), F.least(F.lit(n_global - 1),
                                         (by + dy).cast("long"))).alias("py"),
            (((fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy))
             if method == "bilinear" else F.lit(1.0)).alias("wt"))
        for dx, dy in corners])
    # a point whose own coordinate is outside the zone frame gets NO
    # stencil rows → NULL from the final left join (gdallocationinfo's
    # "location off this file"); edge replication via the clamp below
    # serves only the sub-half-pixel overhang of in-zone points
    inzone = ((gx >= 0) & (gx < n_global) & (gy >= 0) & (gy < n_global))
    st = (points
          .where(inzone)
          .select(F.col(id_col).alias("point_id"), zone.alias("_zone"),
                  F.explode(stencil).alias("s"))
          .select("point_id", "_zone",
                  F.col("s.px").alias("_gpx"), F.col("s.py").alias("_gpy"),
                  F.col("s.wt").alias("_wt"))
          .where(F.col("_wt") > 0))
    cix = F.floor(F.col("_gpx") / w).cast("long")
    ciy = F.floor(F.col("_gpy") / w).cast("long")
    cell = cells.encode_cols(F.col("_zone"), res, cix, ciy)
    per_cell = (st.withColumn(key, cell)
                .groupBy(key)
                .agg(F.collect_list(F.struct(
                    "point_id",
                    (F.col("_gpx") % w).alias("lpx"),
                    (F.col("_gpy") % w).alias("lpy"),
                    "_wt")).alias("_pts")))
    if broadcast_points:
        per_cell = F.broadcast(per_cell)
    tile_cols = [key, "bytes", "w", "h", "fmt", "nodata"] + (
        ["band_nodata"] if "band_nodata" in tiles.columns else [])
    hit = tiles.select(*tile_cols).join(per_cell, key)
    exp_w, exp_h, exp_nb, exp_res = w, h, nb, res

    def gather(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {"point_id": [], "band": [], "wv": [], "wvalid": []}
        bnods = (pdf["band_nodata"] if "band_nodata" in pdf.columns
                 else [None] * len(pdf))
        # NOTE: itertuples would mangle the underscore helper column
        # ("_pts" → positional name) — zip the columns instead
        for cid, tw, th, fmt, buf, nod, bn, pts in zip(
                pdf[key], pdf["w"], pdf["h"], pdf["fmt"], pdf["bytes"],
                pdf["nodata"], bnods, pdf["_pts"]):
            r_res = int(cells.decode_np(np.asarray([cid]))[1][0])
            if (int(tw), int(th), r_res) != (exp_w, exp_h, exp_res):
                raise ValueError(
                    f"point_sample: tile {cid} is {tw}x{th} at res "
                    f"{r_res}, probe said {exp_w}x{exp_h} res "
                    f"{exp_res}; regrid to one grid first")
            arr = codec.decode(buf, exp_w, exp_h, fmt)
            nd = codec.band_meta_or_scalar(bn, len(arr),
                                           codec.nodata_scalar(nod))
            A = codec.to_float_masked(arr, nd)
            if A.shape[0] != exp_nb:
                raise ValueError(
                    f"point_sample: tile {cid} has {A.shape[0]} bands, "
                    f"probe said {exp_nb}; normalize band layout first")
            for p in pts:
                v = A[:, int(p["lpy"]), int(p["lpx"])]
                wt = float(p["_wt"])
                for b in range(exp_nb):
                    out["point_id"].append(int(p["point_id"]))
                    out["band"].append(b)
                    ok = bool(np.isfinite(v[b]))
                    out["wv"].append(wt * float(v[b]) if ok else 0.0)
                    out["wvalid"].append(wt if ok else 0.0)
        return pd.DataFrame({
            "point_id": pd.array(out["point_id"], dtype="Int64"),
            "band": pd.array(out["band"], dtype="Int32"),
            "wv": out["wv"], "wvalid": out["wvalid"]})

    partials = (hit.groupBy(key)
                .applyInPandas(lambda k, g: gather(g), PARTIAL_SCHEMA)
                .groupBy("point_id", "band")
                .agg(F.sum("wv").alias("wv"),
                     F.sum("wvalid").alias("wvalid")))
    bands = F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("band")
    base = points.select(F.col(id_col).alias("point_id")).select(
        "point_id", bands).withColumn("band", F.col("band").cast("int"))
    val = F.when(F.col("wvalid") > 0,
                 F.col("wv") / F.col("wvalid")).otherwise(F.lit(None))
    return (base.join(partials, ["point_id", "band"], "left")
            .select("point_id", "band", val.alias("value")))
