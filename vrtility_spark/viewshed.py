"""Viewshed: per-pixel line-of-sight visibility from observer points,
capped at ``max_dist`` — the gdal_viewshed twin (observer height,
target height, MAXDIST) on the distributed cell grid.

Tower-placement studies, fire-lookout coverage, solar-horizon masks:
all are "which pixels can this observer see", and the realistic batch
shape is MANY observers (10⁴–10⁶ candidate sites) against one huge
DEM. Visibility is non-local in a harder way than any focal window —
a pixel's answer depends on every DEM sample along the ray back to the
observer — so the cap is not an optimization here, it is the entire
distribution strategy (the same argument as :mod:`proximity` and
:mod:`gridding`): nothing beyond ``max_dist`` of an observer can be
visible to it, so each observer needs exactly the tiles of its
``[x−r, x+r]²`` disk and no global mosaic ever exists.

Spark-first plan:

1. each observer row explodes to its disk's covering cells with pure
   expressions (:func:`warp.cells_cover` — whole-stage codegen, no
   UDF). The duplication factor per observer is ``(1 + 2r/size)²``,
   data-independent;
2. ONE equi-join ships each covered tile to its observers (tile bytes
   move once per covering observer — the inherent cost: overlapping
   disks genuinely need the same tiles; at 10⁶ dense observers,
   bucket both sides on the cell key to co-locate);
3. ``groupBy(obs_id)`` grouped Arrow map assembles the observer's
   local NaN-padded mosaic, runs the R3 line-of-sight kernel ONCE, and
   crops per-cell visibility tiles back out — tile-shaped rows keyed
   ``(obs_id, cell_id)``, chainable with every cell-keyed operator
   (zonal over a viewshed = visible-area per AOI).

Kernel semantics (``viewshed_np``, loop-oracle-gated): a target pixel
is VISIBLE when the elevation angle of every intermediate DDA sample
(``n = ceil(max(|dx|,|dy|))`` uniform steps, nearest-neighbor lookup,
observer/target pixels excluded) stays strictly below the target's
angle. Heights are in DEM units; ``obs_height``/``target_height`` are
ABOVE-GROUND offsets; no earth-curvature term (the grid is a synthetic
plane). Output pixels: 1 visible, 0 hidden, ``OUT_NODATA`` (255)
outside the radius or over unknown elevation. NaN DEM samples along a
ray do not block (a coverage hole can only OVERESTIMATE visibility —
the same one-sided contract as every halo operator); an observer whose
own ground elevation is unknown emits all-255 tiles rather than
guessing.

Reference parity: the reference shells out to GDAL for this family
(gdal_viewshed alongside gdaldem, R/call-gdalraster-mirai.R:42-114);
semantics follow gdal_viewshed's observer/target-height + max-distance
mode with the visibility values remapped to {1, 0, 255}.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import cells, codec

OUT_NODATA = 255.0
VIEWSHED_SCHEMA = ("obs_id long, cell_id long, bytes binary, w int, "
                   "h int, fmt string, nodata double, n_tiles int")
_CHUNK = 4096  # target pixels per vectorized ray block


def viewshed_np(dem: np.ndarray, oc: float, orow: float,
                obs_height: float, target_height: float,
                max_dist_px: float) -> np.ndarray:
    """Line-of-sight over one ``(H, W)`` float64 mosaic (NaN =
    unknown). ``(oc, orow)`` is the observer position in pixel-index
    space (pixel ``(r, c)``'s center is ``(c, r)``). Returns ``(H, W)``
    float64 of {1 visible, 0 hidden, 255 outside/unknown}. The
    observer's ground pixel is ``floor(+0.5)`` of its coordinates; if
    that elevation is NaN the whole answer is 255 (unknown ground —
    the caller decides whether that is an error)."""
    H, W = dem.shape
    out = np.full((H, W), OUT_NODATA)
    o_ci = int(np.floor(oc + 0.5))
    o_ri = int(np.floor(orow + 0.5))
    if not (0 <= o_ri < H and 0 <= o_ci < W) or np.isnan(dem[o_ri, o_ci]):
        return out
    z_obs = float(dem[o_ri, o_ci]) + float(obs_height)

    cc, rr = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    dx = (cc - oc).ravel()
    dy = (rr - orow).ravel()
    dist = np.hypot(dx, dy)
    zt = dem.ravel() + float(target_height)
    in_range = (dist <= float(max_dist_px)) & ~np.isnan(dem.ravel())
    idx_all = np.flatnonzero(in_range)
    flat = out.ravel()

    for s in range(0, len(idx_all), _CHUNK):
        idx = idx_all[s:s + _CHUNK]
        d, ddx, ddy = dist[idx], dx[idx], dy[idx]
        n = np.ceil(np.maximum(np.abs(ddx), np.abs(ddy))).astype(np.int64)
        st = np.where(d > 0, (zt[idx] - z_obs) / np.where(d > 0, d, 1.0),
                      np.inf)  # own pixel: always visible
        nmax = int(n.max()) if len(n) else 0
        if nmax <= 1:
            flat[idx] = 1.0
            continue
        k = np.arange(1, nmax, dtype=np.float64)          # (nmax-1,)
        t = k[None, :] / np.maximum(n, 1)[:, None]        # (npix, nmax-1)
        live = k[None, :] < n[:, None]
        sx = oc + t * ddx[:, None]
        sy = orow + t * ddy[:, None]
        si = np.floor(sx + 0.5).astype(np.int64)
        sr = np.floor(sy + 0.5).astype(np.int64)
        np.clip(si, 0, W - 1, out=si)
        np.clip(sr, 0, H - 1, out=sr)
        tci = idx % W
        tri = idx // W
        # endpoint pixels never block themselves
        live &= ~((si == tci[:, None]) & (sr == tri[:, None]))
        live &= ~((si == o_ci) & (sr == o_ri))
        z = dem[sr, si]
        sd = t * d[:, None]
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = (z - z_obs) / sd
        slope = np.where(live & ~np.isnan(z), slope, -np.inf)
        blocked = (slope >= st[:, None]).any(axis=1)
        flat[idx] = np.where(blocked, 0.0, 1.0)
    return flat.reshape(H, W)


def viewshed(tiles: DataFrame, observers: DataFrame, max_dist: float,
             band: int = 0, obs_height: float = 2.0,
             target_height: float = 0.0,
             grid: tuple | None = None) -> DataFrame:
    """Per-observer visibility tiles from a one-row-per-cell DEM tile
    table and an observer table ``(obs_id, zone, x, y)`` in ZONE
    coordinates (the point convention of :mod:`gridding` and
    :mod:`pointsample`). ``max_dist`` is in world units (it also bounds
    each observer's tile disk); ``band`` picks the elevation plane;
    ``obs_height`` / ``target_height`` are above-ground offsets in DEM
    value units. The tile grid ``(res, w, h)`` is probed from one row
    — pass ``grid=(res, w, h)`` to skip the probe. Output: one
    ``raw16`` row per (observer, covered cell that has a tile), pixel
    values {1, 0, 255} with nodata 255."""
    if not float(max_dist) > 0:
        raise ValueError("max_dist must be > 0 world units")
    from vrtility_spark.bands import subset_band_index
    from vrtility_spark.warp import cells_cover

    if grid is not None:
        res, tw, th = (int(v) for v in grid)
    else:
        # probe the RAW tiles (band subset doesn't change the grid), so
        # no payload rewrite happens just to read metadata
        probe = tiles.select("cell_id", "w", "h").first()
        if probe is None:
            return _empty(tiles.sparkSession)
        res = int(cells.decode_np(probe.cell_id)[1])
        tw, th = int(probe.w), int(probe.h)
    if tw != th:
        raise ValueError(
            f"viewshed: tiles are {tw}x{th} on a square cell — "
            "pixel-space rays would not be straight in world units; "
            "resample to a square grid first")
    r = float(max_dist)
    size = cells.cell_size(res)
    obs = observers.select(
        F.col("obs_id").cast("long").alias("obs_id"),
        F.col("zone").cast("long").alias("zone"),
        F.col("x").cast("double").alias("_ox"),
        F.col("y").cast("double").alias("_oy"))
    bbox = obs.select(
        "*",
        (F.col("_ox") - r).alias("xmin"), (F.col("_ox") + r).alias("xmax"),
        (F.col("_oy") - r).alias("ymin"), (F.col("_oy") + r).alias("ymax"))
    cover = cells_cover(bbox, res, out_col="_vcell").select(
        "obs_id", "_ox", "_oy", "_vcell")
    # restrict to covered tiles FIRST (broadcast semi join — the cover
    # set is observer-sized), so the band-subset payload rewrite only
    # touches tiles some observer's disk actually reaches, not the
    # whole collection
    covered = tiles.join(
        F.broadcast(cover.select(F.col("_vcell").alias("cell_id"))
                    .distinct()),
        "cell_id", "left_semi")
    one = subset_band_index(covered, int(band))
    bn = (F.col("band_nodata") if "band_nodata" in one.columns
          else F.lit(None).cast("array<double>")).alias("band_nodata")
    tile_side = one.select("cell_id", "bytes", "w", "h", "fmt",
                           "nodata", bn)
    hits = cover.join(tile_side,
                      cover["_vcell"] == tile_side["cell_id"],
                      "inner").drop("_vcell")

    oh, tgt_h = float(obs_height), float(target_height)
    md_px = r / (size / tw)

    def run_observer(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["w"].nunique() != 1 or pdf["h"].nunique() != 1 or \
                int(pdf["w"].iloc[0]) != tw or int(pdf["h"].iloc[0]) != th:
            raise ValueError(
                "viewshed: mixed tile shapes in one observer disk — "
                "regrid to one grid first")
        if pdf["_ox"].nunique() != 1 or pdf["_oy"].nunique() != 1:
            raise ValueError(
                "viewshed: duplicate obs_id with different positions — "
                "observer ids must be unique")
        if pdf["cell_id"].duplicated().any():
            raise ValueError(
                "viewshed: multiple rows per cell — composite to one "
                "tile per cell first")
        ox = float(pdf["_ox"].iloc[0])
        oy = float(pdf["_oy"].iloc[0])
        oid = int(pdf["obs_id"].iloc[0])
        ixs, iys = [], []
        for cid in pdf["cell_id"]:
            _, cres, ix, iy = (int(v) for v in cells.decode_np(int(cid)))
            if cres != res:
                raise ValueError(
                    f"viewshed: tile res {cres} != probed {res}; "
                    "regrid to one grid first")
            ixs.append(ix)
            iys.append(iy)
        ix0, iy0 = min(ixs), min(iys)
        nx = max(ixs) - ix0 + 1
        ny = max(iys) - iy0 + 1
        mosaic = np.full((ny * th, nx * tw), np.nan)
        for row, ix, iy in zip(pdf.itertuples(index=False), ixs, iys):
            arr = codec.to_float_masked(
                codec.decode(row.bytes, int(row.w), int(row.h), row.fmt),
                codec.row_band_meta(row, 1, "band_nodata", row.nodata))
            ry, rx = (iy - iy0) * th, (ix - ix0) * tw
            mosaic[ry:ry + th, rx:rx + tw] = arr[0]
        px = size / tw
        oc = (ox - ix0 * size) / px - 0.5
        orow = (oy - iy0 * size) / px - 0.5
        vis = viewshed_np(mosaic, oc, orow, oh, tgt_h, md_px)
        out = []
        for row, ix, iy in zip(pdf.itertuples(index=False), ixs, iys):
            ry, rx = (iy - iy0) * th, (ix - ix0) * tw
            tile = vis[ry:ry + th, rx:rx + tw][None]
            out.append({
                "obs_id": oid, "cell_id": int(row.cell_id),
                "bytes": codec.encode(tile.astype(np.uint16), "raw16"),
                "w": tw, "h": th, "fmt": "raw16",
                "nodata": OUT_NODATA, "n_tiles": len(pdf)})
        return pd.DataFrame(out)

    return hits.groupBy("obs_id").applyInPandas(
        run_observer, schema=VIEWSHED_SCHEMA)


def _empty(spark) -> DataFrame:
    return spark.createDataFrame([], VIEWSHED_SCHEMA)


def demo_observers(n: int = 3, zone: int = 0):
    """Deterministic observer fixture aligned with
    datagen.images_pandas' footprint area (zone coords)."""
    rows = []
    for i in range(n):
        rows.append({"obs_id": i, "zone": zone,
                     "x": 3000.0 + 2500.0 * i,
                     "y": 2500.0 + 1800.0 * ((i * 3) % 4)})
    return pd.DataFrame(rows)


# pixel-space observer positions on the 2x2x16px oracle fixture, chosen
# so every zone shows a genuine visible/hidden/outside mix (and none
# lands on a nodata pixel); shared by q_image_viewshed and
# tools/gen_oracle_constants.image_viewshed_rows
FIXTURE_PIX = ((10.2, 11.7), (20.0, 8.0), (7.0, 22.0))
# 13-px radius in world units (TILE_RES pixels are 4096 units wide)
FIXTURE_PARAMS = {"max_dist": 13.0 * 4096.0, "band": 0,
                  "obs_height": 800.0, "target_height": 0.0}


def fixture_observers() -> pd.DataFrame:
    """Three observers per fixture zone at :data:`FIXTURE_PIX`
    (zone coords of the 16-px TILE_RES grid)."""
    from vrtility_spark import datagen
    px = cells.cell_size(datagen.TILE_RES) / 16.0
    rows = []
    for zi, zone in enumerate(datagen.DEFAULT_ZONES):
        for j, (oc, orow) in enumerate(FIXTURE_PIX):
            rows.append({"obs_id": zi * 3 + j, "zone": int(zone),
                         "x": (oc + 0.5) * px, "y": (orow + 0.5) * px})
    return pd.DataFrame(rows)
