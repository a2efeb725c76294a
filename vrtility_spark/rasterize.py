"""Vector→raster: burn AOI polygons into tiles; clip tiles to AOIs.

The inverse of :mod:`zonal` — together they close the raster↔vector
loop (zonal reads pixels under polygons; rasterize writes polygons
into pixels).  The reference leans on GDAL here too (gdal_rasterize /
warp ``-cutline``-style clipping); at 100 TB both directions must be
cell-local: a polygon is burned only into the cells its bbox covers,
a clip touches only the tiles the polygon touches.

Spark-first plans:

* :func:`rasterize_aoi` — AOI parts explode to cover cells at the
  target res (:func:`warp.cells_cover`, pure expressions), then ONE
  ``groupBy(cell)`` grouped map burns every part hitting that cell
  into a fresh tile via the pixel-center point-in-polygon test
  (:func:`join.points_in_polygon_np`).  Burn order is deterministic
  (ascending burn value, then aoi_id; ``merge="max"`` by default so
  overlaps are order-free).  Output rows are real tiles of the cell
  index — chainable with every cell-keyed operator, and usable as a
  mask source (the J3 mask-injection path).
* :func:`clip_tiles` — tiles ⋈ broadcast(AOI cover cells); one Arrow
  map NaNs out pixels whose centers fall outside the AOI's parts
  (``invert=True`` keeps the outside).  Tiles the AOI's bboxes never
  cover drop entirely (the cutline crop); tile bytes shuffle nowhere —
  the join is broadcast, the map is narrow.

Both kernels share zonal's pixel-center convention (row 0 = ymin,
center offset +0.5 px), so ``clip → zonal`` and ``zonal`` alone agree
pixel-for-pixel.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import cells, codec
from vrtility_spark.join import parse_wkt_polygon, points_in_polygon_np
from vrtility_spark.warp import cells_cover

RASTERIZE_SCHEMA = ("cell_id long, bytes binary, w int, h int, "
                    "fmt string, nodata double, n_parts int")


def _pixel_centers(w: int, h: int, x0: float, y0: float, size: float):
    xs = x0 + (np.arange(w) + 0.5) * size / w
    ys = y0 + (np.arange(h) + 0.5) * size / h
    return np.meshgrid(xs, ys)


def rasterize_aoi(aoi: DataFrame, res: int, w: int, h: int,
                  burn=1.0, merge: str = "max",
                  background: float = 0.0) -> DataFrame:
    """Burn AOI polygons into ``w x h`` tiles at resolution ``res``.

    ``burn`` is a constant, or the name of a numeric AOI column
    (per-feature burn values — gdal_rasterize's ``-a``).  Where
    several parts cover one pixel, ``merge`` resolves: ``"max"``
    (default), ``"min"``, or ``"last"`` (parts ordered by ascending
    burn value then ``aoi_id`` — deterministic).  Pixels no part
    covers hold ``background``, which is also the tile ``nodata``
    sentinel.  Output: one ``rawf32`` tile row per covered cell plus
    ``n_parts`` (how many parts touched the cell).  Cells no AOI bbox
    covers produce no row — output size scales with the vector
    footprint, never the grid.
    """
    if merge not in ("max", "min", "last"):
        raise ValueError(f"unknown merge {merge!r}; use max/min/last")
    names = {f.name for f in aoi.schema.fields}
    if isinstance(burn, str) and burn not in names:
        raise ValueError(f"burn column {burn!r} not in AOI table")
    burn_col = (F.col(burn).cast("double") if isinstance(burn, str)
                else F.lit(float(burn)))
    parts = aoi.select(
        "aoi_id", "zone", "geom_wkt", "xmin", "ymin", "xmax", "ymax",
        burn_col.alias("_burn"))
    cover = cells_cover(parts, int(res), out_col="_rcell")
    bg = float(background)

    def burn_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf["_rcell"].iloc[0])
        zone, r, ix, iy = (int(v) for v in cells.decode_np(cid))
        size = cells.cell_size(r)
        gx, gy = _pixel_centers(w, h, ix * size, iy * size, size)
        canvas = np.full((1, h, w), bg, dtype=np.float64)
        hit = np.zeros((h, w), dtype=bool)
        order = pdf.sort_values(["_burn", "aoi_id"], kind="mergesort")
        # NOTE: itertuples would mangle the underscore helper columns
        # (namedtuple fields cannot start with "_") — zip the columns
        for wkt, bv in zip(order["geom_wkt"], order["_burn"]):
            inside = points_in_polygon_np(gx, gy, parse_wkt_polygon(wkt))
            if not inside.any():
                continue
            v = float(bv)
            if merge == "last":
                canvas[0][inside] = v
            elif merge == "max":
                canvas[0][inside] = np.where(
                    hit[inside], np.maximum(canvas[0][inside], v), v)
            else:
                canvas[0][inside] = np.where(
                    hit[inside], np.minimum(canvas[0][inside], v), v)
            hit |= inside
        return pd.DataFrame([{
            "cell_id": cid,
            "bytes": codec.encode(canvas, "rawf32"),
            "w": w, "h": h, "fmt": "rawf32", "nodata": bg,
            "n_parts": int(len(pdf)),
        }])

    return (cover.groupBy("_rcell")
            .applyInPandas(burn_cell, schema=RASTERIZE_SCHEMA))


def clip_tiles(tiles: DataFrame, aoi: DataFrame, res: int,
               invert: bool = False, key: str = "cell_id",
               aoi_id=None) -> DataFrame:
    """Cutline clip: NaN out pixels whose centers fall outside the AOI
    (``invert=True``: inside), dropping tiles the AOI never touches.

    ``aoi_id`` restricts to one AOI's parts; with several AOIs and no
    filter, the clip region is their UNION.  Output schema == input
    schema; the payload keeps its format, masked pixels become the
    tile's (per-band) sentinel.  Tile bytes never shuffle — the cover
    join is broadcast and the mask map is narrow.
    """
    names = [f.name for f in tiles.schema.fields]
    for req in (key, "bytes", "w", "h", "fmt", "nodata"):
        if req not in names:
            raise ValueError(f"clip_tiles input is missing column {req!r}")
    parts = aoi
    if aoi_id is not None:
        parts = parts.filter(F.col("aoi_id") == F.lit(aoi_id))
    cover = (cells_cover(
        parts.select("aoi_id", "zone", "geom_wkt",
                     "xmin", "ymin", "xmax", "ymax"),
        int(res), out_col="_ccell"))
    # one row per (cell, part): collect the part rings per cell so the
    # mask map sees every polygon that might cover a pixel
    rings = (cover.groupBy("_ccell")
             .agg(F.collect_list("geom_wkt").alias("_wkts")))
    joined = tiles.join(F.broadcast(rings),
                        tiles[key] == rings["_ccell"])
    out_schema = tiles.schema

    def mask_batch(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_rows = []
            # zip the helper column alongside the visible ones:
            # itertuples would mangle the underscore name
            for row, wkts in zip(
                    pdf[names].itertuples(index=False), pdf["_wkts"]):
                cid = int(getattr(row, key))
                zone, r, ix, iy = (int(v) for v in cells.decode_np(cid))
                size = cells.cell_size(r)
                gx, gy = _pixel_centers(int(row.w), int(row.h),
                                        ix * size, iy * size, size)
                inside = np.zeros(gx.shape, dtype=bool)
                for wkt in wkts:
                    inside |= points_in_polygon_np(
                        gx, gy, parse_wkt_polygon(wkt))
                keep = ~inside if invert else inside
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)
                A[:, ~keep] = np.nan
                payload = codec.from_float(A, nd,
                                           codec.dtype_for(row.fmt))
                d = {n: getattr(row, n) for n in names}
                d["bytes"] = codec.encode(payload, row.fmt)
                out_rows.append(d)
            yield pd.DataFrame(out_rows, columns=names)

    return joined.mapInPandas(mask_batch, schema=out_schema)
