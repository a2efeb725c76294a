"""Raster→vector region extraction: distributed connected-component
labeling of equal-valued pixel regions across tile boundaries
(gdal_polygonize's semantics, re-expressed Spark-first).

:mod:`rasterize` burns vectors into pixels; this module is the exact
inverse — contiguous (4-connected) runs of pixels sharing one class
value become ONE region row with a stable global id, a pixel count,
and a world-frame bbox, no matter how many tiles the region straddles.
The reference delegates this direction to GDAL utilities outside its
pipeline (its rasters leave as files, R/call-gdalraster-mirai.R); at
100 TB "gather the mosaic and flood-fill" is impossible, so the
operator must label locally and merge globally:

1. **Per-tile labeling** (``mapInPandas``, narrow): each tile decodes
   once and labels its own pixels with :func:`label_np` — a runs-based
   two-pass union-find whose canonical label is the component's
   minimum pixel index, so labels are deterministic and carry no
   executor state. Each local region becomes a fixed-size *partial*
   row (label, value, count, bbox); each tile edge additionally emits
   one tiny *seam* record per valid boundary pixel, addressed to the
   shared seam by pure cell arithmetic (:mod:`cells` — no join, no
   geometry). Tile bytes are never shuffled; seam volume is ~``4/w``
   of the pixel count.
2. **Seam matching** (one groupBy): the two sides of a seam pixel pair
   up by ``(seam, axis, position, value)`` — exactly two records with
   equal value ⟺ the region continues across the boundary — yielding
   an EDGE between the two tiles' local labels.
3. **Global merge**: :func:`dedup.connected_components` (hash-min +
   pointer jumping, O(log diameter) distributed rounds — the same
   operator that collapses near-duplicate documents) resolves
   transitive label equivalence; a final groupBy folds the partials
   into one row per global region.

The global region id is the minimum *global pixel id*
(``cell_id * PID_RADIX + local_pixel_index``) over the whole region —
reproducible from the data alone, byte-stable across cluster sizes.

Scale notes: stage 1 is embarrassingly parallel; the CC edge set holds
only regions that actually cross tiles (≪ pixel count); the final
aggregation shuffles one 64-byte row per (tile, local region). Regions
never cross zone boundaries (zones are disjoint planar frames, the
same contract as :func:`focal.focal_filter`).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import cells, codec
from vrtility_spark.checkpointing import truncate_lineage
from vrtility_spark.dedup import connected_components

#: radix for the global pixel id: pid = cell_id * PID_RADIX + y*w + x.
#: Tiles up to 16 Mpx (4096²) and cell ids up to 2^39 fit int64; the
#: synthetic index tops out near 2^33 (5 zones · res 13).
PID_RADIX = 1 << 24

REGION_SCHEMA = (
    "region_id long, value double, pixel_count long, n_tiles long, "
    "xmin double, ymin double, xmax double, ymax double")

_MID_SCHEMA = (
    "kind int, cell_id long, w int, h int, label long, value double, "
    "px long, pxmin int, pymin int, pxmax int, pymax int, "
    "seam long, axis int, pos int")


# ------------------------------------------------------ NumPy kernels ----

def _find(parent: list, i: int) -> int:
    root = i
    while parent[root] != root:
        root = parent[root]
    while parent[i] != root:  # path compression
        parent[i], i = root, parent[i]
    return root


def label_np(vals: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Label 4-connected components of equal-valued valid pixels.

    Returns an ``(H, W)`` int64 array: each valid pixel carries the
    *minimum linear pixel index* (``y*W + x``) of its component — a
    canonical labeling (no arbitrary counter), so two implementations
    agree exactly. Invalid pixels are ``-1``.

    Runs-based two-pass union-find: each row decomposes into maximal
    equal-value runs (vectorized); runs overlapping an equal-valued
    run of the previous row union. O(runs · α) — worst case (a
    checkerboard) one run per pixel, typical class rasters orders of
    magnitude fewer.
    """
    vals = np.asarray(vals, dtype=np.float64)
    valid = np.asarray(valid, dtype=bool) & np.isfinite(vals)
    if vals.shape != valid.shape or vals.ndim != 2:
        raise ValueError("label_np wants matching 2-D vals/valid")
    H, W = vals.shape
    parent: list[int] = []
    runs: list[tuple[int, int, int, float]] = []  # (y, x0, x1, value)
    prev: list[tuple[int, int, float, int]] = []  # (x0, x1, value, run)
    for y in range(H):
        v = valid[y]
        if not v.any():
            prev = []
            continue
        a = vals[y]
        same = np.zeros(W, dtype=bool)
        same[1:] = v[1:] & v[:-1] & (a[1:] == a[:-1])
        starts = np.flatnonzero(v & ~same)
        stop = np.zeros(W, dtype=bool)
        stop[:-1] = v[:-1] & ~same[1:]
        stop[W - 1] = v[W - 1]
        stops = np.flatnonzero(stop)
        cur: list[tuple[int, int, float, int]] = []
        for s, e in zip(starts, stops):
            ridx = len(parent)
            parent.append(ridx)
            runs.append((y, int(s), int(e), float(a[s])))
            cur.append((int(s), int(e), float(a[s]), ridx))
        i = j = 0
        while i < len(prev) and j < len(cur):
            s0, e0, v0, r0 = prev[i]
            s1, e1, v1, r1 = cur[j]
            if s1 <= e0 and s0 <= e1 and v0 == v1:
                ra, rb = _find(parent, r0), _find(parent, r1)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            if e0 < e1:
                i += 1
            else:
                j += 1
        prev = cur
    comp_min: dict[int, int] = {}
    roots = [_find(parent, r) for r in range(len(parent))]
    for (y, x0, _x1, _v), root in zip(runs, roots):
        pid = y * W + x0
        if root not in comp_min or pid < comp_min[root]:
            comp_min[root] = pid
    L = np.full((H, W), -1, dtype=np.int64)
    for (y, x0, x1, _v), root in zip(runs, roots):
        L[y, x0:x1 + 1] = comp_min[root]
    return L


def region_table_np(L: np.ndarray, vals: np.ndarray):
    """Per-region aggregates of a label image: returns
    ``(labels, values, counts, pxmin, pymin, pxmax, pymax)`` arrays,
    sorted by label. Pixel-space bboxes are inclusive indices."""
    H, W = L.shape
    m = L >= 0
    lab = L[m]
    uniq, inv = np.unique(lab, return_inverse=True)
    counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    ys, xs = np.nonzero(m)
    pxmin = np.full(len(uniq), W, dtype=np.int64)
    pymin = np.full(len(uniq), H, dtype=np.int64)
    pxmax = np.full(len(uniq), -1, dtype=np.int64)
    pymax = np.full(len(uniq), -1, dtype=np.int64)
    np.minimum.at(pxmin, inv, xs)
    np.minimum.at(pymin, inv, ys)
    np.maximum.at(pxmax, inv, xs)
    np.maximum.at(pymax, inv, ys)
    # values are constant per label by construction; pick the first
    values = np.full(len(uniq), np.nan)
    values[inv[::-1]] = np.asarray(vals, dtype=np.float64)[m][::-1]
    return uniq, values, counts, pxmin, pymin, pxmax, pymax


# ------------------------------------------------- distributed driver ----

def _neighbor(zone: int, res: int, ix: int, iy: int,
              dx: int, dy: int) -> int | None:
    n = 1 << res
    jx, jy = ix + dx, iy + dy
    if not (0 <= jx < n and 0 <= jy < n):
        return None  # zone edge: regions stop at the zone frame
    return int(cells.encode_np(zone, res, jx, jy))


def polygonize(df: DataFrame, band: int = 0, key: str = "cell_id",
               values: Sequence[float] | None = None,
               max_iter: int = 50, reliable: bool = False,
               checkpoint_dir: str | None = None) -> DataFrame:
    """Extract equal-valued 4-connected regions from a one-row-per-cell
    tile table (composite outputs, regridded scenes, overview levels,
    :func:`rasterize.rasterize_aoi` burns).

    ``band`` picks the class plane (e.g. the SCL index); ``values``
    optionally restricts to a class subset (everything else becomes
    background). Nodata pixels (scalar or per-band ``band_nodata``)
    never join a region.

    Returns ``REGION_SCHEMA``: one row per region —
    ``region_id`` (min global pixel id, deterministic), ``value``,
    ``pixel_count``, ``n_tiles`` (tiles the region touches), and the
    region's world-frame bbox (pixel edges, row 0 = ymin — the zonal /
    rasterize pixel-center convention).

    ``reliable=True`` routes the iterative merge's checkpoints to
    durable storage (:mod:`checkpointing`), surviving executor loss on
    long jobs.
    """
    names = [f.name for f in df.schema.fields]
    for req in (key, "bytes", "w", "h", "fmt", "nodata"):
        if req not in names:
            raise ValueError(f"polygonize input is missing column {req!r}")
    keep = None if values is None else {float(v) for v in values}
    band_i = int(band)

    def emit(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out: list[tuple] = []
            for row in pdf.itertuples(index=False):
                d = dict(zip(names, row))
                cid = int(d[key])
                w, h = int(d["w"]), int(d["h"])
                if w * h > PID_RADIX:
                    raise ValueError(
                        f"polygonize: tile {w}x{h} exceeds PID_RADIX "
                        f"({PID_RADIX} px); split to child cells first")
                if cid >= (1 << 63) // PID_RADIX:
                    raise ValueError(
                        f"polygonize: cell id {cid} too large for the "
                        "global pixel-id radix")
                arr = codec.decode(d["bytes"], w, h, d["fmt"])
                nb = len(arr)
                if not (-nb <= band_i < nb):
                    raise ValueError(
                        f"polygonize: band {band_i} out of range for "
                        f"{nb}-plane tile")
                nd = codec.row_band_meta(row, nb, "band_nodata",
                                         d["nodata"])
                A = codec.to_float_masked(arr, nd)[band_i]
                valid = np.isfinite(A)
                if keep is not None:
                    valid &= np.isin(A, list(keep))
                L = label_np(A, valid)
                if not (L >= 0).any():
                    continue
                (lab, val, cnt, pxmin, pymin, pxmax,
                 pymax) = region_table_np(L, A)
                zone, res, ix, iy = (int(v) for v in cells.decode_np(cid))
                base = cid * PID_RADIX
                for i in range(len(lab)):
                    out.append((
                        0, cid, w, h, base + int(lab[i]), float(val[i]),
                        int(cnt[i]), int(pxmin[i]), int(pymin[i]),
                        int(pxmax[i]), int(pymax[i]),
                        None, None, None))
                # seam records: E/W use pixel column edges, N/S rows.
                # axis 0 = vertical seam (horizontal adjacency), pos=y;
                # axis 1 = horizontal seam, pos=x. Row 0 = ymin, so the
                # dy=+1 neighbor touches THIS tile's last row.
                for dx, dy, sl in (
                        (1, 0, (slice(None), w - 1)),
                        (-1, 0, (slice(None), 0)),
                        (0, 1, (h - 1, slice(None))),
                        (0, -1, (0, slice(None)))):
                    nbr = _neighbor(zone, res, ix, iy, dx, dy)
                    if nbr is None:
                        continue
                    seam = min(cid, nbr)
                    axis = 0 if dy == 0 else 1
                    edge_lab = L[sl]
                    pos = np.flatnonzero(edge_lab >= 0)
                    if len(pos) == 0:
                        continue
                    edge_val = A[sl]
                    for p in pos:
                        out.append((
                            1, cid, None, None, base + int(edge_lab[p]),
                            float(edge_val[p]), None, None, None, None,
                            None, seam, axis, int(p)))
            if out:
                yield pd.DataFrame(out, columns=[
                    "kind", "cell_id", "w", "h", "label", "value", "px",
                    "pxmin", "pymin", "pxmax", "pymax",
                    "seam", "axis", "pos"])

    mid = df.mapInPandas(emit, schema=_MID_SCHEMA)
    # one shared materialization: the CC iterations and the final
    # aggregation both read this, and neither should re-decode tiles
    mid = truncate_lineage(mid, eager=False, reliable=reliable,
                           checkpoint_dir=checkpoint_dir)
    parts = mid.filter(F.col("kind") == 0)
    seams = mid.filter(F.col("kind") == 1)
    edges = (seams.groupBy("seam", "axis", "pos", "value")
             .agg(F.min("label").alias("src"),
                  F.max("label").alias("dst"),
                  F.count(F.lit(1)).alias("cnt"))
             .filter((F.col("cnt") == 2) & (F.col("src") < F.col("dst")))
             .select("src", "dst").distinct())
    labels = connected_components(edges, "src", "dst", max_iter=max_iter,
                                  reliable=reliable,
                                  checkpoint_dir=checkpoint_dir)
    joined = (parts.join(labels.withColumnRenamed("id", "label"),
                         "label", "left")
              .withColumn("comp", F.coalesce("comp", "label")))
    # world-frame bbox: cell origin + pixel edges (exact binary floats)
    x0, y0, size = cells.cell_frame_cols(F.col("cell_id"))
    px = size / F.col("w")
    py = size / F.col("h")
    g = (joined
         .withColumn("wxmin", x0 + F.col("pxmin") * px)
         .withColumn("wxmax", x0 + (F.col("pxmax") + 1) * px)
         .withColumn("wymin", y0 + F.col("pymin") * py)
         .withColumn("wymax", y0 + (F.col("pymax") + 1) * py))
    return (g.groupBy("comp")
            .agg(F.min("value").alias("value"),
                 F.sum("px").alias("pixel_count"),
                 F.countDistinct("cell_id").alias("n_tiles"),
                 F.min("wxmin").alias("xmin"),
                 F.min("wymin").alias("ymin"),
                 F.max("wxmax").alias("xmax"),
                 F.max("wymax").alias("ymax"))
            .select(F.col("comp").alias("region_id"), "value",
                    "pixel_count", "n_tiles",
                    "xmin", "ymin", "xmax", "ymax"))
