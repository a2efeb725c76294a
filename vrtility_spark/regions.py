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
    "region_id long, value double, pixel_count long, perimeter long, "
    "n_tiles long, "
    "xmin double, ymin double, xmax double, ymax double")

#: emit-stage record kinds: 0 = per-tile region partial, 1 = seam
#: boundary pixel, 2 = in-tile adjacency pair (label, label_b)
_MID_SCHEMA = (
    "kind int, cell_id long, w int, h int, label long, value double, "
    "px long, pxmin int, pymin int, pxmax int, pymax int, "
    "seam long, axis int, pos int, label_b long, perim long")


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


def region_table_np(L: np.ndarray, vals: np.ndarray, fact=None):
    """Per-region aggregates of a label image: returns
    ``(labels, values, counts, pxmin, pymin, pxmax, pymax)`` arrays,
    sorted by label. Pixel-space bboxes are inclusive indices.
    ``fact`` optionally passes a precomputed ``(m, uniq, inv)``
    factorization (shared with :func:`boundary_counts_np`)."""
    H, W = L.shape
    if fact is None:
        m = L >= 0
        uniq, inv = np.unique(L[m], return_inverse=True)
    else:
        m, uniq, inv = fact
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


def boundary_counts_np(L: np.ndarray, fact=None) -> np.ndarray:
    """Per-label count of exposed pixel edges — edges whose 4-neighbor
    is a DIFFERENT label, invalid, or outside the array. Returned in
    the order of ``np.unique(L[L >= 0])`` (region_table_np's order).
    Summed over tiles (minus seam-match corrections) this is the exact
    region perimeter in pixel-edge units."""
    H, W = L.shape
    if fact is None:
        m = L >= 0
        uniq, inv = np.unique(L[m], return_inverse=True)
    else:
        m, uniq, inv = fact
    counts = np.zeros(len(uniq), dtype=np.int64)
    Pd = np.full((H + 2, W + 2), -2, dtype=np.int64)
    Pd[1:-1, 1:-1] = L
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nb = Pd[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
        exposed = (nb != L)[m]
        counts += np.bincount(inv[exposed], minlength=len(uniq))
    return counts


# ------------------------------------------------- distributed driver ----

def _neighbor(zone: int, res: int, ix: int, iy: int,
              dx: int, dy: int) -> int | None:
    # zone edge → None: regions stop at the zone frame (the same
    # shared arithmetic the focal halo exchange uses)
    return cells.neighbor_cell(zone, res, ix, iy, dx, dy)


def _emit_stage(df: DataFrame, band: int, values, key: str,
                adjacency: bool = False,
                perimeter: bool = False) -> DataFrame:
    """Shared per-tile pass: decode once, label locally, emit region
    partials (kind 0), seam boundary pixels (kind 1) and — when
    ``adjacency`` — in-tile different-region contact pairs (kind 2,
    for the region-adjacency graph :func:`sieve` merges along).
    ``perimeter`` adds per-label exposed-edge counts to the partials
    (polygonize wants them; sieve never reads them, so it skips the
    cost)."""
    names = [f.name for f in df.schema.fields]
    for req in (key, "bytes", "w", "h", "fmt", "nodata"):
        if req not in names:
            raise ValueError(
                f"region emit input is missing column {req!r}")
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
                m_ = L >= 0
                uniq_, inv_ = np.unique(L[m_], return_inverse=True)
                fact = (m_, uniq_, inv_)
                (lab, val, cnt, pxmin, pymin, pxmax,
                 pymax) = region_table_np(L, A, fact=fact)
                bcnt = (boundary_counts_np(L, fact=fact)
                        if perimeter else None)
                zone, res, ix, iy = (int(v) for v in cells.decode_np(cid))
                base = cid * PID_RADIX
                for i in range(len(lab)):
                    out.append((
                        0, cid, w, h, base + int(lab[i]), float(val[i]),
                        int(cnt[i]), int(pxmin[i]), int(pymin[i]),
                        int(pxmax[i]), int(pymax[i]),
                        None, None, None, None,
                        None if bcnt is None else int(bcnt[i])))
                if adjacency:
                    pairs = set()
                    for a, b in ((L[:, :-1], L[:, 1:]),
                                 (L[:-1, :], L[1:, :])):
                        m = (a >= 0) & (b >= 0) & (a != b)
                        if m.any():
                            lo = np.minimum(a[m], b[m])
                            hi = np.maximum(a[m], b[m])
                            pairs.update(zip(lo.tolist(), hi.tolist()))
                    for la, lb in pairs:
                        out.append((
                            2, cid, None, None, base + int(la), None,
                            None, None, None, None, None,
                            None, None, None, base + int(lb), None))
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
                    # the edge LENGTH rides in px and joins the seam
                    # key: tiles with mismatched pixel grids then never
                    # pair (regions stop at that seam) instead of
                    # merging geometrically non-adjacent pixels
                    edge_n = h if axis == 0 else w
                    for p in pos:
                        out.append((
                            1, cid, None, None, base + int(edge_lab[p]),
                            float(edge_val[p]), edge_n, None, None,
                            None, None, seam, axis, int(p), None, None))
            if out:
                cols = ["kind", "cell_id", "w", "h", "label", "value",
                        "px", "pxmin", "pymin", "pxmax", "pymax",
                        "seam", "axis", "pos", "label_b", "perim"]
                pdf = pd.DataFrame(out, columns=cols, dtype=object)
                # pixel-id columns hold ~2^59 values with NULLs mixed
                # in; default inference would coerce them to float64
                # and silently destroy the low bits — force nullable
                # integer dtypes instead
                for c in ("kind", "cell_id", "w", "h", "label", "px",
                          "pxmin", "pymin", "pxmax", "pymax", "seam",
                          "axis", "pos", "label_b", "perim"):
                    pdf[c] = pd.array(
                        [None if v is None else int(v) for v in pdf[c]],
                        dtype="Int64")
                pdf["value"] = pd.array(
                    [None if v is None else float(v)
                     for v in pdf["value"]], dtype="Float64")
                yield pdf

    return df.mapInPandas(emit, schema=_MID_SCHEMA)


def _seam_groups(mid: DataFrame) -> DataFrame:
    """Matched seam PIXELS: the two sides of each boundary pixel pair
    up by (seam, axis, position, edge length) — one row per matched
    pixel with both labels and both values.

    The edge length (px) is part of the key, so tiles with mismatched
    pixel grids never pair. More than 2 records per seam pixel can
    only mean multiple tile rows for one cell — the one-row-per-cell
    contract every grouped raster operator shares (focal raises the
    same way) — and fails loudly instead of fragmenting regions."""
    return (mid.filter(F.col("kind") == 1)
            .groupBy("seam", "axis", "pos", "px")
            .agg(F.min("label").alias("src"),
                 F.max("label").alias("dst"),
                 F.min("value").alias("vmin"),
                 F.max("value").alias("vmax"),
                 F.count(F.lit(1)).alias("cnt"))
            # guard and pair-filter as ONE when/otherwise expression:
            # two separate predicates would let Catalyst evaluate the
            # cnt==2 conjunct first and silently drop the cnt>2 rows
            # the guard exists to catch
            .filter(F.when(
                F.col("cnt") <= 2,
                (F.col("cnt") == 2) & (F.col("src") < F.col("dst")))
                .otherwise(F.raise_error(F.concat(
                    F.lit("regions: seam "), F.col("seam"),
                    F.lit(" has >2 records per boundary pixel — a "
                          "cell has multiple tile rows; composite to "
                          "one row per cell first"))).cast("boolean"))))


def _pairs_of(groups: DataFrame) -> DataFrame:
    """Seam pixel matches → distinct label pairs: equal values ⟺ the
    region CONTINUES (component-merge edge), different values ⟺ the
    regions TOUCH (adjacency edge)."""
    return (groups.select(
        "src", "dst", (F.col("vmin") == F.col("vmax")).alias("same"))
        .distinct())


def _seam_pairs(mid: DataFrame) -> DataFrame:
    return _pairs_of(_seam_groups(mid))


def _component_labels(mid: DataFrame, max_iter: int, reliable: bool,
                      checkpoint_dir):
    """(pairs, labels) — seam pairs plus the hash-min component labels
    over the equal-value edges. The pairs are lineage-truncated: both
    the CC edges and the caller's adjacency graph read them."""
    pairs = truncate_lineage(_seam_pairs(mid), eager=False,
                             reliable=reliable,
                             checkpoint_dir=checkpoint_dir)
    edges = pairs.filter("same").select("src", "dst")
    labels = connected_components(edges, "src", "dst",
                                  max_iter=max_iter, reliable=reliable,
                                  checkpoint_dir=checkpoint_dir)
    return pairs, labels


def _with_comp(df: DataFrame, labels: DataFrame, col: str) -> DataFrame:
    """Map a label column to its component id (itself when unmerged)."""
    lab = labels.withColumnRenamed("id", col).withColumnRenamed(
        "comp", f"_{col}_comp")
    return (df.join(lab, col, "left")
            .withColumn(f"_{col}_comp",
                        F.coalesce(f"_{col}_comp", col)))


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
    ``pixel_count``, ``perimeter`` (exact exposed-pixel-edge count:
    per-tile boundary counts minus one edge per side for every
    equal-value matched seam pixel), ``n_tiles`` (tiles the region
    touches), and the region's world-frame bbox (pixel edges, row 0 =
    ymin — the zonal / rasterize pixel-center convention).

    ``reliable=True`` routes the iterative merge's checkpoints to
    durable storage (:mod:`checkpointing`), surviving executor loss on
    long jobs.
    """
    mid = _emit_stage(df, band, values, key, perimeter=True)
    # one shared materialization: the CC iterations and the final
    # aggregation both read this, and neither should re-decode tiles
    mid = truncate_lineage(mid, eager=False, reliable=reliable,
                           checkpoint_dir=checkpoint_dir)
    parts = mid.filter(F.col("kind") == 0)
    # the seam grouping feeds BOTH the component edges and the
    # perimeter correction: truncate so its shuffle runs once
    groups = truncate_lineage(_seam_groups(mid), eager=False,
                              reliable=reliable,
                              checkpoint_dir=checkpoint_dir)
    edges = _pairs_of(groups).filter("same").select("src", "dst")
    labels = connected_components(edges, "src", "dst",
                                  max_iter=max_iter, reliable=reliable,
                                  checkpoint_dir=checkpoint_dir)
    # perimeter correction: each EQUAL-value matched seam pixel hides
    # one exposed edge on BOTH sides (the per-tile counts treated the
    # tile border as boundary)
    corr = (groups.filter(F.col("vmin") == F.col("vmax"))
            .select(F.explode(F.array("src", "dst")).alias("label"))
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("_matched_px")))
    joined = (parts.join(labels.withColumnRenamed("id", "label"),
                         "label", "left")
              .join(corr, "label", "left")
              .withColumn("comp", F.coalesce("comp", "label"))
              .withColumn("perim", F.col("perim")
                          - F.coalesce("_matched_px", F.lit(0))))
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
                 F.sum("perim").alias("perimeter"),
                 F.countDistinct("cell_id").alias("n_tiles"),
                 F.min("wxmin").alias("xmin"),
                 F.min("wymin").alias("ymin"),
                 F.max("wxmax").alias("xmax"),
                 F.max("wymax").alias("ymax"))
            .select(F.col("comp").alias("region_id"), "value",
                    "pixel_count", "perimeter", "n_tiles",
                    "xmin", "ymin", "xmax", "ymax"))


def contour_polygons(df: DataFrame, breaks, band: int = 0,
                     key: str = "cell_id", max_iter: int = 50,
                     reliable: bool = False,
                     checkpoint_dir: str | None = None) -> DataFrame:
    """Contour polygons — gdal_contour's ``-p`` (polygonize) mode on
    the distributed grid: digitize a continuous band at ``breaks``
    (:func:`algebra.classify`, a narrow no-shuffle Arrow map), then
    extract the equal-level regions with :func:`polygonize` — the
    classify map FUSES into polygonize's tile-decode stage, so the
    composition adds zero shuffles to polygonize's plan.

    Output: polygonize's region rows plus ``level`` (the class index),
    ``level_min`` / ``level_max`` (the band's bounds from ``breaks``;
    NULL on the open ends). The reference reaches contours through
    external GDAL utilities; here they chain from any composite.
    """
    from vrtility_spark.algebra import classify
    br = [float(b) for b in breaks]
    classes = classify(df, br, band=band, key=key)
    regs = polygonize(classes, band=0, key=key, max_iter=max_iter,
                      reliable=reliable, checkpoint_dir=checkpoint_dir)
    arr = F.array(*[F.lit(b) for b in br])
    lvl = F.col("value").cast("int")
    return (regs
            .withColumn("level", lvl)
            .withColumn("level_min",
                        F.when(lvl >= 1, F.element_at(arr, lvl)))
            .withColumn("level_max",
                        F.when(lvl < len(br), F.element_at(arr, lvl + 1)))
            .drop("value"))


def sieve(df: DataFrame, band: int = 0, min_pixels: int = 9,
          values: Sequence[float] | None = None,
          fill: str = "largest_neighbor", rounds: int = 1,
          key: str = "cell_id", max_iter: int = 50,
          reliable: bool = False,
          checkpoint_dir: str | None = None) -> DataFrame:
    """Remove salt-and-pepper regions — gdal_sieve's semantics on the
    distributed grid: every region smaller than ``min_pixels`` is
    rewritten to its largest neighbour region's value
    (``fill="largest_neighbor"``, ties broken by the smaller region
    id) or to nodata (``fill="nodata"``). Classifier outputs are full
    of 1-3-pixel speckle; sieving them is the standard cleanup before
    polygonize/zonal.

    Built from the same three distributed pieces as :func:`polygonize`
    plus the region-adjacency graph: the emit pass also records which
    DIFFERENT-valued regions touch (in-tile contact pairs + unequal
    seam pairs), global region sizes come from the component merge,
    and the chosen rewrites travel BACK to the tiles as a per-cell
    patch list — each tile then re-derives its local labels (the
    labeling is deterministic) and rewrites only the patched pixels.
    Tile bytes still never shuffle; the patch join moves one tiny list
    per affected cell.

    One round is one global sieve (every small region judged against
    ORIGINAL sizes — a deterministic variant of GDAL's cascade, which
    merges serially in scan order). ``rounds > 1`` re-runs on the
    rewritten tiles INCREMENTALLY: a tile's emit output depends only on
    its own pixels, so round ``k+1`` re-labels only the cells round
    ``k`` actually patched and reuses every untouched tile's
    checkpointed partials — the seam/CC/RAG stages still see the full
    record set, but the decode+label cost of round ``k+1`` scales with
    the patch set, not the corpus. Merged speckle that is still under
    the threshold joins its (now larger) surroundings, converging like
    iterated gdal_sieve. Small regions with NO neighbour (speckle
    surrounded by nodata) keep their value under ``largest_neighbor``
    and drop under ``"nodata"``.

    Returns the input schema with payloads rewritten (same format);
    ``band``/``values`` follow :func:`polygonize`.
    """
    if fill not in ("largest_neighbor", "nodata"):
        raise KeyError(f"unknown fill {fill!r}; largest_neighbor | nodata")
    if int(min_pixels) < 1:
        raise ValueError("min_pixels must be >= 1")
    out = df
    prev_mid = prev_patched = None
    for _ in range(int(rounds)):
        out, prev_mid, prev_patched = _sieve_once(
            out, band, int(min_pixels), values, fill, key,
            max_iter, reliable, checkpoint_dir,
            prev_mid=prev_mid, prev_patched=prev_patched)
    return out


def _sieve_once(df: DataFrame, band: int, min_pixels: int, values,
                fill: str, key: str, max_iter: int, reliable: bool,
                checkpoint_dir, prev_mid: DataFrame | None = None,
                prev_patched: DataFrame | None = None):
    """One global sieve round. Returns ``(rewritten tiles, this
    round's checkpointed mid table, this round's patched-cell ids)`` —
    the latter two feed the next round's incremental re-label (only
    patched cells re-emit; untouched tiles reuse their partials)."""
    from pyspark.sql import Window

    names = [f.name for f in df.schema.fields]
    if prev_mid is None or prev_patched is None:
        emitted = _emit_stage(df, band, values, key, adjacency=True)
    else:
        redo = df.join(prev_patched.withColumnRenamed("cell_id", key),
                       key, "left_semi")
        emitted = (prev_mid.join(prev_patched, "cell_id", "left_anti")
                   .unionByName(
                       _emit_stage(redo, band, values, key,
                                   adjacency=True)))
    mid = truncate_lineage(
        emitted,
        eager=False, reliable=reliable, checkpoint_dir=checkpoint_dir)
    parts = mid.filter(F.col("kind") == 0)
    pairs, labels = _component_labels(mid, max_iter, reliable,
                                      checkpoint_dir)
    parts_c = (parts.join(labels.withColumnRenamed("id", "label"),
                          "label", "left")
               .withColumn("comp", F.coalesce("comp", "label")))
    regions = (parts_c.groupBy("comp")
               .agg(F.min("value").alias("value"),
                    F.sum("px").alias("px")))
    small = regions.filter(F.col("px") < min_pixels)
    if fill == "largest_neighbor":
        adj = (mid.filter(F.col("kind") == 2)
               .select(F.col("label").alias("a"),
                       F.col("label_b").alias("b")))
        cross = (pairs.filter(~F.col("same"))
                 .select(F.col("src").alias("a"),
                         F.col("dst").alias("b")))
        rag_l = adj.unionByName(cross)
        rag = (_with_comp(_with_comp(rag_l, labels, "a"), labels, "b")
               .select(F.col("_a_comp").alias("ca"),
                       F.col("_b_comp").alias("cb"))
               .filter(F.col("ca") != F.col("cb")).distinct())
        both = rag.unionByName(
            rag.select(F.col("cb").alias("ca"), F.col("ca").alias("cb")))
        cand = (small.select("comp")
                .join(both, F.col("comp") == F.col("ca"))
                .join(regions.select(F.col("comp").alias("cb"),
                                     F.col("px").alias("nb_px"),
                                     F.col("value").alias("nb_value")),
                      "cb"))
        w = Window.partitionBy("comp").orderBy(F.desc("nb_px"), "cb")
        pick = (cand.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") == 1)
                .select("comp", F.col("nb_value").alias("new_value")))
    else:
        pick = small.select(
            "comp", F.lit(None).cast("double").alias("new_value"))
    patch = (parts_c.join(pick, "comp")
             .select(F.col("cell_id").alias(key),
                     (F.col("label") % PID_RADIX).alias("llabel"),
                     "new_value"))
    patches = truncate_lineage(
        patch.groupBy(key).agg(
            F.collect_list(F.struct("llabel", "new_value"))
            .alias("_patches")),
        eager=False, reliable=reliable, checkpoint_dir=checkpoint_dir)
    # only patched tiles enter the Arrow rewrite; untouched tile bytes
    # never cross the Python boundary at all
    joined = df.join(patches, key, "inner")
    untouched = df.join(patches, key, "left_anti").select(*names)
    keep = None if values is None else {float(v) for v in values}
    band_i = int(band)

    def apply_patches(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples(index=False):
                d = dict(zip(pdf.columns, row))
                plist = d.pop("_patches", None)
                res = {n: d[n] for n in names}
                if plist is not None and len(plist):
                    # decode returns a read-only buffer view; the patch
                    # mutates pixels in place
                    arr = codec.decode(d["bytes"], int(d["w"]),
                                       int(d["h"]), d["fmt"]).copy()
                    nd = codec.row_band_meta(row, len(arr),
                                             "band_nodata", d["nodata"])
                    A = codec.to_float_masked(arr, nd)[band_i]
                    valid = np.isfinite(A)
                    if keep is not None:
                        valid &= np.isin(A, list(keep))
                    # the labeling is deterministic, so re-deriving it
                    # here is cheaper than shuffling a label plane
                    L = label_np(A, valid)
                    plane = arr[band_i]
                    nd_b = (nd[band_i] if isinstance(nd, np.ndarray)
                            else nd)
                    for p in plist:
                        ll, nv = int(p["llabel"]), p["new_value"]
                        fillv = nd_b if nv is None else nv
                        if fillv is None or (isinstance(fillv, float)
                                             and np.isnan(fillv)):
                            fillv = np.nan
                        m = L == ll
                        if np.issubdtype(plane.dtype, np.floating):
                            plane[m] = fillv
                        elif np.isnan(fillv):
                            raise ValueError(
                                f"sieve: cell {d[key]} has an integer "
                                f"payload ({d['fmt']}) but no finite "
                                "nodata to write — fill='nodata' needs "
                                "a finite nodata sentinel on integer "
                                "formats (set_nodata first)")
                        else:
                            plane[m] = int(round(float(fillv)))
                    res["bytes"] = codec.encode(arr, d["fmt"])
                rows.append(res)
            yield pd.DataFrame(rows, columns=names)

    from pyspark.sql import types as T
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True)
         for f in df.schema.fields])
    rewritten = (joined.mapInPandas(apply_patches, schema=out_schema)
                 .unionByName(untouched))
    patched_cells = patches.select(F.col(key).alias("cell_id")).distinct()
    return rewritten, mid, patched_cells
