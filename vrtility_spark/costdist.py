"""Cost-distance accumulation over the distributed cell grid — the
GRASS ``r.cost`` / ArcGIS ``CostDistance`` / WhiteboxTools
``CostDistance`` semantics: given a per-pixel friction surface and a
set of source pixels, every pixel's value is the minimum ACCUMULATED
cost to reach any source along an 8-connected path, where stepping
between adjacent pixels ``a -> b`` costs
``dist(a, b) * (friction[a] + friction[b]) / 2`` (``dist`` = 1
orthogonal, sqrt(2) diagonal — the classic knight's-move-off
convention shared by all three tools).

The reference delegates terrain/raster analysis to external GDAL
tooling (R/gdal-options.R); cost distance completes the
whole-mosaic-transform family (fill_sinks / flow_accumulation /
basins) with the additive-geodesic member — proximity.py's Euclidean
distance is the special case of a uniform friction of 1 with no
obstacle weighting.

Spark-first plan — like depression filling, a pixel's accumulated
cost can be set by a source arbitrarily far away, so no fixed-radius
halo suffices. Chaotic relaxation of a monotone map (the same shape
as :func:`vrtility_spark.hydrology.fill_sinks`):

1. **Seed** (one ``mapInPandas``, zero shuffle): every tile runs
   multi-source Dijkstra to its LOCAL fixpoint under the boundary it
   can prove — every halo position starts unknown (``+inf``: unlike
   fill_sinks there is no outlet convention; the void simply
   contributes no paths) — then emits its state plus 1-pixel boundary
   strips ``(dest_cell, hy, hx, acc, friction)`` addressed into each
   existing neighbor's padded frame. Strips carry the sender pixel's
   FRICTION alongside its accumulated cost because the receiver's
   relaxation step needs both (the half-sum rule above); friction is
   static per position, so min-merging the pair is exact.
2. **Rounds**: strips min-merge per halo position (map-side
   combinable ``min``); ONLY tiles whose halo strictly lowered re-run
   the local Dijkstra (an inner join against the strip table —
   untouched tiles are never rescanned) and re-emit strips for
   boundary pixels that lowered. Accumulated costs only ever decrease
   toward the global fixpoint; path costs are drawn from the finite
   set of simple-path costs (strictly positive friction makes
   non-simple paths strictly worse), so the rounds terminate;
   convergence is the scalar strip count hitting zero. Round count is
   bounded by the maximum number of TILE crossings of any optimal
   path (tile-grid diameter for monotone surfaces, more only for
   genuinely spiraling corridors).
3. **Assembly**: final states join the original tiles once to emit
   ``rawf32`` accumulated-cost payloads with the finite ``-9999``
   sentinel where the pixel is nodata/barrier OR unreachable from
   every source (the GIS-standard unreachable-is-nodata convention).

At 100 TB the shuffled volume per round is boundary strips
(``<= 2(w+h)+4`` pairs per touched tile) plus one f64 state plane per
TOUCHED tile — the imagery itself is scanned once at seed and once at
assembly, and quiescent regions (no source anywhere near) never
re-process after the seed pass.

Input contract: one multiband tile table (the composite/warp output
schema); ``cost_band`` holds the friction (affine-rescaled by
``cost_scale`` / ``cost_offset``; the result must be strictly
positive wherever valid — zero or negative friction would make the
"finitely many simple paths" termination argument false, so it
raises), ``source_band`` marks sources (``value >= source_threshold``).
Nodata in EITHER band is a barrier: no path enters such a pixel and
its output is nodata.

Kernel/oracle split (house rule): :func:`cost_distance_np` is the
whole-mosaic reference kernel (multi-source Dijkstra, used by
tools/gen_oracle_constants.py); the deliberately-naive
Bellman-Ford-to-fixpoint twin lives in tests/oracle.py, and
tests/test_costdist.py pins kernel == oracle on random fields plus
closed-form corridors before the distributed operator is pinned
against the kernel on assembled mosaics.
"""

from __future__ import annotations

import heapq
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vrtility_spark import cells, codec
from vrtility_spark.checkpointing import truncate_lineage

OUT_NODATA = -9999.0

#: the 8-neighborhood in (dy, dx) order shared by seed/update/halo-init
_NB_OFFSETS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
               (1, -1), (1, 0), (1, 1))

_SQRT2 = float(np.sqrt(2.0))

_CD_STATE, _CD_STRIP = 0, 1


# --------------------------------------------------------- kernels ----

def _cd_local(cost: np.ndarray, src: np.ndarray,
              halo_acc: np.ndarray, halo_cost: np.ndarray,
              ) -> np.ndarray:
    """Multi-source Dijkstra for ONE ``(H, W)`` friction plane under a
    FIXED boundary: ``halo_acc``/``halo_cost`` are the padded
    ``(H+2, W+2)`` rings of neighbor accumulated costs and frictions
    (``+inf``/NaN = no contribution). ``cost`` is the friction (NaN =
    barrier), ``src`` the boolean source mask. Returns the minimal
    accumulated cost per pixel given that boundary — the exact local
    fixpoint, so the cross-tile rounds only ever exchange boundary
    values, never iterate inside a tile. Barrier pixels return NaN;
    unreachable valid pixels return ``+inf`` (callers map both to the
    sentinel at the very end)."""
    H, W_ = cost.shape
    valid = np.isfinite(cost)
    acc = np.full((H, W_), np.inf)
    heap: list[tuple[float, int, int]] = []
    ys, xs = np.nonzero(src & valid)
    for y, x in zip(ys.tolist(), xs.tolist()):
        acc[y, x] = 0.0
        heapq.heappush(heap, (0.0, y, x))
    # halo entry seeds: ring position (hy, hx) touches the in-tile
    # pixels 8-adjacent to it; relax each with the half-sum step rule
    ring_ok = np.isfinite(halo_acc) & np.isfinite(halo_cost)
    hys, hxs = np.nonzero(ring_ok)
    for hy, hx in zip(hys.tolist(), hxs.tolist()):
        a0, c0 = float(halo_acc[hy, hx]), float(halo_cost[hy, hx])
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                y, x = hy - 1 + dy, hx - 1 + dx
                if not (0 <= y < H and 0 <= x < W_) or not valid[y, x]:
                    continue
                d = _SQRT2 if (dy != 0 and dx != 0) else 1.0
                cand = a0 + d * (c0 + float(cost[y, x])) / 2.0
                if cand < acc[y, x]:
                    acc[y, x] = cand
                    heapq.heappush(heap, (cand, y, x))
    while heap:
        v, y, x = heapq.heappop(heap)
        if v > acc[y, x]:
            continue                        # stale lazy-deletion entry
        c0 = float(cost[y, x])
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                ny, nx = y + dy, x + dx
                if not (0 <= ny < H and 0 <= nx < W_) \
                        or not valid[ny, nx]:
                    continue
                d = _SQRT2 if (dy != 0 and dx != 0) else 1.0
                cand = v + d * (c0 + float(cost[ny, nx])) / 2.0
                if cand < acc[ny, nx]:
                    acc[ny, nx] = cand
                    heapq.heappush(heap, (cand, ny, nx))
    return np.where(valid, acc, np.nan)


def backlink_np(cost: np.ndarray, acc: np.ndarray,
                halo_acc: np.ndarray | None = None,
                halo_cost: np.ndarray | None = None) -> np.ndarray:
    """D8 backlink codes (ArcGIS ``CostBackLink``) derived from a
    CONVERGED accumulated-cost plane: each reachable non-source pixel
    points at the predecessor ``q`` minimizing
    ``acc[q] + dist · (cost[q] + cost[p]) / 2`` — by the Dijkstra
    fixpoint this minimum EQUALS ``acc[p]`` (same float expression as
    the relaxation, so the argmin is exact, no tolerance) — with ties
    to the smallest D8 code (:data:`terrain.D8_CODES` convention, so
    :func:`hydrology.basins` can walk the result directly: walking
    backlinks lands on a source = cost ALLOCATION). Sources (acc 0)
    code 0; nodata/unreachable NaN. ``halo_acc``/``halo_cost`` supply
    the cross-tile ring in the distributed assembly (absent → no
    out-of-plane predecessors)."""
    from vrtility_spark.terrain import D8_CODES
    H, W_ = cost.shape
    pad_acc = (halo_acc.copy() if halo_acc is not None
               else np.full((H + 2, W_ + 2), np.inf))
    pad_cost = (halo_cost.copy() if halo_cost is not None
                else np.full((H + 2, W_ + 2), np.inf))
    pad_acc[1:-1, 1:-1] = np.where(np.isfinite(acc), acc, np.inf)
    pad_cost[1:-1, 1:-1] = np.where(np.isfinite(cost), cost, np.inf)
    best = np.full((H, W_), np.inf)
    code_out = np.zeros((H, W_))
    for code, dy, dx in D8_CODES:   # ascending: first strict winner
        q_acc = pad_acc[1 + dy:1 + dy + H, 1 + dx:1 + dx + W_]
        q_cost = pad_cost[1 + dy:1 + dy + H, 1 + dx:1 + dx + W_]
        d = _SQRT2 if (dy != 0 and dx != 0) else 1.0
        cand = q_acc + d * (q_cost + cost) / 2.0
        better = cand < best
        code_out = np.where(better, float(code), code_out)
        best = np.where(better, cand, best)
    out = np.where(acc == 0.0, 0.0, code_out)
    out[~(np.isfinite(acc) & np.isfinite(cost))] = np.nan
    return out


def _check_friction(cost: np.ndarray) -> None:
    bad = np.isfinite(cost) & (cost <= 0.0)
    if bad.any():
        raise ValueError(
            f"cost_distance: {int(bad.sum())} finite friction pixels "
            "are <= 0 after cost_scale/cost_offset; friction must be "
            "strictly positive (nodata = barrier) — rescale the cost "
            "band or mask non-traversable pixels to nodata")


def cost_distance_np(cost: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Whole-mosaic reference kernel: ``(H, W)`` friction plane (NaN =
    barrier, strictly positive elsewhere) + boolean source mask →
    accumulated-cost plane. Barriers return NaN; valid pixels
    unreachable from every source return ``+inf`` (the distributed
    operator maps both to the ``-9999`` sentinel at assembly). The
    obviously-correct Bellman-Ford fixpoint twin lives in
    tests/oracle.py; the distributed operator is pinned against THIS
    kernel run on the assembled mosaic."""
    cost = np.asarray(cost, np.float64)
    if cost.ndim != 2:
        raise ValueError("expected one (h, w) friction plane")
    _check_friction(cost)
    H, W_ = cost.shape
    ring = np.full((H + 2, W_ + 2), np.inf)
    return _cd_local(cost, np.asarray(src, bool), ring, ring)


# ---------------------------------------------------- distributed ----

def cost_distance(df: DataFrame, key: str = "cell_id",
                  cost_band: int = 0, source_band: int = 1,
                  source_threshold: float = 1.0,
                  cost_scale: float = 1.0, cost_offset: float = 0.0,
                  backlink: bool = False,
                  max_rounds: int = 256, reliable: bool = False,
                  checkpoint_dir: str | None = None) -> DataFrame:
    """Distributed cost-distance accumulation over a one-row-per-cell
    multiband tile table (GRASS ``r.cost`` / ArcGIS ``CostDistance``
    semantics — see the module docstring for the exact step rule and
    the chaotic-relaxation plan). Output schema == input schema with
    the payload replaced by a single ``rawf32`` accumulated-cost
    plane, ``-9999`` sentinel where nodata/barrier or unreachable.

    ``cost_band`` (affine-rescaled friction, must be > 0 where valid)
    and ``source_band`` (``value >= source_threshold`` marks sources)
    address planes of the SAME tile — rasterize sources first with
    :func:`vrtility_spark.rasterize.rasterize` + ``vrt_stack`` if they
    arrive as vectors. ``backlink=True`` appends a second plane of D8
    predecessor codes (:func:`backlink_np` — ArcGIS ``CostBackLink``;
    derived per tile from the converged state's halo, so it needs no
    extra rounds) — chain ``bands.subset_band_index(out, 1)`` into
    :func:`hydrology.basins` for cost ALLOCATION (every pixel labeled
    by the source it reaches cheapest, ArcGIS ``CostAllocation``).
    ``reliable``/``checkpoint_dir`` select durable checkpoints for
    the round states (the same policy knob as
    ``hydrology.fill_sinks``)."""
    names = df.columns
    for req in (key, "bytes", "w", "h", "fmt", "nodata"):
        if req not in names:
            raise ValueError(f"cost_distance input is missing column "
                             f"{req!r}")
    cost_band, source_band = int(cost_band), int(source_band)
    thr = float(source_threshold)
    scale, offset = float(cost_scale), float(cost_offset)

    def _ckpt(d, eager):
        return truncate_lineage(d, eager=eager, reliable=reliable,
                                checkpoint_dir=checkpoint_dir)

    slim_cols = [F.col(key).alias("cell"), "bytes", "w", "h", "fmt",
                 "nodata"]
    if "band_nodata" in names:
        slim_cols.append("band_nodata")
    tiles_slim = _ckpt(df.select(*slim_cols), True)

    # which of the 8 neighbors exist: one slim self-join, 8 rows/cell
    cell_ids = tiles_slim.select("cell").distinct()

    def _nb_rows(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for cid in pdf["cell"].tolist():
                zone, res, ix, iy = (int(v) for v in
                                     cells.decode_np(int(cid)))
                for k, (dy, dx) in enumerate(_NB_OFFSETS):
                    nb = cells.neighbor_cell(zone, res, ix, iy, dx, dy)
                    if nb is not None:
                        rows.append({"cell": int(cid), "k": k,
                                     "nb": int(nb)})
            yield pd.DataFrame(rows, columns=["cell", "k", "nb"])

    cand = cell_ids.mapInPandas(_nb_rows, schema="cell long, k int, "
                                                 "nb long")
    exists = (cand.join(cell_ids.withColumnRenamed("cell", "nb"), "nb")
              .groupBy("cell")
              .agg(F.sum(F.expr("shiftleft(1L, k)")).alias("nbmask")))
    work0 = tiles_slim.join(exists, "cell", "left") \
                      .fillna(0, subset=["nbmask"])

    step_schema = T.StructType([
        T.StructField("cell", T.LongType()),
        T.StructField("kind", T.IntegerType()),
        T.StructField("state", T.BinaryType()),
        T.StructField("hy", T.IntegerType()),
        T.StructField("hx", T.IntegerType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("val2", T.DoubleType()),
    ])
    _step_cols = [f.name for f in step_schema.fields]

    def _planes(row) -> tuple[np.ndarray, np.ndarray]:
        """Tile row → (friction plane, source mask)."""
        arr = codec.decode(row.bytes, int(row.w), int(row.h), row.fmt)
        nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                 row.nodata)
        A = codec.to_float_masked(arr, nd)
        hi = max(cost_band, source_band)
        if len(A) <= hi:
            raise ValueError(
                f"cost_distance: tile {int(getattr(row, 'cell'))} has "
                f"{len(A)} bands but cost_band={cost_band}, "
                f"source_band={source_band} were requested")
        cost = A[cost_band] * scale + offset
        _check_friction(cost)
        sv = A[source_band]
        src = np.isfinite(sv) & (sv >= thr)
        # barrier in EITHER band blocks the pixel entirely
        cost = np.where(np.isfinite(sv), cost, np.nan)
        return cost, src

    def _solve_emit(row, halo_acc: np.ndarray, halo_cost: np.ndarray,
                    prev: np.ndarray | None):
        """Solve to the local fixpoint under the halo and emit the
        state row + strips for boundary pixels that LOWERED vs
        ``prev`` (``None`` = seed round: every finite boundary value
        ships)."""
        cost, src = _planes(row)
        H, W_ = cost.shape
        zone, res, ix, iy = (int(v) for v in cells.decode_np(row.cell))
        acc = _cd_local(cost, src, halo_acc, halo_cost)
        rows = []
        send = np.where(np.isnan(acc), np.inf, acc)
        base = (np.where(np.isnan(prev), np.inf, prev)
                if prev is not None else np.full_like(send, np.inf))
        cost_send = np.where(np.isnan(cost), np.inf, cost)
        for k, (dy, dx) in enumerate(_NB_OFFSETS):
            dest = cells.neighbor_cell(zone, res, ix, iy, dx, dy)
            if dest is None:
                continue
            sl_y = slice(H - 1, H) if dy > 0 else \
                slice(0, 1) if dy < 0 else slice(0, H)
            sl_x = slice(W_ - 1, W_) if dx > 0 else \
                slice(0, 1) if dx < 0 else slice(0, W_)
            # receiver halo coords for this strip
            hy0 = 0 if dy > 0 else H + 1 if dy < 0 else 1
            hx0 = 0 if dx > 0 else W_ + 1 if dx < 0 else 1
            cut, old = send[sl_y, sl_x], base[sl_y, sl_x]
            cc = cost_send[sl_y, sl_x]
            py, px = np.nonzero(cut < old)
            for yy, xx in zip(py.tolist(), px.tolist()):
                rows.append({
                    "cell": int(dest), "kind": _CD_STRIP,
                    "state": None,
                    "hy": hy0 + (yy if dy == 0 else 0),
                    "hx": hx0 + (xx if dx == 0 else 0),
                    "val": float(cut[yy, xx]),
                    "val2": float(cc[yy, xx])})
        packed = np.concatenate(
            [send.ravel(), halo_acc.ravel(), halo_cost.ravel()])
        rows.append({"cell": int(row.cell), "kind": _CD_STATE,
                     "state": packed.astype("<f8").tobytes(),
                     "hy": None, "hx": None, "val": None,
                     "val2": None})
        return rows

    def _unpack_state(buf: bytes, H: int, W_: int):
        flat = np.frombuffer(buf, "<f8")
        n, m = H * W_, (H + 2) * (W_ + 2)
        acc = flat[:n].reshape(H, W_).copy()
        halo_acc = flat[n:n + m].reshape(H + 2, W_ + 2).copy()
        halo_cost = flat[n + m:].reshape(H + 2, W_ + 2).copy()
        return acc, halo_acc, halo_cost

    def _step_pdf(rows: list[dict]) -> pd.DataFrame:
        pdf = pd.DataFrame(rows, columns=_step_cols)
        pdf["cell"] = pd.array(pdf["cell"], dtype="Int64")
        for c in ("kind", "hy", "hx"):
            pdf[c] = pd.array(pdf[c], dtype="Int32")
        return pdf

    def seed_round(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                H, W_ = int(row.h), int(row.w)
                ring = np.full((H + 2, W_ + 2), np.inf)
                out.extend(_solve_emit(row, ring, ring.copy(), None))
            if out:
                yield _step_pdf(out)

    def update_round(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                H, W_ = int(row.h), int(row.w)
                prev, halo_acc, halo_cost = _unpack_state(
                    row.state, H, W_)
                lowered = False
                for s in row.inj:
                    hy, hx = int(s["hy"]), int(s["hx"])
                    if not (0 <= hy < H + 2 and 0 <= hx < W_ + 2):
                        raise ValueError(
                            f"cost_distance: halo strip at ({hy},{hx}) "
                            f"is outside the padded {H + 2}x{W_ + 2} "
                            f"frame of cell {row.cell} — mixed tile "
                            "dims are not supported")
                    v = float(s["val"])
                    if v < halo_acc[hy, hx]:
                        halo_acc[hy, hx] = v
                        halo_cost[hy, hx] = float(s["val2"])
                        lowered = True
                if lowered:
                    out.extend(_solve_emit(row, halo_acc, halo_cost,
                                           prev))
                else:       # strips were stale: keep the state as-is
                    out.append({"cell": int(row.cell),
                                "kind": _CD_STATE, "state": row.state,
                                "hy": None, "hx": None, "val": None,
                                "val2": None})
            if out:
                yield _step_pdf(out)

    step = _ckpt(work0.mapInPandas(seed_round, schema=step_schema),
                 False)
    states = step.where(F.col("kind") == _CD_STATE) \
                 .select("cell", "state")
    strips = step.where(F.col("kind") == _CD_STRIP)
    pending = strips.count()
    rounds = 0
    while pending:
        rounds += 1
        if rounds > max_rounds:
            raise ValueError(
                f"cost_distance did not converge in {max_rounds} "
                f"rounds ({pending} boundary strips still pending). "
                "Costs propagate one tile per round, so an optimal "
                "path crossing more tiles than max_rounds needs a "
                "higher bound (rounds are cheap: only touched tiles "
                "re-run).")
        inflows = (strips.groupBy("cell", "hy", "hx")
                   .agg(F.min("val").alias("val"),
                        F.min("val2").alias("val2"))
                   .groupBy("cell")
                   .agg(F.collect_list(F.struct("hy", "hx", "val",
                                                "val2")).alias("inj")))
        work = tiles_slim.join(states, "cell").join(inflows, "cell")
        step = _ckpt(work.mapInPandas(update_round, schema=step_schema),
                     False)
        new_states = step.where(F.col("kind") == _CD_STATE) \
                         .select("cell", "state")
        states = _ckpt(
            states.join(inflows.select("cell"), "cell", "left_anti")
                  .unionByName(new_states), False)
        strips = step.where(F.col("kind") == _CD_STRIP)
        pending = strips.count()

    in_fields = [T.StructField(f.name, f.dataType, True)
                 for f in df.schema.fields]
    out_schema = T.StructType(in_fields)
    meta_null = [c for c in ("band_scale", "band_offset", "band_nodata")
                 if c in names]

    def assemble(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                H, W_ = int(row.h), int(row.w)
                acc, ha, hc = _unpack_state(row.state, H, W_)
                plane = np.where(np.isfinite(acc), acc, np.nan)[None]
                if backlink:
                    cost, _src = _planes(row)
                    bl = backlink_np(cost, acc, ha, hc)
                    plane = np.concatenate([plane, bl[None]])
                d = {c: getattr(row, c) for c in names if c != key}
                d[key] = int(row.cell)
                d["bytes"] = codec.encode(
                    codec.from_float(plane, OUT_NODATA, np.float32),
                    "rawf32")
                d["fmt"] = "rawf32"
                d["nodata"] = OUT_NODATA
                for c in meta_null:
                    d[c] = None
                out.append(d)
            if out:
                yield pd.DataFrame(out, columns=names)

    return (df.withColumnRenamed(key, "cell")
            .join(states, "cell")
            .mapInPandas(assemble, schema=out_schema))
