"""D8 flow accumulation over the distributed cell grid — the
hydrology stage after :func:`vrtility_spark.terrain.terrain`'s
``flowdir`` (ESRI FlowAccumulation / GRASS ``r.watershed`` / WhiteboxTools
``D8FlowAccum`` semantics): each pixel's value is the COUNT of upstream
pixels whose D8 drainage path passes through it (exclusive of itself,
the ESRI convention). Stream networks are then one threshold away
(``accumulation >= T`` — :func:`stream_mask`).

The reference delegates terrain analysis to external GDAL tooling
(R/gdal-options.R); accumulation completes the hydrology family
(slope/aspect/hillshade/flowdir) the same way sieve/proximity/polygonize
completed the gdal_* utility family.

Spark-first plan — the whole-DEM transform is NOT focal (a pixel's
value depends on arbitrarily distant upstream terrain), so it cannot
ride a fixed-radius halo exchange. Instead:

1. **Local phase** (one ``mapInPandas``, zero shuffle): every tile
   seeds one unit of mass per valid pixel and pushes it down its own
   D8 pointers (vectorized frontier sweep — pure ``np.add.at`` rounds,
   no per-pixel Python). Receipts accumulate in an exact float64
   plane; mass reaching a tile edge becomes a tiny ``(dest_cell, band,
   py, px, mass)`` OUTFLOW record — bounded by the tile perimeter
   (``<= 2(w+h)`` rows per tile per round), so tile BYTES never
   shuffle, only boundary mass does.
2. **Cross-tile rounds**: outflows group by destination cell
   (map-side combinable sum), join back to the slim checkpointed codes
   table (only tiles that actually received mass re-process — an
   inner join, not a full pass), inject at the entry pixels, and push
   again. Per-round lineage is truncated (``localCheckpoint``, or
   durable checkpoints with ``reliable=True`` — the same policy knob
   as :func:`vrtility_spark.dedup.connected_components`); convergence
   is the scalar outflow count hitting zero. Round count = the maximum
   number of TILE crossings of any drainage path (grid diameter at
   worst, typically far less), not path length in pixels.
3. **Final assembly**: the per-round receipt planes (one small binary
   row per touched tile per round) merge in ONE grouped sum, then join
   the original tiles to emit ``rawf32`` payloads with the finite
   ``-9999`` sentinel (same contract as :mod:`terrain`).

At 100 TB the shuffled volume per round is perimeter mass records plus
one f64 plane per TOUCHED tile — orders of magnitude under the DEM
itself; the DEM scan happens exactly once.

Counting convention (kernel ≡ distributed, loop-oracle-gated in
tests/test_hydrology.py): valid pixels (finite D8 code) each
contribute one unit; mass moves only from pixels with code > 0; every
receipt counts; sinks (code 0) and nodata-code pixels absorb; a
pointer off the DEM edge (or into a cell absent from the table)
absorbs silently — on flowdir-derived codes this cannot occur, since
any pixel whose 3x3 window left the mosaic already coded NaN. Counts
are exact integers in float64 throughout; the ``rawf32`` payload is
exact up to 2**24 upstream pixels per pixel — beyond that (a
~4000 km² single-outlet basin at 10 m), read the float32 as the
GIS-standard approximate accumulation it is everywhere else too.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vrtility_spark import cells, codec
from vrtility_spark.checkpointing import truncate_lineage
from vrtility_spark.terrain import D8_CODES

OUT_NODATA = -9999.0

#: absorb marker in the per-tile destination table
_ABSORB = -1
#: off-tile marker base: dest = _OFF_BASE - ((cdy+1)*3 + (cdx+1))
_OFF_BASE = -2


def _dest_tables(c: np.ndarray):
    """Per-pixel move tables for one ``(H, W)`` code plane: ``dest``
    (in-tile flat index, ``_ABSORB``, or an off-tile marker), the
    receiving NEIGHBOR's flat pixel index for off-tile moves, and the
    neighbor offset ``(cdy, cdx)`` per marker."""
    H, W = c.shape
    dest = np.full(H * W, _ABSORB, np.int64)
    off_flat = np.full(H * W, -1, np.int64)
    for code, dy, dx in D8_CODES:
        py, px = np.nonzero(c == code)
        if py.size == 0:
            continue
        ny, nx = py + dy, px + dx
        cdy = (ny < 0).astype(np.int64) * -1 + (ny >= H).astype(np.int64)
        cdx = (nx < 0).astype(np.int64) * -1 + (nx >= W).astype(np.int64)
        flat = py * W + px
        inb = (cdy == 0) & (cdx == 0)
        dest[flat[inb]] = ny[inb] * W + nx[inb]
        out = ~inb
        if out.any():
            dest[flat[out]] = _OFF_BASE - ((cdy[out] + 1) * 3
                                           + (cdx[out] + 1))
            off_flat[flat[out]] = ((ny[out] - cdy[out] * H) * W
                                   + (nx[out] - cdx[out] * W))
    return dest, off_flat


def _push(c: np.ndarray, pending: np.ndarray, acc: np.ndarray):
    """Push ``pending`` mass down one ``(H, W)`` code plane until it
    all rests on absorbers or leaves the tile. Mutates ``acc`` (flat
    f64 receipts) and returns ``{(cdy, cdx): (H, W) outflow mass}``
    keyed by neighbor offset, addressed in the NEIGHBOR's frame."""
    H, W = c.shape
    n = H * W
    dest, off_flat = _dest_tables(c)
    can_move = dest != _ABSORB
    pend = pending.ravel().copy()
    out: dict[tuple[int, int], np.ndarray] = {}
    frontier = np.flatnonzero((pend > 0) & can_move)
    guard = 0
    while frontier.size:
        amt = pend[frontier]
        pend[frontier] = 0.0
        d = dest[frontier]
        intile = d >= 0
        if intile.any():
            di = d[intile]
            np.add.at(acc, di, amt[intile])
            np.add.at(pend, di, amt[intile])
        offsel = ~intile
        if offsel.any():
            src = frontier[offsel]
            amt_off = amt[offsel]
            for marker in np.unique(d[offsel]):
                k = int(_OFF_BASE - marker)
                cdy, cdx = k // 3 - 1, k % 3 - 1
                buf = out.setdefault((cdy, cdx), np.zeros(n))
                sel = dest[src] == marker
                np.add.at(buf, off_flat[src[sel]], amt_off[sel])
        nxt = np.unique(d[intile])
        frontier = nxt[(pend[nxt] > 0) & can_move[nxt]]
        guard += 1
        if guard > n + 8:
            raise ValueError(
                "flow_accumulation: cycle detected in D8 codes — input "
                "is not a flowdir product (steepest descent cannot "
                "cycle); fix the code plane before accumulating")
    return {k: v.reshape(H, W) for k, v in out.items()}


def flow_accumulation_np(codes: np.ndarray) -> np.ndarray:
    """Whole-mosaic reference kernel: ``(B, H, W)`` D8 code planes
    (NaN = nodata) → float64 upstream-pixel counts (NaN where the code
    was nodata). Bands accumulate independently. Pointers off the
    array edge absorb. The naive path-walking twin lives in
    tests/oracle.py; the distributed operator is pinned against THIS
    kernel run on the assembled mosaic."""
    codes = np.asarray(codes, np.float64)
    if codes.ndim != 3:
        raise ValueError("expected (bands, h, w) code planes")
    B, H, W = codes.shape
    result = np.full((B, H, W), np.nan)
    for b in range(B):
        c = codes[b]
        valid = np.isfinite(c)
        acc = np.zeros(H * W)
        outs = _push(c, valid.astype(np.float64), acc)
        # off-array mass is absorbed by the void — nothing to re-inject
        del outs
        plane = acc.reshape(H, W)
        result[b] = np.where(valid, plane, np.nan)
    return result


# ------------------------------------------------- distributed driver ----

_K_CONTRIB, _K_FLOW = 0, 1


def flow_accumulation(df: DataFrame, key: str = "cell_id",
                      max_rounds: int = 128,
                      reliable: bool = False,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """Distributed D8 flow accumulation over a one-row-per-cell tile
    table of flow-direction codes (the output of
    ``terrain(df, "flowdir")``; any payload holding ESRI D8 codes
    works). Output schema == input schema with the payload replaced by
    ``rawf32`` upstream counts, ``-9999`` sentinel nodata (per-band
    metadata arrays nulled — the scalar is authoritative), chainable
    like every other cell-keyed operator.

    All tiles must share ``w``/``h`` (the warp grid guarantees it);
    mass crossing into a differently-sized neighbor raises. See the
    module header for the plan and its shuffle budget.
    """
    names = df.columns
    for req in (key, "bytes", "w", "h", "fmt", "nodata"):
        if req not in names:
            raise ValueError(f"flow_accumulation input is missing "
                             f"column {req!r}")

    def _ckpt(d, eager):
        return truncate_lineage(d, eager=eager, reliable=reliable,
                                checkpoint_dir=checkpoint_dir)

    slim_cols = [F.col(key).alias("cell"), "bytes", "w", "h", "fmt",
                 "nodata"]
    if "band_nodata" in names:
        slim_cols.append("band_nodata")
    tiles_slim = _ckpt(df.select(*slim_cols), True)

    step_schema = T.StructType([
        T.StructField("cell", T.LongType()),
        T.StructField("kind", T.IntegerType()),
        T.StructField("nb", T.IntegerType()),
        T.StructField("acc", T.BinaryType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("mass", T.DoubleType()),
    ])

    def _decode_codes(row) -> np.ndarray:
        arr = codec.decode(row.bytes, int(row.w), int(row.h), row.fmt)
        nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                 row.nodata)
        return codec.to_float_masked(arr, nd)

    def _tile_step(row, inject) -> list[dict]:
        """One tile, one round: seed (round 0) or inject (later
        rounds), push, emit a receipt plane + outflow records."""
        C = _decode_codes(row)
        B, H, W = C.shape
        zone, res, ix, iy = (int(v) for v in cells.decode_np(row.cell))
        acc = np.zeros((B, H * W))
        pending = np.zeros((B, H, W))
        if inject is None:
            pending[np.isfinite(C)] = 1.0
        else:
            for b, py, px, mass in inject:
                if not (0 <= b < B and 0 <= py < H and 0 <= px < W):
                    raise ValueError(
                        f"flow_accumulation: inflow at band {b} pixel "
                        f"({py},{px}) is outside the {B}x{H}x{W} tile "
                        f"of cell {row.cell} — mixed tile dims are not "
                        "supported")
                # a cross-tile arrival IS a receipt (the sender could
                # not count it), and it keeps flowing from here
                acc[b, py * W + px] += mass
                pending[b, py, px] += mass
        rows = []
        for b in range(B):
            outs = _push(C[b], pending[b], acc[b])
            for (cdy, cdx), plane in outs.items():
                dest = cells.neighbor_cell(zone, res, ix, iy, cdx, cdy)
                if dest is None:
                    continue  # zone edge: the void absorbs
                py, px = np.nonzero(plane)
                for yy, xx in zip(py.tolist(), px.tolist()):
                    rows.append({"cell": dest, "kind": _K_FLOW,
                                 "nb": None, "acc": None, "band": b,
                                 "py": int(yy), "px": int(xx),
                                 "mass": float(plane[yy, xx])})
        rows.append({"cell": int(row.cell), "kind": _K_CONTRIB,
                     "nb": B, "acc": acc.astype("<f8").tobytes(),
                     "band": None, "py": None, "px": None,
                     "mass": None})
        return rows

    _step_cols = [f.name for f in step_schema.fields]

    def _step_pdf(rows: list[dict]) -> pd.DataFrame:
        # explicit nullable-int dtypes: a mixed int/None column would
        # otherwise infer float64 and corrupt 2^59-scale cell ids
        pdf = pd.DataFrame(rows, columns=_step_cols)
        pdf["cell"] = pd.array(pdf["cell"], dtype="Int64")
        for c in ("kind", "nb", "band", "py", "px"):
            pdf[c] = pd.array(pdf[c], dtype="Int32")
        return pdf

    def seed_round(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                out.extend(_tile_step(row, None))
            if out:
                yield _step_pdf(out)

    def inject_round(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                inject = [(int(s["band"]), int(s["py"]), int(s["px"]),
                           float(s["mass"])) for s in row.inj]
                out.extend(_tile_step(row, inject))
            if out:
                yield _step_pdf(out)

    step = _ckpt(tiles_slim.mapInPandas(seed_round, schema=step_schema),
                 False)
    contribs = step.where(F.col("kind") == _K_CONTRIB) \
                   .select("cell", "nb", "acc")
    flows = step.where(F.col("kind") == _K_FLOW)
    pending = flows.count()  # materializes the round-0 checkpoint
    rounds = 0
    while pending:
        rounds += 1
        if rounds > max_rounds:
            sample = [(int(r.cell), int(r.band), int(r.py), int(r.px),
                       float(r.mass))
                      for r in flows.select("cell", "band", "py", "px",
                                            "mass").limit(5).collect()]
            raise ValueError(
                f"flow_accumulation did not converge in {max_rounds} "
                f"rounds ({pending} boundary-flow records still "
                "pending). EITHER a drainage path crosses more tiles "
                "than max_rounds — raise it (rounds are cheap: only "
                "touched tiles re-process) — OR the code planes "
                "contain a CROSS-TILE cycle (tile A's edge pixel "
                "points into tile B and B's entry drains back into "
                "A), which can never converge at any bound: "
                "flowdir-derived codes cannot cycle, so inspect how "
                "these planes were produced. Sample pending inflows "
                f"(cell, band, py, px, mass): {sample}")
        # map-side combinable pre-sum: parallel inflows to one pixel
        # collapse before the collect_list
        inflows = (flows.groupBy("cell", "band", "py", "px")
                   .agg(F.sum("mass").alias("mass"))
                   .groupBy("cell")
                   .agg(F.collect_list(F.struct("band", "py", "px",
                                                "mass")).alias("inj")))
        work = tiles_slim.join(inflows, "cell")
        step = _ckpt(work.mapInPandas(inject_round, schema=step_schema),
                     False)
        contribs = contribs.unionByName(
            step.where(F.col("kind") == _K_CONTRIB)
                .select("cell", "nb", "acc"))
        flows = step.where(F.col("kind") == _K_FLOW)
        pending = flows.count()

    merged = (contribs.groupBy("cell")
              .agg(F.collect_list("acc").alias("accs"),
                   F.first("nb").alias("nb")))

    in_fields = [T.StructField(f.name, f.dataType, True)
                 for f in df.schema.fields]
    out_schema = T.StructType(in_fields)
    meta_null = [c for c in ("band_scale", "band_offset", "band_nodata")
                 if c in names]

    def assemble(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                C = _decode_codes(row)
                B, H, W = C.shape
                total = np.zeros((B, H * W))
                for buf in row.accs:
                    total += np.frombuffer(buf, "<f8").reshape(B, -1)
                plane = np.where(np.isfinite(C),
                                 total.reshape(B, H, W), np.nan)
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

    final = (df.withColumnRenamed(key, "cell")
             .join(merged, "cell")
             .mapInPandas(assemble, schema=out_schema))
    return final


def stream_mask(df: DataFrame, threshold: float, band: int = 0,
                key: str = "cell_id") -> DataFrame:
    """Stream network extraction: accumulation tiles → 0/1 class tiles
    (``1`` where ``accumulation >= threshold``, nodata preserved) — a
    one-break :func:`vrtility_spark.algebra.classify` (narrow Arrow
    map, no shuffle), ready for :func:`regions.polygonize` to
    vectorize the channel network."""
    from vrtility_spark.algebra import classify
    return classify(df, [float(threshold)], band=band, key=key)
