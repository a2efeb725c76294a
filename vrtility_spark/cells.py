"""Hierarchical spatial cell index (quadtree over synthetic planar zones).

Plays the role that target-grid alignment plays in the reference
(``vrt_warp``, /root/reference/R/vrt-warp.R:34-246): once footprints are
mapped to cells, everything downstream (stacking, compositing, spatial
joins, kNN) is an equi-join / groupBy on ``cell_id``.

Design constraints:

1. **Pure integer arithmetic** — the same cell id is computable three
   ways with bit-identical results: NumPy (inside pixel kernels), Spark
   ``Column`` expressions (Catalyst codegen, *no UDF*), and ANSI SQL
   (DuckDB oracles). This is what makes the engine's join output
   exactly verifiable.
2. **Power-of-two zone span** (2**20 m) so cell sizes are exact binary
   floats and ``floor(x / size)`` is deterministic across engines.

Encoding (fits int64):

    cell_id = ((zone * 16 + res) * 8192 + iy) * 8192 + ix

with ``res`` in [0, 13] and ``ix, iy`` in [0, 2**res).  A *parent* at
``res - k`` (the ``cell_prefix`` join key) divides ix/iy by ``2**k`` —
mirroring H3's parent/child truncation semantics.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

ZONE_SPAN = 1048576.0  # 2**20 metres — one synthetic planar "UTM-like" zone
MAX_RES = 13
_B = 8192  # 2**13, ix/iy radix


def cell_size(res: int) -> float:
    """Edge length of a cell at resolution ``res`` (exact binary float)."""
    return ZONE_SPAN / (1 << res)


# ---------------------------------------------------------------- numpy ----

def encode_np(zone, res, ix, iy):
    """Vectorized encode; inputs broadcast, int64 out."""
    zone = np.asarray(zone, dtype=np.int64)
    ix = np.asarray(ix, dtype=np.int64)
    iy = np.asarray(iy, dtype=np.int64)
    return ((zone * 16 + res) * _B + iy) * _B + ix


def decode_np(cell_id):
    """Inverse of :func:`encode_np` → (zone, res, ix, iy), all int64."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    ix = cell_id % _B
    t = cell_id // _B
    iy = t % _B
    t = t // _B
    res = t % 16
    zone = t // 16
    return zone, res, ix, iy


def xy_to_cell_np(zone, x, y, res: int):
    """Map points in zone coordinates to cell ids (clipped to the zone)."""
    size = cell_size(res)
    n = (1 << res) - 1
    ix = np.clip(np.floor(np.asarray(x) / size).astype(np.int64), 0, n)
    iy = np.clip(np.floor(np.asarray(y) / size).astype(np.int64), 0, n)
    return encode_np(zone, res, ix, iy)


def parent_np(cell_id, k: int = 1):
    """Ancestor cell ``k`` levels up — the ``cell_prefix`` join key."""
    zone, res, ix, iy = decode_np(cell_id)
    return encode_np(zone, res - k, ix >> k, iy >> k)


def cover_bbox_np(zone: int, xmin: float, ymin: float, xmax: float, ymax: float, res: int):
    """All cells at ``res`` intersecting an axis-aligned bbox (1-D int64).

    The covering-cell analogue of the reference's AOI windowing
    (``projwin`` pushdown, /root/reference/R/vrt-warp.R:473-477).
    """
    size = cell_size(res)
    n = (1 << res) - 1
    ix0 = int(np.clip(np.floor(xmin / size), 0, n))
    iy0 = int(np.clip(np.floor(ymin / size), 0, n))
    # upper edges exclusive: a bbox touching a cell boundary does not
    # enter the next cell
    ix1 = int(np.clip(np.ceil(xmax / size) - 1, 0, n))
    iy1 = int(np.clip(np.ceil(ymax / size) - 1, 0, n))
    ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(ixs, iys)
    return encode_np(zone, res, gx.ravel(), gy.ravel())


def disk_np(cell_id: int, k: int):
    """Cells with Chebyshev distance <= k (the kNN ring-expansion disk)."""
    zone, res, ix, iy = decode_np(cell_id)
    n = (1 << int(res)) - 1
    xs = np.arange(max(0, int(ix) - k), min(n, int(ix) + k) + 1, dtype=np.int64)
    ys = np.arange(max(0, int(iy) - k), min(n, int(iy) + k) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return encode_np(int(zone), int(res), gx.ravel(), gy.ravel())


def ring_np(cell_id: int, k: int):
    """Cells at Chebyshev distance exactly k (k=0 → the cell itself)."""
    if k == 0:
        return np.asarray([cell_id], dtype=np.int64)
    inner = set(disk_np(cell_id, k - 1).tolist())
    return np.asarray(
        [c for c in disk_np(cell_id, k).tolist() if c not in inner], dtype=np.int64
    )


# ------------------------------------------------------- spark columns ----

def xy_to_cell_col(zone: Column, x: Column, y: Column, res: int) -> Column:
    """Cell id as a pure ``Column`` expression (whole-stage codegen).

    No UDF: the index is arithmetic by design so Catalyst folds it into
    the scan/join stage.
    """
    size = F.lit(cell_size(res))
    n = F.lit((1 << res) - 1)
    ix = F.greatest(F.lit(0), F.least(n, F.floor(x / size))).cast("long")
    iy = F.greatest(F.lit(0), F.least(n, F.floor(y / size))).cast("long")
    return ((zone.cast("long") * 16 + F.lit(res)) * _B + iy) * _B + ix


def encode_cols(zone: Column, res: int, ix: Column, iy: Column) -> Column:
    """Cell id from already-computed integer tile indices as a pure
    ``Column`` expression — the Column twin of :func:`encode_np` (and
    the single place, with :func:`xy_to_cell_col`, that spells the
    radix layout in Catalyst; operators must NOT inline ``8192``/``16``
    literals)."""
    return ((zone.cast("long") * 16 + F.lit(int(res))) * _B
            + iy.cast("long")) * _B + ix.cast("long")


def res_col(cell_id: Column) -> Column:
    """Resolution field of a cell id as a Column expression — the
    single place that knows the radix layout (keep operators off
    inline ``8192*8192``/``16`` literals)."""
    return F.floor(cell_id / F.lit(_B * _B)) % 16


def zone_col(cell_id: Column) -> Column:
    """Zone field of a cell id as a Column expression."""
    return F.floor(cell_id / F.lit(16 * _B * _B))


def parent_col(cell_id: Column, k: int = 1) -> Column:
    """``cell_prefix`` as a Column expression (ancestor ``k`` levels up)."""
    ix = cell_id % _B
    t = F.floor(cell_id / _B)
    iy = t % _B
    t2 = F.floor(t / _B)
    res = t2 % 16
    zone = F.floor(t2 / 16)
    return (
        (zone * 16 + (res - k)) * _B + F.floor(iy / F.lit(1 << k))
    ) * _B + F.floor(ix / F.lit(1 << k))


def xy_to_cell_sql(zone: str, x: str, y: str, res: int) -> str:
    """The same cell id as an ANSI-SQL expression (DuckDB oracle parity)."""
    size = cell_size(res)
    n = (1 << res) - 1
    ix = f"greatest(0, least({n}, cast(floor(({x}) / {size!r}) as bigint)))"
    iy = f"greatest(0, least({n}, cast(floor(({y}) / {size!r}) as bigint)))"
    return f"((cast({zone} as bigint) * 16 + {res}) * {_B} + {iy}) * {_B} + {ix}"


# ------------------------------------------------- zone world frame ----
#
# Cross-zone reprojection model (the reference's defining normalization:
# vrt_warp unifies scenes from DIFFERENT CRS onto one target grid —
# /root/reference/R/vrt-warp.R:34-246; its fixture deliberately spans
# 3 CRS, data-raw/s2-test-data-create.R:40-48). SURVEY.md §6 scopes the
# synthetic planar zones so the inter-CRS transform is CLOSED-FORM:
# every zone is an affine parameterization of one shared world plane,
#
#     world = zone_origin(z) + (x, y)
#
# so zone a → zone b is the exact translation (origin(a) - origin(b)).
# Origins are integer multiples of cell_size(4) (= 65536 m, an exact
# binary float): the transform is bit-exact in NumPy, Catalyst and SQL,
# AND scene footprints that tile one zone's grid still tile another's —
# reprojected scenes stay pixel-aligned, so cross-zone composites need
# no resampling (the translation analogue of the reference warping
# everything onto a common target grid before stacking).

ZONE_ORIGIN_STEP = 65536.0  # cell_size(4), exact binary float


def zone_origin(zone: int) -> tuple[float, float]:
    """World-frame origin of a zone (closed-form, deterministic)."""
    return ((zone % 5) * ZONE_ORIGIN_STEP, ((3 * zone) % 5) * ZONE_ORIGIN_STEP)


def zone_shift_np(src_zone, dst_zone):
    """(dx, dy) adding which maps src-zone coords into dst-zone coords."""
    src = np.asarray(src_zone, dtype=np.int64)
    dst = np.asarray(dst_zone, dtype=np.int64)
    dx = (src % 5 - dst % 5).astype(np.float64) * ZONE_ORIGIN_STEP
    dy = ((3 * src) % 5 - (3 * dst) % 5).astype(np.float64) * ZONE_ORIGIN_STEP
    return dx, dy


def zone_shift_cols(src_zone: Column, dst_zone: int) -> tuple[Column, Column]:
    """The same shift as Column expressions (whole-stage codegen)."""
    step = F.lit(ZONE_ORIGIN_STEP)
    dst_ox, dst_oy = zone_origin(int(dst_zone))
    dx = (src_zone.cast("long") % 5).cast("double") * step - F.lit(dst_ox)
    dy = ((src_zone.cast("long") * 3) % 5).cast("double") * step - F.lit(dst_oy)
    return dx, dy


def zone_shift_sql(src_zone: str, dst_zone: int) -> tuple[str, str]:
    """The same shift as ANSI-SQL expressions (DuckDB oracle parity)."""
    dst_ox, dst_oy = zone_origin(int(dst_zone))
    dx = (f"(cast(({src_zone}) % 5 as double) * {ZONE_ORIGIN_STEP!r}"
          f" - {dst_ox!r})")
    dy = (f"(cast((({src_zone}) * 3) % 5 as double) * {ZONE_ORIGIN_STEP!r}"
          f" - {dst_oy!r})")
    return dx, dy


def cell_center_np(cell_id):
    """(x, y) of cell centers — used for kNN distance refinement."""
    _, res, ix, iy = decode_np(cell_id)
    size = ZONE_SPAN / np.power(2.0, res.astype(np.float64))
    return (ix.astype(np.float64) + 0.5) * size, (iy.astype(np.float64) + 0.5) * size


def neighbor_cell(zone: int, res: int, ix: int, iy: int,
                  dx: int, dy: int) -> int | None:
    """Adjacent cell id, or None past the zone edge (zones are
    disjoint planar frames — windows/regions stop there). The single
    home of this arithmetic: the focal halo exchange and the region
    seam addressing must agree on it."""
    n = 1 << res
    jx, jy = ix + dx, iy + dy
    if not (0 <= jx < n and 0 <= jy < n):
        return None
    return int(encode_np(zone, res, jx, jy))


def cell_frame_np(cell_id):
    """World-frame ``(x0, y0, size)`` of each cell: the zone origin plus
    the cell's offset inside its zone (all exact binary floats)."""
    zone, res, ix, iy = decode_np(cell_id)
    size = ZONE_SPAN / np.power(2.0, res.astype(np.float64))
    ox = (zone % 5).astype(np.float64) * ZONE_ORIGIN_STEP
    oy = ((3 * zone) % 5).astype(np.float64) * ZONE_ORIGIN_STEP
    return ox + ix.astype(np.float64) * size, oy + iy.astype(np.float64) * size, size


def cell_frame_cols(cell_id: Column) -> tuple[Column, Column, Column]:
    """:func:`cell_frame_np` as Column expressions (whole-stage codegen;
    keeps the radix layout out of operator code, like :func:`res_col`)."""
    ix = cell_id % _B
    t = F.floor(cell_id / _B)
    iy = t % _B
    res = res_col(cell_id)
    zone = zone_col(cell_id)
    size = F.lit(ZONE_SPAN) / F.pow(F.lit(2.0), res.cast("double"))
    ox = (zone % 5).cast("double") * F.lit(ZONE_ORIGIN_STEP)
    oy = ((zone * 3) % 5).cast("double") * F.lit(ZONE_ORIGIN_STEP)
    return (ox + ix.cast("double") * size,
            oy + iy.cast("double") * size, size)
