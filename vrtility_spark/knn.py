"""kNN tile queries via a two-phase count-then-probe cell search.

Required by BASELINE.json's ``north_rule`` (the reference has no kNN
operator — SURVEY.md §2.3 J6). For each query point, find the K
nearest scene tiles (distance = query point → tile center), exactly.

Design (two Spark jobs total, loop-free in the common case):

1. **Count phase** — enumerate candidate cells in a Chebyshev disk
   around each query's cell (driver-side: the query set is a bounded
   user-supplied probe list by contract, never the tile table) and run
   ONE aggregation job: ``broadcast(cells) ⋈ tiles → count per
   (query, cell)``. The result is tiny (≤ cells probed) and gives the
   driver, per query, the smallest radius ``r0`` whose disk already
   holds ≥ K tiles. Queries in locally sparse regions double the count
   radius and re-count — but each extra round is a cheap counting
   aggregate, not a candidate materialization.
2. **Probe phase** — the disk(r0) guarantee bounds the Kth distance by
   ``d0 = (r0+1)·cell_size·√2`` (query anywhere inside its cell, tile
   anywhere inside the farthest disk cell), so every true neighbour
   lies within Chebyshev cell radius ``r1 = ceil(√2·(r0+1))``. One
   broadcast join on the disk(r1) cells + a per-query ``row_number``
   window over distance produces the exact top-K.

At 10^12-tile scale both phases stay cheap: the count job is a
map-side-combined aggregate over a cached/bucketed tile table, and the
probe fanout is bounded by K / local density — never the table size.
When a probe disk would cover most of a zone (fewer than K tiles in
the zone), the join degrades gracefully to a per-zone equi-join
instead of enumerating cells.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vrtility_spark.cells import _B, cell_size, encode_np
from vrtility_spark.checkpointing import truncate_lineage

_SQRT2 = math.sqrt(2.0)

_OUT_SCHEMA = ("query_id string, image_id string, dist double, rank int, "
               "caption string, phash long")


def knn_tiles_distributed(tiles: DataFrame, queries: DataFrame, res: int,
                          max_rings: int = 64,
                          initial_radius: int | None = None,
                          n_tiles_hint: int | None = None,
                          persist: bool = True, reliable: bool = False,
                          checkpoint_dir: str | None = None) -> DataFrame:
    """Exact K nearest tiles per query — the DISTRIBUTED-QUERIES twin
    of :func:`knn_tiles` for 10⁶+-row query tables.

    :func:`knn_tiles` collects the query table to the driver (right
    for ad-hoc probe lists; documented there). Here the query table
    stays a DataFrame end to end: candidate disk cells are generated
    executor-side (two ``explode(sequence(...))`` generators per
    radius round), counted against a per-cell tile-count aggregate
    (computed ONCE and reused every round), and each query's minimal
    disk radius ``r0`` falls out of a per-query cumulative ring sum —
    one window over rings, never a per-query driver loop. The ONLY
    thing that ever reaches the driver is one scalar per round: the
    count of still-under-filled queries, which decides whether to
    double the count radius. The probe phase is the same disk(r1)
    guarantee as :func:`knn_tiles` (``r1 = ceil(√2·(r0+1))``), with the
    per-query radius driving a column-valued ``sequence`` explode, and
    the same graceful per-zone equi-join when a disk covers its zone.

    Scale shape: the count join moves (pending × (2rc+1)²) tiny key
    rows against the cell-count table (itself bounded by the number of
    distinct occupied cells, not tiles); the probe fanout is bounded by
    K/local-density per query. Nothing query-sized or tile-sized is
    ever collected. Results are row-identical to :func:`knn_tiles` on
    the same input (pytest-pinned).
    """
    spark = tiles.sparkSession
    size = cell_size(res)
    nmax = (1 << res) - 1
    nside = 1 << res

    tiles_p = tiles.select(
        "cell_id", "image_id", "caption", "phash",
        ((F.col("xmin") + F.col("xmax")) / 2).alias("tcx"),
        ((F.col("ymin") + F.col("ymax")) / 2).alias("tcy"))
    if persist:
        tiles_p = tiles_p.persist()
    cell_counts = (tiles_p.groupBy("cell_id")
                   .agg(F.count("*").alias("_n")).persist())

    def _clip(c):
        return F.greatest(F.lit(0), F.least(F.lit(nmax), c)).cast("long")

    q = (queries.select(
            "query_id", F.col("zone").cast("long").alias("zone"),
            F.col("x").cast("double").alias("qx"),
            F.col("y").cast("double").alias("qy"),
            F.col("k").cast("int").alias("k"))
         .withColumn("qix", _clip(F.floor(F.col("qx") / F.lit(size))))
         .withColumn("qiy", _clip(F.floor(F.col("qy") / F.lit(size))))
         .persist())
    stats = q.agg(F.count("*").alias("nq"), F.max("k").alias("kmax"),
                  F.count_distinct("zone").alias("nz")).collect()[0]
    if not stats.nq:
        q.unpersist()
        cell_counts.unpersist()
        if persist:
            tiles_p.unpersist()
        return spark.createDataFrame([], _OUT_SCHEMA)

    if initial_radius is None:
        n_tiles = (n_tiles_hint if n_tiles_hint is not None
                   else tiles_p.count())
        density = max(n_tiles / ((stats.nz or 1) * nside ** 2), 1e-9)
        want_cells = 4.0 * stats.kmax / density
        initial_radius = max(2, math.ceil((math.sqrt(want_cells) - 1) / 2))
    rc_cap = min(nmax, int(max_rings))
    rc = min(int(initial_radius), rc_cap)

    def _cell_expr(zone, ix, iy):
        return ((zone * 16 + F.lit(res)) * F.lit(_B) + iy) * F.lit(_B) + ix

    def _disk(df, radius):
        """Explode the Chebyshev disk around each query's cell;
        ``radius`` is a literal int or a per-row Column."""
        from pyspark.sql import Column
        r = radius if isinstance(radius, Column) else F.lit(int(radius))
        return (df
                .withColumn("dx", F.explode(F.sequence(-r, r)))
                .withColumn("dy", F.explode(F.sequence(-r, r)))
                .withColumn("ix", F.col("qix") + F.col("dx"))
                .withColumn("iy", F.col("qiy") + F.col("dy"))
                .where((F.col("ix") >= 0) & (F.col("ix") <= nmax)
                       & (F.col("iy") >= 0) & (F.col("iy") <= nmax))
                .withColumn("_cell", _cell_expr(F.col("zone"),
                                                F.col("ix"), F.col("iy"))))

    # ---- phase 1: count (loop driven by ONE scalar per round) ------------
    solved: list[DataFrame] = []
    pending = q
    while True:
        ring_counts = (_disk(pending, rc)
                       .withColumn("ring", F.greatest(F.abs("dx"),
                                                      F.abs("dy")))
                       .join(cell_counts,
                             F.col("_cell") == F.col("cell_id"), "left")
                       .groupBy("query_id", "k", "ring")
                       .agg(F.sum(F.coalesce(F.col("_n"),
                                             F.lit(0))).alias("rn")))
        wr = Window.partitionBy("query_id").orderBy("ring")
        got = (ring_counts.withColumn("cum", F.sum("rn").over(wr))
               .where(F.col("cum") >= F.col("k"))
               .groupBy("query_id").agg(F.min("ring").alias("r0")))
        # disk covers the whole zone (take all) / bounded search
        # exhausted (best partial answer): r0 = current count radius
        covers = ((F.col("qix") <= rc) & (F.col("qiy") <= rc)
                  & (F.col("qix") + rc >= nmax)
                  & (F.col("qiy") + rc >= nmax))
        exhausted = rc >= rc_cap
        fallback = (pending.where(covers | F.lit(exhausted))
                    .select("query_id",
                            F.lit(int(rc)).cast("int").alias("r0"))
                    .join(got, "query_id", "left_anti"))
        # truncate per round: pending_{k+1} references round_solved_k
        # AND pending_k, so without truncation the logical plan doubles
        # every round (exponential analyze/explain cost — a real OOM at
        # sf0.01 before this). These tables are (query_id, r0)-sized.
        round_solved = truncate_lineage(
            got.select("query_id", F.col("r0").cast("int").alias("r0"))
            .unionByName(fallback), eager=True)
        solved.append(round_solved)
        nxt = truncate_lineage(
            pending.join(round_solved, "query_id", "left_anti"),
            eager=False)
        n_left = nxt.count()  # the ONLY driver-side signal
        pending = nxt
        if n_left == 0 or exhausted:
            break
        rc = min(2 * rc, rc_cap)

    import functools
    r0df = functools.reduce(DataFrame.unionByName, solved)

    # ---- phase 2: probe + exact rank (same guarantee as knn_tiles) ------
    qr = (q.join(r0df, "query_id")
          .withColumn("r1", F.least(
              F.lit(nmax),
              F.ceil(F.lit(_SQRT2) * (F.col("r0") + 1))).cast("int")))
    zone_cover = (F.lit(2) * F.col("r1") + F.lit(1)) >= F.lit(nside)
    hits_d = (_disk(qr.where(~zone_cover), F.col("r1"))
              .select("query_id", "k", "qx", "qy", "_cell")
              .join(tiles_p, F.col("_cell") == F.col("cell_id"), "inner")
              .select("query_id", "k", "qx", "qy", "image_id",
                      "caption", "phash", "tcx", "tcy"))
    tzone = F.floor(F.col("cell_id") / (16 * _B * _B))
    hits_z = (qr.where(zone_cover)
              .select("query_id", "k", "qx", "qy",
                      F.col("zone").alias("_qzone"))
              .join(tiles_p.withColumn("_tzone", tzone),
                    F.col("_qzone") == F.col("_tzone"), "inner")
              .select("query_id", "k", "qx", "qy", "image_id",
                      "caption", "phash", "tcx", "tcy"))
    hits = hits_d.unionByName(hits_z)

    w = Window.partitionBy("query_id").orderBy("dist", "image_id")
    out = (hits
           .withColumn("dist", F.sqrt((F.col("tcx") - F.col("qx")) ** 2
                                      + (F.col("tcy") - F.col("qy")) ** 2))
           .withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= F.col("k"))
           .select("query_id", "image_id", "dist", "rank",
                   "caption", "phash"))
    result = truncate_lineage(out, eager=True, reliable=reliable,
                              checkpoint_dir=checkpoint_dir)
    q.unpersist()
    cell_counts.unpersist()
    if persist:
        tiles_p.unpersist()
    return result


def _qcell(q, res: int):
    """Clipped (ix, iy) of the query's own cell."""
    n = (1 << res) - 1
    size = cell_size(res)
    ix = min(max(int(q.x // size), 0), n)
    iy = min(max(int(q.y // size), 0), n)
    return ix, iy


def _disk_rows(q, res: int, r_from: int, r_to: int):
    """(query_id, cell_id) pairs for Chebyshev rings in (r_from, r_to]."""
    n = (1 << res) - 1
    qix, qiy = _qcell(q, res)
    out = []
    for ix in range(max(0, qix - r_to), min(n, qix + r_to) + 1):
        for iy in range(max(0, qiy - r_to), min(n, qiy + r_to) + 1):
            if max(abs(ix - qix), abs(iy - qiy)) <= r_from:
                continue
            out.append((q.query_id, int(encode_np(q.zone, res, ix, iy))))
    return out


def _covers_zone(q, res: int, r: int) -> bool:
    n = (1 << res) - 1
    qix, qiy = _qcell(q, res)
    return (qix - r <= 0 and qiy - r <= 0 and qix + r >= n and qiy + r >= n)


def _min_disk_radius(q, res: int, qcounts: dict, counted_r: int) -> int | None:
    """Smallest r ≤ counted_r with ≥ k tiles in disk(r); None if none.
    ``qcounts`` is THIS query's sparse (cell → n) map — per-query keying
    keeps the driver loop O(own cells), not O(all queries' cells)."""
    qix, qiy = _qcell(q, res)
    total = 0
    by_ring: dict[int, int] = {}
    for cell, c in qcounts.items():
        ix = cell % _B
        iy = (cell // _B) % _B
        ring = max(abs(ix - qix), abs(iy - qiy))
        by_ring[ring] = by_ring.get(ring, 0) + c
    for r in range(0, counted_r + 1):
        total += by_ring.get(r, 0)
        if total >= q.k:
            return r
    return None


def knn_tiles(tiles: DataFrame, queries: DataFrame, res: int,
              max_rings: int = 64, initial_radius: int | None = None,
              n_tiles_hint: int | None = None,
              persist: bool = True, reliable: bool = False,
              checkpoint_dir: str | None = None) -> DataFrame:
    """K nearest tiles per query row (exact).

    ``tiles`` must carry ``cell_id`` at ``res`` (see
    :func:`vrtility_spark.warp.assign_cells`) plus ``image_id``,
    ``xmin..ymax``, ``caption``, ``phash``. ``queries`` carries
    ``query_id, zone, x, y, k``.

    ``persist=True`` caches the (metadata-only) tile projection so the
    count and probe phases share one scan — right for ad-hoc tables.
    At 1e12 rows pass ``persist=False`` with a tile table WRITTEN
    bucketed/partitioned by ``cell_id`` (storage.write_images_bucketed):
    both phases then prune to the probed cells at the source instead of
    materializing the projection.

    Returns ``(query_id, image_id, dist, rank, caption, phash)``.
    """
    spark = tiles.sparkSession
    size = cell_size(res)
    nmax = (1 << res) - 1
    tiles_p = tiles.select(
        "cell_id", "image_id", "caption", "phash",
        ((F.col("xmin") + F.col("xmax")) / 2).alias("tcx"),
        ((F.col("ymin") + F.col("ymax")) / 2).alias("tcy"),
    )
    if persist:
        tiles_p = tiles_p.persist()
    qrows = queries.select("query_id", "zone", "x", "y", "k").collect()
    if not qrows:
        if persist:
            tiles_p.unpersist()
        return spark.createDataFrame([], _OUT_SCHEMA)
    qmeta = spark.createDataFrame(
        [(q.query_id, float(q.x), float(q.y), int(q.k)) for q in qrows],
        "query_id string, qx double, qy double, k int")

    # ---- phase 1: count --------------------------------------------------
    if initial_radius is None:
        n_tiles = n_tiles_hint if n_tiles_hint is not None else tiles_p.count()
        zones = len({q.zone for q in qrows}) or 1
        density = max(n_tiles / (zones * (1 << res) ** 2), 1e-9)
        # 4x oversampling absorbs local sparsity (lattice voids) so the
        # common case is ONE counting round
        want_cells = 4.0 * max(q.k for q in qrows) / density
        initial_radius = max(2, math.ceil((math.sqrt(want_cells) - 1) / 2))
    # max_rings bounds the COUNT radius (and thus driver-side cell
    # enumeration and the probe fanout): with k-1 tiles in a sparse
    # zone at high res, an unbounded search would enumerate the whole
    # zone's cells driver-side; past the cap we return the best
    # partial answer, like any bounded-radius kNN. The density-derived
    # initial_radius is clamped to the same cap — a sparse tile table
    # at high res would otherwise size the FIRST count round to a
    # (2r+1)^2 disk of hundreds of millions of driver-side cells.
    rc_cap = min(nmax, int(max_rings))
    rc = min(int(initial_radius), rc_cap)

    counts: dict[str, dict[int, int]] = {q.query_id: {} for q in qrows}
    counted: dict[str, int] = {q.query_id: -1 for q in qrows}
    r0: dict[str, int] = {}
    pending = list(qrows)
    while pending:
        rows = []
        for q in pending:
            rows.extend(_disk_rows(q, res, counted[q.query_id], rc))
        if rows:
            cand = spark.createDataFrame(rows, "query_id string, cand_cell long")
            got = (F.broadcast(cand)
                   .join(tiles_p, cand.cand_cell == tiles_p.cell_id, "inner")
                   .groupBy("query_id", "cand_cell")
                   .agg(F.count("*").alias("n")).collect())
            for row in got:
                counts[row.query_id][row.cand_cell] = row.n
        still, need = [], 2 * rc
        for q in pending:
            counted[q.query_id] = rc
            r = _min_disk_radius(q, res, counts[q.query_id], rc)
            if r is not None:
                r0[q.query_id] = r
            elif _covers_zone(q, res, rc):
                r0[q.query_id] = rc  # < k tiles in the whole zone: take all
            else:
                still.append(q)
                # adaptive jump: scale the radius by the observed local
                # density shortfall (√(k/m) area growth) instead of
                # blind doubling — sparse-void queries converge in one
                # extra round instead of O(log) rounds
                m = sum(counts[q.query_id].values())
                est = math.ceil(rc * math.sqrt(q.k / max(m, 0.5))) + 1
                need = max(need, est)
        pending = still
        if rc >= rc_cap:
            break
        rc = min(need, rc_cap)
    for q in qrows:  # bounded search exhausted: best partial answer
        r0.setdefault(q.query_id, counted[q.query_id])

    # ---- phase 2: probe + exact rank ------------------------------------
    probe_rows, zone_rows = [], []
    for q in qrows:
        r1 = min(math.ceil(_SQRT2 * (r0[q.query_id] + 1)), nmax)
        if 2 * r1 + 1 >= (1 << res):  # disk covers the zone: equi-join on zone
            zone_rows.append((q.query_id, int(q.zone)))
        else:
            probe_rows.append((q, r1))

    parts = []
    if probe_rows:
        rows = []
        for q, r1 in probe_rows:
            rows.extend(_disk_rows(q, res, -1, r1))
        cand = spark.createDataFrame(rows, "query_id string, cand_cell long")
        parts.append(
            F.broadcast(cand)
            .join(tiles_p, cand.cand_cell == tiles_p.cell_id, "inner")
            .select("query_id", "image_id", "caption", "phash", "tcx", "tcy"))
    if zone_rows:
        zdf = spark.createDataFrame(zone_rows, "query_id string, qzone long")
        tile_zone = F.floor(F.col("cell_id") / (16 * _B * _B))
        parts.append(
            F.broadcast(zdf)
            .join(tiles_p.withColumn("tzone", tile_zone),
                  F.col("qzone") == F.col("tzone"), "inner")
            .select("query_id", "image_id", "caption", "phash", "tcx", "tcy"))
    hits = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])

    w = Window.partitionBy("query_id").orderBy("dist", "image_id")
    out = (hits.join(F.broadcast(qmeta), "query_id")
           .withColumn("dist", F.sqrt((F.col("tcx") - F.col("qx")) ** 2
                                      + (F.col("tcy") - F.col("qy")) ** 2))
           .withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= F.col("k"))
           .select("query_id", "image_id", "dist", "rank", "caption", "phash"))
    # materialize before unpersisting the shared projection; the result
    # must outlive tiles_p. reliable=True makes it durable (executor
    # loss after this operator completes can't lose the answer).
    result = truncate_lineage(out, eager=True, reliable=reliable,
                              checkpoint_dir=checkpoint_dir)
    if persist:
        tiles_p.unpersist()
    return result
