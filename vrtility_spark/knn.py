"""kNN tile queries via iterative cell-ring expansion.

Required by BASELINE.json's ``north_rule`` (the reference has no kNN
operator — SURVEY.md §2.3 J6). For each query point, find the K
nearest scene tiles (distance = query point → tile center):

1. probe an initial disk of cells around each query's cell (radius
   sized from tile density so typical queries settle in ONE round);
2. candidate cells equi-join against the tile table on ``cell_id`` —
   the probe side is tiny and broadcast, the tile side is cached once
   so each round reads memory, not the source;
3. per query, rank candidates with ``row_number`` over distance;
4. a query is *settled* once it has K candidates AND its Kth distance
   ≤ r·cell_size — the guarantee that no unseen ring can hold a closer
   tile (a center in Chebyshev ring ρ is ≥ (ρ-0.5)·cell_size away);
   unsettled queries expand ring by ring (driver loop, the stream-kNN
   grid pattern from PAPERS.md).

The query table is collected driver-side once — kNN probes are a
bounded user-supplied set by contract (never the tile table); all
per-tile work stays distributed.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vrtility_spark.cells import cell_size, encode_np


def _cand_rows(qrows, res: int, r: int, include_inner: bool):
    """Driver-side (query_id, cand_cell) pairs for ring r / disk<=r."""
    n = (1 << res) - 1
    size = cell_size(res)
    out = []
    for q in qrows:
        qix, qiy = int(q.x // size), int(q.y // size)
        qix, qiy = min(max(qix, 0), n), min(max(qiy, 0), n)
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                if not include_inner and max(abs(dx), abs(dy)) != r:
                    continue
                ix, iy = qix + dx, qiy + dy
                if 0 <= ix <= n and 0 <= iy <= n:
                    out.append((q.query_id, int(encode_np(q.zone, res, ix, iy))))
    return out


def knn_tiles(tiles: DataFrame, queries: DataFrame, res: int,
              max_rings: int = 64, initial_radius: int | None = None,
              n_tiles_hint: int | None = None) -> DataFrame:
    """K nearest tiles per query row.

    ``tiles`` must carry ``cell_id`` at ``res`` (see
    :func:`vrtility_spark.warp.assign_cells`) plus ``image_id``,
    ``xmin..ymax``, ``caption``, ``phash``. ``queries`` carries
    ``query_id, zone, x, y, k``.

    Returns ``(query_id, image_id, dist, rank, caption, phash)``.
    """
    spark = tiles.sparkSession
    size = cell_size(res)
    tiles_p = tiles.select(
        "cell_id", "image_id", "caption", "phash",
        ((F.col("xmin") + F.col("xmax")) / 2).alias("tcx"),
        ((F.col("ymin") + F.col("ymax")) / 2).alias("tcy"),
    ).persist()
    qrows = queries.select("query_id", "zone", "x", "y", "k").collect()
    if not qrows:
        tiles_p.unpersist()
        return spark.createDataFrame(
            [], "query_id string, image_id string, dist double, rank int, "
                "caption string, phash long")
    kmap = {q.query_id: int(q.k) for q in qrows}
    qmeta = spark.createDataFrame(
        [(q.query_id, float(q.x), float(q.y), int(q.k)) for q in qrows],
        "query_id string, qx double, qy double, k int")

    if initial_radius is None:
        n_tiles = n_tiles_hint if n_tiles_hint is not None else tiles_p.count()
        zones = len({q.zone for q in qrows}) or 1
        density = max(n_tiles / (zones * (1 << res) ** 2), 1e-9)
        want_cells = 2.0 * max(kmap.values()) / density
        initial_radius = max(1, math.ceil((math.sqrt(want_cells) - 1) / 2))

    pending = list(qrows)
    acc: DataFrame | None = None
    r = min(int(initial_radius), max_rings)
    probed = -1  # radius fully covered so far (per pending query)
    while r <= max_rings and pending:
        # geometric expansion: probe all rings in (probed, r] this round
        # → O(log(kth/cell_size)) driver rounds even for sparse regions
        rows = []
        if probed < 0:
            rows = _cand_rows(pending, res, r, include_inner=True)
        else:
            for ring in range(probed + 1, r + 1):
                rows.extend(_cand_rows(pending, res, ring, include_inner=False))
        if rows:
            cand = spark.createDataFrame(rows, "query_id string, cand_cell long")
            hits = F.broadcast(cand).join(
                tiles_p, cand.cand_cell == tiles_p.cell_id, "inner"
            ).select("query_id", "image_id", "caption", "phash", "tcx", "tcy")
            acc = hits if acc is None else acc.unionByName(hits)
            # cut lineage so each ring joins once, not once per re-rank
            acc = acc.localCheckpoint(eager=True)
        probed = r
        if acc is None:
            r = min(max(r + 1, 2 * r), max_rings if r < max_rings else max_rings + 1)
            continue
        # settle check: one small aggregate over accumulated candidates
        ranked = (acc.join(F.broadcast(qmeta), "query_id")
                  .withColumn("dist",
                              F.sqrt((F.col("tcx") - F.col("qx")) ** 2
                                     + (F.col("tcy") - F.col("qy")) ** 2)))
        w = Window.partitionBy("query_id").orderBy("dist", "image_id")
        status = (ranked.withColumn("rank", F.row_number().over(w))
                  .groupBy("query_id", "k")
                  .agg(F.count("*").alias("n"),
                       F.max(F.when(F.col("rank") <= F.col("k"), F.col("dist")))
                        .alias("kth")).collect())
        settled = {s.query_id for s in status
                   if s.n >= s.k and s.kth is not None and s.kth <= r * size}
        pending = [q for q in pending if q.query_id not in settled]
        if not pending:
            break
        if r >= max_rings:
            break
        r = min(max(r + 1, 2 * r), max_rings)

    w = Window.partitionBy("query_id").orderBy("dist", "image_id")
    out = (acc.dropDuplicates(["query_id", "image_id"])
           .join(F.broadcast(qmeta), "query_id")
           .withColumn("dist", F.sqrt((F.col("tcx") - F.col("qx")) ** 2
                                      + (F.col("tcy") - F.col("qy")) ** 2))
           .withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= F.col("k"))
           .select("query_id", "image_id", "dist", "rank", "caption", "phash"))
    result = out.localCheckpoint(eager=True)
    tiles_p.unpersist()
    return result
