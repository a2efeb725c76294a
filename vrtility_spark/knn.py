"""kNN tile queries via iterative cell-ring expansion.

Required by BASELINE.json's ``north_rule`` (the reference has no kNN
operator — SURVEY.md §2.3 J6). For each query point, find the K
nearest scene tiles (distance = query point → tile center):

1. start with the query's own cell at the search resolution (ring 0);
2. equi-join candidate cells against the tile table on ``cell_id``
   (broadcast: the exploded query-cell table is tiny relative to the
   tile table);
3. per query, rank candidates with ``row_number`` over distance;
4. a query is *settled* once it has K candidates AND its Kth distance
   ≤ r·cell_size — the guarantee that no unseen ring can hold a closer
   tile; unsettled queries expand to the next ring (driver loop, the
   stream-kNN grid pattern from PAPERS.md).

Only per-query counts are collected driver-side (bounded by #queries,
never by #tiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vrtility_spark.cells import cell_size, xy_to_cell_col


def _query_ring_cells(queries: DataFrame, res: int, r: int,
                      include_inner: bool = False) -> DataFrame:
    """Cells at Chebyshev ring distance exactly r (or the full disk <= r
    when ``include_inner``) from each query's cell (pure Column
    arithmetic: sequence + explode + boundary filter)."""
    size = F.lit(cell_size(res))
    n = (1 << res) - 1
    q = queries.withColumn("_qix", F.floor(F.col("x") / size).cast("long")) \
               .withColumn("_qiy", F.floor(F.col("y") / size).cast("long"))
    q = q.withColumn("_dx", F.explode(F.sequence(F.lit(-r), F.lit(r)))) \
         .withColumn("_dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
    if r > 0 and not include_inner:
        q = q.where((F.abs(F.col("_dx")) == r) | (F.abs(F.col("_dy")) == r))
    ix = F.col("_qix") + F.col("_dx")
    iy = F.col("_qiy") + F.col("_dy")
    q = q.where((ix >= 0) & (ix <= n) & (iy >= 0) & (iy <= n))
    cell = ((F.col("zone").cast("long") * 16 + F.lit(res)) * 8192 + iy) * 8192 + ix
    return q.withColumn("cand_cell", cell).drop("_qix", "_qiy", "_dx", "_dy")


def knn_tiles(tiles: DataFrame, queries: DataFrame, res: int,
              max_rings: int = 8) -> DataFrame:
    """K nearest tiles per query row.

    ``tiles`` must carry ``cell_id`` at ``res`` (see
    :func:`vrtility_spark.warp.assign_cells`) plus ``image_id``,
    ``xmin..ymax``, ``caption``, ``phash``. ``queries`` carries
    ``query_id, zone, x, y, k``.

    Returns ``(query_id, image_id, dist, rank, caption, phash)``.
    """
    size = cell_size(res)
    tiles = tiles.select(
        "cell_id", "image_id", "caption", "phash",
        ((F.col("xmin") + F.col("xmax")) / 2).alias("tcx"),
        ((F.col("ymin") + F.col("ymax")) / 2).alias("tcy"),
    )
    pending = queries.select("query_id", "zone", "x", "y", "k")
    acc: DataFrame | None = None
    # start with the full disk of radius 1: ring 0 alone can never
    # satisfy the settle bound (kth <= 0), so probing it separately just
    # buys an extra driver round-trip per query
    r = 1
    first = True
    while r <= max_rings:
        cand_cells = _query_ring_cells(pending, res, r, include_inner=first)
        first = False
        hits = F.broadcast(cand_cells).join(
            tiles, cand_cells.cand_cell == tiles.cell_id, "inner"
        ).select(
            "query_id", "k", "x", "y", "image_id", "caption", "phash",
            F.sqrt((F.col("tcx") - F.col("x")) ** 2 +
                   (F.col("tcy") - F.col("y")) ** 2).alias("dist"),
        )
        acc = hits if acc is None else acc.unionByName(hits)
        # cut lineage so each ring joins once, not once per re-rank
        acc = acc.localCheckpoint(eager=True)
        # settle check: k-th distance must be <= r*cell_size so that no
        # farther ring can contain a closer tile center
        w = Window.partitionBy("query_id").orderBy("dist", "image_id")
        ranked = acc.withColumn("rank", F.row_number().over(w))
        counts = (
            ranked.groupBy("query_id")
            .agg(F.count("*").alias("n"),
                 F.max(F.when(F.col("rank") <= F.col("k"), F.col("dist")))
                  .alias("kth"))
        )
        # left join from the full pending set: a query with zero
        # candidates so far must stay pending, not silently settle
        status = (
            pending.select("query_id", "k").join(counts, "query_id", "left")
            .withColumn("settled",
                        F.coalesce(
                            (F.col("n") >= F.col("k"))
                            & (F.col("kth") <= r * size), F.lit(False)))
        )
        unsettled = [row.query_id for row in
                     status.where(~F.col("settled")).select("query_id").collect()]
        if not unsettled:
            break
        pending = queries.where(F.col("query_id").isin(unsettled)) \
                         .select("query_id", "zone", "x", "y", "k")
        r += 1
    w = Window.partitionBy("query_id").orderBy("dist", "image_id")
    out = (
        acc.dropDuplicates(["query_id", "image_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
    )
    return out.select("query_id", "image_id", "dist", "rank", "caption", "phash")
