from __future__ import annotations

import numpy as np

import oracle
from vrtility_spark import datagen, knn, schema, warp


def test_knn_matches_bruteforce(spark, tiny_images, tiny_images_pdf):
    queries_pdf = datagen.knn_queries_pandas(n=12)
    queries = schema.knn_df(spark, queries_pdf)
    tiles = warp.assign_cells(tiny_images, datagen.TILE_RES)
    got = knn.knn_tiles(tiles, queries, res=datagen.TILE_RES).toPandas()
    exp = oracle.brute_force_knn(tiny_images_pdf, queries_pdf)
    for q in queries_pdf.itertuples(index=False):
        g = got[got.query_id == q.query_id].sort_values("rank")
        e = exp[q.query_id]
        want_n = min(q.k, len(e))
        assert len(g) == want_n, q.query_id
        # distances must match the true kNN distances (ids may differ
        # only on exact ties, which the fixture avoids)
        np.testing.assert_allclose(g.dist.values,
                                   [d for d, _ in e[:want_n]], rtol=1e-12)
        assert list(g.image_id) == [i for _, i in e[:want_n]]


def test_knn_caption_passthrough(spark, tiny_images, tiny_images_pdf):
    queries = schema.knn_df(spark, datagen.knn_queries_pandas(n=3))
    tiles = warp.assign_cells(tiny_images, datagen.TILE_RES)
    got = knn.knn_tiles(tiles, queries, res=datagen.TILE_RES).toPandas()
    cap = dict(zip(tiny_images_pdf.image_id, tiny_images_pdf.caption))
    assert all(got.caption.iloc[i] == cap[got.image_id.iloc[i]]
               for i in range(len(got)))


def test_knn_randomized_exactness(spark):
    """Seeded random tile sets with clustered + sparse regions and
    random k: the two-phase count/probe search must return exactly the
    brute-force top-k (distances AND ids) every time."""
    import pandas as pd
    from vrtility_spark import cells, schema

    rng = np.random.default_rng(42)
    res = 5
    for trial in range(3):
        n = int(rng.integers(40, 160))
        # half clustered in one corner (hot cells), half uniform (voids)
        xy = np.vstack([
            rng.uniform(0, 2e5, (n // 2, 2)),
            rng.uniform(0, cells.ZONE_SPAN, (n - n // 2, 2)),
        ])
        tiles_pdf = pd.DataFrame({
            "image_id": [f"t{trial}_{i:04d}" for i in range(n)],
            "zone": 30, "xmin": xy[:, 0], "xmax": xy[:, 0],
            "ymin": xy[:, 1], "ymax": xy[:, 1],
            "caption": [f"c{i}" for i in range(n)],
            "phash": np.arange(n, dtype=np.int64),
        })
        tiles_pdf["cell_id"] = cells.xy_to_cell_np(
            30, xy[:, 0], xy[:, 1], res)
        qs = pd.DataFrame({
            "query_id": [f"q{j}" for j in range(5)],
            "zone": 30,
            "x": rng.uniform(0, cells.ZONE_SPAN, 5),
            "y": rng.uniform(0, cells.ZONE_SPAN, 5),
            "k": rng.integers(1, 12, 5),
        })
        got = knn.knn_tiles(
            spark.createDataFrame(tiles_pdf),
            spark.createDataFrame(qs), res=res).toPandas()
        for q in qs.itertuples(index=False):
            d = np.hypot(xy[:, 0] - q.x, xy[:, 1] - q.y)
            order = sorted(range(n), key=lambda i: (d[i], tiles_pdf.image_id[i]))
            want = order[: min(q.k, n)]
            g = got[got.query_id == q.query_id].sort_values("rank")
            assert list(g.image_id) == [tiles_pdf.image_id[i] for i in want]
            np.testing.assert_allclose(g.dist.values, d[want], rtol=1e-12)


def test_auto_radius_clamped_to_max_rings(spark):
    """A sparse tile table at high res makes the density-derived
    initial count radius huge; it must clamp to max_rings so the first
    count round never enumerates a quadratic cell disk driver-side.
    Within the ring budget the answer is the best bounded-partial."""
    import pandas as pd

    from vrtility_spark import cells

    res = 10  # 1024 x 1024 cells per zone
    xy = [(100.0, 100.0), (900000.0, 900000.0), (901000.0, 901000.0)]
    tiles_pdf = pd.DataFrame({
        "image_id": [f"s{i}" for i in range(3)], "zone": 30,
        "xmin": [x for x, _ in xy], "xmax": [x for x, _ in xy],
        "ymin": [y for _, y in xy], "ymax": [y for _, y in xy],
        "caption": ["c"] * 3, "phash": [0, 1, 2],
    })
    tiles_pdf["cell_id"] = cells.xy_to_cell_np(
        30, tiles_pdf.xmin.values, tiles_pdf.ymin.values, res)
    qs = pd.DataFrame({"query_id": ["q0"], "zone": 30,
                       "x": [899000.0], "y": [899000.0], "k": [3]})
    got = knn.knn_tiles(spark.createDataFrame(tiles_pdf),
                        spark.createDataFrame(qs), res=res,
                        max_rings=6).toPandas()
    # the two nearby tiles are inside the 6-ring budget (cell ~1024 m);
    # the far corner tile is not — bounded-partial answer, never a
    # zone-wide enumeration
    assert list(got.sort_values("rank").image_id) == ["s1", "s2"]


def test_distributed_knn_parity_with_driver_loop(spark):
    """knn_tiles_distributed must return the SAME rows as knn_tiles on
    seeded random tile sets (clustered + sparse, random k), including
    the ring-expansion, zone-cover, and max_rings-partial paths."""
    import pandas as pd
    from vrtility_spark import cells

    rng = np.random.default_rng(7)
    res = 5
    for trial, rings in ((0, 64), (1, 64), (2, 1)):  # rings=1: partial
        n = int(rng.integers(40, 160))
        xy = np.vstack([
            rng.uniform(0, 2e5, (n // 2, 2)),
            rng.uniform(0, cells.ZONE_SPAN, (n - n // 2, 2)),
        ])
        tiles_pdf = pd.DataFrame({
            "image_id": [f"t{trial}_{i:04d}" for i in range(n)],
            "zone": 30, "xmin": xy[:, 0], "xmax": xy[:, 0],
            "ymin": xy[:, 1], "ymax": xy[:, 1],
            "caption": [f"c{i}" for i in range(n)],
            "phash": np.arange(n, dtype=np.int64),
        })
        tiles_pdf["cell_id"] = cells.xy_to_cell_np(
            30, xy[:, 0], xy[:, 1], res)
        qs = pd.DataFrame({
            "query_id": [f"q{j}" for j in range(6)],
            "zone": 30,
            "x": rng.uniform(0, cells.ZONE_SPAN, 6),
            "y": rng.uniform(0, cells.ZONE_SPAN, 6),
            "k": rng.integers(1, 12, 6),
        })
        tiles = spark.createDataFrame(tiles_pdf)
        queries = spark.createDataFrame(qs)
        a = sorted(map(tuple, knn.knn_tiles(
            tiles, queries, res=res, max_rings=rings).collect()))
        b = sorted(map(tuple, knn.knn_tiles_distributed(
            tiles, queries, res=res, max_rings=rings).collect()))
        assert a == b and a, (trial, rings)


def test_distributed_knn_never_collects_queries(spark, monkeypatch):
    """10^4 queries: nothing query-sized may reach the driver — the
    only collect() during the call is the 1-row stats aggregate (the
    per-round signal is a scalar count)."""
    import pandas as pd
    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F
    from vrtility_spark import cells

    res = 5
    rng = np.random.default_rng(3)
    n = 200
    xy = rng.uniform(0, cells.ZONE_SPAN, (n, 2))
    tiles_pdf = pd.DataFrame({
        "image_id": [f"t{i:04d}" for i in range(n)],
        "zone": 30, "xmin": xy[:, 0], "xmax": xy[:, 0],
        "ymin": xy[:, 1], "ymax": xy[:, 1],
        "caption": "c", "phash": np.arange(n, dtype=np.int64),
    })
    tiles_pdf["cell_id"] = cells.xy_to_cell_np(30, xy[:, 0], xy[:, 1], res)
    tiles = spark.createDataFrame(tiles_pdf)
    # 10^4 queries built DISTRIBUTED from spark.range — never a pandas
    # table, so a driver collect would be the only way they'd leave
    span = float(cells.ZONE_SPAN)
    queries = (spark.range(10_000)
               .select(F.concat(F.lit("q"), F.col("id")).alias("query_id"),
                       F.lit(30).alias("zone"),
                       (F.pmod(F.col("id") * 7919, 10_000)
                        / 10_000.0 * span).alias("x"),
                       (F.pmod(F.col("id") * 104729, 10_000)
                        / 10_000.0 * span).alias("y"),
                       F.lit(3).alias("k")))
    collected = []
    orig = _DF.collect
    monkeypatch.setattr(
        _DF, "collect",
        lambda self: (lambda rows: (collected.append(len(rows)),
                                    rows)[1])(orig(self)))
    out = knn.knn_tiles_distributed(tiles, queries, res=res)
    monkeypatch.undo()
    assert max(collected, default=0) <= 1  # the stats row only
    assert out.count() == 30_000  # every query filled to k=3
    # spot-check one query against brute force
    got = sorted((r["rank"], r["image_id"])
                 for r in out.where("query_id = 'q123'").collect())
    qx, qy = (123 * 7919 % 10_000) / 10_000.0 * span, \
        (123 * 104729 % 10_000) / 10_000.0 * span
    d = np.hypot(xy[:, 0] - qx, xy[:, 1] - qy)
    want = sorted(range(n), key=lambda i: (d[i], tiles_pdf.image_id[i]))[:3]
    assert [i for _, i in got] == [tiles_pdf.image_id[i] for i in want]
