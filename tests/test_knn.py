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
