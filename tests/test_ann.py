from __future__ import annotations

import numpy as np

from vrtility_spark import ann


def _brute_topk(vecs: dict, qid, k):
    q = vecs[qid] / np.linalg.norm(vecs[qid])
    sims = sorted(((float(np.dot(q, v / np.linalg.norm(v))), i)
                   for i, v in vecs.items() if i != qid), reverse=True)
    return [i for _, i in sims[:k]]


def test_ivf_recall_and_exact_limit(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pdf = emb.toPandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for _, r in pdf.iterrows()}

    cents = ann.train_ivf(emb, "embedding", "vec_id", n_clusters=8, iters=2)
    assert cents.shape == (8, len(pdf.embedding.iloc[0]))
    indexed = ann.ivf_assign(emb, "embedding", cents).cache()
    sizes = indexed.groupBy("cluster").count().toPandas()
    assert len(sizes) >= 4  # clusters actually used

    queries = emb.where("vec_id < 8")
    # nprobe = n_clusters → exact: must equal brute force
    exact = ann.ivf_search(indexed, queries, cents, "embedding", "vec_id",
                           "vec_id", k=10, nprobe=8).toPandas()
    for qid in range(8):
        got = list(exact[exact.q_id == qid].sort_values("rank").id)
        assert got == _brute_topk(vecs, qid, 10), qid

    # pruned search: recall@10 must stay high
    approx = ann.ivf_search(indexed, queries, cents, "embedding", "vec_id",
                            "vec_id", k=10, nprobe=3).toPandas()
    recalls = []
    for qid in range(8):
        got = set(approx[approx.q_id == qid].id)
        true = set(_brute_topk(vecs, qid, 10))
        recalls.append(len(got & true) / 10)
    assert float(np.mean(recalls)) >= 0.5, recalls