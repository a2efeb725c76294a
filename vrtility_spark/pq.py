"""Product quantization (IVF-PQ): memory-compressed ANN for corpora
whose raw vectors no longer fit the cluster.

:mod:`ann` prunes WHICH vectors a query inspects (IVF); PQ shrinks
WHAT the index stores per vector — each embedding splits into ``m``
subvectors, every subvector is replaced by the id of its nearest
per-subspace k-means centroid, and the stored record becomes ``m``
uint8 codes (64-dim float64 → 8 bytes at m=8: 64× compression). Search
never decodes: a query builds one ``(m, ksub)`` lookup table of
subspace distances, and a candidate's asymmetric distance (ADC) is
``m`` table lookups — the Jégou/Douze/Schmid PQ recipe behind every
billion-scale FAISS index.

Spark-first shapes:

* :func:`train_pq` — ALL subspaces train in one Arrow pass per Lloyd
  iteration: each partition emits partial ``(subspace, code, vecsum,
  n)`` rows (map-side combine, nothing shuffles, the driver merges
  O(partitions × m × ksub) tiny rows in deterministic order — the same
  contract as :func:`ann.train_ivf`).
* :func:`pq_encode` — narrow ``mapInPandas``; the code column is a
  ``binary`` of ``m`` bytes, so a 10¹²-vector index is ~m TB instead
  of ~8·d TB.
* :func:`pq_search` — queries are the BOUNDED side (the
  ``embedding_topk`` / kNN contract): their LUTs broadcast inside the
  closure, the code table streams through ONE narrow map emitting a
  per-partition top-``shortlist`` per query, and only those tiny
  partials shuffle for the global merge. ``rerank=True`` then
  re-scores the shortlist against the ORIGINAL vectors (one equi-join
  on the shortlist ids — the IVFPQ+refine layout: codes in RAM, full
  vectors on cold storage). With ``nprobe = n_clusters`` and
  ``shortlist ≥`` corpus the refined result IS exact brute force —
  which is what gives the driver query a closed-form SQL oracle while
  realistic-shortlist recall stays pytest-gated.

Vectors are L2-normalized before training/encoding (``normalize=True``
default), so squared-L2 ADC ranks by cosine (``‖a−b‖² = 2−2·cos`` on
the unit sphere) and composes with the cosine conventions used
everywhere else in this engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vrtility_spark.ann import _normalize


def _check_dims(d: int, m: int) -> int:
    if d % m != 0:
        raise ValueError(f"vector dim {d} is not divisible by m={m}")
    return d // m


def _sub(X: np.ndarray, m: int) -> np.ndarray:
    """(N, d) → (m, N, dsub) subvector view."""
    N, d = X.shape
    dsub = _check_dims(d, m)
    return X.reshape(N, m, dsub).transpose(1, 0, 2)


def train_pq(df: DataFrame, vec_col: str, id_col: str, m: int = 8,
             ksub: int = 16, iters: int = 3,
             normalize: bool = True) -> np.ndarray:
    """Per-subspace k-means codebooks, ``(m, ksub, dsub)`` float64.

    Init is the first ``ksub`` rows by id (per-subspace k-means is
    low-dimensional and Lloyd-polished; determinism matters more than
    seeding finesse here). Each iteration is ONE Arrow pass emitting
    map-side partial sums for every (subspace, code); the driver
    merges in (subspace, code, partition) order — bit-reproducible."""
    if not 1 <= int(ksub) <= 256:
        raise ValueError(
            f"ksub={ksub} out of range: codes are stored as uint8, so "
            "each subspace holds at most 256 codewords (raise m, not "
            "ksub, for more capacity)")
    first = (df.orderBy(id_col).limit(int(ksub))
             .select(vec_col).toPandas()[vec_col].tolist())
    X0 = np.asarray(first, dtype=np.float64)
    if normalize:
        X0 = _normalize(X0)
    d = X0.shape[1]
    dsub = _check_dims(d, m)
    books = np.zeros((m, ksub, dsub))
    S0 = _sub(X0, m)
    for s in range(m):
        n0 = min(len(X0), ksub)
        books[s, :n0] = S0[s][:n0]
        if n0 < ksub:
            books[s, n0:] = S0[s][0] if n0 else 0.0

    def make_partials(bk: np.ndarray):
        def run(batches):
            from pyspark import TaskContext
            pid = TaskContext.get().partitionId() if TaskContext.get() else -1
            sums = np.zeros((m, ksub, dsub))
            counts = np.zeros((m, ksub), dtype=np.int64)
            for pdf in batches:
                X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                if len(X) == 0:
                    continue
                if normalize:
                    X = _normalize(X)
                S = _sub(X, m)
                for s in range(m):
                    # squared L2 to each codeword, argmin
                    d2 = (np.sum(S[s] ** 2, axis=1)[:, None]
                          - 2.0 * S[s] @ bk[s].T
                          + np.sum(bk[s] ** 2, axis=1)[None, :])
                    lab = np.argmin(d2, axis=1)
                    np.add.at(sums[s], lab, S[s])
                    np.add.at(counts[s], lab, 1)
            rows = []
            for s in range(m):
                for kk in np.nonzero(counts[s])[0]:
                    rows.append({"pid": pid, "sub": s, "code": int(kk),
                                 "vecsum": sums[s, kk].tolist(),
                                 "n": int(counts[s, kk])})
            if rows:
                yield pd.DataFrame(rows)
        return run

    for _ in range(int(iters)):
        partials = df.select(vec_col).mapInPandas(
            make_partials(books.copy()),
            "pid long, sub int, code int, vecsum array<double>, n long")
        rows = sorted(partials.collect(),
                      key=lambda r: (r.sub, r.code, r.pid))
        agg = np.zeros_like(books)
        cnt = np.zeros((m, ksub), dtype=np.int64)
        for r in rows:
            agg[r.sub, r.code] += np.asarray(r.vecsum, dtype=np.float64)
            cnt[r.sub, r.code] += r.n
        hit = cnt > 0
        books[hit] = agg[hit] / cnt[hit][:, None]
    return books


def _encode_np(X: np.ndarray, books: np.ndarray,
               normalize: bool) -> np.ndarray:
    """(N, d) → (N, m) uint8 codes."""
    m, ksub, dsub = books.shape
    if ksub > 256:
        raise ValueError(f"codebook has {ksub} codewords per subspace; "
                         "uint8 codes hold at most 256")
    if normalize:
        X = _normalize(X)
    S = _sub(X, m)
    codes = np.empty((X.shape[0], m), dtype=np.uint8)
    for s in range(m):
        d2 = (np.sum(S[s] ** 2, axis=1)[:, None]
              - 2.0 * S[s] @ books[s].T
              + np.sum(books[s] ** 2, axis=1)[None, :])
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def decode_np(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(N, m) codes → (N, d) reconstructed vectors."""
    m, ksub, dsub = books.shape
    return np.concatenate(
        [books[s][codes[:, s]] for s in range(m)], axis=1)


def adc_lut_np(q: np.ndarray, books: np.ndarray,
               normalize: bool = True) -> np.ndarray:
    """Query → ``(m, ksub)`` table of per-subspace squared distances."""
    m, ksub, dsub = books.shape
    q = np.asarray(q, dtype=np.float64).reshape(1, -1)
    if normalize:
        q = _normalize(q)
    S = _sub(q, m)
    return np.stack([
        (np.sum(S[s][0] ** 2) - 2.0 * books[s] @ S[s][0]
         + np.sum(books[s] ** 2, axis=1))
        for s in range(m)])


def adc_np(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """(N, m) codes × (m, ksub) LUT → (N,) asymmetric distances."""
    m = lut.shape[0]
    return lut[np.arange(m)[None, :], codes.astype(np.int64)].sum(axis=1)


def pq_encode(df: DataFrame, vec_col: str, books: np.ndarray,
              out_col: str = "pq_code",
              normalize: bool = True) -> DataFrame:
    """Add the ``m``-byte PQ code column (binary) — narrow map."""
    bk = books.copy()

    @F.pandas_udf("binary")
    def enc(emb: pd.Series) -> pd.Series:
        X = np.asarray(emb.tolist(), dtype=np.float64)
        codes = _encode_np(X, bk, normalize)
        return pd.Series([c.tobytes() for c in codes])

    return df.withColumn(out_col, enc(F.col(vec_col)))


def pq_search(indexed: DataFrame, queries: DataFrame, books: np.ndarray,
              vec_col: str, id_col: str, q_id_col: str, k: int,
              centroids: np.ndarray | None = None, nprobe: int = 4,
              shortlist: int = 64, rerank: bool = False,
              rank_round: int | None = None, code_col: str = "pq_code",
              normalize: bool = True) -> DataFrame:
    """Top-k per query via ADC over the code table.

    ``indexed`` must carry ``code_col`` (:func:`pq_encode`) and — when
    ``centroids`` is given — the ``cluster`` column
    (:func:`ann.ivf_assign`); only codes in a query's ``nprobe``
    nearest coarse clusters are scored. Returns
    ``(q_id, id, sim, rank)`` where ``sim`` is ``1 − adc/2`` (the
    cosine estimate on the unit sphere), or the EXACT re-ranked cosine
    when ``rerank=True``."""
    m = books.shape[0]
    qrows = (queries.select(F.col(q_id_col).alias("q_id"), vec_col)
             .collect())
    if not qrows:
        return (indexed.sparkSession
                .createDataFrame([], "q_id long, id long, sim double, "
                                     "rank int"))
    luts, probed = {}, {}
    cn = None if centroids is None else _normalize(centroids)
    for r in qrows:
        q = np.asarray(r[vec_col], dtype=np.float64)
        qid = int(r["q_id"])
        luts[qid] = adc_lut_np(q, books, normalize)
        if cn is not None:
            sims = _normalize(q.reshape(1, -1))[0] @ cn.T
            order = np.argsort(-sims)[:min(int(nprobe), len(cn))]
            probed[qid] = set(int(x) for x in order)

    has_cluster = centroids is not None
    if int(shortlist) < 1:
        raise ValueError("shortlist must be >= 1")
    # a shortlist narrower than k would silently truncate the answer
    S = max(int(shortlist), int(k))

    def score(batches):
        best: dict[int, list] = {qid: [] for qid in luts}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf[code_col].tolist()),
                dtype=np.uint8).reshape(len(pdf), m)
            ids = pdf["_id"].to_numpy()
            clus = pdf["cluster"].to_numpy() if has_cluster else None
            for qid, lut in luts.items():
                sel = np.ones(len(pdf), dtype=bool)
                if has_cluster:
                    sel = np.isin(clus, list(probed[qid]))
                sel &= ids != qid
                if not sel.any():
                    continue
                d2 = adc_np(codes[sel], lut)
                sub_ids = ids[sel]
                # keep the S best (ties by id) from this batch
                order = np.lexsort((sub_ids, d2))[:S]
                best[qid].extend(zip(d2[order], sub_ids[order]))
                if len(best[qid]) > 4 * S:
                    best[qid] = sorted(best[qid])[:S]
        rows = []
        for qid, lst in best.items():
            for d2, i in sorted(lst)[:S]:
                rows.append({"q_id": qid, "id": int(i),
                             "adc": float(d2)})
        if rows:
            yield pd.DataFrame(rows)

    cols = [F.col(id_col).alias("_id"), F.col(code_col).alias(code_col)]
    if has_cluster:
        cols.append(F.col("cluster"))
    partials = indexed.select(*cols).mapInPandas(
        score, "q_id long, id long, adc double")
    w = Window.partitionBy("q_id").orderBy("adc", "id")
    short = (partials.withColumn("_r", F.row_number().over(w))
             .where(F.col("_r") <= S).drop("_r"))
    if not rerank:
        sim = F.lit(1.0) - F.col("adc") / F.lit(2.0)
        order_key = sim if rank_round is None else F.round(sim, rank_round)
        wk = Window.partitionBy("q_id").orderBy(F.desc("_ord"), "id")
        return (short.select("q_id", "id", sim.alias("sim"),
                             order_key.alias("_ord"))
                .withColumn("rank", F.row_number().over(wk))
                .where(F.col("rank") <= int(k)).drop("_ord"))
    # exact refine: join the (tiny) shortlist back to original vectors
    qdf = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.transform(F.col(vec_col),
                    lambda a: a.cast("double")).alias("q_emb"))
    cand = indexed.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col),
                    lambda a: a.cast("double")).alias("c_emb"))
    j = short.join(F.broadcast(qdf), "q_id").join(cand, "id")
    dot = F.aggregate(F.zip_with("q_emb", "c_emb", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, v: acc + v)
    nrm = (lambda c: F.greatest(
        F.sqrt(F.aggregate(F.col(c), F.lit(0.0),
                           lambda acc, v: acc + v * v)),
        F.lit(1e-12)))
    sim = dot / (nrm("q_emb") * nrm("c_emb"))
    order_key = sim if rank_round is None else F.round(sim, rank_round)
    wk = Window.partitionBy("q_id").orderBy(F.desc("_ord"), "id")
    return (j.select("q_id", "id", sim.alias("sim"),
                     order_key.alias("_ord"))
            .withColumn("rank", F.row_number().over(wk))
            .where(F.col("rank") <= int(k)).drop("_ord"))
