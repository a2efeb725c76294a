"""Scalar (int8) embedding quantization — the SQ8 tier of the ANN
memory ladder (the FAISS ``ScalarQuantizer QT_8bit`` layout), between
raw floats and :mod:`vrtility_spark.pq`'s product codes:

* **train** — one Arrow pass folds per-partition ``(min, max)``
  vectors; only ``(2, d)`` float blocks shuffle, embedding bytes never
  do, and min/max merging is EXACT and order-free (no float-sum
  nondeterminism at all — the model is bit-identical under any
  partitioning, no decimal tricks needed);
* **encode** — each (unit-normalized) vector becomes ``d`` uint8 codes
  ``round((v − min) / Δ · 255)`` in one narrow map: 4× compression
  over float32 (8× over f64) with per-dimension reconstruction error
  ≤ Δ/510;
* **search** — asymmetric scoring: the query stays float, candidate
  codes decode on the fly inside one ``mapInPandas`` over the code
  table; per-partition top-``shortlist`` partials are the only rows
  that shuffle (the :func:`vrtility_spark.pq.pq_search` plan), and
  ``rerank=True`` re-scores the shortlist against the original
  vectors — with a corpus-wide shortlist that is brute force by
  construction, the driver query's exact-oracle trick.

The reference has no vector search at all; this quadrant comes from
the LLM-training-data brief (dedup/similarity over ``embeddings``).
Scale shape: training shuffles O(partitions · d) floats, encoding is
embarrassingly parallel, search shuffles O(queries · shortlist) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _normalize(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    return X / np.maximum(n, 1e-12)


def train_sq(df: DataFrame, vec_col: str = "embedding",
             normalize: bool = True) -> np.ndarray:
    """Per-dimension affine model ``(2, d)`` — row 0 the minima, row 1
    the maxima of the (unit-normalized) corpus.  One narrow Arrow map
    emits a single ``(2, d)`` partial per partition; the driver merge
    is min/max, so the model is exact and partitioning-invariant."""
    def partials(batches):
        lo = hi = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if normalize:
                X = _normalize(X)
            bl, bh = X.min(axis=0), X.max(axis=0)
            lo = bl if lo is None else np.minimum(lo, bl)
            hi = bh if hi is None else np.maximum(hi, bh)
        if lo is not None:
            yield pd.DataFrame({"lo": [lo.tolist()], "hi": [hi.tolist()]})

    rows = (df.select(vec_col)
            .mapInPandas(partials,
                         "lo array<double>, hi array<double>")
            .collect())
    if not rows:
        raise ValueError("train_sq: empty corpus")
    lo = np.min([r["lo"] for r in rows], axis=0)
    hi = np.max([r["hi"] for r in rows], axis=0)
    return np.stack([lo, hi])


def sq_encode_np(X: np.ndarray, model: np.ndarray,
                 normalize: bool = True) -> np.ndarray:
    """(n, d) floats → (n, d) uint8 codes.  Constant dimensions
    (Δ = 0) encode to 0 and decode back to their exact value."""
    lo, hi = model[0], model[1]
    delta = hi - lo
    if normalize:
        X = _normalize(np.asarray(X, dtype=np.float64))
    with np.errstate(invalid="ignore", divide="ignore"):
        t = (X - lo) / np.where(delta == 0.0, 1.0, delta)
    return np.clip(np.round(t * 255.0), 0, 255).astype(np.uint8)


def sq_decode_np(codes: np.ndarray, model: np.ndarray) -> np.ndarray:
    """(n, d) uint8 codes → (n, d) float64 reconstructions."""
    lo, hi = model[0], model[1]
    return lo + codes.astype(np.float64) / 255.0 * (hi - lo)


def sq_encode(df: DataFrame, vec_col: str, model: np.ndarray,
              out_col: str = "sq_code",
              normalize: bool = True) -> DataFrame:
    """Add the ``d``-byte SQ code column (binary) — narrow map."""
    mdl = np.asarray(model, dtype=np.float64).copy()

    @F.pandas_udf("binary")
    def enc(emb: pd.Series) -> pd.Series:
        X = np.asarray(emb.tolist(), dtype=np.float64)
        codes = sq_encode_np(X, mdl, normalize)
        return pd.Series([c.tobytes() for c in codes])

    return df.withColumn(out_col, enc(F.col(vec_col)))


def sq_search(indexed: DataFrame, queries: DataFrame,
              model: np.ndarray, vec_col: str, id_col: str,
              q_id_col: str, k: int, shortlist: int = 64,
              rerank: bool = False, rank_round: int | None = None,
              code_col: str = "sq_code",
              normalize: bool = True) -> DataFrame:
    """Top-k per query by decoded-dot asymmetric scoring over the SQ
    code table.  Returns ``(q_id, id, sim, rank)``; ``sim`` is the
    approximate cosine (dot of the unit query with the decoded
    candidate), or the EXACT re-ranked cosine when ``rerank=True``.
    Deterministic: ties break by ascending id, ``rank_round`` rounds
    the ordering key so float noise can't flip equal-sim ranks."""
    mdl = np.asarray(model, dtype=np.float64).copy()
    d = mdl.shape[1]
    qrows = (queries.select(F.col(q_id_col).alias("q_id"), vec_col)
             .collect())
    if not qrows:
        return (indexed.sparkSession
                .createDataFrame([], "q_id long, id long, sim double, "
                                     "rank int"))
    Q, qids = [], []
    for r in qrows:
        q = np.asarray(r[vec_col], dtype=np.float64)
        Q.append(_normalize(q.reshape(1, -1))[0] if normalize else q)
        qids.append(int(r["q_id"]))
    Qm = np.asarray(Q)
    if int(shortlist) < 1:
        raise ValueError("shortlist must be >= 1")
    S = max(int(shortlist), int(k))

    def score(batches):
        best: dict[int, list] = {qid: [] for qid in qids}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf[code_col].tolist()),
                dtype=np.uint8).reshape(len(pdf), d)
            ids = pdf["_id"].to_numpy()
            Xh = sq_decode_np(codes, mdl)
            sims = Xh @ Qm.T                        # (nb, nq)
            for qi, qid in enumerate(qids):
                sel = ids != qid
                if not sel.any():
                    continue
                s = sims[sel, qi]
                sub_ids = ids[sel]
                order = np.lexsort((sub_ids, -s))[:S]
                best[qid].extend(zip(-s[order], sub_ids[order]))
                if len(best[qid]) > 4 * S:
                    best[qid] = sorted(best[qid])[:S]
        rows = []
        for qid, lst in best.items():
            for ns, i in sorted(lst)[:S]:
                rows.append({"q_id": qid, "id": int(i),
                             "nsim": float(ns)})
        if rows:
            yield pd.DataFrame(rows)

    partials = (indexed.select(F.col(id_col).alias("_id"), code_col)
                .mapInPandas(score, "q_id long, id long, nsim double"))
    w = Window.partitionBy("q_id").orderBy("nsim", "id")
    short = (partials.withColumn("_r", F.row_number().over(w))
             .where(F.col("_r") <= S).drop("_r"))
    if not rerank:
        sim = -F.col("nsim")
        order_key = sim if rank_round is None else F.round(sim, rank_round)
        wk = Window.partitionBy("q_id").orderBy(F.desc("_ord"), "id")
        return (short.select("q_id", "id", sim.alias("sim"),
                             order_key.alias("_ord"))
                .withColumn("rank", F.row_number().over(wk))
                .where(F.col("rank") <= int(k)).drop("_ord"))
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
