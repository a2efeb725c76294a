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
* :func:`write_pq_index` / :func:`read_pq_index` — the code table
  commits to a :class:`lineage.SnapshotTable` (durable manifest,
  per-partition row counts, ``remaining()``-based resume for
  interrupted encode jobs) keyed by the IVF ``cluster`` when present;
  codebooks + coarse centroids persist as tiny parquet sidecars.
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
from pyspark import StorageLevel
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


def _sub_min_d2(S_s: np.ndarray, C_s: np.ndarray) -> np.ndarray:
    """(N, dsub) points vs (c, dsub) candidates → per-point min
    squared-L2 distance (plain Euclidean: subvectors are NOT unit
    vectors even when the full vector is normalized)."""
    d2 = (np.sum(S_s ** 2, axis=1)[:, None] - 2.0 * S_s @ C_s.T
          + np.sum(C_s ** 2, axis=1)[None, :])
    return np.maximum(d2.min(axis=1), 0.0)


def init_pq_kmeans_parallel(df: DataFrame, vec_col: str, id_col: str,
                            m: int, ksub: int, seed: int = 42,
                            rounds: int = 2, oversample: int | None = None,
                            normalize: bool = True) -> np.ndarray:
    """Deterministic per-subspace k-means|| seeding, ``(m, ksub, dsub)``.

    The :func:`ann.init_kmeans_parallel` recipe (Bahmani et al.,
    VLDB'12; hash-coin sampling, weighted k-means++ finish) applied to
    every PQ subspace AT ONCE: all ``m`` subspaces share the same
    Arrow passes, so a round costs two narrow corpus passes TOTAL (per-
    subspace Σd², then the sample filter) instead of two per subspace.
    The sampling coin is ``xxhash64(id, seed, round, sub)`` (JVM-side,
    bit-reproducible, no RNG state); distances are plain squared-L2 in
    each subspace (subvectors are not unit vectors). Candidates are
    weighted by nearest-point counts (one shared counting pass) and
    reduced to ``ksub`` centers per subspace driver-side — candidate
    pools are O(oversample · rounds) per subspace, driver-trivial."""
    el = float(oversample if oversample is not None else 2 * ksub)
    proj = df.select(F.col(id_col).alias("_id"),
                     F.transform(F.col(vec_col),
                                 lambda a: a.cast("double")).alias("_emb"))
    first = proj.orderBy("_id").limit(1).collect()
    if not first:
        raise ValueError("init_pq_kmeans_parallel: empty corpus")
    x0 = np.asarray(first[0]._emb, dtype=np.float64).reshape(1, -1)
    if normalize:
        x0 = _normalize(x0)
    dsub = _check_dims(x0.shape[1], m)
    S0 = _sub(x0, m)
    cands: list[list[np.ndarray]] = [[S0[s][0]] for s in range(m)]

    def totals_udf(C):
        def run(batches):
            tot = np.zeros(m)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
                if normalize:
                    X = _normalize(X)
                S = _sub(X, m)
                for s in range(m):
                    tot[s] += _sub_min_d2(S[s], C[s]).sum()
            yield pd.DataFrame({"sub": np.arange(m, dtype=np.int64),
                                "tot": tot})
        return run

    def sample_udf(C, totals):
        def run(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
                if normalize:
                    X = _normalize(X)
                S = _sub(X, m)
                rows = []
                for s in range(m):
                    if totals[s] <= 0.0:
                        continue
                    u = pdf[f"_u{s}"].to_numpy(dtype=np.float64)
                    keep = u * totals[s] < el * _sub_min_d2(S[s], C[s])
                    rows.extend({"sub": s, "subvec": v.tolist()}
                                for v in S[s][keep])
                if rows:
                    yield pd.DataFrame(rows)
        return run

    for r in range(int(rounds)):
        C = [np.stack(c) for c in cands]
        trows = (proj.mapInPandas(totals_udf(C), "sub long, tot double")
                 .groupBy("sub").agg(F.sum("tot").alias("t")).collect())
        totals = np.zeros(m)
        for row in trows:
            totals[row.sub] = float(row.t or 0.0)
        if totals.max() <= 0.0:
            break
        coins = [(F.pmod(F.xxhash64(F.col("_id"), F.lit(int(seed)),
                                    F.lit(r), F.lit(s)),
                         F.lit(2 ** 40)).cast("double")
                  / F.lit(float(2 ** 40))).alias(f"_u{s}")
                 for s in range(m)]
        sampled = (proj.select("_id", "_emb", *coins)
                   .mapInPandas(sample_udf(C, totals),
                                "sub long, subvec array<double>")
                   .collect())
        for row in sampled:
            cands[int(row.sub)].append(
                np.asarray(row.subvec, dtype=np.float64))

    # pad degenerate pools (tiny corpus / tight duplicates) old-init
    # style with the first ids' subvectors, then dedupe per subspace
    need_pad = any(len(c) < ksub for c in cands)
    if need_pad:
        pad = (proj.orderBy("_id").limit(int(ksub) + max(len(c) for c in cands))
               .select("_emb").collect())
        P = np.asarray([row._emb for row in pad], dtype=np.float64)
        if normalize:
            P = _normalize(P)
        SP = _sub(P, m)
        for s in range(m):
            cands[s].extend(SP[s])
    C = [np.unique(np.stack(c), axis=0) for c in cands]

    # shared counting pass: per-partition nearest-candidate counts for
    # every subspace (O(Σ|C_s|) rows per partition, vectors stay put)
    def count_udf(Cs):
        def run(batches):
            counts = [np.zeros(len(Cs[s]), dtype=np.int64)
                      for s in range(m)]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
                if normalize:
                    X = _normalize(X)
                S = _sub(X, m)
                for s in range(m):
                    d2 = (np.sum(S[s] ** 2, axis=1)[:, None]
                          - 2.0 * S[s] @ Cs[s].T
                          + np.sum(Cs[s] ** 2, axis=1)[None, :])
                    np.add.at(counts[s], np.argmin(d2, axis=1), 1)
            rows = []
            for s in range(m):
                for i in np.nonzero(counts[s])[0]:
                    rows.append({"sub": s, "cand": int(i),
                                 "n": int(counts[s][i])})
            if rows:
                yield pd.DataFrame(rows)
        return run

    weights = [np.zeros(len(C[s])) for s in range(m)]
    for row in (proj.mapInPandas(count_udf(C),
                                 "sub long, cand long, n long")
                .groupBy("sub", "cand").agg(F.sum("n").alias("n"))
                .collect()):
        weights[int(row.sub)][int(row.cand)] += row.n

    books = np.zeros((m, int(ksub), dsub))
    for s in range(m):
        Cs, w = C[s], np.maximum(weights[s], 1e-9)
        if len(Cs) <= ksub:
            books[s, :len(Cs)] = Cs
            if len(Cs) < ksub:
                books[s, len(Cs):] = Cs[0]
            continue
        # greedy weighted k-means++ (argmax of w·d², index tiebreak)
        sel = [int(np.argmax(w))]
        d2 = np.maximum(np.sum((Cs - Cs[sel[0]]) ** 2, axis=1), 0.0)
        while len(sel) < ksub:
            score = w * d2
            score[sel] = -1.0
            nxt = int(np.argmax(score))
            sel.append(nxt)
            d2 = np.minimum(d2, np.sum((Cs - Cs[nxt]) ** 2, axis=1))
        centers = Cs[sel].copy()
        for _ in range(3):  # weighted Lloyd polish on the pool
            dd = (np.sum(Cs ** 2, axis=1)[:, None]
                  - 2.0 * Cs @ centers.T
                  + np.sum(centers ** 2, axis=1)[None, :])
            lab = np.argmin(dd, axis=1)
            for j in range(ksub):
                msk = lab == j
                if msk.any():
                    centers[j] = np.average(Cs[msk], axis=0,
                                            weights=w[msk])
        books[s] = centers
    return books


def train_pq(df: DataFrame, vec_col: str, id_col: str, m: int = 8,
             ksub: int = 16, iters: int = 3, normalize: bool = True,
             init: str = "kmeans||", seed: int = 42,
             cache: bool = True) -> np.ndarray:
    """Per-subspace k-means codebooks, ``(m, ksub, dsub)`` float64.

    ``init="kmeans||"`` (default) seeds every subspace with the
    deterministic oversampled sampler
    (:func:`init_pq_kmeans_parallel` — all subspaces share the same
    corpus passes); ``init="first"`` keeps the legacy
    first-``ksub``-rows-by-id seeding (the recall baseline in
    test_pq). Each Lloyd iteration is ONE Arrow pass emitting map-side
    partial sums for every (subspace, code); the driver merges in
    (subspace, code, partition) order — bit-reproducible.

    ``cache=True`` (default) persists the narrow ``(id, vector)``
    projection once and reuses it across every init/Lloyd pass —
    values and partition boundaries are unchanged, so codebooks are
    bit-identical to ``cache=False``; the win is avoided input
    re-reads (material when the corpus scans from remote storage, a
    measured wash at local bench scale); disable when the projection
    exceeds cluster storage (see :func:`ann.train_ivf`)."""
    if not 1 <= int(ksub) <= 256:
        raise ValueError(
            f"ksub={ksub} out of range: codes are stored as uint8, so "
            "each subspace holds at most 256 codewords (raise m, not "
            "ksub, for more capacity)")
    if init not in ("kmeans||", "first"):
        raise ValueError(f"unknown init {init!r}: kmeans|| | first")
    proj = df.select(id_col, vec_col)
    if cache:
        proj = proj.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _train_pq_passes(proj, vec_col, id_col, m, int(ksub),
                                int(iters), normalize, init, seed)
    finally:
        if cache:
            proj.unpersist()


def _train_pq_passes(df: DataFrame, vec_col: str, id_col: str, m: int,
                     ksub: int, iters: int, normalize: bool, init: str,
                     seed: int) -> np.ndarray:
    if init == "kmeans||":
        books = init_pq_kmeans_parallel(df, vec_col, id_col, m, int(ksub),
                                        seed=seed, normalize=normalize)
        d = books.shape[2] * m
        dsub = books.shape[2]
    else:
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


def save_pq_books(spark, path: str, books: np.ndarray,
                  centroids: np.ndarray | None = None) -> None:
    """Persist codebooks (and the coarse IVF centroids, when given) as
    tiny single-file parquet tables next to the code table."""
    m, ksub, dsub = books.shape
    rows = [(int(s), int(kk), [float(x) for x in books[s, kk]])
            for s in range(m) for kk in range(ksub)]
    (spark.createDataFrame(rows, "sub int, code int, center array<double>")
     .coalesce(1).write.mode("overwrite").parquet(path + "_books"))
    if centroids is not None:
        crows = [(int(i), [float(x) for x in c])
                 for i, c in enumerate(centroids)]
        (spark.createDataFrame(crows, "cluster int, centroid array<double>")
         .coalesce(1).write.mode("overwrite").parquet(path + "_centroids"))


def load_pq_books(spark, path: str) -> tuple[np.ndarray, np.ndarray | None]:
    """(books, centroids-or-None) back from :func:`save_pq_books`."""
    b = (spark.read.parquet(path + "_books")
         .orderBy("sub", "code").toPandas())
    m, ksub = int(b["sub"].max()) + 1, int(b["code"].max()) + 1
    books = np.asarray(b.center.tolist(), dtype=np.float64) \
        .reshape(m, ksub, -1)
    # only a MISSING sidecar means "books-only index"; any other read
    # failure (corruption, permissions) must surface — a silently-None
    # centroids table would degrade pq_search to a full-corpus scan
    from pyspark.errors import AnalysisException
    try:
        c = (spark.read.parquet(path + "_centroids")
             .orderBy("cluster").toPandas())
        centroids = np.asarray(c.centroid.tolist(), dtype=np.float64)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
        centroids = None
    return books, centroids


def pq_index_table(path: str):
    """The code table as a :class:`lineage.SnapshotTable` — encode a
    10¹²-vector corpus in partition batches, commit each, and an
    interrupted job resumes from ``remaining()`` instead of
    re-encoding (exactly the scenes-log durability contract)."""
    from vrtility_spark.lineage import SnapshotTable
    return SnapshotTable(path + "_codes")


def write_pq_index(indexed: DataFrame, path: str, books: np.ndarray,
                   centroids: np.ndarray | None = None,
                   partition_col: str | None = None) -> dict:
    """Persist a full PQ index: the encoded code table committed to a
    :class:`lineage.SnapshotTable` (durable manifest, per-partition
    row counts, resumable), plus the tiny codebook/centroid tables.

    ``partition_col`` keys the snapshot partitions — ``cluster`` when
    the table is IVF-assigned (searches over ``nprobe`` clusters then
    prune at the SCAN, the :func:`ann.write_ivf_index` layout); falls
    back to ``cluster`` if present else a hash bucket of the first
    column."""
    if partition_col is None:
        partition_col = "cluster" if "cluster" in indexed.columns else None
    if partition_col is None:
        indexed = indexed.withColumn(
            "_bucket", F.pmod(F.xxhash64(indexed.columns[0]), F.lit(64)))
        partition_col = "_bucket"
    tab = pq_index_table(path)
    manifest = tab.commit(indexed, partition_col, upsert=True)
    save_pq_books(indexed.sparkSession, path, books, centroids)
    return manifest


def read_pq_index(spark, path: str):
    """(indexed DataFrame, books, centroids-or-None) back from
    :func:`write_pq_index` — the DataFrame reads through the snapshot
    chain (newest snapshot wins per partition)."""
    indexed = pq_index_table(path).read(spark)
    # the write-side hash-bucket partitioner is an internal layout
    # detail — strip it so the round-trip schema matches what the
    # caller committed (unionByName against fresh pq_encode rows works)
    if "_bucket" in indexed.columns:
        indexed = indexed.drop("_bucket")
    books, centroids = load_pq_books(spark, path)
    return indexed, books, centroids


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
