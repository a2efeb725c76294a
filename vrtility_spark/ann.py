"""Approximate nearest neighbour over embedding columns.

Brute-force cosine top-k is the baseline (oracle-checked as the
``embedding_topk`` driver query); this module is the scale path: an
IVF (inverted-file) index — k-means coarse quantizer, cluster-pruned
search — the standard recipe for 10^9+ vector corpora:

- ``train_ivf``: distributed k-means (assignment fused with MAP-SIDE
  partial centroid sums in one Arrow stage against broadcast
  centroids; the driver merges O(partitions x k) partial rows —
  vectors never leave executors and nothing shuffles). Deterministic:
  seeded hash-coin k-means|| init (``init_kmeans_parallel``), fixed
  iterations, (cluster, partition)-ordered merge.
- ``ivf_assign``: adds the ``cluster`` column (the "cell index" of
  vector space — same role cells.py plays for footprints).
- ``ivf_search``: queries probe their ``nprobe`` nearest centroids,
  candidates come from one equi-join on ``cluster`` (partition-pruned
  at scale when the table is written partitioned by cluster), exact
  cosine re-ranks. ``nprobe = n_clusters`` degrades gracefully to
  exact brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _assign_udf(centroids: np.ndarray):
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True),
                               1e-12)

    @F.pandas_udf(T.IntegerType())
    def assign(emb: pd.Series) -> pd.Series:
        X = np.asarray(emb.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(X @ c.T, axis=1).astype(np.int32))

    return assign


def _partial_sums_udf(centroids: np.ndarray, vec_col: str):
    """Fused assign + map-side combine for one k-means update: each
    input partition emits AT MOST ``n_clusters`` rows
    ``(pid, cluster, vecsum, n)`` — assignment against the broadcast
    centroids and the per-cluster running sums happen inside ONE Arrow
    stage, so nothing is shuffled at all (the follow-up ``collect()``
    moves O(partitions x k) tiny rows to the driver, not n x d)."""
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True),
                               1e-12)
    d = centroids.shape[1]

    def run(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        sums = np.zeros((len(c), d), dtype=np.float64)
        counts = np.zeros(len(c), dtype=np.int64)
        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                                1e-12)
            lab = np.argmax(Xn @ c.T, axis=1)
            # one bincount-style accumulate per batch; RAW vectors are
            # summed (centroid = mean of members, matching the
            # explode+groupBy formulation this replaces)
            np.add.at(sums, lab, X)
            np.add.at(counts, lab, 1)
        hit = np.nonzero(counts)[0]
        yield pd.DataFrame({
            "pid": np.full(len(hit), pid, dtype=np.int64),
            "cluster": hit.astype(np.int64),
            "vecsum": [sums[k].tolist() for k in hit],
            "n": counts[hit],
        })

    return run


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _min_d2_udf(cands: np.ndarray, passthrough: tuple[str, ...] = ()):
    """Arrow map: per-point spherical distance to the nearest current
    candidate, ``d2 = max(0, 1 - max cos sim)``, with ``passthrough``
    columns carried along (column ``_emb`` holds the vector)."""
    cn = _normalize(cands)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf["_emb"].tolist(), dtype=np.float64)
            d2 = np.maximum(1.0 - (_normalize(X) @ cn.T).max(axis=1), 0.0)
            out = pdf[["_emb", *passthrough]].copy()
            out["d2"] = d2
            yield out

    return run


def init_kmeans_parallel(df: DataFrame, vec_col: str, id_col: str,
                         n_clusters: int, seed: int = 42, rounds: int = 2,
                         oversample: int | None = None) -> np.ndarray:
    """Deterministic k-means|| seeding (Bahmani et al., VLDB'12),
    Spark-shaped: start from the minimum-id vector, then for each round
    sample every point independently with probability
    ``l * d²(x)/Σd²`` against the current candidate set — the sampling
    coin is ``xxhash64(id, seed, round)`` (JVM-side, engine-exact), so
    the init is bit-reproducible run to run with no RNG state. Each
    round costs two narrow Arrow passes (Σd², then the sample filter);
    nothing shuffles and only ~``l`` vectors per round reach the
    driver. Candidates are weighted by the number of points nearest to
    them (one map-side count pass) and reduced to ``n_clusters``
    centers driver-side with greedy weighted k-means++ plus a few
    weighted Lloyd polish steps — the candidate pool is O(l·rounds),
    driver-trivial at any corpus size."""
    el = float(oversample if oversample is not None else 2 * n_clusters)
    proj = df.select(F.col(id_col).alias("_id"),
                     F.transform(F.col(vec_col),
                                 lambda a: a.cast("double")).alias("_emb"))
    first = proj.orderBy("_id").limit(1).collect()
    if not first:
        return np.zeros((0, 0), dtype=np.float64)
    cands = [np.asarray(first[0]._emb, dtype=np.float64)]
    d = len(cands[0])
    for r in range(rounds):
        C = np.stack(cands)
        # Σd² — one narrow pass, one tiny aggregate
        tot_row = (proj.mapInPandas(_min_d2_udf(C),
                                    "_emb array<double>, d2 double")
                   .agg(F.sum("d2").alias("t")).collect()[0])
        total = float(tot_row.t or 0.0)
        if total <= 0.0:  # every point is (numerically) a candidate
            break
        # deterministic coin in [0, 1): xxhash64 of (id, seed, round)
        u = (F.pmod(F.xxhash64(F.col("_id"), F.lit(int(seed)), F.lit(r)),
                    F.lit(2 ** 40)).cast("double") / F.lit(float(2 ** 40)))
        sampled = (proj.withColumn("_u", u)
                   .mapInPandas(_min_d2_udf(C, ("_u",)),
                                "_emb array<double>, _u double, d2 double")
                   .where(F.col("_u") * total < F.lit(el) * F.col("d2"))
                   .select("_emb").collect())
        cands.extend(np.asarray(row._emb, dtype=np.float64)
                     for row in sampled)
    if len(cands) < n_clusters:
        # degenerate sampling (tiny corpus / tight duplicates): top up
        # the pool with the first ids, old-init style, weight 1
        pad = (proj.orderBy("_id").limit(n_clusters + len(cands))
               .select("_emb").collect())
        cands.extend(np.asarray(row._emb, dtype=np.float64) for row in pad)
    C = np.unique(np.stack(cands), axis=0)  # dedupe, deterministic order
    if len(C) <= n_clusters:
        out = np.zeros((n_clusters, d), dtype=np.float64)
        out[:len(C)] = C
        out[len(C):] = C[0] if len(C) else 0.0
        return out
    # weight candidates by nearest-point counts (map-side, no shuffle)
    counts = np.zeros(len(C), dtype=np.float64)
    for row in (df.select(F.col(vec_col).alias("_v"))
                .mapInPandas(_count_nearest_udf(C, "_v"),
                             "cluster long, n long").collect()):
        counts[row.cluster] += row.n
    w = np.maximum(counts, 1e-9)
    Cn = _normalize(C)
    # greedy weighted k-means++: argmax of w·d² (index tiebreak) —
    # deterministic without RNG
    sel = [int(np.argmax(w))]
    d2 = np.maximum(1.0 - Cn @ Cn[sel[0]], 0.0)
    while len(sel) < n_clusters:
        score = w * d2
        score[sel] = -1.0
        nxt = int(np.argmax(score))
        sel.append(nxt)
        d2 = np.minimum(d2, np.maximum(1.0 - Cn @ Cn[nxt], 0.0))
    centers = C[sel].copy()
    for _ in range(3):  # weighted Lloyd polish on the candidate pool
        lab = np.argmax(Cn @ _normalize(centers).T, axis=1)
        for j in range(n_clusters):
            m = lab == j
            if m.any():
                centers[j] = np.average(C[m], axis=0, weights=w[m])
    return centers


def _count_nearest_udf(cands: np.ndarray, vec_col: str):
    """Arrow map: per-partition counts of the nearest candidate —
    O(candidates) rows out per partition, vectors stay put."""
    cn = _normalize(cands)

    def run(batches):
        counts = np.zeros(len(cn), dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            lab = np.argmax(_normalize(X) @ cn.T, axis=1)
            np.add.at(counts, lab, 1)
        hit = np.nonzero(counts)[0]
        yield pd.DataFrame({"cluster": hit.astype(np.int64),
                            "n": counts[hit]})

    return run


def train_ivf(df: DataFrame, vec_col: str, id_col: str, n_clusters: int,
              iters: int = 3, combine: str = "driver",
              init: str = "kmeans||", seed: int = 42,
              cache: bool = True) -> np.ndarray:
    """Deterministic distributed k-means (cosine/spherical).

    The update step is MAP-SIDE: per-partition partial centroid sums
    inside an Arrow ``mapInPandas`` (one ``(cluster, vecsum, n)`` row
    per partition per non-empty cluster) — the explode+groupBy
    formulation it replaces shuffled O(n x d) rows per iteration.

    ``combine`` picks where partials merge:

    - ``"driver"`` (default): collect O(partitions x k) rows, merge in
      (cluster, partition-id) order — bit-deterministic run to run.
      Right up to ~10^3 partitions x 10^3 clusters.
    - ``"spark"``: one tiny shuffle reduces partials per cluster
      (element-wise array sum), then k rows collect — for extreme
      partition x cluster products where the driver collect itself
      would be the bottleneck. Summation order inside a cluster is
      Spark-determined (float drift ~1e-15 relative; rank_round in
      :func:`ivf_search` absorbs it).

    ``init="kmeans||"`` (default) seeds with the deterministic
    oversampled sampler (:func:`init_kmeans_parallel`, ``seed``-keyed);
    ``init="first"`` keeps the legacy first-k-by-id seeding (the
    recall baseline in test_ann). Exact search (``nprobe =
    n_clusters``) is init-independent; pruned-search recall at fixed
    nprobe is what the better init buys.

    ``cache=True`` (default) persists the narrow ``(id, vector)``
    projection ONCE (memory-and-disk) and reuses it across every
    init/Lloyd pass — the MLlib-KMeans pattern for iterative training
    over an immutable input. Values and partition boundaries are
    unchanged (persist materializes the same scan), so the result is
    bit-identical to ``cache=False``. What it buys depends on where
    the input lives: at local bench scale passes are job-overhead- and
    Arrow-conversion-bound and caching is a wash (measured), but when
    the corpus scans from remote object storage every avoided re-read
    is a full network pass. Pass ``cache=False`` when the projection
    exceeds cluster storage (compressed-parquet re-scans can beat a
    spilled cache there — or train on a
    :mod:`~vrtility_spark.sampling` subset instead).
    """
    if combine not in ("driver", "spark"):
        raise ValueError(f"unknown combine {combine!r}")
    if init not in ("kmeans||", "first"):
        raise ValueError(f"unknown init {init!r}")
    proj = df.select(id_col, vec_col)
    if cache:
        proj = proj.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if init == "kmeans||":
            centroids = init_kmeans_parallel(proj, vec_col, id_col,
                                             n_clusters, seed=seed)
        else:
            # legacy deterministic init: first-k rows by id — clustering-
            # quality-naive (correlated ids seed one region), kept for
            # comparisons and as the recall-test baseline
            rows = (proj.orderBy(id_col).limit(n_clusters)
                    .select(vec_col).toPandas()[vec_col].tolist())
            centroids = np.asarray(rows, dtype=np.float64)
        d = centroids.shape[1]
        for _ in range(iters):
            partials = proj.select(vec_col).mapInPandas(
                _partial_sums_udf(centroids, vec_col),
                "pid long, cluster long, vecsum array<double>, n long")
            new = centroids.copy()
            if combine == "spark":
                zero = F.array(*[F.lit(0.0)] * d)
                rows = (partials.groupBy("cluster")
                        .agg(F.aggregate(
                                F.collect_list("vecsum"), zero,
                                lambda acc, v: F.zip_with(
                                    acc, v, lambda a, b: a + b)).alias("s"),
                             F.sum("n").alias("n"))
                        .collect())
                for row in rows:
                    new[row.cluster] = (np.asarray(row.s, dtype=np.float64)
                                        / max(row.n, 1))
            else:
                rows = sorted(partials.collect(),
                              key=lambda r: (r.cluster, r.pid))
                agg: dict[int, np.ndarray] = {}
                cnt: dict[int, int] = {}
                for row in rows:
                    agg.setdefault(row.cluster, np.zeros(d))
                    agg[row.cluster] += np.asarray(row.vecsum,
                                                   dtype=np.float64)
                    cnt[row.cluster] = cnt.get(row.cluster, 0) + row.n
                for k, v in agg.items():
                    new[k] = v / max(cnt[k], 1)
            centroids = new
    finally:
        if cache:
            proj.unpersist()
    return centroids


def ivf_assign(df: DataFrame, vec_col: str, centroids: np.ndarray) -> DataFrame:
    return df.withColumn("cluster", _assign_udf(centroids)(F.col(vec_col)))


def write_ivf_index(indexed: DataFrame, path: str,
                    centroids: np.ndarray) -> None:
    """Persist an IVF index: vectors partitioned BY CLUSTER plus the
    (tiny) centroid table. At 1e9+ vectors this is what makes nprobe
    sub-linear in practice — a search over ``nprobe`` clusters prunes
    to those partition directories at the SCAN (PartitionFilters), so
    the bytes read scale with nprobe/n_clusters, not the corpus."""
    indexed.write.mode("overwrite").partitionBy("cluster").parquet(path)
    spark = indexed.sparkSession
    cent_rows = [(int(i), [float(x) for x in c])
                 for i, c in enumerate(centroids)]
    (spark.createDataFrame(cent_rows, "cluster int, centroid array<double>")
     .coalesce(1).write.mode("overwrite").parquet(path + "_centroids"))


def read_ivf_index(spark, path: str):
    """(indexed DataFrame, centroids ndarray) back from disk."""
    indexed = spark.read.parquet(path)
    cents = (spark.read.parquet(path + "_centroids")
             .orderBy("cluster").toPandas())
    return indexed, np.asarray(cents.centroid.tolist(), dtype=np.float64)


def ivf_search(indexed: DataFrame, queries: DataFrame, centroids: np.ndarray,
               vec_col: str, id_col: str, q_id_col: str, k: int,
               nprobe: int = 4, rank_round: int | None = None) -> DataFrame:
    """Top-k cosine neighbours per query via cluster-pruned search.

    Returns ``(q_id, id, sim, rank)``. ``rank_round`` RANKS on the
    similarity rounded to that many decimals (+ id tiebreak) so
    row_number is engine-independent — required when the result is
    compared against an external SQL oracle. The returned ``sim``
    column always carries the full-precision similarity; only the
    ordering key is rounded.
    """
    from pyspark.sql import Window

    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True),
                               1e-12)
    nprobe = min(nprobe, len(centroids))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(emb: pd.Series) -> pd.Series:
        X = np.asarray(emb.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(X @ c.T), axis=1)[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    # per-row norm + double cast BEFORE the cluster join: at 10^9+
    # vectors the per-pair norm recompute dominates the search stage
    def _prep(df_, idc, out_id, out_emb, out_norm, *extra):
        emb = F.transform(F.col(vec_col), lambda a: a.cast("double"))
        p = df_.select(F.col(idc).alias(out_id), emb.alias(out_emb), *extra)
        norm = F.sqrt(F.aggregate(F.col(out_emb), F.lit(0.0),
                                  lambda acc, v: acc + v * v))
        # zero-vector guard: 0/0 = NaN sorts ABOVE every real value in
        # desc order, promoting garbage rows to rank 1
        return p.withColumn(out_norm, F.greatest(norm, F.lit(1e-12)))

    q = _prep(queries, q_id_col, "q_id", "q_emb", "q_norm",
              F.explode(probes(F.col(vec_col))).alias("cluster"))
    cand = _prep(indexed, id_col, "id", "c_emb", "c_norm", "cluster")
    dot = F.aggregate(
        F.zip_with("q_emb", "c_emb", lambda a, b: a * b),
        F.lit(0.0), lambda acc, v: acc + v)
    sim = dot / (F.col("q_norm") * F.col("c_norm"))
    order_key = sim if rank_round is None else F.round(sim, rank_round)
    pairs = (q.join(cand, "cluster")
             .where(F.col("q_id") != F.col("id"))
             .select("q_id", "id", sim.alias("sim"), order_key.alias("_ord"))
             .dropDuplicates(["q_id", "id"]))
    w = Window.partitionBy("q_id").orderBy(F.desc("_ord"), "id")
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k).drop("_ord"))
