"""Approximate nearest neighbour over embedding columns.

Brute-force cosine top-k is the baseline (oracle-checked as the
``embedding_topk`` driver query); this module is the scale path: an
IVF (inverted-file) index — k-means coarse quantizer, cluster-pruned
search — the standard recipe for 10^9+ vector corpora:

- ``train_ivf``: distributed k-means (assignment fused with MAP-SIDE
  partial centroid sums in one Arrow stage against broadcast
  centroids; the driver merges O(partitions x k) partial rows —
  vectors never leave executors and nothing shuffles). Deterministic:
  init = first-k by id, fixed iterations, (cluster, partition)-ordered
  merge.
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


def train_ivf(df: DataFrame, vec_col: str, id_col: str, n_clusters: int,
              iters: int = 3, combine: str = "driver") -> np.ndarray:
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
    """
    if combine not in ("driver", "spark"):
        raise ValueError(f"unknown combine {combine!r}")
    init = (df.orderBy(id_col).limit(n_clusters)
            .select(vec_col).toPandas()[vec_col].tolist())
    centroids = np.asarray(init, dtype=np.float64)
    d = centroids.shape[1]
    for _ in range(iters):
        partials = df.select(vec_col).mapInPandas(
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
                agg[row.cluster] += np.asarray(row.vecsum, dtype=np.float64)
                cnt[row.cluster] = cnt.get(row.cluster, 0) + row.n
            for k, v in agg.items():
                new[k] = v / max(cnt[k], 1)
        centroids = new
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
