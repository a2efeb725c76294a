"""Unsupervised per-pixel k-means classification — the GEE
``ee.Clusterer.wekaKMeans`` / ``.cluster()`` pattern for multiband
imagery: train a k-means model on a bounded deterministic PIXEL SAMPLE,
then assign every pixel of every tile to its nearest centroid in one
broadcast zero-shuffle pass.

Spark-first shape (and why it scales to 100 TB):

- **sample** is a narrow Arrow map: each tile contributes
  ``n_per_tile`` pixel feature vectors chosen by a deterministic
  md5-hash permutation of its OWN pixel indices (seeded by
  ``cell_id``), after an optional hash filter selects a bounded subset
  of cells — no shuffle, reshard/retry-invariant, and the training-set
  size is ``≤ max sampled cells × n_per_tile`` no matter the corpus;
- **train** is driver-side NumPy Lloyd over that bounded sample — the
  standard clusterer contract (GEE trains on a numPixels sample too):
  deterministic k-means++ seeding from a fixed PCG64 stream, lowest-
  index argmin tie-breaks, empty clusters re-seeded to the farthest
  point.  Training never touches the full corpus;
- **assign** broadcasts the tiny ``(k, B)`` centroid matrix and maps
  tiles once: per-pixel squared distances via one einsum, argmin with
  lowest-index ties, raw16 class payload (classes ``0..k-1``,
  ``NODATA_CLASS = 65535`` wherever ANY feature plane is nodata).
  Zero shuffle — classification cost is one scan.

Determinism note: uint16 pixel features are integers, so Lloyd's
per-cluster sums are exact in float64 and centroids are bit-identical
no matter how the sample rows were ordered — which is what lets
`tools/gen_oracle_constants.py` replicate the whole fit Spark-free.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec

#: class value burned where any feature plane is nodata (raw16 max)
NODATA_CLASS = 65535


# --------------------------------------------------------- kernels ----

def sample_offsets_np(cell_id: int, n_px: int, n: int,
                      seed: int = 0) -> np.ndarray:
    """First ``n`` pixel offsets of the md5 permutation of
    ``range(n_px)`` keyed by ``(cell_id, seed)`` — deterministic,
    host-portable, independent of tile partitioning."""
    ranks = np.array([
        int.from_bytes(hashlib.md5(
            f"{seed}:{int(cell_id)}:{i}".encode()).digest()[:8], "big")
        for i in range(int(n_px))], dtype=np.uint64)
    return np.argsort(ranks, kind="stable")[:int(n)]


def sample_tile_np(arr: np.ndarray, cell_id: int, n_per_tile: int,
                   seed: int = 0) -> np.ndarray:
    """(B, H, W) float array (NaN = nodata) → up to ``n_per_tile``
    fully-valid pixel feature rows ``(n, B)``, picked by the
    deterministic offset permutation (invalid pixels skipped in
    permutation order so the draw stays stable under mask changes
    elsewhere in the tile)."""
    B, H, W = arr.shape
    flat = arr.reshape(B, H * W).T                     # (px, B)
    order = sample_offsets_np(cell_id, H * W, H * W, seed)
    valid = np.isfinite(flat).all(axis=1)
    keep = order[valid[order]][:int(n_per_tile)]
    return flat[keep]


def kmeans_pp_init_np(X: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """Deterministic k-means++ seeding: fixed PCG64 stream picks the
    first centroid and each D²-weighted successor."""
    n = X.shape[0]
    rng = np.random.default_rng(int(seed))
    C = [X[int(rng.integers(n))]]
    d2 = ((X - C[0]) ** 2).sum(axis=1)
    for _ in range(1, int(k)):
        tot = d2.sum()
        if tot <= 0:                      # all points coincide
            C.append(C[0].copy())
            continue
        r = rng.random() * tot
        i = int(np.searchsorted(np.cumsum(d2), r, side="right"))
        i = min(i, n - 1)
        C.append(X[i])
        d2 = np.minimum(d2, ((X - C[-1]) ** 2).sum(axis=1))
    return np.stack(C)


def assign_np(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest-centroid labels with lowest-index tie-break (np.argmin
    returns the first minimum)."""
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1)


def train_kmeans_np(X: np.ndarray, k: int, iters: int = 20,
                    seed: int = 0) -> np.ndarray:
    """Deterministic Lloyd over the (n, B) sample: k-means++ init,
    exact-integer-sum centroid updates (bit-stable for uint16
    features), empty clusters re-seeded to the point farthest from its
    centroid.  Returns the (k, B) float64 codebook."""
    X = np.asarray(X, dtype=np.float64)
    n, B = X.shape
    k = int(k)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n < k:
        raise ValueError(f"sample has {n} rows < k={k}; sample more "
                         "pixels (raise n_per_tile / max_cells)")
    C = kmeans_pp_init_np(X, k, seed).astype(np.float64)
    for _ in range(int(iters)):
        lab = assign_np(X, C)
        newC = C.copy()
        for j in range(k):
            m = lab == j
            if m.any():
                newC[j] = X[m].sum(axis=0) / m.sum()
            else:
                far = int(((X - C[lab]) ** 2).sum(axis=1).argmax())
                newC[j] = X[far]
        if np.array_equal(newC, C):
            break
        C = newC
    return C


def classify_tile_np(arr: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(B, H, W) float array → (1, H, W) uint16 class plane;
    ``NODATA_CLASS`` wherever any feature plane is NaN."""
    B, H, W = arr.shape
    if C.shape[1] != B:
        raise ValueError(
            f"centroids have {C.shape[1]} features but tile has {B} "
            "planes; subset to the training bands first")
    flat = arr.reshape(B, H * W).T
    valid = np.isfinite(flat).all(axis=1)
    lab = np.full(H * W, NODATA_CLASS, dtype=np.uint16)
    if valid.any():
        lab[valid] = assign_np(flat[valid], C).astype(np.uint16)
    return lab.reshape(1, H, W)


# ------------------------------------------------- distributed driver ----

def sample_pixels(df: DataFrame, n_per_tile: int = 64,
                  max_cells: int | None = None, seed: int = 0,
                  key: str = "cell_id") -> pd.DataFrame:
    """Collect the bounded deterministic training sample: an optional
    md5 hash-rank filter keeps the ``max_cells`` lowest-ranked cells
    (a narrow filter + one small top-k, never a full sort of tile
    bytes), then one Arrow map emits each kept tile's ``n_per_tile``
    sampled feature rows.  Returns a pandas DataFrame of float64
    features, rows sorted by (cell_id, draw order) — a canonical order,
    so the fit is partitioning-invariant."""
    src = df
    if max_cells is not None:
        rank = F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.lit(int(seed)), F.col(key).cast("string"))), 1, 8),
            16, 10).cast("long")
        keep = (df.select(F.col(key).alias("_c"), rank.alias("_r"))
                .orderBy("_r", "_c").limit(int(max_cells)))
        src = df.join(F.broadcast(keep.select(F.col("_c").alias(key))),
                      key, "semi")

    has_bn = "band_nodata" in df.columns

    def emit(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
                nd = (codec.row_band_meta(r, arr.shape[0],
                                          "band_nodata", r.nodata)
                      if has_bn else r.nodata)
                feats = sample_tile_np(codec.to_float_masked(arr, nd),
                                       r.cell_id, n_per_tile, seed)
                for j, v in enumerate(feats):
                    out.append({"cell_id": int(r.cell_id), "j": j,
                                "feat": [float(x) for x in v]})
            yield pd.DataFrame(out, columns=["cell_id", "j", "feat"])

    cols = [F.col(key).alias("cell_id"),
            "bytes", "w", "h", "fmt", "nodata"]
    if has_bn:
        cols.append("band_nodata")
    rows = (src.select(*cols)
            .mapInPandas(emit,
                         "cell_id long, j int, feat array<double>")
            .toPandas())
    rows = rows.sort_values(["cell_id", "j"],
                            kind="mergesort").reset_index(drop=True)
    return rows


def fit_kmeans(df: DataFrame, k: int, n_per_tile: int = 64,
               max_cells: int | None = None, iters: int = 20,
               seed: int = 0, key: str = "cell_id") -> np.ndarray:
    """Sample + train: returns the (k, B) centroid codebook."""
    rows = sample_pixels(df, n_per_tile=n_per_tile, max_cells=max_cells,
                         seed=seed, key=key)
    if not len(rows):
        raise ValueError("no valid pixels sampled; check masks/nodata")
    X = np.asarray(rows.feat.tolist(), dtype=np.float64)
    return train_kmeans_np(X, k, iters=iters, seed=seed)


def fold_d2_np(X: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared distance accumulated in INDEX ORDER — the bit-exact
    twin of :func:`assign_vectors`' ``F.aggregate`` fold (NumPy's
    ``.sum`` is pairwise, which can differ in the last ulp)."""
    acc = np.zeros(X.shape[0])
    for t in range(X.shape[1]):
        acc = acc + (X[:, t] - c[t]) ** 2
    return acc


def assign_fold_np(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin over :func:`fold_d2_np` distances, lowest index on ties
    — replicates the distributed expression assignment exactly."""
    D = np.stack([fold_d2_np(X, c) for c in C], axis=1)
    return D.argmin(axis=1)


def fold_dot_np(a: np.ndarray, b: np.ndarray) -> float:
    """Index-order dot product (twin of the pair-cosine fold)."""
    acc = 0.0
    for t in range(len(a)):
        acc = acc + a[t] * b[t]
    return acc


def fold_norm_np(a: np.ndarray) -> float:
    return float(np.sqrt(fold_dot_np(a, a)))


def fit_kmeans_vectors(df: DataFrame, k: int,
                       vec_col: str = "embedding",
                       id_col: str = "doc_id",
                       max_rows: int = 100_000, iters: int = 20,
                       seed: int = 0) -> np.ndarray:
    """k-means codebook over an embedding column: the training sample
    is the ``max_rows`` lowest md5-hash-ranked rows (one bounded top-k,
    never a full collect), sorted canonically before the deterministic
    NumPy Lloyd — so the fit is identical under any partitioning and
    bounded no matter the corpus."""
    rank = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(int(seed)), F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("long")
    rows = (df.select(F.col(id_col).alias("_id"),
                      F.col(vec_col).alias("_v"), rank.alias("_r"))
            .orderBy("_r", "_id").limit(int(max_rows)).toPandas())
    if not len(rows):
        raise ValueError("empty training sample")
    X = np.asarray(rows._v.tolist(), dtype=np.float64)
    return train_kmeans_np(X, k, iters=iters, seed=seed)


def assign_vectors(df: DataFrame, centroids: np.ndarray,
                   vec_col: str = "embedding",
                   out_col: str = "cluster") -> DataFrame:
    """Append the nearest-centroid cluster id: the ``(k, d)`` codebook
    broadcasts as literal columns and the argmin is PURE EXPRESSIONS
    (one squared-distance aggregate per centroid, ``least`` + a
    first-match scan for the lowest-index tie-break) — zero shuffle,
    zero Python in the hot path, whole-stage codegen end to end."""
    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError(f"centroids must be (k, d), got {C.shape}")

    def d2(c: np.ndarray):
        arr = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda a, b: (a - b) ** 2),
            F.lit(0.0), lambda acc, x: acc + x)

    dists = [d2(c) for c in C]
    best = F.least(*dists) if len(dists) > 1 else dists[0]
    lab = F.lit(None).cast("int")
    for j in range(len(dists) - 1, -1, -1):   # first minimum wins
        lab = F.when(dists[j] == best, F.lit(j)).otherwise(lab)
    return df.withColumn(out_col, lab)


def semantic_dup_pairs(df: DataFrame, centroids: np.ndarray,
                       threshold: float = 0.99,
                       vec_col: str = "embedding",
                       id_col: str = "doc_id",
                       max_cluster_size: int = 50_000) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) candidate pairs: assign every
    embedding to its k-means cluster, then compare cosines ONLY within
    clusters — the self-join key is the cluster id, so pair cost is
    ``Σ c_i²`` instead of n², and the cosine itself is pure
    expressions (precomputed norms + one zip_with dot per pair).
    Pairs with ``cos ≥ threshold`` survive, ``(doc_a < doc_b)``.

    A cluster larger than ``max_cluster_size`` fails LOUDLY (inside
    the pair count, via a fused guard expression) instead of silently
    exploding the join — raise ``k`` (SemDeDup uses k ~ √n) or the
    cap."""
    norm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x))
    tagged = (assign_vectors(df, centroids, vec_col=vec_col)
              .select(F.col(id_col).alias("_id"),
                      F.col(vec_col).alias("_v"),
                      norm.alias("_n"), "cluster"))
    csize = tagged.groupBy("cluster").agg(F.count("*").alias("_cs"))
    # fused guard: Catalyst may reorder separate filters, so the size
    # check and the pass-through live in ONE expression
    guard = F.when(
        F.col("_cs") > int(max_cluster_size),
        F.raise_error(F.concat(
            F.lit("semantic_dup_pairs: cluster "),
            F.col("cluster").cast("string"),
            F.lit(" holds "), F.col("_cs").cast("string"),
            F.lit(f" > max_cluster_size={int(max_cluster_size)} "
                  "embeddings; raise k (SemDeDup uses k ~ sqrt(n)) "
                  "or max_cluster_size")))).otherwise(F.lit(True))
    tagged = (tagged.join(csize, "cluster").where(guard)
              .drop("_cs"))
    a = tagged.select(F.col("cluster"), F.col("_id").alias("doc_a"),
                      F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = tagged.select(F.col("cluster"), F.col("_id").alias("doc_b"),
                      F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    den = F.col("_na") * F.col("_nb")
    cos = F.when(den > 0, dot / den)
    return (a.join(b, "cluster")
            .where(F.col("doc_a") < F.col("doc_b"))
            .withColumn("cos", cos)
            .where(F.col("cos") >= float(threshold))
            .select("doc_a", "doc_b", "cluster", "cos"))


def semantic_dedup(df: DataFrame, k: int, threshold: float = 0.99,
                   vec_col: str = "embedding", id_col: str = "doc_id",
                   max_rows: int = 100_000, iters: int = 20,
                   seed: int = 0,
                   max_cluster_size: int = 50_000) -> DataFrame:
    """SemDeDup end to end: fit k-means on a bounded sample, bucket by
    cluster, drop near-identical embeddings (cos ≥ threshold) with
    keep-min-id semantics via the shared connected-components dedup
    (:func:`vrtility_spark.dedup.drop_near_duplicates` — transitive
    closure, same as every other near-dup family here)."""
    from vrtility_spark import dedup
    C = fit_kmeans_vectors(df, k, vec_col=vec_col, id_col=id_col,
                           max_rows=max_rows, iters=iters, seed=seed)
    pairs = semantic_dup_pairs(df, C, threshold=threshold,
                               vec_col=vec_col, id_col=id_col,
                               max_cluster_size=max_cluster_size)
    return dedup.drop_near_duplicates(df, pairs, id_col=id_col)


def classify_kmeans(df: DataFrame, centroids: np.ndarray,
                    key: str = "cell_id") -> DataFrame:
    """Assign every pixel to its nearest centroid: broadcast the tiny
    codebook, one narrow Arrow map, zero shuffle.  Output replaces the
    payload with a single raw16 class plane (classes ``0..k-1``,
    ``NODATA_CLASS`` sentinel) and nulls per-band metadata."""
    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError(f"centroids must be (k, B), got {C.shape}")
    bc = df.sparkSession.sparkContext.broadcast(C.tolist())
    names = [f.name for f in df.schema.fields]
    schema = df.schema

    has_bn = "band_nodata" in df.columns

    def run(batches):
        Cl = np.asarray(bc.value, dtype=np.float64)
        for pdf in batches:
            out_bytes = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
                nd = (codec.row_band_meta(r, arr.shape[0],
                                          "band_nodata", r.nodata)
                      if has_bn else r.nodata)
                lab = classify_tile_np(codec.to_float_masked(arr, nd),
                                       Cl)
                out_bytes.append(codec.encode(lab, "raw16"))
            pdf = pdf.copy()
            pdf["bytes"] = out_bytes
            pdf["fmt"] = "raw16"
            pdf["nodata"] = float(NODATA_CLASS)
            for c in ("band_scale", "band_offset", "band_nodata"):
                if c in pdf.columns:
                    pdf[c] = None
            if "bands" in pdf.columns:
                pdf["bands"] = [["class"]] * len(pdf)
            if "scale" in pdf.columns:
                pdf["scale"] = 1.0
            if "offset" in pdf.columns:
                pdf["offset"] = 0.0
            yield pdf[names]

    return df.mapInPandas(run, schema)
