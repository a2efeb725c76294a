"""Distributed PCA over an embedding column — the dimensionality-
reduction step a large-scale embedding pipeline runs before ANN
indexing / clustering (shrink ``d`` 4-16× at ~no recall cost, cut the
IVF/PQ index and every downstream shuffle by the same factor).

Spark-first shape: PCA needs exactly two passes and ONE tiny shuffle.

- **fit** is decomposable: each partition folds its rows into a
  ``(n, Σx, ΣxxT)`` sufficient-statistics block inside one narrow
  ``mapInPandas`` (the same pattern as :mod:`trend`'s partials), and
  only these O(partitions) fixed-size blocks — ``8·d(d+3)/2`` bytes
  each — ever move; the driver merges them in partition order and
  eigendecomposes the ``d×d`` covariance. Row count and embedding
  bytes never shuffle.
- **transform** is a broadcast projection: the ``(k, d)`` component
  matrix ships to every worker once and a vectorized Arrow batch
  matmul appends the projected column — zero shuffle, fully fused
  with whatever scan feeds it.

Determinism: the eigensolver is a hand-rolled cyclic Jacobi sweep
(LAPACK-free, fixed rotation order — same rationale as
:mod:`harmonic`'s elimination: constants oracles must replay
bit-identically on any host/BLAS), components carry a fixed sign
convention (largest-|entry| coordinate positive, first index on
ties), and the driver merge sums partials in partition order. With
integer-valued inputs (the fixture) the sufficient statistics are
exact in f64, so the fitted model is bit-identical at ANY
partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def jacobi_eigh(A: np.ndarray, max_sweeps: int = 64,
                tol: float = 1e-13) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric eigendecomposition by cyclic Jacobi rotations —
    deterministic (fixed (p, q) sweep order, no LAPACK) and accurate
    to ~machine epsilon for the small ``d×d`` covariance matrices PCA
    meets. Returns (eigenvalues desc, eigenvectors as ROWS aligned
    with them). Gated against np.linalg.eigh in tests/test_pca.py."""
    A = np.array(A, dtype=np.float64, copy=True)
    n = A.shape[0]
    if A.shape != (n, n):
        raise ValueError("jacobi_eigh needs a square matrix")
    V = np.eye(n)
    scale = max(1.0, float(np.abs(A).max()))
    for _ in range(max_sweeps):
        # off-diagonal mass measured directly (sum(A²) − sum(diag²)
        # catastrophically cancels, stalling convergence at ~√eps·‖A‖)
        off = np.sqrt(((A - np.diag(np.diag(A)))**2).sum())
        if off <= tol * scale * n:
            break
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = A[p, q]
                if abs(apq) <= tol * scale:
                    continue
                theta = (A[q, q] - A[p, p]) / (2.0 * apq)
                t = np.sign(theta) / (abs(theta)
                                      + np.sqrt(theta * theta + 1.0)) \
                    if theta != 0.0 else 1.0
                c = 1.0 / np.sqrt(t * t + 1.0)
                s = t * c
                rp, rq = A[p].copy(), A[q].copy()
                A[p], A[q] = c * rp - s * rq, s * rp + c * rq
                cp, cq = A[:, p].copy(), A[:, q].copy()
                A[:, p], A[:, q] = c * cp - s * cq, s * cp + c * cq
                vp, vq = V[:, p].copy(), V[:, q].copy()
                V[:, p], V[:, q] = c * vp - s * vq, s * vp + c * vq
    vals = np.diag(A).copy()
    order = np.argsort(-vals, kind="stable")
    vals = vals[order]
    vecs = V[:, order].T
    # fixed sign: the largest-|entry| coordinate is positive (first
    # index on ties), so components are reproducible across runs
    for i in range(n):
        j = int(np.argmax(np.abs(vecs[i])))
        if vecs[i, j] < 0:
            vecs[i] = -vecs[i]
    return vals, vecs


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = principal axes
    eigenvalues: np.ndarray   # (d,) full spectrum, descending
    n: int

    @property
    def explained_variance_ratio(self) -> np.ndarray:
        tot = float(self.eigenvalues.sum())
        k = self.components.shape[0]
        return self.eigenvalues[:k] / tot if tot > 0 else \
            np.zeros(k)


_PARTIAL_SCHEMA = "pid long, n long, s array<double>, m2 array<double>"


def fit_pca(df: DataFrame, k: int, col: str = "embedding",
            combine: str = "driver", groups: int = 16) -> PCAModel:
    """Two-phase distributed fit: per-partition ``(n, Σx, ΣxxT)``
    sufficient-statistics blocks (one narrow Arrow map; the upper
    triangle of ΣxxT is packed, so each block is ``8·d(d+3)/2`` bytes
    regardless of row count), merged on the driver in partition order,
    then the deterministic Jacobi eigensolve of the covariance.

    ``combine="driver"`` collects every partition block — optimal up
    to ~10³ partitions. ``combine="spark"`` adds one tiny distributed
    merge level first (blocks grouped by ``pid % groups``, summed in
    pid order inside each group), so the driver sees at most
    ``groups`` blocks regardless of partition count — the
    treeAggregate shape for 10⁴+-partition tables. Both paths merge
    deterministically (fixed pid order within and across groups);
    for integer-valued inputs the sums are exact in f64, so the two
    paths are bit-identical (float inputs may differ by association
    order at the last ulp)."""
    k = int(k)
    if k < 1:  # d-independent half of the check: fail BEFORE the scan
        raise ValueError(f"k must be in [1, d], got {k}")
    if combine not in ("driver", "spark"):
        raise ValueError("combine must be 'driver' or 'spark'")

    def partials(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        n = 0
        s = None
        m2 = None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[col].to_numpy()).astype(np.float64)
            n += X.shape[0]
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            g = X.T @ X
            m2 = g if m2 is None else m2 + g
        if n:
            iu = np.triu_indices(s.shape[0])
            yield pd.DataFrame([{
                "pid": pid, "n": n, "s": s.tolist(),
                "m2": m2[iu].tolist()}])

    part_df = df.select(col).mapInPandas(partials, schema=_PARTIAL_SCHEMA)
    if combine == "spark":
        def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("pid")
            s = np.zeros(len(pdf.s.iloc[0]))
            m2 = np.zeros(len(pdf.m2.iloc[0]))
            for r in pdf.itertuples(index=False):
                s += np.asarray(r.s)
                m2 += np.asarray(r.m2)
            return pd.DataFrame([{
                "pid": int(pdf.pid.min()), "n": int(pdf.n.sum()),
                "s": s.tolist(), "m2": m2.tolist()}])

        part_df = (part_df
                   .groupBy(F.pmod("pid", F.lit(int(groups))))
                   .applyInPandas(merge_group, schema=_PARTIAL_SCHEMA))
    rows = part_df.toPandas().sort_values("pid")
    if not len(rows):
        raise ValueError("fit_pca: empty input")
    d = len(rows.s.iloc[0])
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    n = int(rows.n.sum())
    s = np.zeros(d)
    m2u = np.zeros(d * (d + 1) // 2)
    for r in rows.itertuples(index=False):
        s += np.asarray(r.s)
        m2u += np.asarray(r.m2)
    m2 = np.zeros((d, d))
    iu = np.triu_indices(d)
    m2[iu] = m2u
    m2 = m2 + np.triu(m2, 1).T
    mean = s / n
    cov = m2 / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0
    vals, vecs = jacobi_eigh(cov)
    vals = np.maximum(vals, 0.0)
    return PCAModel(mean=mean, components=vecs[:k],
                    eigenvalues=vals, n=n)


def transform_pca(df: DataFrame, model: PCAModel,
                  col: str = "embedding",
                  out_col: str = "pca") -> DataFrame:
    """Broadcast projection: append ``out_col`` = ``(x − mean) @ Wᵀ``
    as ``array<double>`` via one vectorized Arrow batch matmul — zero
    shuffle."""
    mean = np.asarray(model.mean, dtype=np.float64)
    W = np.asarray(model.components, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def proj(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy()).astype(np.float64)
        Y = (X - mean) @ W.T
        return pd.Series(list(Y))

    return df.withColumn(out_col, proj(F.col(col)))
