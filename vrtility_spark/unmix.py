"""Linear spectral unmixing — per-pixel endmember fraction maps.

Every EO classification stack eventually asks "how much of this pixel
is vegetation / soil / water?": model each pixel's spectrum ``p`` (B
bands) as a non-negative mixture ``p ≈ E f`` of K fixed endmember
spectra (the columns of ``E``, B×K) and emit the fraction planes plus
a per-pixel RMSE plane.  The reference ecosystem runs this through
GDAL/driver-side pixel functions over a VRT stack
(/root/reference/R/zvrt-pixel-funs.R declares the per-pixel function
contract; unmixing is the classic user-supplied one); here it is a
first-class distributed verb.

Math, chosen for determinism and oracle-testability:

- the unconstrained least-squares solution is ``f = (EᵀE)⁻¹ Eᵀ p`` —
  ONE tiny K×K normal system shared by every pixel (the endmembers
  are fixed), solved LAPACK-free with :func:`harmonic.solve_normal_np`
  (Jacobi-scaled Gaussian elimination, host-portable constants), then
  applied to all pixels as a single (K×B)·(B×N) matmul;
- ``clip=True`` (default) projects onto the non-negativity boundary
  (``max(f, 0)``) and ``renorm=True`` rescales positive fractions to
  sum to 1 — the standard cheap surrogate for fully-constrained NNLS
  (deterministic, vectorized; honest about being a projection, not
  the KKT optimum);
- RMSE is computed from the EMITTED fractions (after clip/renorm), so
  the error plane describes the product actually shipped.

Spark-first shape: ``E`` is a few hundred bytes — it rides the UDF
closure (broadcast by the task serializer), and the whole operator is
ONE narrow ``mapInPandas`` over the tile table: no shuffle, no join,
decode → matmul → encode, pipelines after any composite/regrid stage
and before polygonize/zonal.  Per-tile cost is O(B·K·N + K²·N) flops
on data already in cache — Arrow-batched, never per-row Python.

NaN semantics: a pixel invalid in ANY band is invalid in every output
plane (fractions and RMSE).  Output re-types to ``rawf32`` with the
finite ``-9999`` sentinel (same rationale as :mod:`terrain`).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from vrtility_spark import codec
from vrtility_spark.harmonic import solve_normal_np

_SENTINEL = -9999.0

#: A documented example endmember set for the synthetic 4-band
#: (B02,B03,B04,B08) fixture scale (~0-15000 DN): columns are
#: vegetation-ish (dark visible, bright NIR), bare-soil-ish (broad
#: bright), water-ish (uniformly dark). Well-conditioned by
#: construction; the driver query and its constants oracle share it.
EXAMPLE_ENDMEMBERS = (
    (1200.0, 9000.0, 400.0),
    (2500.0, 8000.0, 600.0),
    (2000.0, 7000.0, 500.0),
    (9000.0, 6000.0, 300.0),
)


def unmix_matrix(E: np.ndarray) -> np.ndarray:
    """The (K, B) least-squares operator ``(EᵀE)⁻¹Eᵀ`` via the shared
    LAPACK-free normal solver.  Raises if the endmember matrix is
    rank-deficient (collinear endmembers make fractions meaningless —
    fail loudly, don't emit noise)."""
    E = np.asarray(E, dtype=np.float64)
    if E.ndim != 2:
        raise ValueError(f"endmember matrix must be (bands, K), got "
                         f"shape {E.shape}")
    B, K = E.shape
    if B < K:
        raise ValueError(f"underdetermined: {K} endmembers but only "
                         f"{B} bands")
    # B independent K×K systems (EᵀE) u_b = Eᵀ[:, b] = E[b, :] — the
    # solved rows are the COLUMNS of U = (EᵀE)⁻¹Eᵀ
    M = np.broadcast_to(E.T @ E, (B, K, K))
    x, ok = solve_normal_np(M, np.ascontiguousarray(E))
    if not ok.all():
        raise ValueError("endmember matrix is rank-deficient "
                         "(collinear endmembers); unmixing is "
                         "ill-posed")
    return x.T  # (K, B): f = U @ p


def unmix_np(A: np.ndarray, E: np.ndarray, clip: bool = True,
             renorm: bool = True) -> np.ndarray:
    """Unmix a NaN-masked ``(B, H, W)`` tile against endmembers
    ``E (B, K)`` → ``(K + 1, H, W)``: K fraction planes then the RMSE
    plane, NaN wherever any input band was NaN."""
    E = np.asarray(E, dtype=np.float64)
    B, K = E.shape
    if A.shape[0] != B:
        raise ValueError(f"tile has {A.shape[0]} bands, endmember "
                         f"matrix wants {B}; subset/stack bands first")
    H, W = A.shape[1:]
    U = unmix_matrix(E)
    flat = A.reshape(B, -1).astype(np.float64)
    valid = np.isfinite(flat).all(axis=0)
    out = np.full((K + 1, H * W), np.nan)
    if valid.any():
        P = flat[:, valid]
        Fr = U @ P
        if clip:
            Fr = np.maximum(Fr, 0.0)
            if renorm:
                s = Fr.sum(axis=0)
                Fr = np.divide(Fr, s, out=np.zeros_like(Fr),
                               where=s > 0)
        R = E @ Fr - P
        out[:K, valid] = Fr
        out[K, valid] = np.sqrt(np.mean(R * R, axis=0))
    return out.reshape(K + 1, H, W)


def unmix(df: DataFrame, endmembers, clip: bool = True,
          renorm: bool = True,
          bands: tuple | list | None = None) -> DataFrame:
    """Distributed unmixing: one zero-shuffle Arrow map over the tile
    table.  ``endmembers`` is a (bands, K) array-like; it validates
    eagerly on the driver (rank check) and ships in the closure.
    ``bands`` optionally picks plane INDICES to unmix (e.g. drop a
    trailing mask plane a composite carried through) — len(bands)
    must equal the endmember matrix's row count.  Output tiles are
    ``rawf32`` with K fraction planes + RMSE, ``-9999`` sentinel
    nodata, ``band_nodata`` cleared."""
    E = np.asarray(endmembers, dtype=np.float64)
    unmix_matrix(E)  # validate eagerly, fail on the driver
    sel = None if bands is None else tuple(int(b) for b in bands)
    if sel is not None and len(sel) != E.shape[0]:
        raise ValueError(f"bands selects {len(sel)} planes but the "
                         f"endmember matrix has {E.shape[0]} rows")
    names = [f.name for f in df.schema.fields]

    def _map(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf.itertuples(index=False):
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)
                if sel is not None:
                    A = A[list(sel)]
                out = unmix_np(A, E, clip=clip, renorm=renorm)
                d = {n: getattr(row, n) for n in names}
                d["bytes"] = codec.encode(
                    codec.from_float(out, _SENTINEL, "float32"),
                    "rawf32")
                d["fmt"] = "rawf32"
                d["nodata"] = _SENTINEL
                if "band_nodata" in names:
                    d["band_nodata"] = None
                rows.append(d)
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(_map, schema=df.schema)
