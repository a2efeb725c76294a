"""Spatial autocorrelation — global Moran's I / Geary's C and local
Getis-Ord Gi* hot-spot maps over tiled rasters.

The single-node twins are PySAL ``esda.Moran`` / ``esda.Geary`` /
``esda.G_Local`` and ESRI's Spatial Autocorrelation + Hot Spot
Analysis tools; the reference delegates all raster analytics beyond
compositing to external tooling (R/gdal-options.R), so this module is
the same capability family as :mod:`terrain`/:mod:`hydrology` —
classic geospatial statistics re-expressed for tiles that never
gather. Weights are QUEEN contiguity (binary 8-neighbor, per band,
never crossing CRS-zone edges — :func:`cells.neighbor_cell` returns
no neighbor there, exactly like every other focal operator).

Definitions over the z-scored valid pixels ``z_i = x_i − x̄`` (global
mean over ALL valid pixels of the collection, per band):

- ``I = (n / S0) · Σ_ij w_ij z_i z_j / Σ_i z_i²``  (Moran, 1950)
- ``C = (n−1) · Σ_ij w_ij (x_i − x_j)² / (2 S0 Σ_i z_i²)``  (Geary, 1954)
- ``Gi* = (Σ_j∈N*(i) x_j − x̄ W_i) / (S √((n W_i − W_i²)/(n−1)))``
  with ``N*`` including self, ``W_i = |N*(i)|``, ``S = √(Σx²/n − x̄²)``
  (Getis & Ord 1992 / Ord & Getis 1995 — the ESRI hot-spot z-score).

Spark-first plan — TWO independent narrow passes, no driver loop:

1. **Moments pass** (``mapInPandas``, zero shuffle): per-tile
   ``(band, n, Σx, Σx²)`` partials → one tiny ``groupBy(band)`` agg.
2. **Neighbor pass**: ONE :func:`focal.focal_filter` halo exchange
   (radius 1) whose kernel emits per-pixel contribution planes; a
   second narrow map reduces them to per-tile ``(band, S0, ΣC_i x_i,
   Σx_i S1_i, ΣS1_i, ΣS2_i, ΣC_i x_i²)`` partials → tiny agg.

Every partial above is a plain SUM of integer-valued terms when the
payloads are integer-family (raw16/png): Spark's double sums of exact
integers below 2⁵³ are exact and ORDER-INDEPENDENT, so the global I
and C are bit-deterministic regardless of partition order — the mean
x̄ enters only in the final tiny-table expressions::

    Σ_ij w_ij z_i z_j      = Σx_iS1_i − x̄(ΣC_ix_i + ΣS1_i) + x̄²·S0
    Σ_ij w_ij (x_i − x_j)² = ΣC_ix_i² − 2Σx_iS1_i + ΣS2_i
    Σ_i z_i²               = Σx² − n·x̄²

(``S1_i/S2_i`` = sum / sum-of-squares of i's valid neighbors, ``C_i``
their count.) Cross-tile neighbor pairs are counted exactly once per
ordered direction by the pixel that owns ``i`` — seams need no dedup.

:func:`hotspots` needs the global moments INSIDE its per-pixel kernel,
so it collects the B-row moments table to the driver first (a few
floats — not a payload collect) and closes over it; the map output is
a chainable rawf32/-9999 z-score tile table ready for a threshold
filter (|Gi*| ≥ 1.96 → 95 % hot/cold spots).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec
from vrtility_spark.focal import focal_filter, focal_np

MOMENTS_SCHEMA = "band int, n long, sum double, sumsq double"
PARTIAL_SCHEMA = ("band int, s0 double, scx double, sxs1 double, "
                  "ss1 double, ss2 double, scx2 double")
AUTOCORR_SCHEMA = ("band int, n long, s0 long, moran_i double, "
                   "geary_c double, e_i double")


# ------------------------------------------------------ NumPy kernels ----

def _neighbor_sums(P: np.ndarray):
    """Padded ``(B, H+2, W+2)`` NaN-masked → per-center-pixel queen
    neighbor count / sum / sum-of-squares ``(B, H, W)`` (center pixel
    excluded; NaN neighbors don't count)."""
    V = np.isfinite(P)
    x = np.where(V, P, 0.0)
    C = focal_np(V.astype(np.float64), "sum", 1) - V[:, 1:-1, 1:-1]
    S1 = focal_np(x, "sum", 1) - x[:, 1:-1, 1:-1]
    S2 = focal_np(x * x, "sum", 1) - (x * x)[:, 1:-1, 1:-1]
    return C, S1, S2


def autocorr_np(P: np.ndarray) -> list[tuple]:
    """Global Moran's I / Geary's C of a single padded NaN-masked
    mosaic — the obviously-correct single-node twin the distributed
    aggregation must reproduce. Returns per-band ``(n, s0, i, c,
    e_i)`` (``e_i = −1/(n−1)``, the no-autocorrelation expectation);
    bands with ``s0 == 0`` or zero variance report NaN statistics."""
    C, S1, S2 = _neighbor_sums(P)
    A = P[:, 1:-1, 1:-1]
    out = []
    for bi in range(P.shape[0]):
        m = np.isfinite(A[bi])
        n = int(m.sum())
        if n < 2:
            out.append((n, 0, np.nan, np.nan, np.nan))
            continue
        x = A[bi][m]
        c, s1, s2 = C[bi][m], S1[bi][m], S2[bi][m]
        s0 = float(c.sum())
        mu = x.mean()
        zz = float((x * x).sum()) - n * mu * mu
        num_i = float((x * s1).sum()) - mu * (float((c * x).sum())
                                              + float(s1.sum())) \
            + mu * mu * s0
        num_c = float((c * x * x).sum()) - 2.0 * float((x * s1).sum()) \
            + float(s2.sum())
        if s0 == 0.0 or zz == 0.0:
            out.append((n, int(s0), np.nan, np.nan, -1.0 / (n - 1)))
            continue
        out.append((n, int(s0), (n / s0) * num_i / zz,
                    ((n - 1) * num_c) / (2.0 * s0 * zz),
                    -1.0 / (n - 1)))
    return out


def gi_star_np(P: np.ndarray, n: np.ndarray, mean: np.ndarray,
               std: np.ndarray) -> np.ndarray:
    """Getis-Ord Gi* z-score plane of a padded NaN-masked ``(B, H+2,
    W+2)`` array given the GLOBAL per-band valid count / mean /
    population std — ``(B, H, W)``, NaN where the center pixel is
    invalid or the variance term degenerates (``W_i == n`` or zero
    global std)."""
    C, S1, _ = _neighbor_sums(P)
    A = P[:, 1:-1, 1:-1]
    V = np.isfinite(A)
    W = C + V  # include self
    S1s = S1 + np.where(V, A, 0.0)
    nn = np.asarray(n, dtype=np.float64).reshape(-1, 1, 1)
    mu = np.asarray(mean, dtype=np.float64).reshape(-1, 1, 1)
    s = np.asarray(std, dtype=np.float64).reshape(-1, 1, 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (nn * W - W * W) / np.maximum(nn - 1.0, 1.0)
        den = s * np.sqrt(np.maximum(var, 0.0))
        out = (S1s - mu * W) / den
    out[~V | (den <= 0) | ~np.isfinite(den)] = np.nan
    return out


def local_moran_np(P: np.ndarray, n: np.ndarray, mean: np.ndarray,
                   m2: np.ndarray) -> np.ndarray:
    """Local Moran's I (Anselin 1995 LISA) planes of a padded
    NaN-masked ``(B, H+2, W+2)`` array given the GLOBAL per-band valid
    count / mean / population variance ``m2 = Σz²/n`` — returns
    ``(2B, H, W)``: first the ``I_i = z_i · lag_i / m2`` value planes,
    then the cluster/outlier quadrant codes (1 = HH high surrounded by
    high, 2 = LL, 3 = HL high outlier in low neighborhood, 4 = LH; the
    deterministic boundary rule is ``z > 0`` → H else L, same for the
    lag). NaN where the center is invalid, has no valid neighbor
    (``C_i == 0``), or the band variance degenerates. By construction
    ``Σ_i I_i = S0 · I_global`` — pinned in tests as the local↔global
    consistency invariant."""
    C, S1, _ = _neighbor_sums(P)
    A = P[:, 1:-1, 1:-1]
    V = np.isfinite(A)
    mu = np.asarray(mean, dtype=np.float64).reshape(-1, 1, 1)
    v2 = np.asarray(m2, dtype=np.float64).reshape(-1, 1, 1)
    z = A - mu
    lag = S1 - C * mu
    with np.errstate(invalid="ignore", divide="ignore"):
        li = z * lag / v2
    ok = V & (C > 0) & np.broadcast_to(v2 > 0, V.shape)
    li = np.where(ok, li, np.nan)
    quad = np.where(z > 0, np.where(lag > 0, 1.0, 3.0),
                    np.where(lag > 0, 4.0, 2.0))
    quad = np.where(ok, quad, np.nan)
    return np.concatenate([li, quad], axis=0)


# ------------------------------------------------- distributed driver ----

def moments(df: DataFrame, key: str = "cell_id") -> DataFrame:
    """Global per-band valid-pixel moments ``(band, n, sum, sumsq)``
    of a tile table — one narrow Arrow pass emitting fixed-size
    partials, one tiny agg. Exact (order-independent) for
    integer-family payloads: every partial is an exact integer below
    2⁵³."""
    names = {f.name for f in df.schema.fields}
    for req in (key, "bytes", "w", "h", "fmt", "nodata"):
        if req not in names:
            raise ValueError(f"moments input is missing column {req!r}")
    lnames = [f.name for f in df.schema.fields]

    def part(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for row in pdf[lnames].itertuples(index=False):
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                A = codec.to_float_masked(arr, nd)
                for bi in range(len(A)):
                    v = A[bi][np.isfinite(A[bi])]
                    rows.append({"band": bi, "n": int(v.size),
                                 "sum": float(v.sum()),
                                 "sumsq": float((v * v).sum())})
            yield pd.DataFrame(rows, columns=["band", "n", "sum", "sumsq"])

    return (df.mapInPandas(part, MOMENTS_SCHEMA)
            .groupBy("band")
            .agg(F.sum("n").alias("n"), F.sum("sum").alias("sum"),
                 F.sum("sumsq").alias("sumsq")))


def _contribution_planes(P: np.ndarray, meta: dict) -> np.ndarray:
    """focal_filter kernel: per band emit the six per-pixel
    contribution planes ``[C_i, C_i·x_i, x_i·S1_i, S1_i, S2_i,
    C_i·x_i²]`` (NaN off the valid centers) stacked as ``(6B, H, W)``."""
    C, S1, S2 = _neighbor_sums(P)
    A = P[:, 1:-1, 1:-1]
    V = np.isfinite(A)
    x = np.where(V, A, np.nan)
    # x is NaN at invalid centers, so "+ x*0" NaN-masks planes whose
    # factors (C, S1, S2) are finite there — an invalid center must
    # contribute nothing, not its neighbor counts
    planes = np.concatenate(
        [C + x * 0.0, C * x, x * S1, S1 + x * 0.0, S2 + x * 0.0,
         C * x * x], axis=0)
    return planes


def global_autocorr(df: DataFrame, key: str = "cell_id") -> DataFrame:
    """Global Moran's I + Geary's C per band → ``AUTOCORR_SCHEMA``.

    Plan: the moments pass + ONE radius-1 halo exchange whose kernel
    emits contribution planes, reduced by a narrow partial map and a
    tiny agg; the two B-row aggregates join on ``band`` and the
    statistics are plain Catalyst expressions — no payload ever
    shuffles twice, no driver-side collect. ``e_i`` is the
    no-autocorrelation expectation ``−1/(n−1)`` for significance
    framing."""
    mom = moments(df, key=key)
    planes = focal_filter(df, op=_contribution_planes, radius=1,
                          fill=True, key=key, out_fmt="rawf64",
                          out_nodata=float("nan"))

    def part(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        cols = ["s0", "scx", "sxs1", "ss1", "ss2", "scx2"]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for buf, w, h, fmt in zip(pdf["bytes"], pdf["w"], pdf["h"],
                                      pdf["fmt"]):
                arr = codec.decode(buf, int(w), int(h), fmt)
                nb = len(arr) // 6
                for bi in range(nb):
                    d = {"band": bi}
                    for pi, cname in enumerate(cols):
                        v = arr[pi * nb + bi]
                        d[cname] = float(np.nansum(v.astype(np.float64)))
                    rows.append(d)
            yield pd.DataFrame(rows, columns=["band"] + cols)

    agg = (planes.mapInPandas(part, PARTIAL_SCHEMA)
           .groupBy("band")
           .agg(*[F.sum(c).alias(c)
                  for c in ("s0", "scx", "sxs1", "ss1", "ss2", "scx2")]))
    j = mom.join(agg, "band")
    mu = F.col("sum") / F.col("n")
    zz = F.col("sumsq") - F.col("n") * mu * mu
    num_i = (F.col("sxs1") - mu * (F.col("scx") + F.col("ss1"))
             + mu * mu * F.col("s0"))
    num_c = F.col("scx2") - F.lit(2.0) * F.col("sxs1") + F.col("ss2")
    ok = (F.col("s0") > 0) & (zz > 0) & (F.col("n") > 1)
    return j.select(
        "band", "n", F.col("s0").cast("long").alias("s0"),
        F.when(ok, (F.col("n") / F.col("s0")) * num_i / zz)
        .alias("moran_i"),
        F.when(ok, ((F.col("n") - F.lit(1.0)) * num_c)
               / (F.lit(2.0) * F.col("s0") * zz)).alias("geary_c"),
        F.when(F.col("n") > 1, F.lit(-1.0) / (F.col("n") - F.lit(1.0)))
        .alias("e_i")).orderBy("band")


def hotspots(df: DataFrame, key: str = "cell_id") -> DataFrame:
    """Getis-Ord Gi* hot-spot z-score map as a chainable tile table
    (rawf32, -9999 sentinel): the B-row global moments table is
    collected (a few floats — deliberately NOT a payload collect) and
    closed over the one radius-1 halo-exchange kernel. Threshold
    downstream with a plain predicate (|z| ≥ 1.96)."""
    rows = moments(df, key=key).collect()
    if not rows:
        raise ValueError("hotspots: empty input collection")
    nb = max(r["band"] for r in rows) + 1
    n = np.zeros(nb)
    mean = np.zeros(nb)
    std = np.zeros(nb)
    for r in rows:
        n[r["band"]] = r["n"]
        if r["n"] > 0:
            mean[r["band"]] = r["sum"] / r["n"]
            std[r["band"]] = float(
                np.sqrt(max(r["sumsq"] / r["n"]
                            - (r["sum"] / r["n"]) ** 2, 0.0)))

    def kernel(P: np.ndarray, meta: dict) -> np.ndarray:
        if P.shape[0] != nb:
            raise ValueError(
                f"hotspots: tile has {P.shape[0]} bands, moments have "
                f"{nb}; normalize band layout first")
        return gi_star_np(P, n, mean, std)

    return focal_filter(df, op=kernel, radius=1, fill=True, key=key,
                        out_fmt="rawf32", out_nodata=-9999.0)


def local_moran(df: DataFrame, key: str = "cell_id") -> DataFrame:
    """Local Moran's I cluster/outlier map (Anselin 1995 LISA — the
    ESRI Cluster & Outlier Analysis twin) as a chainable tile table:
    same plan shape as :func:`hotspots` (B-row moments collect → one
    radius-1 halo-exchange kernel), but the output payload stacks 2B
    bands — the ``I_i`` value planes then the HH/LL/HL/LH quadrant
    codes (rawf32, -9999 sentinel). Threshold/choropleth downstream
    with plain predicates (e.g. quadrant code ∈ {1, 2} for clusters,
    {3, 4} for outliers)."""
    rows = moments(df, key=key).collect()
    if not rows:
        raise ValueError("local_moran: empty input collection")
    nb = max(r["band"] for r in rows) + 1
    n = np.zeros(nb)
    mean = np.zeros(nb)
    m2 = np.zeros(nb)
    for r in rows:
        n[r["band"]] = r["n"]
        if r["n"] > 0:
            mean[r["band"]] = r["sum"] / r["n"]
            m2[r["band"]] = max(
                r["sumsq"] / r["n"] - (r["sum"] / r["n"]) ** 2, 0.0)

    def kernel(P: np.ndarray, meta: dict) -> np.ndarray:
        if P.shape[0] != nb:
            raise ValueError(
                f"local_moran: tile has {P.shape[0]} bands, moments "
                f"have {nb}; normalize band layout first")
        return local_moran_np(P, n, mean, m2)

    return focal_filter(df, op=kernel, radius=1, fill=True, key=key,
                        out_fmt="rawf32", out_nodata=-9999.0)
