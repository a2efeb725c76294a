"""Supervised per-pixel classification — Gaussian maximum-likelihood
(the ERDAS/ENVI/terra MLC workhorse; GEE's ``ee.Classifier`` applied
with ``.classify()``) and minimum-distance-to-means, trained from a
LABEL raster (training polygons rasterized with
:func:`vrtility_spark.rasterize.rasterize`, or any thematic plane such
as :func:`vrtility_spark.algebra.classify` output) joined cell-by-cell
onto the feature tiles.

The reference has no classifier (it delegates analysis to external
tooling); this is the supervised twin of
:mod:`vrtility_spark.cluster`'s k-means verb and completes the classic
remote-sensing train→classify loop.

Spark-first shape (and why it scales to 100 TB):

- **fit** is ONE narrow Arrow pass over the cell-keyed
  (features × labels) join emitting per-class sufficient statistics —
  pixel count, per-band sums, and the upper triangle of the
  second-moment matrix, ``1 + B + B(B+1)/2`` values per class per
  tile — quantized to the 1e-6 grid and summed as ``DECIMAL(38,6)``
  (the same exact-decimal policy as :mod:`vrtility_spark.mad`'s
  IR-MAD fit): Spark decimal sums are exact and commutative, so the
  fitted model is BIT-IDENTICAL under any partitioning, retry, or
  cluster size. Tile bytes never shuffle; the agg traffic is a few
  dozen decimal rows per tile with map-side combine.
- **model assembly** is driver-side on the tiny merged table: MLE
  mean/covariance per class (``Σ = S2/n − μμᵀ``, optional ridge
  ``reg`` on the diagonal), inverse + log-determinant computed ONCE
  here so every executor applies the identical floats.
- **classify** broadcasts the model in the UDF closure and maps the
  feature tiles once — per class one vectorized quadratic form
  ``(x−μ)ᵀ Σ⁻¹ (x−μ)`` via ``einsum``; argmax with lowest-class-id
  ties; ``raw16`` class plane (``NODATA_CLASS = 65535`` wherever any
  feature is nodata). Zero shuffle — classification cost is one scan.

Discriminant (equal priors default): ``g_c(x) = ln π_c − ½ ln|Σ_c| −
½ (x−μ_c)ᵀ Σ_c⁻¹ (x−μ_c)`` — the standard quadratic (QDA) rule;
``method="mindist"`` drops the covariance entirely
(``g_c = −‖x−μ_c‖²``), the minimum-distance classifier.

Label convention: a single-plane tile table; any finite value ≥ 0 is
a class id (class 0 is legitimate — :func:`algebra.classify` emits
it), nodata = unlabeled. Negative labels raise. Pixels where any
feature band is nodata are excluded from training and classify to
``NODATA_CLASS``.

Kernel/oracle split (house rule): the NumPy kernels here replicate
the whole fit+classify Spark-free for tools/gen_oracle_constants.py;
the deliberately-naive per-pixel twins live in tests/oracle.py and
tests/test_supervised.py pins kernel == oracle before the distributed
operator is pinned against the kernel on assembled mosaics.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark import codec
from vrtility_spark.mad import _joined_pair

#: class value burned where any feature plane is nodata (raw16 max)
NODATA_CLASS = 65535

#: quantization grid shared with mad.py's decimal sufficient stats
_QDIGITS = 6


# --------------------------------------------------------- kernels ----

def tile_class_stats_np(X: np.ndarray, L: np.ndarray) -> dict:
    """Per-class sufficient statistics for one tile: ``X`` the
    ``(B, H, W)`` NaN-masked feature planes, ``L`` the ``(H, W)``
    NaN-masked label plane. A pixel trains iff its label AND every
    feature are finite. Returns ``{class_id: (n, s, s2)}`` with ``s``
    the ``(B,)`` sum and ``s2`` the ``(B, B)`` second-moment sum —
    exact in float64 for integer-valued features."""
    B = X.shape[0]
    ok = np.isfinite(L) & np.isfinite(X).all(axis=0)
    if not ok.any():
        return {}
    labs = L[ok]
    if (labs < 0).any():
        raise ValueError("supervised: negative label values — class "
                         "ids must be >= 0 (nodata = unlabeled)")
    if not np.array_equal(labs, np.floor(labs)):
        raise ValueError("supervised: non-integer label values — "
                         "rasterize/classify the training layer to "
                         "integer class ids first")
    feats = X[:, ok].T                       # (n, B)
    out: dict[int, tuple] = {}
    for c in np.unique(labs).astype(np.int64):
        rows = feats[labs == c]
        out[int(c)] = (rows.shape[0], rows.sum(axis=0),
                       rows.T @ rows)
    return out


def merge_stats(parts: Iterable[dict]) -> dict:
    """Sum per-class (n, s, s2) dictionaries."""
    tot: dict[int, list] = {}
    for d in parts:
        for c, (n, s, s2) in d.items():
            if c in tot:
                tot[c][0] += n
                tot[c][1] = tot[c][1] + s
                tot[c][2] = tot[c][2] + s2
            else:
                tot[c] = [n, np.array(s, np.float64),
                          np.array(s2, np.float64)]
    return {c: (v[0], v[1], v[2]) for c, v in tot.items()}


def fit_from_stats_np(stats: dict, reg: float = 0.0,
                      priors: str = "equal") -> dict:
    """Assemble the classifier model from merged sufficient
    statistics: per class the MLE mean and covariance
    (``Σ = S2/n − μμᵀ`` + ``reg`` on the diagonal), its inverse and
    log-determinant (computed ONCE so every executor applies identical
    floats), and the log-prior (``equal`` or ``proportional`` to class
    pixel counts). Raises on a non-positive-definite covariance with
    the add-reg hint."""
    if not stats:
        raise ValueError("supervised: no labeled training pixels")
    if priors not in ("equal", "proportional"):
        raise ValueError(f"unknown priors {priors!r}: "
                         "use 'equal' or 'proportional'")
    n_tot = sum(n for n, _s, _s2 in stats.values())
    model: dict[int, dict] = {}
    for c in sorted(stats):
        n, s, s2 = stats[c]
        B = s.shape[0]
        if n < B + 1:
            raise ValueError(
                f"supervised: class {c} has only {n} training pixels "
                f"for {B} bands — need at least B+1 for a full-rank "
                "covariance (label more pixels or drop the class)")
        mu = s / float(n)
        cov = s2 / float(n) - np.outer(mu, mu)
        cov = cov + float(reg) * np.eye(B)
        sign, logdet = np.linalg.slogdet(cov)
        if sign <= 0:
            raise ValueError(
                f"supervised: covariance of class {c} is singular — "
                "features are linearly dependent; pass reg > 0 "
                "(ridge on the diagonal) or drop redundant bands")
        model[int(c)] = {
            "n": int(n), "mean": mu, "cov": cov,
            "inv": np.linalg.inv(cov), "logdet": float(logdet),
            "logprior": (0.0 if priors == "equal"
                         else float(np.log(n / n_tot))),
        }
    return model


def fit_mlc_np(X: np.ndarray, L: np.ndarray, reg: float = 0.0,
               priors: str = "equal") -> dict:
    """Whole-mosaic reference fit: stats + assembly in one call."""
    return fit_from_stats_np(tile_class_stats_np(X, L), reg, priors)


def classify_np(X: np.ndarray, model: dict,
                method: str = "mlc") -> np.ndarray:
    """Classify ``(B, H, W)`` NaN-masked features against the fitted
    model: returns an ``(H, W)`` float plane of class ids (NaN where
    any feature is nodata). ``method='mlc'`` applies the quadratic
    Gaussian discriminant; ``'mindist'`` the minimum-distance rule.
    Ties break to the LOWEST class id (first argmax)."""
    if method not in ("mlc", "mindist"):
        raise ValueError(f"unknown method {method!r}: "
                         "use 'mlc' or 'mindist'")
    B, H, W_ = X.shape
    ok = np.isfinite(X).all(axis=0)
    classes = sorted(model)
    scores = np.full((len(classes), H, W_), -np.inf)
    for i, c in enumerate(classes):
        m = model[c]
        if m["mean"].shape[0] != B:
            raise ValueError(
                f"supervised: model was fitted on "
                f"{m['mean'].shape[0]} bands but the tile has {B}")
        d = X - m["mean"][:, None, None]
        if method == "mlc":
            q = np.einsum("bhw,bc,chw->hw", d, m["inv"], d)
            scores[i] = m["logprior"] - 0.5 * m["logdet"] - 0.5 * q
        else:
            scores[i] = -np.einsum("bhw,bhw->hw", d, d)
    best = np.argmax(scores, axis=0)
    out = np.array(classes, np.float64)[best]
    out[~ok] = np.nan
    return out


# ---------------------------------------------------- distributed ----

def _stat_index(B: int):
    """Flat index layout per class: 0 = n, 1..B = sums, then the
    upper triangle of S2 row-major."""
    iu = np.triu_indices(B)
    return iu, 1 + B + iu[0].size


def fit_mlc(features: DataFrame, labels: DataFrame,
            key: str = "cell_id", reg: float = 0.0,
            priors: str = "equal",
            broadcast_labels: bool = False) -> dict:
    """Distributed fit: one narrow Arrow pass over the cell-keyed
    (features × labels) join → ``(class, idx, val)`` rows quantized to
    the 1e-6 grid → exact ``DECIMAL(38,6)`` agg (bit-identical under
    any partitioning) → driver-side model assembly. See the module
    docstring for the full plan."""
    joined, lnames = _joined_pair(features, labels, key,
                                  broadcast_labels)

    def part(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cls: list[int] = []
            idxs: list[int] = []
            vals: list[float] = []
            for row, rb, rw, rh, rfmt, rnd, rbnd in zip(
                    pdf[lnames].itertuples(index=False),
                    pdf["_rbytes"], pdf["_rw"], pdf["_rh"],
                    pdf["_rfmt"], pdf["_rnodata"],
                    (pdf["_rband_nodata"] if "_rband_nodata" in pdf
                     else [None] * len(pdf))):
                arrL = codec.decode(row.bytes, int(row.w),
                                    int(row.h), row.fmt)
                ndL = codec.row_band_meta(
                    row, len(arrL), "band_nodata",
                    codec.nodata_scalar(row.nodata))
                X = codec.to_float_masked(arrL, ndL)
                arrR = codec.decode(rb, int(rw), int(rh), rfmt)
                ndR = (np.asarray(rbnd, dtype=np.float64)
                       if rbnd is not None and not np.isscalar(rbnd)
                       and len(np.atleast_1d(rbnd)) == len(arrR)
                       else codec.nodata_scalar(rnd))
                L = codec.to_float_masked(arrR, ndR)
                if L.shape[0] != 1:
                    raise ValueError(
                        f"supervised: label tile has {L.shape[0]} "
                        "planes — rasterize/classify to one class "
                        "plane first")
                if X.shape[1:] != L.shape[1:]:
                    raise ValueError(
                        f"supervised: tile dims disagree: "
                        f"{X.shape[1:]} vs {L.shape[1:]}; regrid "
                        "the label layer first")
                st = tile_class_stats_np(X, L[0])
                for c, (n, s, s2) in st.items():
                    B = s.shape[0]
                    iu, _n_terms = _stat_index(B)
                    blk = np.concatenate(
                        [[float(n)], s, s2[iu]])
                    blk = np.round(blk, _QDIGITS)
                    cls.extend([c] * blk.size)
                    idxs.extend(range(blk.size))
                    vals.extend(blk.tolist())
            yield pd.DataFrame({"cls": np.asarray(cls, np.int64),
                                "idx": np.asarray(idxs, np.int32),
                                "val": np.asarray(vals, np.float64)})

    agg = (joined.mapInPandas(part, "cls long, idx int, val double")
           .withColumn("val", F.col("val").cast("decimal(38,6)"))
           .groupBy("cls", "idx").agg(F.sum("val").alias("val"))
           .collect())
    by_cls: dict[int, dict[int, float]] = {}
    for r in agg:
        by_cls.setdefault(int(r["cls"]), {})[int(r["idx"])] = \
            float(r["val"])
    stats: dict[int, tuple] = {}
    for c, flat_map in by_cls.items():
        n_terms = max(flat_map) + 1
        flat = np.array([flat_map.get(i, 0.0) for i in range(n_terms)])
        # invert n_terms = 1 + B + B(B+1)/2
        B = int(round((np.sqrt(9 + 8 * (n_terms - 1)) - 3) / 2))
        s2 = np.zeros((B, B))
        iu, _ = _stat_index(B)
        s2[iu] = flat[1 + B:]
        s2 = s2 + np.triu(s2, 1).T
        stats[c] = (int(round(flat[0])), flat[1:1 + B], s2)
    return fit_from_stats_np(stats, reg, priors)


def classify_mlc(features: DataFrame, model: dict,
                 key: str = "cell_id",
                 method: str = "mlc") -> DataFrame:
    """Broadcast-model classification: one zero-shuffle Arrow map over
    the feature tiles — raw16 class plane, ``NODATA_CLASS`` wherever
    any feature is nodata. Output schema == input schema."""
    classify_np(np.zeros((next(iter(model.values()))["mean"].shape[0],
                          1, 1)), model, method)  # validate eagerly
    if any(c < 0 or c >= NODATA_CLASS for c in model):
        raise ValueError(
            f"supervised: class ids must be in [0, {NODATA_CLASS}) "
            "to fit the raw16 class plane")
    names = [f.name for f in features.schema.fields]

    def _map(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_rows = []
            for row in pdf.itertuples(index=False):
                arr = codec.decode(row.bytes, int(row.w), int(row.h),
                                   row.fmt)
                nd = codec.row_band_meta(row, len(arr), "band_nodata",
                                         codec.nodata_scalar(row.nodata))
                X = codec.to_float_masked(arr, nd)
                lab = classify_np(X, model, method)
                plane = np.where(np.isnan(lab), float(NODATA_CLASS),
                                 lab)[None].astype(np.uint16)
                d = {n: getattr(row, n) for n in names}
                d["bytes"] = codec.encode(plane, "raw16")
                d["fmt"] = "raw16"
                d["nodata"] = float(NODATA_CLASS)
                for c in ("band_scale", "band_offset", "band_nodata"):
                    if c in names:
                        d[c] = None
                out_rows.append(d)
            yield pd.DataFrame(out_rows, columns=names)

    return features.mapInPandas(_map, schema=features.schema)


def mlc(features: DataFrame, labels: DataFrame, key: str = "cell_id",
        reg: float = 0.0, priors: str = "equal",
        method: str = "mlc",
        broadcast_labels: bool = False) -> DataFrame:
    """Convenience train→classify: fit on every labeled pixel, then
    classify every tile (the GEE ``.train().classify()`` one-liner)."""
    model = fit_mlc(features, labels, key=key, reg=reg, priors=priors,
                    broadcast_labels=broadcast_labels)
    return classify_mlc(features, model, key=key, method=method)
