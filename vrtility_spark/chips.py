"""Training-chip export: slice one-row-per-cell tiles (typically
composites) into fixed-size model-ready chips with per-chip validity
scoring — the step that turns an EO datacube into an ML training set
(the caption column riding along makes each output row an
image+caption training pair, the BASELINE.json input shape).

Spark-first shape: a chip never crosses a tile boundary (chips tile
the cell grid exactly), so the whole operator is ONE narrow Arrow map
— decode each tile once, slice, re-encode in the same codec — with
ZERO shuffle (plan-asserted in tests/test_chips.py). Downstream
train/val assignment reuses :mod:`sampling`'s md5 hash-range splits on
``(cell_id, chip_x, chip_y)``: deterministic, reshard-proof, and
re-computable from the keys alone, so the split never drifts when the
corpus grows. At 100 TB this is the ideal plan: a pure map over the
composite table followed by a hash expression.

Each chip row keeps the parent tile's metadata (nodata, band_nodata,
caption_agg, …) and adds ``chip_x``/``chip_y`` (grid position inside
the parent cell) and ``valid_frac`` — the fraction of chip pixels
valid in EVERY band (the usual "drop mostly-masked chips" training
filter; filter it with a plain Catalyst predicate so pruning stays
declarative).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from vrtility_spark import codec


def chip_rows_np(arr: np.ndarray, nd, chip: int):
    """Slice a decoded ``(B, H, W)`` tile into ``chip×chip`` blocks →
    list of ``(chip_x, chip_y, block, valid_frac)`` in row-major order.
    Pure NumPy; gated against manual slicing in tests/test_chips.py."""
    _, h, w = arr.shape
    if h % chip or w % chip:
        raise ValueError(
            f"chip size {chip} must divide the tile ({w}x{h}); regrid "
            "or pick a divisor (chips may not cross tile boundaries)")
    valid = np.isfinite(codec.to_float_masked(arr, nd)).all(axis=0)
    out = []
    for cy in range(h // chip):
        for cx in range(w // chip):
            ys, xs = slice(cy * chip, (cy + 1) * chip), \
                slice(cx * chip, (cx + 1) * chip)
            out.append((cx, cy, arr[:, ys, xs],
                        float(valid[ys, xs].mean())))
    return out


#: the dihedral-subgroup variants every vision pipeline augments with;
#: each is an exact pixel permutation (lossless, codec-roundtrip-safe)
AUG_VARIANTS = ("orig", "fliph", "flipv", "rot90", "rot180", "rot270")


def aug_np(arr: np.ndarray, variant: str) -> np.ndarray:
    """Apply one augmentation to a ``(B, H, W)`` array (rotations are
    counter-clockwise, matching np.rot90)."""
    if variant == "orig":
        return arr
    if variant == "fliph":
        return arr[:, :, ::-1]
    if variant == "flipv":
        return arr[:, ::-1, :]
    if variant in ("rot90", "rot180", "rot270"):
        k = {"rot90": 1, "rot180": 2, "rot270": 3}[variant]
        return np.rot90(arr, k=k, axes=(1, 2))
    raise KeyError(f"unknown augmentation {variant!r}; "
                   f"known: {AUG_VARIANTS}")


def augment_chips(df: DataFrame, variants=("orig", "fliph", "flipv"),
                  mode: str = "all", seed: int = 0,
                  key_cols=("cell_id", "chip_x", "chip_y")) -> DataFrame:
    """Augment a chip table with exact flip/rotation variants — the
    standard vision-training multiplier, as ONE narrow Arrow map with
    zero shuffle.

    ``mode="all"`` emits every variant per chip (corpus × len(variants),
    ``variant`` column added). ``mode="hash"`` emits exactly ONE
    deterministically-chosen variant per chip (md5 of ``seed|key_cols``
    picks it — reshard-proof like :mod:`sampling`'s splits, so the
    augmented corpus never flickers between runs). Rotations require
    square chips."""
    variants = tuple(variants)
    for v in variants:
        if v not in AUG_VARIANTS:
            raise KeyError(f"unknown augmentation {v!r}; "
                           f"known: {AUG_VARIANTS}")
    if mode not in ("all", "hash"):
        raise ValueError("mode must be 'all' or 'hash'")
    for c in (*key_cols, "bytes", "w", "h", "fmt"):
        if c not in df.columns:
            raise ValueError(f"chip table is missing column {c!r}")
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("variant", T.StringType())])
    in_cols = list(df.columns)

    def gen(batches):
        import hashlib
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                arr = codec.decode(rec["bytes"], int(rec["w"]),
                                   int(rec["h"]), rec["fmt"])
                if mode == "hash":
                    hx = hashlib.md5(
                        ("|".join([str(seed)]
                                  + [str(rec[c]) for c in key_cols])
                         ).encode()).hexdigest()[:8]
                    chosen = (variants[int(hx, 16) % len(variants)],)
                else:
                    chosen = variants
                for v in chosen:
                    if v.startswith("rot") and v != "rot180" \
                            and rec["w"] != rec["h"]:
                        raise ValueError(
                            f"{v} needs square chips, got "
                            f"{rec['w']}x{rec['h']}")
                    row = dict(rec)
                    row["bytes"] = codec.encode(
                        np.ascontiguousarray(aug_np(arr, v)), rec["fmt"])
                    row["variant"] = v
                    rows.append(row)
            if rows:
                yield pd.DataFrame(rows, columns=in_cols + ["variant"])

    return df.mapInPandas(gen, schema=out_schema)


def make_chips(df: DataFrame, chip: int = 8,
               key: str = "cell_id") -> DataFrame:
    """Explode a tile table into chips: every input column passes
    through (``bytes``/``w``/``h`` replaced by the chip's), plus
    ``chip_x``, ``chip_y``, ``valid_frac``. One narrow ``mapInPandas``,
    zero shuffle."""
    chip = int(chip)
    if chip < 1:
        raise ValueError("chip size must be >= 1")
    for c in (key, "bytes", "w", "h", "fmt"):
        if c not in df.columns:
            raise ValueError(f"tile table is missing column {c!r}")
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("chip_x", T.IntegerType()),
           T.StructField("chip_y", T.IntegerType()),
           T.StructField("valid_frac", T.DoubleType())])
    in_cols = list(df.columns)

    def gen(batches):
        for pdf in batches:
            recs = pdf.to_dict("records")
            rows = []
            for rec in recs:
                arr = codec.decode(rec["bytes"], int(rec["w"]),
                                   int(rec["h"]), rec["fmt"])
                sc = rec.get("nodata")
                nd = codec.row_band_meta(
                    SimpleNamespace(**{"band_nodata":
                                       rec.get("band_nodata")}),
                    len(arr), "band_nodata",
                    np.nan if sc is None or codec.pd_isna(sc) else sc)
                for cx, cy, block, vf in chip_rows_np(arr, nd, chip):
                    row = dict(rec)
                    row["bytes"] = codec.encode(block, rec["fmt"])
                    row["w"] = chip
                    row["h"] = chip
                    row["chip_x"], row["chip_y"] = cx, cy
                    row["valid_frac"] = vf
                    rows.append(row)
            if rows:
                out = pd.DataFrame(rows, columns=in_cols
                                   + ["chip_x", "chip_y", "valid_frac"])
                yield out

    return df.mapInPandas(gen, schema=out_schema)
