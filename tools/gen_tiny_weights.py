#!/usr/bin/env python
"""Generate the vendored tiny-conv-net weights fixture
(vrtility_spark/models/tinycloud.npz) — run ONCE, commit the output.

Seeded, then the final bias is centered so the logit straddles 0 on a
deterministic sample scene: the predicted mask is guaranteed mixed
(neither all-cloud nor all-clear), which is what makes the downstream
masking tests meaningful. Re-running reproduces the same bytes.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vrtility_spark import codec, datagen  # noqa: E402
from vrtility_spark.mlmask import _np_conv2d  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(20260817)
    w1 = rng.normal(0, 0.3, size=(4, 3, 3, 3)).astype(np.float32)
    b1 = rng.normal(0, 0.05, size=4).astype(np.float32)
    w2 = rng.normal(0, 0.3, size=(1, 4, 3, 3)).astype(np.float32)
    b2 = np.zeros(1, dtype=np.float32)

    # center the logit on a deterministic sample scene so the mask mixes
    pdf = datagen.images_pandas(nx=1, ny=1, n_dates=1, w=16, h=16)
    row = pdf.iloc[0]
    arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
    names = list(row.bands)
    planes = arr[[names.index(b) for b in ("B04", "B03", "B08")]]
    x = planes.astype(np.float32) / 10000.0
    h = np.maximum(_np_conv2d(x, w1, b1), 0.0)
    logit = _np_conv2d(h, w2, b2)[0]
    b2[0] = -float(np.median(logit))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "vrtility_spark", "models",
        "tinycloud.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, w1=w1, b1=b1, w2=w2, b2=b2)
    # sanity: mixed mask on the sample scene
    logit2 = logit + b2[0]
    frac = float((logit2 <= 0).mean())
    print(f"wrote {out}; valid fraction on sample scene: {frac:.3f}")
    assert 0.2 <= frac <= 0.8, "mask not mixed; adjust seed"


if __name__ == "__main__":
    main()
