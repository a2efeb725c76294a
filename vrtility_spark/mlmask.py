"""ML cloud-mask operator (P11, ``create_omnicloudmask``).

The reference wraps the OmniCloudMask torch model as a pixel function
over (red, green, nir) planes (/root/reference/R/zvrt-pixel-funs-mask.R:262-340)
and materializes the mask eagerly per scene (R/vrt-create-mask.R:56-174).

Spark shape: a batched-inference ``mapInPandas`` — the standard model-
serving pattern (load model once per worker inside the generator, run
whole Arrow batches). Torch is not available in this sandbox, so the
model call is stubbed behind ``model="fake"``:

- ``model="fake"`` — deterministic stand-in (brightness threshold on
  the mean of the requested planes) so the full Spark plumbing (schema,
  batching, plane injection) is real and tested;
- ``model=<callable>`` — a real predictor ``(planes (C,H,W) float32)
  -> (H,W) 0/1 mask`` (e.g. a torch module wrapped in a closure); this
  is the branch a real deployment uses, exercised by the torch-gated
  test in tests/test_bands.py (skipped where torch is absent);
- ``model="omnicloudmask"`` — imports torch/omnicloudmask if present,
  else raises ``NotImplementedError`` naming the missing dependency.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from vrtility_spark import codec


def _fake_model(planes: np.ndarray) -> np.ndarray:
    """Deterministic stand-in: cloud iff mean reflectance of the input
    planes exceeds the scene's 85th percentile. Returns 0/1 mask
    (1 = valid, 0 = cloud), matching the engine's mask polarity."""
    mean = planes.mean(axis=0)
    thr = np.percentile(mean, 85.0)
    return (mean <= thr).astype(np.uint8)


def _omnicloudmask_predict(planes: np.ndarray) -> np.ndarray:
    """Real OmniCloudMask inference over one (red, green, nir) stack —
    the engine twin of the reference's pixel function
    (/root/reference/R/zvrt-pixel-funs-mask.R:313-333:
    ``omc.predict_from_array(np_rgn, ...)`` then the class plane).
    Class 0 = clear → mask 1 (valid); clouds/shadows (1/2/3) → 0,
    matching the engine's mask polarity."""  # pragma: no cover - torch
    import omnicloudmask as omc
    pred = np.asarray(omc.predict_from_array(
        planes.astype(np.float32), batch_size=1))
    return (pred.reshape(pred.shape[-2:]) == 0).astype(np.uint8)


def _np_conv2d(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """3x3 same-padding conv, (C,H,W) x (O,C,3,3) -> (O,H,W)."""
    C, H, W = x.shape
    O = w.shape[0]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1)))
    out = np.empty((O, H, W), dtype=np.float32)
    for o in range(O):
        acc = np.full((H, W), b[o], dtype=np.float32)
        for c in range(C):
            for di in range(3):
                for dj in range(3):
                    acc += w[o, c, di, dj] * xp[c, di:di + H, dj:dj + W]
        out[o] = acc
    return out


TINY_WEIGHTS = __file__.rsplit("/", 1)[0] + "/models/tinycloud.npz"


def tiny_conv_predictor(weights_path: str | None = None,
                        backend: str = "auto"):
    """REAL-WEIGHTS predictor from the vendored tiny conv-net fixture
    (``models/tinycloud.npz``: conv3x3(3→4) + ReLU + conv3x3(4→1),
    weights generated once by ``tools/gen_tiny_weights.py`` with a
    fixed seed and committed — fixed on disk, not derived from the
    input). This is the P11 run-it-for-real gate: the returned
    callable exercises ``create_mlmask``'s real-predictor branch with
    loaded weights in any environment.

    ``backend="numpy"`` runs the forward pass in NumPy (always
    available); ``backend="torch"`` builds the equivalent
    ``torch.nn.Conv2d`` stack and loads the SAME weights (parity is
    asserted by the torch-gated test); ``backend="auto"`` prefers
    torch when importable. CI note for the torch path:
    ``pip install torch && python -m pytest tests -k torch -q``.

    Input planes are scaled by 1/10000 (the S2 reflectance
    convention); cloud where the output logit exceeds 0 → mask 0,
    else 1 (valid), matching the engine's mask polarity.
    """
    path = weights_path or TINY_WEIGHTS
    wts = np.load(path)
    w1, b1, w2, b2 = (wts[k].astype(np.float32)
                      for k in ("w1", "b1", "w2", "b2"))
    if backend == "auto":
        try:
            import torch  # noqa: F401
            backend = "torch"
        except ImportError:
            backend = "numpy"
    if backend == "numpy":
        def predict(planes: np.ndarray) -> np.ndarray:
            x = planes.astype(np.float32) / 10000.0
            h = np.maximum(_np_conv2d(x, w1, b1), 0.0)
            logit = _np_conv2d(h, w2, b2)[0]
            return (logit <= 0.0).astype(np.uint8)
        return predict
    if backend == "torch":  # pragma: no cover - torch absent here
        import torch

        net1 = torch.nn.Conv2d(w1.shape[1], w1.shape[0], 3, padding=1)
        net2 = torch.nn.Conv2d(w2.shape[1], w2.shape[0], 3, padding=1)
        with torch.no_grad():
            net1.weight.copy_(torch.from_numpy(w1))
            net1.bias.copy_(torch.from_numpy(b1))
            net2.weight.copy_(torch.from_numpy(w2))
            net2.bias.copy_(torch.from_numpy(b2))
        net1.eval(), net2.eval()

        def predict(planes: np.ndarray) -> np.ndarray:
            with torch.no_grad():
                x = torch.from_numpy(
                    planes.astype(np.float32) / 10000.0)[None]
                logit = net2(torch.relu(net1(x)))[0, 0].numpy()
            return (logit <= 0.0).astype(np.uint8)
        return predict
    raise ValueError(f"unknown backend {backend!r}")


def create_mlmask(df: DataFrame, bands: Sequence[str] = ("B04", "B03", "B08"),
                  model: str = "fake", mask_name: str = "MLMASK") -> DataFrame:
    """Append an ML-predicted 0/1 mask plane computed from ``bands``.

    The appended plane is a regular mask plane: feed the result to
    ``masks.vrt_set_maskfun(df, "int", [0])`` to apply it (class 0 =
    cloud), mirroring how the reference chains create-mask → set-mask.
    """
    if callable(model):
        predict = model  # real inference path: any (C,H,W)->(H,W) model
    elif model == "omnicloudmask":
        try:
            import omnicloudmask  # noqa: F401
            import torch  # noqa: F401
        except ImportError as e:  # pragma: no cover - sandbox has no torch
            raise NotImplementedError(
                "model='omnicloudmask' needs the torch + omnicloudmask "
                "packages (not available in this environment); use "
                "model='fake' for the deterministic stand-in, or pass a "
                "callable (C,H,W)->(H,W) predictor") from e
        predict = _omnicloudmask_predict  # pragma: no cover - needs torch
    elif model == "fake":
        predict = _fake_model
    else:
        raise ValueError(f"unknown model {model!r}")

    wanted = list(bands)
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a heavyweight model is loaded once per worker (this generator
        # body runs once per task), then applied per scene below —
        # the batched-inference pattern
        for pdf in batches:
            blobs, bands_out, fmts = [], [], []
            for row in pdf.itertuples(index=False):
                arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
                names = list(row.bands)
                planes = arr[[names.index(b) for b in wanted]].astype(np.float32)
                mask = np.asarray(predict(planes), dtype=np.uint8)
                if mask.shape != planes.shape[1:]:
                    raise ValueError(
                        f"mlmask model returned shape {mask.shape}, "
                        f"expected {planes.shape[1:]}")
                plane = mask.astype(arr.dtype)[None]
                # a lossy codec destroys 0/1 class planes (png8's
                # quantization by 257 rounds 1 -> 0 = everything cloud);
                # mask-bearing payloads switch to the lossless sibling
                fmt = "png" if row.fmt == "png8" else row.fmt
                blobs.append(codec.encode(
                    np.concatenate([arr, plane]).astype(arr.dtype), fmt))
                bands_out.append(names + [mask_name])
                fmts.append(fmt)
            pdf = pdf.copy()
            pdf["bytes"] = blobs
            pdf["bands"] = bands_out
            pdf["fmt"] = fmts
            # keep per-band metadata aligned with the appended plane:
            # a 0/1 mask is unscaled with the row's sentinel convention
            exts = {"band_scale": 1.0, "band_offset": 0.0}
            for c, new_val in exts.items():
                if c in pdf.columns:
                    pdf[c] = pdf[c].map(
                        lambda v, nv=new_val: None if v is None
                        else list(v) + [nv])
            if "band_nodata" in pdf.columns:
                pdf["band_nodata"] = [
                    None if v is None else list(v) + [float(nd)]
                    for v, nd in zip(pdf["band_nodata"], pdf["nodata"])]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
