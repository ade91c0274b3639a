"""Fold inference BatchNorm into the preceding conv's weights.

At eval time BN is an affine map with frozen statistics:
``y = (conv(x) - mu) * gamma / sqrt(var + eps) + beta``.  Folding
``s = gamma / sqrt(var + eps)`` into the conv kernel (output-channel scale)
and ``beta - mu * s`` into its bias leaves just conv -> ReLU, which XLA
fuses into a single MXU op with a ReLU epilogue — eliminating 18 full-size
elementwise passes (and their bf16->fp32->bf16 converts) per BiDateNet
forward.  This is the TPU-native answer to the reference's reliance on
cuDNN's fused conv+BN inference kernels (SURVEY.md §2.3).

Usage:
    folded_params = fold_batchnorm(variables["params"],
                                   variables["batch_stats"])
    model = BiDateNet(..., fold_bn=True)
    model.apply({"params": folded_params, "batch_stats": {}}, x1, x2,
                train=False)
"""

from __future__ import annotations

import numpy as np


def _fold_pair(conv: dict, bn: dict, stats: dict, eps: float) -> dict:
    # Host-side numpy on purpose: the fold runs once at predictor init,
    # and jnp arithmetic rounds differently per platform (TPU vs CPU
    # differ in the last ulp), which would give the SAME checkpoint a
    # different aot.params_fingerprint depending on where it was folded
    # — breaking the AOT weights-sha256 startup check between a bundle
    # exported on one platform and a checkpoint served on another.
    # float64 intermediates, cast back to the kernel's dtype: bit-exact
    # on every host.
    kdt = np.asarray(conv["kernel"]).dtype
    scale = (np.asarray(bn["scale"], np.float64)
             / np.sqrt(np.asarray(stats["var"], np.float64) + eps))
    kernel = (np.asarray(conv["kernel"], np.float64) * scale).astype(kdt)
    bias = np.asarray(conv.get("bias", 0.0), np.float64)
    bias = ((bias - np.asarray(stats["mean"], np.float64)) * scale
            + np.asarray(bn["bias"], np.float64)).astype(kdt)
    return {"kernel": kernel, "bias": bias}


def _fold_tree(params: dict, batch_stats: dict, eps: float) -> dict:
    out = {}
    for key, value in params.items():
        if key.startswith("bn"):
            continue  # consumed by its conv sibling
        if key.startswith("conv") and key[4:].isdigit() \
                and f"bn{key[4:]}" in params:
            out[key] = _fold_pair(value, params[f"bn{key[4:]}"],
                                  batch_stats[f"bn{key[4:]}"], eps)
        elif isinstance(value, dict):
            out[key] = _fold_tree(value, batch_stats.get(key, {}), eps)
        else:
            out[key] = value
    return out


def fold_batchnorm(params: dict, batch_stats: dict, eps: float = 1e-5) -> dict:
    """Return a params tree for the ``fold_bn=True`` model: every
    conv{i}/bn{i} pair becomes a single conv{i}; other entries recurse.

    The returned leaves are committed DEVICE arrays: the fold math is
    host numpy (see _fold_pair), but callers pass the folded tree as an
    argument into jitted runners on every scene — leaving it as host
    numpy would re-upload all ~53 MB of weights per call (measured 79 →
    28 Mpx/s through the axon tunnel)."""
    import jax

    return jax.device_put(_fold_tree(params, batch_stats, eps))
