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

import jax.numpy as jnp


def _fold_pair(conv: dict, bn: dict, stats: dict, eps: float) -> dict:
    scale = bn["scale"] / jnp.sqrt(stats["var"] + eps)
    kernel = conv["kernel"] * scale  # (kh, kw, cin, cout) * (cout,)
    bias = conv.get("bias", 0.0)
    bias = (bias - stats["mean"]) * scale + bn["bias"]
    return {"kernel": kernel, "bias": bias}


def fold_batchnorm(params: dict, batch_stats: dict, eps: float = 1e-5) -> dict:
    """Return a params tree for the ``fold_bn=True`` model: every
    conv{i}/bn{i} pair becomes a single conv{i}; other entries recurse."""
    out = {}
    for key, value in params.items():
        if key.startswith("bn"):
            continue  # consumed by its conv sibling
        if key.startswith("conv") and key[4:].isdigit() \
                and f"bn{key[4:]}" in params:
            out[key] = _fold_pair(value, params[f"bn{key[4:]}"],
                                  batch_stats[f"bn{key[4:]}"], eps)
        elif isinstance(value, dict):
            out[key] = fold_batchnorm(value, batch_stats.get(key, {}), eps)
        else:
            out[key] = value
    return out
