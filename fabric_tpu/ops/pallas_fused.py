"""Pallas TPU kernels for fused elementwise hot paths.

These cover the two epilogues the reference leans on cuDNN for
(SURVEY.md §2.3): the Siamese multiplicative-ReLU fusion
(bidate_model.py:35-38) and the BN scale-bias-ReLU epilogue
(unet_parts.py:13-18).  XLA already fuses these into neighboring convs; the
Pallas versions exist to (a) pin the fusion when XLA's heuristics miss and
(b) serve as the template for the more aggressive fused kernels.  They are
gated behind ``Config.use_pallas`` and benchmarked against the plain-XLA path
in bench.py, per SURVEY.md §7 stage 8.

Off-TPU (CPU tests) the kernels run in interpreter mode automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_LANES = 128
_TILE_ROWS = 512


def _flatten2d(x: jax.Array) -> tuple[jax.Array, tuple]:
    """Reshape any array to (rows, lanes) for elementwise tiling."""
    shape = x.shape
    flat = x.reshape(-1)
    pad = (-flat.size) % _LANES
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, _LANES), shape


def _unflatten(y2d: jax.Array, shape: tuple) -> jax.Array:
    import numpy as np
    n = int(np.prod(shape)) if shape else 1
    return y2d.reshape(-1)[:n].reshape(shape)


def _mul_relu_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.maximum(a_ref[:] * b_ref[:], 0)


def fused_mul_relu(a: jax.Array, b: jax.Array) -> jax.Array:
    """relu(a * b) as a single VPU kernel (the Siamese fusion op)."""
    a2, shape = _flatten2d(a)
    b2, _ = _flatten2d(b)
    rows = a2.shape[0]
    tile = min(_TILE_ROWS, rows)
    grid = (pl.cdiv(rows, tile),)
    out = pl.pallas_call(
        _mul_relu_kernel,
        out_shape=jax.ShapeDtypeStruct(a2.shape, a2.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((tile, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(a2, b2)
    return _unflatten(out, shape)


def _scale_bias_relu_kernel(x_ref, s_ref, b_ref, o_ref):
    o_ref[:] = jnp.maximum(x_ref[:] * s_ref[:] + b_ref[:], 0)


def bn_relu_inference(x: jax.Array, scale: jax.Array, bias: jax.Array,
                      mean: jax.Array, var: jax.Array,
                      eps: float = 1e-5) -> jax.Array:
    """Folded inference BatchNorm + ReLU: relu((x - mean) * g + b) as one
    fused scale/bias/relu kernel over NHWC with per-channel constants."""
    inv = scale / jnp.sqrt(var + eps)
    s = inv.astype(x.dtype)
    b = (bias - mean * inv).astype(x.dtype)
    n, h, w, c = x.shape
    x2 = x.reshape(-1, c)
    rows = x2.shape[0]
    tile = min(_TILE_ROWS, rows)
    grid = (pl.cdiv(rows, tile),)
    s2 = jnp.broadcast_to(s, (1, c))
    b2 = jnp.broadcast_to(b, (1, c))
    out = pl.pallas_call(
        _scale_bias_relu_kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x2, s2, b2)
    return out.reshape(n, h, w, c)
