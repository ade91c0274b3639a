"""Align-corners bilinear resize as MXU-friendly matmuls.

The reference decoder upsamples with ``nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True)`` (/root/reference/models/unet_parts.py:56-58).
``jax.image.resize`` only offers half-pixel-center sampling, so an explicit
align-corners implementation is required for weight-level parity.

TPU-first design: 1-D interpolation over each spatial axis is expressed as a
dense (out, in) weight matrix contraction (einsum), which XLA lowers onto the
MXU — no gathers, fully static shapes, fuses with surrounding ops.  The
weight matrices are computed at trace time from static shapes and become
compile-time constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) align-corners linear interpolation matrix."""
    m = np.zeros((out_size, in_size), np.float32)
    if in_size == 1 or out_size == 1:
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    m[rows, lo] += 1.0 - frac
    m[rows, hi] += frac
    return m


def resize_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear align-corners resize of NHWC (or HWC) arrays via matmuls."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    dtype = x.dtype
    wh = jnp.asarray(_interp_matrix(out_h, h), dtype)
    ww = jnp.asarray(_interp_matrix(out_w, w), dtype)
    # (N,H,W,C) -> (N,OH,W,C) -> (N,OH,OW,C); both are MXU matmuls.
    # HIGHEST precision: interpolation weights must not be bf16-rounded
    # (on TPU this selects fp32 accumulation on the MXU).
    y = jnp.einsum("nhwc,Hh->nHwc", x, wh,
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("nhwc,Ww->nhWc", y, ww,
                   precision=jax.lax.Precision.HIGHEST)
    return y[0] if squeeze else y


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear align-corners upsample (the reference decoder's op)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_align_corners(x, 2 * h, 2 * w)


def _up1d_local(x: jax.Array, axis: int) -> jax.Array:
    """Shift-invariant 1-D 2x upsample along ``axis``: even outputs copy
    the inputs, odd outputs are midpoints (the last odd output clamps to
    the edge).  Pure interleave — no position-dependent weights."""
    idx_next = [slice(None)] * x.ndim
    idx_next[axis] = slice(1, None)
    idx_last = [slice(None)] * x.ndim
    idx_last[axis] = slice(-1, None)
    nxt = jnp.concatenate([x[tuple(idx_next)], x[tuple(idx_last)]],
                          axis=axis)
    mid = ((x.astype(jnp.float32) + nxt.astype(jnp.float32)) * 0.5
           ).astype(x.dtype)
    y = jnp.stack([x, mid], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return y.reshape(shape)


def upsample2x_local(x: jax.Array) -> jax.Array:
    """Shift-invariant bilinear 2x upsample of NHWC (or HWC) arrays:
    ``out[2i] = x[i]``, ``out[2i+1] = (x[i] + x[i+1]) / 2`` per spatial
    axis (edge-clamped at the far end).

    This is the H→∞ limit of the reference's align-corners upsample
    (unet_parts.py:56-58): align-corners samples at ``i·(H-1)/(2H-1)``,
    which drifts from ``i/2`` by up to ~0.5 px across the map and makes
    the op depend on absolute position — a crop of the upsample is NOT
    the upsample of the crop.  This local variant IS translation
    invariant (for shifts aligned to the U-Net's total stride), which is
    what lets :mod:`fabric_tpu.infer.fullconv` run the network over
    halo-extended scene bands and exactly reproduce a whole-scene
    forward."""
    return _up1d_local(_up1d_local(x, x.ndim - 3), x.ndim - 2)


def pad_to_match(x: jax.Array, target_h: int, target_w: int) -> jax.Array:
    """Zero-pad NHWC spatial dims to a target, split like torch ``F.pad``
    in the reference Up block (unet_parts.py:68-72): ``diff//2`` before,
    ``diff - diff//2`` after."""
    dh = target_h - x.shape[-3]
    dw = target_w - x.shape[-2]
    if dh == 0 and dw == 0:
        return x
    pads = [(0, 0)] * (x.ndim - 3) + [(dh // 2, dh - dh // 2),
                                      (dw // 2, dw - dw // 2), (0, 0)]
    return jnp.pad(x, pads)
