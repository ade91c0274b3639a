"""Pallas TPU kernel: fused 3x3 conv + bias + ReLU (inference).

The north-star asks for the reference's cuDNN-backed conv+BN+ReLU blocks as
Pallas kernels (BASELINE.json; SURVEY.md §7 stage 8).  With BatchNorm folded
into the conv weights (ops/fold_bn.py) the whole block is
``relu(conv3x3(x, w) + b)``, implemented here as:

  grid (N, H/16): each program
    DMAs a 32-row aligned window of the padded input HBM -> VMEM
    (overlapping windows cannot be expressed with blocked BlockSpecs, and
    this toolchain's Mosaic rejects bf16 DMAs with non-16-multiple sublane
    dims, hence the aligned 32-row windows and 16-multiple column padding),
    accumulates 9 shifted-tap MXU matmuls (16*W, Cin) x (Cin, Cout) in
    fp32 — no im2col materialization, so VMEM stays bounded,
    applies bias + ReLU in the epilogue and writes (16, W, Cout).

Measured on the v5e chip at (32,128,128,128)x128: 3.12 ms = 49.5 TFLOP/s
vs XLA's fused conv+bias+relu at 2.73 ms = 56.6 TFLOP/s — ~88% of XLA per
layer at the best shapes; the full-model scene pipeline measures 35.2
Mpx/s with this kernel vs 69.3 Mpx/s pure-XLA (mixed path loses cross-op
fusion).  The kernel therefore stays behind ``use_pallas`` as the
measured Pallas implementation of the hot block and the substrate for a
future double-conv fusion (keeping the intermediate activation in VMEM
between the two convs, which XLA cannot do).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_H = 16
_VMEM_BUDGET = 14 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supports(shape: tuple, cin: int, cout: int, itemsize: int = 2) -> bool:
    """Static check: can conv3x3_bias_relu handle this input?

    On real TPUs this toolchain's Mosaic rejects the kernel's HBM DMAs and
    window slices when the channel (lane) dims are not 128-multiples, so
    narrow layers fall back to XLA there; interpret mode (CPU tests) has no
    such restriction.
    """
    n, h, w = shape[0], shape[1], shape[2]
    if h % _TILE_H:
        return False
    if not _interpret() and (cin % 128 or cout % 128):
        return False
    wp = _round_up(w + 2, 16)
    scratch = 32 * wp * cin * itemsize
    weights = 9 * cin * cout * itemsize
    out_blk = _TILE_H * w * cout * itemsize
    acc = _TILE_H * w * cout * 4
    return scratch + weights + out_blk + acc < _VMEM_BUDGET


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _conv_kernel(x_hbm, w_ref, b_ref, o_ref, scratch, sem, *,
                 width: int, cin: int, cout: int):
    ni = pl.program_id(0)
    ti = pl.program_id(1)
    row0 = pl.multiple_of(ti * _TILE_H, _TILE_H)
    dma = pltpu.make_async_copy(
        x_hbm.at[ni, pl.ds(row0, 2 * _TILE_H), :, :], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:]
    acc = jnp.zeros((_TILE_H * width, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = x[dy:dy + _TILE_H, dx:dx + width, :].reshape(
                _TILE_H * width, cin)
            wt = w_ref[pl.ds((dy * 3 + dx) * cin, cin), :]
            acc += jnp.dot(tap, wt, preferred_element_type=jnp.float32)
    out = jnp.maximum(acc + b_ref[:].astype(jnp.float32), 0.0)
    o_ref[:] = out.reshape(1, _TILE_H, width, cout).astype(o_ref.dtype)


@jax.jit
def conv3x3_bias_relu(x: jax.Array, kernel: jax.Array,
                      bias: jax.Array) -> jax.Array:
    """relu(conv3x3_SAME(x, kernel) + bias) as one fused Pallas kernel.

    x: (N, H, W, Cin) with H % 16 == 0; kernel: (3, 3, Cin, Cout);
    bias: (Cout,).  Check :func:`supports` first.
    """
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert h % _TILE_H == 0, (h, _TILE_H)
    wp = _round_up(w + 2, 16)
    # 1 halo row on top; enough bottom padding that the last 32-row aligned
    # DMA window stays in bounds (last start = h - 16 -> end = h + 16)
    xp = jnp.pad(x, ((0, 0), (1, _TILE_H + 1), (1, wp - w - 1), (0, 0)))
    w2 = kernel.reshape(9 * cin, cout).astype(x.dtype)
    b2 = bias.reshape(1, cout).astype(jnp.float32)

    kern = functools.partial(_conv_kernel, width=w, cin=cin, cout=cout)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        grid=(n, h // _TILE_H),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input stays in HBM
            pl.BlockSpec((9 * cin, cout), lambda ni, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda ni, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE_H, w, cout),
                               lambda ni, ti: (ni, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * _TILE_H, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(xp, w2, b2)
