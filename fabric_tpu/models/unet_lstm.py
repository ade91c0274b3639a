"""UNetLSTM: multi-date U-Net with a recurrent (ConvLSTM) bottleneck.

The reference repo only links this variant externally (its UNetLSTM/ dir is
empty — README.md:7, SURVEY.md §0), so this is built from the paper's
description ("Detecting Urban Changes with Recurrent Neural Networks from
Multitemporal Sentinel-2 Data": a U-Net whose bottleneck features are
processed by an LSTM over the temporal axis) and BASELINE.json config 3
("5-date Sentinel-2 sequences with recurrent bottleneck").

TPU-first design:
- Input (N, T, H, W, C).  The shared encoder runs ONCE at batch N*T (time
  folded into batch: biggest possible MXU tiles, a single fusion region).
- Bottleneck: a ConvLSTM (3x3 convolutional gates) scanned over T with
  ``nn.scan`` — compiler-friendly static unrolling via XLA while-loop,
  weights shared across steps.
- Skip fusion across dates generalizes the reference's bi-date
  multiplicative-ReLU fusion relu(x_d2 * x_d1) (bidate_model.py:35-38) to
  relu(prod_t x_t) — identical for T=2.
- Decoder identical to BiDateNet's (Up x4 + OutConv).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from fabric_tpu.models.blocks import DoubleConv, Down, Up, OutConv

Dtype = type(jnp.float32)


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell: all four gates from one 3x3 conv over
    [input, hidden] — a single large MXU matmul per step."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        z = jnp.concatenate([x, h], axis=-1)
        gates = nn.Conv(4 * self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, name="gates")(z)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = nn.sigmoid(i)
        f = nn.sigmoid(f + 1.0)  # forget-gate bias init trick
        g = nn.tanh(g)
        o = nn.sigmoid(o)
        c = f * c.astype(f.dtype) + i * g
        h = o * nn.tanh(c)
        return (h, c), h


def multi_date_fuse(feats: jnp.ndarray) -> jnp.ndarray:
    """relu(prod over dates) — T-date generalization of the reference's
    bi-date fusion (exact for T=2)."""
    return nn.relu(jnp.prod(feats, axis=1))


class UNetLSTM(nn.Module):
    n_channels: int = 13
    n_classes: int = 2
    base: int = 64
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    use_pallas: bool = False
    # BN folded into conv weights (ops/fold_bn.py) — eval-only fast path,
    # same contract as BiDateNet.fold_bn (the ConvLSTM gates have no BN)
    fold_bn: bool = False
    # Shift-invariant decoder upsample (ops/resize.upsample2x_local) —
    # makes the whole net translation invariant at 16-px-aligned crops
    # (everything else already is: SAME convs, aligned pooling, the
    # ConvLSTM's 3x3 SAME gates, pointwise temporal fusion), enabling
    # banded fully-convolutional serving (infer/fullconv.py).
    # Parameter-free; checkpoints are unaffected.
    local_upsample: bool = False

    @nn.compact
    def __call__(self, seq, train: bool = True):
        """seq: (N, T, H, W, C) multi-date stack -> (N, H, W, n_classes)."""
        n, t = seq.shape[0], seq.shape[1]
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  use_pallas=self.use_pallas, fold_bn=self.fold_bn)
        b = self.base

        # shared encoder over all dates at batch N*T
        x = seq.reshape((n * t,) + seq.shape[2:]).astype(self.dtype)
        x1 = DoubleConv(b, name="inc", **kw)(x, train)
        x2 = Down(2 * b, name="down1", **kw)(x1, train)
        x3 = Down(4 * b, name="down2", **kw)(x2, train)
        x4 = Down(8 * b, name="down3", **kw)(x3, train)
        x5 = Down(8 * b, name="down4", **kw)(x4, train)

        def unfold(v):
            return v.reshape((n, t) + v.shape[1:])

        s1, s2, s3, s4 = (unfold(v) for v in (x1, x2, x3, x4))
        bott = unfold(x5)  # (N, T, h5, w5, 8b)

        # ConvLSTM over the temporal axis at the bottleneck
        cell = nn.scan(ConvLSTMCell, variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1)(8 * b, dtype=self.dtype,
                                              name="bottleneck_lstm")
        h0 = jnp.zeros(bott.shape[:1] + bott.shape[2:], self.dtype)
        (h_last, _), _ = cell((h0, jnp.zeros_like(h0)), bott)

        f4 = multi_date_fuse(s4)
        f3 = multi_date_fuse(s3)
        f2 = multi_date_fuse(s2)
        f1 = multi_date_fuse(s1)

        ukw = dict(kw, local_upsample=self.local_upsample)
        y = Up(4 * b, name="up1", **ukw)(h_last, f4, train)
        y = Up(2 * b, name="up2", **ukw)(y, f3, train)
        y = Up(b, name="up3", **ukw)(y, f2, train)
        y = Up(b, name="up4", **ukw)(y, f1, train)
        logits = OutConv(self.n_classes, dtype=self.dtype, name="outc")(y)
        return logits.astype(jnp.float32)
