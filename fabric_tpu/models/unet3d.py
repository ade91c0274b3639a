"""3D U-Net: spatiotemporal conv encoder over multi-date stacks.

BASELINE.json config 5 ("3D U-Net spatiotemporal encoder over multi-date
stacks, pmapped across a v5p slice").  No reference implementation exists
(SURVEY.md §0); designed here TPU-first:

- Input (N, T, H, W, C) as an NDHWC volume (T = depth).
- Encoder: (3,3,3)-conv DoubleConv3D blocks with spatial-only 2x pooling
  (T is tiny — 5 dates — so it is preserved through the pyramid; pooling it
  would destroy the temporal signal and produce degenerate conv shapes).
- At each level the skip passed to the decoder collapses T by max — "was
  there change at any date" semantics; the bottleneck collapses by mean.
- Decoder: the same 2-D Up/OutConv stack as BiDateNet.

XLA:TPU lowers Conv3D to MXU contractions like Conv2D; NDHWC is the
TPU-preferred layout.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from fabric_tpu.models.blocks import Up, OutConv

Dtype = type(jnp.float32)


class DoubleConv3D(nn.Module):
    """(3x3x3 conv -> BN -> ReLU) x 2 over NDHWC."""

    features: int
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    fold_bn: bool = False  # BN folded into conv weights (ops/fold_bn.py)

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            if self.fold_bn:
                assert not train, "fold_bn is an inference-only transform"
            else:
                from fabric_tpu.models.blocks import TorchBatchNorm
                x = TorchBatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=jnp.float32,
                    axis_name=self.bn_axis_name if train else None,
                    name=f"bn{i + 1}")(x)
            x = nn.relu(x).astype(self.dtype)
        return x


def _spatial_pool(x):
    """2x2 max-pool over H, W only; T preserved (NDHWC)."""
    return nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2), padding="VALID")


class UNet3D(nn.Module):
    n_channels: int = 13
    n_classes: int = 2
    base: int = 32  # 3D convs are ~3x the FLOPs/param of 2D; narrower base
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    fold_bn: bool = False  # eval-only; see ops/fold_bn.py
    # Shift-invariant decoder upsample — every other op here is already
    # translation invariant at 16-px-aligned crops (SAME 3D convs,
    # spatial-only aligned pooling, pointwise temporal max/mean), so this
    # enables banded fully-convolutional serving (infer/fullconv.py).
    # Parameter-free; checkpoints are unaffected.
    local_upsample: bool = False

    @nn.compact
    def __call__(self, seq, train: bool = True):
        """seq: (N, T, H, W, C) -> (N, H, W, n_classes) change logits."""
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  fold_bn=self.fold_bn)
        b = self.base
        x = seq.astype(self.dtype)  # NDHWC with D = T

        x1 = DoubleConv3D(b, name="inc", **kw)(x, train)
        x2 = DoubleConv3D(2 * b, name="down1", **kw)(_spatial_pool(x1), train)
        x3 = DoubleConv3D(4 * b, name="down2", **kw)(_spatial_pool(x2), train)
        x4 = DoubleConv3D(8 * b, name="down3", **kw)(_spatial_pool(x3), train)
        x5 = DoubleConv3D(8 * b, name="down4", **kw)(_spatial_pool(x4), train)

        # collapse the temporal axis: max for skips, mean at the bottleneck
        s1, s2, s3, s4 = (jnp.max(v, axis=1) for v in (x1, x2, x3, x4))
        bott = jnp.mean(x5, axis=1)

        ukw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                   fold_bn=self.fold_bn, local_upsample=self.local_upsample)
        y = Up(4 * b, name="up1", **ukw)(bott, s4, train)
        y = Up(2 * b, name="up2", **ukw)(y, s3, train)
        y = Up(b, name="up3", **ukw)(y, s2, train)
        y = Up(b, name="up4", **ukw)(y, s1, train)
        logits = OutConv(self.n_classes, dtype=self.dtype, name="outc")(y)
        return logits.astype(jnp.float32)
