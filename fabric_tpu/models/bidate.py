"""Siamese bi-date U-Net for change detection, in Flax (NHWC).

Re-derivation of the reference architecture at
/root/reference/models/bidate_model.py:7-40: a shared-weight encoder
(inc 13->64, down x4: 64->128->256->512->512) applied to both dates, per-level
multiplicative-ReLU fusion ``relu(feat_d2 * feat_d1)``, and a skip-connected
decoder (up 1024->256, 512->128, 256->64, 128->64) with a 1x1 output head.

Weight sharing is expressed the linen way: each encoder stage is a single
submodule applied to both dates inside ``__call__`` — one parameter set, two
activations.  The two dates are stacked into the batch axis for the encoder
so every conv runs at 2N batch (bigger MXU tiles, one XLA fusion region)
instead of tracing the encoder twice.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from fabric_tpu.models.blocks import DoubleConv, Down, Up, OutConv

Dtype = type(jnp.float32)


def fuse(a, b, use_pallas: bool = False):
    """Multiplicative-ReLU Siamese fusion: relu(b * a) (bidate_model.py:35-38)."""
    if use_pallas:
        from fabric_tpu.ops.pallas_fused import fused_mul_relu
        return fused_mul_relu(b, a)
    return nn.relu(b * a)


class BiDateNet(nn.Module):
    n_channels: int = 13
    n_classes: int = 2
    base: int = 64
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    use_pallas: bool = False
    fold_bn: bool = False  # BN folded into conv weights (ops/fold_bn.py)
    # Rematerialize each encoder/decoder stage in the backward pass —
    # trades ~1/3 more FLOPs for activation memory, enabling much larger
    # batch/patch sizes per chip (jax.checkpoint via nn.remat).
    remat: bool = False
    # True (default): stack dates into the batch axis so the shared encoder
    # runs once at 2N batch — bigger MXU tiles, one fusion region.  Train-mode
    # BatchNorm then uses joint two-date batch statistics.  False: apply the
    # encoder per date, which reproduces the reference's per-date BN batch
    # statistics (bidate_model.py:23-33) exactly, at the cost of two encoder
    # launches.  Eval mode is identical either way (running averages).
    joint_date_batchnorm: bool = True
    # Eval-only decoder optimization: first conv of each Up block reads its
    # two concat sources directly (linearity) instead of materializing the
    # channel concat — skips an HBM round-trip of the widest decoder tensor
    # (measured 1.29x on up4's shape on the v5e).  Same math up to fp32
    # accumulation order; identical parameter tree.
    split_up_concat: bool = False
    # Space-to-depth lane packing for Cout=64 full-res convs
    # (ops/s2d_conv.py; wins 1.42x per isolated conv at patch>=96 but
    # measured a net LOSS in the full graph — see BASELINE.md; off in
    # production).  lane_pack_bwd additionally packs the dgrad convs.
    lane_pack: bool = False
    lane_pack_bwd: bool = False
    # Shift-invariant decoder upsample (ops/resize.upsample2x_local) so the
    # whole network commutes with 16-px-aligned scene crops — the property
    # the banded fully-convolutional scene mode (infer/fullconv.py) relies
    # on.  Off by default: align-corners matches the reference (and the
    # torch-weight-transfer parity oracle).
    local_upsample: bool = False

    @nn.compact
    def __call__(self, x_d1, x_d2, train: bool = True):
        """x_d1, x_d2: (N, H, W, n_channels) NHWC. Returns float32 logits
        (N, H, W, n_classes)."""
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  use_pallas=self.use_pallas, fold_bn=self.fold_bn,
                  lane_pack=self.lane_pack,
                  lane_pack_bwd=self.lane_pack_bwd)
        b = self.base
        DC, Dn, UpB = DoubleConv, Down, Up
        if self.remat and train:
            DC = nn.remat(DoubleConv, static_argnums=(2,))
            Dn = nn.remat(Down, static_argnums=(2,))
            UpB = nn.remat(Up, static_argnums=(3,))
        inc = DC(b, name="inc", **kw)
        down1 = Dn(2 * b, name="down1", **kw)
        down2 = Dn(4 * b, name="down2", **kw)
        down3 = Dn(8 * b, name="down3", **kw)
        down4 = Dn(8 * b, name="down4", **kw)

        def encode(x):
            x1 = inc(x, train)
            x2 = down1(x1, train)
            x3 = down2(x2, train)
            x4 = down3(x3, train)
            x5 = down4(x4, train)
            return x1, x2, x3, x4, x5

        if self.joint_date_batchnorm or not train:
            n = x_d1.shape[0]
            x = jnp.concatenate([x_d1, x_d2], axis=0).astype(self.dtype)
            x1, x2, x3, x4, x5 = encode(x)
            d1 = (x1[:n], x2[:n], x3[:n], x4[:n], x5[:n])
            d2 = (x1[n:], x2[n:], x3[n:], x4[n:], x5[n:])
        else:
            d1 = encode(x_d1.astype(self.dtype))
            d2 = encode(x_d2.astype(self.dtype))

        f1, f2, f3, f4, f5 = (fuse(a, b_, self.use_pallas)
                              for a, b_ in zip(d1, d2))

        ukw = dict(kw, split_concat=self.split_up_concat,
                   local_upsample=self.local_upsample)
        y = UpB(4 * b, name="up1", **ukw)(f5, f4, train)
        y = UpB(2 * b, name="up2", **ukw)(y, f3, train)
        y = UpB(b, name="up3", **ukw)(y, f2, train)
        y = UpB(b, name="up4", **ukw)(y, f1, train)
        logits = OutConv(self.n_classes, dtype=self.dtype, name="outc")(y)
        return logits.astype(jnp.float32)
