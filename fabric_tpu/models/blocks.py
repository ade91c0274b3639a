"""U-Net building blocks in Flax, NHWC, TPU-first.

Functional re-derivation of the reference blocks at
/root/reference/models/unet_parts.py — ``double_conv`` (:8-23), ``inconv``
(:26), ``down`` (:36), ``up`` (:49-80), ``outconv`` (:83) — with TPU-native
choices: NHWC layout (XLA:TPU's preferred conv layout), bfloat16 compute with
float32 params and float32 BatchNorm statistics, align-corners upsampling as
MXU matmuls, and an optional Pallas fused scale-bias-ReLU epilogue.

BatchNorm semantics: torch defaults (momentum 0.1 on the *new* batch stat,
eps 1e-5, unbiased variance in the running update) are reproduced exactly by
``TorchBatchNorm`` below — one-SGD-step training parity with the reference is
asserted by tests/test_reference_train_parity.py.  Under jit SPMD the batch
axis is global, so BN batch statistics are cross-device ("sync BN") by
construction; ``bn_axis_name``/pmean only matters under shard_map/pmap.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fabric_tpu.ops.resize import (upsample2x_align_corners,
                                   upsample2x_local, pad_to_match)

Dtype = type(jnp.float32)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch ``nn.BatchNorm2d`` running-stat semantics.

    flax ``nn.BatchNorm`` feeds the *biased* batch variance into the running
    average; torch uses the *unbiased* (n/(n-1)-corrected) variance there
    while normalizing with the biased one.  The reference trains with torch
    BN (models/unet_parts.py:14-18), so one-step training parity
    (tests/test_reference_train_parity.py) requires the torch update rule.
    Parameter/collection layout matches ``nn.BatchNorm`` exactly
    (params: scale/bias; batch_stats: mean/var) so checkpoints, weight
    transfer, and ops/fold_bn.py are unaffected.

    Statistics are always computed/stored in float32 regardless of the
    compute dtype.  ``axis_name`` cross-device reduction is only meaningful
    under shard_map/pmap; under jit SPMD the batch axis is global already.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        feats = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feats, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feats, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feats,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feats,),
                          jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(jnp.square(xf), axes)
            if self.axis_name is not None:
                import jax
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        inv = (var + self.epsilon) ** -0.5
        y = (x.astype(jnp.float32) - mean) * (inv * scale) + bias
        return y.astype(self.dtype)


class DoubleConv(nn.Module):
    """(3x3 conv -> BN -> ReLU) x 2, SAME padding (unet_parts.py:8-23)."""

    features: int
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    use_pallas: bool = False
    # fold_bn: the caller folded BN into the conv weights (ops/fold_bn.py);
    # skip the BN modules entirely so eval is conv -> ReLU (single fused
    # MXU op).  Only valid with train=False.
    fold_bn: bool = False
    # lane_pack: compute Cout<128 3x3 convs in space-to-depth(2) layout
    # (ops/s2d_conv.py) — 4x the channels fill the MXU lanes.  Measured
    # 1.42x per ISOLATED conv at patch>=96 but 1.6-2.1x SLOWER in the
    # full train graph (layout shuffles break XLA's conv+BN fusions; see
    # BASELINE.md r3 analysis) — kept off in production, retained so the
    # measurement is reproducible.  Gradients are hand-written
    # (custom_vjp, direct-form convs); lane_pack_bwd additionally
    # computes the dgrad conv in packed form.
    lane_pack: bool = False
    lane_pack_bwd: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.fold_bn and self.use_pallas:
            assert not train, "fold_bn is an inference-only transform"
            from fabric_tpu.ops.pallas_double_conv import (
                supports as supports_double)
            if supports_double(x.shape, x.shape[-1], self.features,
                               self.features, x.dtype.itemsize):
                # fully-fused double_conv: both convs in ONE Pallas kernel,
                # intermediate resident in VMEM (the r1 north star); the
                # param holders keep the exact nn.Conv scope layout
                # ('conv1'/'conv2' with kernel+bias) so fold_bn weights
                # drop in unchanged
                from fabric_tpu.ops.pallas_double_conv import (
                    double_conv3x3_bias_relu)
                k1, b1 = _Conv3x3Params(self.features,
                                        name="conv1")(x.shape[-1])
                k2, b2 = _Conv3x3Params(self.features,
                                        name="conv2")(self.features)
                return double_conv3x3_bias_relu(
                    x.astype(self.dtype), k1.astype(self.dtype), b1,
                    k2.astype(self.dtype), b2)
        for i in range(2):
            if self.fold_bn and self.use_pallas:
                import jax
                from fabric_tpu.ops.pallas_conv import supports
                # the single-conv kernel measured ~88% of XLA per layer and
                # 2x slower end-to-end on the real chip (breaks XLA fusion
                # clusters — r1 measurement, ops/pallas_conv.py docstring);
                # on TPU, use_pallas therefore means "fused double_conv
                # where it wins, XLA elsewhere".  Interpret mode keeps
                # exercising the single-conv path.
                single_ok = jax.default_backend() != "tpu"
                if single_ok and supports(x.shape, x.shape[-1],
                                          self.features, x.dtype.itemsize):
                    # fused conv+bias+relu Pallas kernel; same param tree
                    # ('convN'/kernel+bias) as nn.Conv
                    x = _PallasConvRelu(self.features, dtype=self.dtype,
                                        name=f"conv{i + 1}")(x)
                    continue
            if self.lane_pack:
                from fabric_tpu.ops import s2d_conv
                if s2d_conv.supports(x.shape[-3], x.shape[-2],
                                     x.shape[-1], self.features):
                    k, bias = _Conv3x3Params(self.features,
                                             name=f"conv{i + 1}")(x.shape[-1])
                    x = s2d_conv.conv3x3_lane_packed(
                        x.astype(self.dtype), k.astype(self.dtype), bias,
                        self.lane_pack_bwd)
                    if self.fold_bn:
                        assert not train
                        x = nn.relu(x).astype(self.dtype)
                    else:
                        x = self._bn_relu(x, train, i)
                    continue
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            if self.fold_bn:
                assert not train, "fold_bn is an inference-only transform"
                x = nn.relu(x).astype(self.dtype)
            else:
                x = self._bn_relu(x, train, i)
        return x

    def _bn_relu(self, x, train: bool, i: int):
        # For the BN-free inference fast path, see
        # fabric_tpu/ops/fold_bn.py (folds BN into conv weights so XLA can
        # fuse the remaining ReLU into the conv epilogue on TPU).
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32,
                           axis_name=self.bn_axis_name if train else None,
                           name=f"bn{i + 1}")(x)
        return nn.relu(x).astype(self.dtype)


class _Conv3x3Params(nn.Module):
    """Parameter holder laid out exactly like nn.Conv (kernel HWIO + bias)
    so fold_bn param trees drop into the Pallas modules unchanged."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _PallasConvRelu(nn.Module):
    """Fused conv3x3+bias+ReLU via ops/pallas_conv.py, parameter-compatible
    with nn.Conv (same 'kernel'/'bias' names, so the fold_bn param tree
    drops in unchanged)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from fabric_tpu.ops.pallas_conv import conv3x3_bias_relu
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return conv3x3_bias_relu(x.astype(self.dtype),
                                 kernel.astype(self.dtype), bias)


class Down(nn.Module):
    """2x2 max-pool then DoubleConv (unet_parts.py:36-46)."""

    features: int
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    use_pallas: bool = False
    fold_bn: bool = False
    lane_pack: bool = False
    lane_pack_bwd: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        return DoubleConv(self.features, self.dtype, self.bn_axis_name,
                          self.use_pallas, self.fold_bn, self.lane_pack,
                          self.lane_pack_bwd, name="conv")(x, train)


class Up(nn.Module):
    """Bilinear 2x align-corners upsample, pad-to-skip, concat, DoubleConv
    (unet_parts.py:49-80).  Channel concat order is [skip, upsampled],
    matching ``torch.cat([x2, x1], dim=1)`` at unet_parts.py:78.

    ``split_concat``: compute the block's first conv as
    ``conv(skip, K[:, :, :Cs]) + conv(up, K[:, :, Cs:])`` instead of
    materializing ``concat([skip, up])`` — same math (conv is linear in the
    input channels; the only difference is fp32-accumulation order), same
    parameter tree, but skips an HBM round-trip of the widest decoder
    tensor.  Only applied where the concat is LANE-MISALIGNED (skip
    channels not a multiple of 128): measured on the v5e, split wins 1.29x
    at up4 (64+64 concat straddles a lane tile) but LOSES 0.79x at up3
    (128+128 concat is layout-free while splitting halves each conv's
    contraction depth).  Eval-only; training keeps the reference-shaped
    graph."""

    features: int
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    use_pallas: bool = False
    fold_bn: bool = False
    split_concat: bool = False
    lane_pack: bool = False
    lane_pack_bwd: bool = False
    # Shift-invariant 2x upsample (ops/resize.upsample2x_local) instead of
    # the reference's align-corners grid — required by the banded
    # fully-convolutional scene mode (infer/fullconv.py), where the
    # network must commute with scene crops.  Parameter-free either way;
    # checkpoints are unaffected.
    local_upsample: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        x1 = (upsample2x_local(x1) if self.local_upsample
              else upsample2x_align_corners(x1))
        x1 = pad_to_match(x1, x2.shape[-3], x2.shape[-2])
        if self.split_concat and not train and x2.shape[-1] % 128:
            return _SplitDoubleConv(self.features, self.dtype,
                                    name="conv")(x2, x1, self.fold_bn)
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.features, self.dtype, self.bn_axis_name,
                          self.use_pallas, self.fold_bn, self.lane_pack,
                          self.lane_pack_bwd, name="conv")(x, train)


class _SplitDoubleConv(nn.Module):
    """DoubleConv whose first conv reads its two concat sources directly:
    ``conv(concat([skip, up]), K) == conv(skip, K[:, :, :Cs]) +
    conv(up, K[:, :, Cs:])`` by linearity.  Parameter/collection layout is
    IDENTICAL to ``DoubleConv`` (conv1/conv2 kernel+bias, bn1/bn2), so any
    checkpoint drops in unchanged; eval-only."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip, up, fold_bn: bool):
        cs = skip.shape[-1]
        cin = cs + up.shape[-1]
        dn = ("NHWC", "HWIO", "NHWC")
        k1, b1 = _Conv3x3Params(self.features, name="conv1")(cin)
        k1 = k1.astype(self.dtype)
        y = (jax.lax.conv_general_dilated(
                skip, k1[:, :, :cs, :], (1, 1), "SAME",
                dimension_numbers=dn)
             + jax.lax.conv_general_dilated(
                up, k1[:, :, cs:, :], (1, 1), "SAME",
                dimension_numbers=dn)
             + b1.astype(self.dtype))
        y = self._epilogue(y, fold_bn, 0)
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv2")(y)
        return self._epilogue(y, fold_bn, 1)

    def _epilogue(self, x, fold_bn: bool, i: int):
        if fold_bn:
            return nn.relu(x).astype(self.dtype)
        x = TorchBatchNorm(use_running_average=True, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32,
                           name=f"bn{i + 1}")(x)
        return nn.relu(x).astype(self.dtype)


class OutConv(nn.Module):
    """1x1 projection to class logits (unet_parts.py:83-89)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="conv")(x)
