"""U-Net building blocks in Flax, NHWC, TPU-first.

Functional re-derivation of the reference blocks at
/root/reference/models/unet_parts.py — ``double_conv`` (:8-23), ``inconv``
(:26), ``down`` (:36), ``up`` (:49-80), ``outconv`` (:83) — with TPU-native
choices: NHWC layout (XLA:TPU's preferred conv layout), bfloat16 compute with
float32 params and float32 BatchNorm statistics, align-corners upsampling as
MXU matmuls, and an optional Pallas fused scale-bias-ReLU epilogue.

BatchNorm semantics: torch defaults (momentum 0.1 on the *new* batch stat,
eps 1e-5) map to flax ``momentum=0.9``.  ``bn_axis_name`` enables cross-
device (sync) BN via pmean; leaving it None matches the reference's
per-replica DataParallel behavior (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from fabric_tpu.ops.resize import upsample2x_align_corners, pad_to_match

Dtype = type(jnp.float32)


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

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(2):
            if self.fold_bn and self.use_pallas:
                assert not train, "fold_bn is an inference-only transform"
                from fabric_tpu.ops.pallas_conv import supports
                if supports(x.shape, x.shape[-1], self.features,
                            x.dtype.itemsize):
                    # fused conv+bias+relu Pallas kernel; same param tree
                    # ('convN'/kernel+bias) as nn.Conv
                    x = _PallasConvRelu(self.features, dtype=self.dtype,
                                        name=f"conv{i + 1}")(x)
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
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         axis_name=self.bn_axis_name if train else None,
                         name=f"bn{i + 1}")(x)
        return nn.relu(x).astype(self.dtype)


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

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        return DoubleConv(self.features, self.dtype, self.bn_axis_name,
                          self.use_pallas, self.fold_bn, name="conv")(x, train)


class Up(nn.Module):
    """Bilinear 2x align-corners upsample, pad-to-skip, concat, DoubleConv
    (unet_parts.py:49-80).  Channel concat order is [skip, upsampled],
    matching ``torch.cat([x2, x1], dim=1)`` at unet_parts.py:78."""

    features: int
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    use_pallas: bool = False
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        x1 = upsample2x_align_corners(x1)
        x1 = pad_to_match(x1, x2.shape[-3], x2.shape[-2])
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.features, self.dtype, self.bn_axis_name,
                          self.use_pallas, self.fold_bn, name="conv")(x, train)


class OutConv(nn.Module):
    """1x1 projection to class logits (unet_parts.py:83-89)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="conv")(x)
