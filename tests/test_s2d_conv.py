"""Exactness of the space-to-depth lane-packed conv forms (ops/s2d_conv).

The packing is pure algebra — a 3x3 SAME stride-1 conv re-tiled as a 2x2
VALID conv over phase-shifted 2x2 pixel blocks — so the results must match
the direct `lax.conv_general_dilated` to float rounding, including the
SAME zero-padding at borders and the chained (reshift) second conv.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fabric_tpu.ops import s2d_conv

DN = ("NHWC", "HWIO", "NHWC")


def _direct(x, k, b=None, relu=False):
    y = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                     dimension_numbers=DN)
    if b is not None:
        y = y + b
    return jax.nn.relu(y) if relu else y


@pytest.mark.parametrize("cin,cout,h", [(13, 16, 8), (16, 16, 12),
                                        (32, 16, 10), (5, 8, 16)])
def test_single_conv_exact(cin, cout, h):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, h + 2 if h % 4 else h, cin), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    got = s2d_conv.s2d_conv3x3(x, k, b, relu=True)
    want = _direct(x, k, b, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_double_conv_exact():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 12, 16, 9), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, 9, 16) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    got = s2d_conv.s2d_double_conv(x, k1, b1, k2, b2)
    want = _direct(_direct(x, k1, b1, relu=True), k2, b2, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_double_conv_split_extra_exact():
    # the split-concat decoder form: conv1 reads two sources by linearity
    rng = np.random.RandomState(2)
    skip = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    up = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, 32, 16) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    got = s2d_conv.s2d_double_conv(skip, k1[:, :, :16], b1, k2, b2,
                                   extra=up, k1_extra=k1[:, :, 16:])
    cat = jnp.concatenate([skip, up], axis=-1)
    want = _direct(_direct(cat, k1, b1, relu=True), k2, b2, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("pack_bwd", [False, True])
def test_lane_packed_grads_match_direct(pack_bwd):
    # the custom_vjp grads must equal the direct conv's exactly
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 96, 96, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)

    def packed(x, k, b):
        return (s2d_conv.conv3x3_lane_packed(x, k, b, pack_bwd) ** 2).sum()

    def direct(x, k, b):
        return (_direct(x, k, b) ** 2).sum()

    gp = jax.grad(packed, argnums=(0, 1, 2))(x, k, b)
    gd = jax.grad(direct, argnums=(0, 1, 2))(x, k, b)
    for a, want in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                                   atol=5e-3, rtol=1e-4)


def test_bidate_lane_pack_matches_direct():
    # lane_pack flips eligible convs (patch>=96, Cout<128) to the packed
    # path with the SAME parameter tree; logits must match to rounding in
    # both train and eval modes.
    from fabric_tpu.models.bidate import BiDateNet
    rng = np.random.RandomState(3)
    x1 = jnp.asarray(rng.randn(1, 96, 96, 13), jnp.float32)
    x2 = jnp.asarray(rng.randn(1, 96, 96, 13), jnp.float32)
    base = BiDateNet(dtype=jnp.float32)
    packed = BiDateNet(dtype=jnp.float32, lane_pack=True)
    variables = base.init(jax.random.PRNGKey(0), x1, x2, train=False)
    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else {}
        want = base.apply(variables, x1, x2, train=train, **kw)
        got = packed.apply(variables, x1, x2, train=train, **kw)
        if train:
            want, got = want[0], got[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=1e-4)


def test_supports_gate():
    assert s2d_conv.supports(96, 96, 13, 64)
    assert s2d_conv.supports(96, 96, 128, 64)
    assert s2d_conv.supports(128, 128, 64, 64)
    assert not s2d_conv.supports(97, 96, 64, 64)   # odd H
    assert not s2d_conv.supports(96, 96, 64, 128)  # lanes already full
    assert not s2d_conv.supports(64, 64, 64, 64)   # measured loss at 64
