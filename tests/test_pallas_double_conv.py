"""Fused double_conv Pallas kernel (ops/pallas_double_conv.py): interpret-
mode correctness vs plain XLA, group/VMEM sizing, and the DoubleConv
integration path (fold_bn + use_pallas)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fabric_tpu.ops.pallas_double_conv import (
    double_conv3x3_bias_relu, reference_double_conv, supports, group_size,
    _row_chunk, _vmem_bytes)


def _case(seed, n, h, w, cin, cmid, cout):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(n, h, w, cin), jnp.float32),
            jnp.asarray(rng.randn(3, 3, cin, cmid) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(cmid) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(3, 3, cmid, cout) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(cout) * 0.1, jnp.float32))


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 16, 32, 32),     # asymmetric channels
    (1, 12, 20, 8, 8, 16),     # non-square, non-pow2
    (5, 16, 16, 32, 32, 32),   # group doesn't divide N (pad path)
    (3, 8, 8, 32, 32, 16),     # contracting output
])
def test_matches_xla_double_conv(shape):
    x, w1, b1, w2, b2 = _case(0, *shape)
    got = double_conv3x3_bias_relu(x, w1, b1, w2, b2)
    want = reference_double_conv(x, w1, b1, w2, b2)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_same_padding_borders_are_exact():
    """Border pixels exercise both convs' zero padding — the part the
    VMEM-resident intermediate must reproduce (its zero frame IS conv2's
    SAME padding)."""
    x, w1, b1, w2, b2 = _case(1, 1, 6, 6, 4, 4, 4)
    got = np.asarray(double_conv3x3_bias_relu(x, w1, b1, w2, b2))
    want = np.asarray(reference_double_conv(x, w1, b1, w2, b2))
    np.testing.assert_allclose(got[0, 0, :], want[0, 0, :], atol=1e-5)
    np.testing.assert_allclose(got[0, -1, :], want[0, -1, :], atol=1e-5)
    np.testing.assert_allclose(got[0, :, 0], want[0, :, 0], atol=1e-5)
    np.testing.assert_allclose(got[0, :, -1], want[0, :, -1], atol=1e-5)


def test_group_size_scales_with_depth():
    # deep tiny-spatial level: the 9.4 MB of 512ch weights cap the group
    # at 1, which measures FASTER than large groups (VMEM headroom lets
    # the cross-program pipeline overlap); narrower channels group up
    assert group_size(64, 16, 16, 512, 512, 512) >= 1
    assert group_size(64, 8, 8, 128, 128, 128) > 1
    # moderate spatial level: at least one image fits
    g64 = group_size(64, 64, 64, 128, 128, 128)
    assert g64 >= 1
    assert _vmem_bytes(g64, 64, 64, 128, 128, 128) < 13 * 1024 * 1024
    # 96^2 x 128ch working set (with double-buffered in/out blocks) does
    # NOT fit — supports() must reject it and the op falls back to XLA
    assert group_size(8, 96, 96, 128, 128, 128) == 0
    assert not supports((8, 96, 96, 128), 128, 128, 128)


def test_row_chunk_divides_and_bounds():
    for h, gw in [(64, 64), (96, 192), (16, 4096), (8, 64)]:
        rc = _row_chunk(h, gw)
        assert h % rc == 0
        assert rc * gw <= 4096 or rc == 1


def test_supports_rejects_tiny_spatial():
    assert not supports((1, 2, 2, 8), 8, 8, 8)


def test_doubleconv_module_uses_fused_kernel():
    """DoubleConv with fold_bn+use_pallas routes through the fused kernel
    and matches the plain folded path bit-for-bit in fp32."""
    from fabric_tpu.models.blocks import DoubleConv
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8), jnp.float32)
    plain = DoubleConv(16, dtype=jnp.float32, fold_bn=True)
    fused = DoubleConv(16, dtype=jnp.float32, fold_bn=True, use_pallas=True)
    variables = plain.init(jax.random.PRNGKey(0), x, False)
    # param trees are interchangeable (same conv1/conv2 kernel+bias layout)
    v2 = fused.init(jax.random.PRNGKey(0), x, False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))
    a = plain.apply(variables, x, False)
    b = fused.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
