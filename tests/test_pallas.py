"""Pallas fused-kernel correctness (interpret mode on CPU; the same kernels
compile to Mosaic on TPU — benchmarked in bench.py per SURVEY.md §7 stage 8)."""

import numpy as np

import jax.numpy as jnp

from fabric_tpu.ops.pallas_fused import fused_mul_relu, bn_relu_inference


def test_fused_mul_relu_matches_xla():
    rng = np.random.RandomState(0)
    a = jnp.array(rng.randn(2, 17, 23, 64), jnp.float32)
    b = jnp.array(rng.randn(2, 17, 23, 64), jnp.float32)
    got = fused_mul_relu(a, b)
    expected = jnp.maximum(a * b, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-6)
    assert got.shape == a.shape


def test_fused_mul_relu_odd_sizes():
    rng = np.random.RandomState(1)
    a = jnp.array(rng.randn(3, 7, 11, 5), jnp.float32)  # not lane-aligned
    b = jnp.array(rng.randn(3, 7, 11, 5), jnp.float32)
    got = fused_mul_relu(a, b)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.maximum(a * b, 0)), atol=1e-6)


def test_bn_relu_inference_matches_formula():
    rng = np.random.RandomState(2)
    x = jnp.array(rng.randn(2, 9, 9, 32), jnp.float32)
    scale = jnp.array(rng.rand(32) + 0.5, jnp.float32)
    bias = jnp.array(rng.randn(32), jnp.float32)
    mean = jnp.array(rng.randn(32), jnp.float32)
    var = jnp.array(rng.rand(32) + 0.1, jnp.float32)
    got = bn_relu_inference(x, scale, bias, mean, var, eps=1e-5)
    inv = scale / jnp.sqrt(var + 1e-5)
    expected = jnp.maximum((x - mean) * inv + bias, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_bidate_with_pallas_fusion_matches():
    import jax
    from fabric_tpu.models import BiDateNet
    rng = np.random.RandomState(3)
    a = jnp.array(rng.randn(1, 16, 16, 13), jnp.float32)
    b = jnp.array(rng.randn(1, 16, 16, 13), jnp.float32)
    plain = BiDateNet(base=8, use_pallas=False)
    variables = plain.init(jax.random.PRNGKey(0), a, b, train=False)
    fused = BiDateNet(base=8, use_pallas=True)
    out_plain = plain.apply(variables, a, b, train=False)
    out_fused = fused.apply(variables, a, b, train=False)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_fused),
                               atol=1e-5)
