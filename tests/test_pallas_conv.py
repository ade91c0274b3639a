"""Fused Pallas conv3x3+bias+ReLU: correctness vs XLA, model integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fabric_tpu.ops.pallas_conv import conv3x3_bias_relu, supports


def _xla_ref(x, k, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                       dimension_numbers=dn)
    return jax.nn.relu(out + b)


@pytest.mark.parametrize("n,h,w,cin,cout", [
    (2, 16, 24, 8, 16),     # small, unaligned width/channels
    (1, 32, 33, 13, 64),    # first-layer channel count, odd width
    (1, 48, 128, 64, 64),
])
def test_matches_xla(n, h, w, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, cin), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32) * 0.1
    b = jnp.asarray(rng.randn(cout), jnp.float32)
    assert supports(x.shape, cin, cout, 4)
    got = conv3x3_bias_relu(x, k, b)
    ref = _xla_ref(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_supports_guards():
    assert not supports((1, 20, 20, 8), 8, 8)      # H not /16
    assert not supports((1, 32, 2048, 1024), 1024, 1024)  # VMEM blow-up
    assert supports((1, 128, 128, 128), 128, 128)


def test_bidate_pallas_conv_inference_matches():
    from fabric_tpu.models import BiDateNet
    from fabric_tpu.ops.fold_bn import fold_batchnorm
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(1, 32, 32, 13), jnp.float32)
    b = jnp.asarray(rng.randn(1, 32, 32, 13), jnp.float32)
    plain = BiDateNet(base=8)
    variables = plain.init(jax.random.PRNGKey(0), a, b, train=False)
    _, mut = plain.apply(variables, a, b, train=True,
                         mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}
    ref = plain.apply(variables, a, b, train=False)

    folded = fold_batchnorm(variables["params"], variables["batch_stats"])
    pallas_model = BiDateNet(base=8, fold_bn=True, use_pallas=True)
    got = pallas_model.apply({"params": folded, "batch_stats": {}},
                             a, b, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)
