"""Rematerialization must not change outputs or gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from fabric_tpu.models import BiDateNet


def test_remat_matches_plain():
    rng = np.random.RandomState(0)
    a = jnp.array(rng.randn(2, 16, 16, 13), jnp.float32)
    b = jnp.array(rng.randn(2, 16, 16, 13), jnp.float32)
    plain = BiDateNet(base=8)
    remat = BiDateNet(base=8, remat=True)
    variables = plain.init(jax.random.PRNGKey(0), a, b, train=False)

    def loss(model, params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             a, b, train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(plain, p))(variables["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(variables["params"])
    assert np.isclose(float(l1), float(l2), rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)
