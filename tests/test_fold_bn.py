"""BN folding must be numerically equivalent to eval-mode BN."""

import numpy as np

import jax
import jax.numpy as jnp

from fabric_tpu.models import BiDateNet
from fabric_tpu.ops.fold_bn import fold_batchnorm


def test_folded_matches_eval_bn():
    model = BiDateNet(base=8)
    rng = np.random.RandomState(0)
    a = jnp.array(rng.randn(2, 16, 16, 13), jnp.float32)
    b = jnp.array(rng.randn(2, 16, 16, 13), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), a, b, train=False)
    # make stats non-trivial (fresh init has mean=0, var=1)
    _, mutated = model.apply(variables, a, b, train=True,
                             mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}

    reference_out = model.apply(variables, a, b, train=False)

    folded_params = fold_batchnorm(variables["params"],
                                   variables["batch_stats"])
    folded_model = BiDateNet(base=8, fold_bn=True)
    folded_out = folded_model.apply(
        {"params": folded_params, "batch_stats": {}}, a, b, train=False)

    np.testing.assert_allclose(np.asarray(folded_out),
                               np.asarray(reference_out), atol=2e-4)


def test_folded_param_tree_has_no_bn():
    model = BiDateNet(base=8)
    x = jnp.zeros((1, 16, 16, 13))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    folded = fold_batchnorm(variables["params"], variables["batch_stats"])
    flat = jax.tree_util.tree_flatten_with_path(folded)[0]
    keys = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("bn" in k for k in keys)
    # folded tree must be a valid params tree for the fold_bn model
    folded_model = BiDateNet(base=8, fold_bn=True)
    out = folded_model.apply({"params": folded, "batch_stats": {}},
                             x, x, train=False)
    assert out.shape == (1, 16, 16, 2)


def test_folded_leaves_are_committed_device_arrays():
    """The folded tree must be DEVICE-resident: it is passed as an
    argument into the jitted scene runners on every call, and host-numpy
    leaves would re-upload the full weight set per scene (measured
    79 -> 28 Mpx/s through the axon tunnel when the fold briefly
    returned numpy).  The fold MATH stays host numpy for cross-platform
    bit-determinism (the AOT weights fingerprint relies on it)."""
    model = BiDateNet(base=8)
    x = jnp.zeros((1, 16, 16, 13))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    folded = fold_batchnorm(variables["params"], variables["batch_stats"])
    for path, leaf in jax.tree_util.tree_flatten_with_path(folded)[0]:
        assert isinstance(leaf, jax.Array), (path, type(leaf))
        assert leaf.committed or len(leaf.devices()) == 1, path


def test_fold_is_bit_deterministic_run_to_run():
    """Two folds of the same checkpoint must agree byte-for-byte — the
    AOT startup check compares sha256 fingerprints across processes (and
    across the platform that folded: numpy float64 math, not jnp)."""
    model = BiDateNet(base=8)
    x = jnp.zeros((1, 16, 16, 13))
    variables = model.init(jax.random.PRNGKey(2), x, x, train=False)
    a = fold_batchnorm(variables["params"], variables["batch_stats"])
    b = fold_batchnorm(variables["params"], variables["batch_stats"])
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(a)[0],
            jax.tree_util.tree_flatten_with_path(b)[0]):
        assert pa == pb
        assert np.asarray(la).tobytes() == np.asarray(lb).tobytes(), pa


def test_fold_bn_unet_lstm_and_3d():
    """BN folding extends to the multi-date variants: folded eval logits
    match the unfolded eval forward (the ConvLSTM gates / temporal
    collapses carry no BN and pass through unchanged)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fabric_tpu.models.unet_lstm import UNetLSTM
    from fabric_tpu.models.unet3d import UNet3D
    from fabric_tpu.ops.fold_bn import fold_batchnorm

    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.randn(2, 3, 32, 32, 13), jnp.float32)
    for cls, base in ((UNetLSTM, 16), (UNet3D, 8)):
        model = cls(base=base, dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), seq, train=False)
        # make BN stats non-trivial so the fold actually does work
        stats = jax.tree_util.tree_map(
            lambda v: v + 0.1 * np.random.RandomState(1).standard_normal(
                v.shape).astype(np.float32),
            variables["batch_stats"])
        ref = model.apply({"params": variables["params"],
                           "batch_stats": stats}, seq, train=False)
        folded = fold_batchnorm(variables["params"], stats)
        fm = cls(base=base, dtype=jnp.float32, fold_bn=True)
        got = fm.apply({"params": folded, "batch_stats": {}}, seq,
                       train=False)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=2e-4, rtol=2e-4)
