"""Model tests: param-count parity with the reference architecture, output
shapes on odd sizes (90x90 patches), BN mode behavior, gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fabric_tpu.models import BiDateNet, build_model
from fabric_tpu.config import Config


def _init(model, n=2, h=32, w=32, c=13):
    x = jnp.zeros((n, h, w, c), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    return variables, x


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def _expected_param_count():
    """Analytic trainable-param count of the reference BiDateNet(13, 2):
    conv = 3*3*cin*cout + cout (bias), BN = 2*cout, computed from the layer
    plan at models/bidate_model.py:8-20."""
    def dc(cin, cout):
        return (9 * cin * cout + cout + 2 * cout) + (9 * cout * cout + cout + 2 * cout)
    total = dc(13, 64)            # inc
    total += dc(64, 128) + dc(128, 256) + dc(256, 512) + dc(512, 512)  # downs
    total += dc(1024, 256) + dc(512, 128) + dc(256, 64) + dc(128, 64)  # ups
    total += 1 * 1 * 64 * 2 + 2   # outconv
    return total


def test_param_count_matches_reference():
    model = BiDateNet()
    variables, _ = _init(model)
    got = _count(variables["params"])
    expected = _expected_param_count()
    assert got == expected, (got, expected)
    # NOTE: BASELINE.md's "~7.8M params" estimate is wrong; the reference
    # layer plan (bidate_model.py:8-20) works out to 13,401,154 trainable
    # params (convs with bias + affine BN), which this matches exactly.
    assert got == 13_401_154


def test_output_shape_odd_size():
    # 90x90 is the reference patch size; the encoder floors to 45/22/11/5
    # and the decoder must pad back up exactly (unet_parts.py:68-72).
    model = BiDateNet()
    variables, _ = _init(model, n=1, h=90, w=90)
    x = jnp.ones((1, 90, 90, 13))
    out = model.apply(variables, x, x, train=False)
    assert out.shape == (1, 90, 90, 2)
    assert out.dtype == jnp.float32


def test_shared_encoder_is_symmetric():
    # fusion relu(d2*d1) is commutative, so swapping dates must be exact
    model = BiDateNet()
    variables, _ = _init(model)
    rng = np.random.RandomState(0)
    a = jnp.array(rng.randn(2, 32, 32, 13), jnp.float32)
    b = jnp.array(rng.randn(2, 32, 32, 13), jnp.float32)
    out1 = model.apply(variables, a, b, train=False)
    out2 = model.apply(variables, b, a, train=False)
    assert np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_batchnorm_updates_in_train_mode():
    model = BiDateNet()
    variables, x = _init(model)
    rng = np.random.RandomState(1)
    a = jnp.array(rng.randn(2, 32, 32, 13) * 3 + 1, jnp.float32)
    out, mutated = model.apply(variables, a, a, train=True,
                               mutable=["batch_stats"])
    before = variables["batch_stats"]["inc"]["bn1"]["mean"]
    after = mutated["batch_stats"]["inc"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_per_date_bn_variant():
    model = BiDateNet(joint_date_batchnorm=False)
    variables, _ = _init(model)
    rng = np.random.RandomState(2)
    a = jnp.array(rng.randn(2, 32, 32, 13), jnp.float32)
    b = jnp.array(rng.randn(2, 32, 32, 13), jnp.float32)
    out, _ = model.apply(variables, a, b, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 32, 32, 2)
    # param count identical to the joint variant (same weights, shared)
    joint = BiDateNet()
    vj, _ = _init(joint)
    assert _count(variables["params"]) == _count(vj["params"])


def test_gradients_flow_everywhere():
    model = BiDateNet(base=8)  # small for speed
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(2, 16, 16, 13), jnp.float32)
    y = jnp.array(rng.randn(2, 16, 16, 13), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, y, train=False)

    def loss_fn(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             x, y, train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # every parameter (including the shared encoder's) must receive gradient
    nonzero = sum(bool(np.any(np.asarray(g) != 0)) for g in leaves)
    assert nonzero == len(leaves)


def test_bfloat16_compute_fp32_params():
    model = BiDateNet(dtype=jnp.bfloat16, base=8)
    x = jnp.ones((1, 16, 16, 13))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    out = model.apply(variables, x, x, train=False)
    assert out.dtype == jnp.float32  # logits promoted back for loss


def test_build_model_factory():
    cfg = Config(dtype="float32")
    model = build_model(cfg)
    assert isinstance(model, BiDateNet)
    with pytest.raises(ValueError):
        build_model(Config(model="nope"))


def test_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    from fabric_tpu.ops.resize import upsample2x_align_corners
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    ours = np.asarray(upsample2x_align_corners(jnp.array(x)))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    theirs = torch.nn.functional.interpolate(
        xt, scale_factor=2, mode="bilinear", align_corners=True)
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    assert np.allclose(ours, theirs, atol=1e-5)


def test_pad_to_match_matches_torch_fpad():
    from fabric_tpu.ops.resize import pad_to_match
    x = jnp.ones((1, 10, 10, 4))
    y = pad_to_match(x, 11, 13)
    assert y.shape == (1, 11, 13, 4)
    # torch F.pad semantics: before = diff//2, after = diff - diff//2.
    # diffY=1 -> rows (0 before, 1 after); diffX=3 -> cols (1 before, 2 after)
    np.testing.assert_array_equal(np.asarray(y[0, :10, 1:11, :]),
                                  np.ones((10, 10, 4)))
    assert float(jnp.sum(y[0, 10])) == 0.0       # bottom pad row
    assert float(jnp.sum(y[0, :, 0])) == 0.0     # left pad col
    assert float(jnp.sum(y[0, :, 11:])) == 0.0   # right pad cols


def test_split_up_concat_matches_concat_eval():
    """split_up_concat computes the Up blocks' first conv from the two
    concat sources directly (blocks._SplitDoubleConv); by linearity the
    eval logits must match the concat graph to fp accumulation noise, with
    an identical parameter tree (gated to lane-misaligned concats)."""
    rng = np.random.RandomState(0)
    d1 = jnp.asarray(rng.randn(2, 32, 32, 13), jnp.float32)
    d2 = jnp.asarray(rng.randn(2, 32, 32, 13), jnp.float32)
    base = BiDateNet(base=16, dtype=jnp.float32)
    variables, _ = _init(base)
    split = BiDateNet(base=16, dtype=jnp.float32, split_up_concat=True)
    la = base.apply(variables, d1, d2, train=False)
    lb = split.apply(variables, d1, d2, train=False)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               atol=1e-4, rtol=1e-4)
    # folded-BN bf16 serving graph: same agreement check through fold_bn
    from fabric_tpu.ops.fold_bn import fold_batchnorm
    folded = fold_batchnorm(variables["params"], variables["batch_stats"])
    fa = BiDateNet(base=16, dtype=jnp.bfloat16, fold_bn=True)
    fb = BiDateNet(base=16, dtype=jnp.bfloat16, fold_bn=True,
                   split_up_concat=True)
    va = {"params": folded, "batch_stats": {}}
    np.testing.assert_allclose(
        np.asarray(fa.apply(va, d1, d2, train=False), np.float32),
        np.asarray(fb.apply(va, d1, d2, train=False), np.float32),
        atol=0.15, rtol=0.1)
