"""Golden-value tests for losses against independent numpy formulations.

The expected values are computed here from the published formulas (softmax
CE, focal, soft dice/jaccard/tversky) in plain numpy — not from the
reference's code — and, where shapes allow, cross-checked against torch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fabric_tpu import losses
from fabric_tpu.config import Config


def _softmax_np(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _rand(seed=0, n=2, h=8, w=8, c=2):
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, h, w, c).astype(np.float32)
    labels = rng.randint(0, c, size=(n, h, w)).astype(np.int32)
    return logits, labels


def test_cross_entropy_matches_numpy():
    logits, labels = _rand(1)
    p = _softmax_np(logits)
    expected = -np.mean(np.log(
        np.take_along_axis(p, labels[..., None], axis=-1)[..., 0]))
    got = float(losses.cross_entropy_loss(jnp.array(logits), jnp.array(labels)))
    assert np.isclose(got, expected, rtol=1e-5)


def test_weighted_bce_upweights_change():
    logits, labels = _rand(2)
    plain = float(losses.weighted_bce_loss(jnp.array(logits), jnp.array(labels), 1.0))
    ce = float(losses.cross_entropy_loss(jnp.array(logits), jnp.array(labels)))
    assert np.isclose(plain, ce, rtol=1e-6)
    up = float(losses.weighted_bce_loss(jnp.array(logits), jnp.array(labels), 5.0))
    assert up != plain


def test_focal_gamma0_equals_ce():
    logits, labels = _rand(3)
    f0 = float(losses.focal_loss(jnp.array(logits), jnp.array(labels), gamma=0.0))
    ce = float(losses.cross_entropy_loss(jnp.array(logits), jnp.array(labels)))
    assert np.isclose(f0, ce, rtol=1e-5)


def test_focal_matches_numpy():
    logits, labels = _rand(4)
    gamma, alpha = 2.0, 0.25
    p = _softmax_np(logits.reshape(-1, 2))
    ll = labels.reshape(-1)
    pt = np.take_along_axis(p, ll[:, None], axis=-1)[:, 0]
    at = np.where(ll == 0, alpha, 1 - alpha)
    expected = np.mean(-((1 - pt) ** gamma) * np.log(pt) * at)
    got = float(losses.focal_loss(jnp.array(logits), jnp.array(labels),
                                  gamma=gamma, alpha=alpha))
    assert np.isclose(got, expected, rtol=1e-4)


def _soft_np(logits, labels, axes):
    p = _softmax_np(logits)
    t = np.eye(2, dtype=np.float64)[labels]
    inter = (p * t).sum(axis=axes)
    card = (p + t).sum(axis=axes)
    return p, t, inter, card


@pytest.mark.parametrize("compat", [False, True])
def test_dice_matches_numpy(compat):
    logits, labels = _rand(5)
    axes = (0, 1) if compat else (0, 1, 2)
    _, _, inter, card = _soft_np(logits, labels, axes)
    expected = 1 - np.mean(2 * inter / (card + 1e-7))
    got = float(losses.dice_loss(jnp.array(logits), jnp.array(labels),
                                 compat_reference=compat))
    assert np.isclose(got, expected, rtol=1e-5)


@pytest.mark.parametrize("compat", [False, True])
def test_jaccard_matches_numpy(compat):
    logits, labels = _rand(6)
    axes = (0, 1) if compat else (0, 1, 2)
    _, _, inter, card = _soft_np(logits, labels, axes)
    expected = 1 - np.mean(inter / (card - inter + 1e-7))
    got = float(losses.jaccard_loss(jnp.array(logits), jnp.array(labels),
                                    compat_reference=compat))
    assert np.isclose(got, expected, rtol=1e-5)


@pytest.mark.parametrize("alpha,beta", [(0.5, 0.5), (0.1, 0.9)])
def test_tversky_matches_numpy(alpha, beta):
    logits, labels = _rand(7)
    p = _softmax_np(logits)
    t = np.eye(2, dtype=np.float64)[labels]
    axes = (0, 1, 2)
    inter = (p * t).sum(axis=axes)
    fps = (p * (1 - t)).sum(axis=axes)
    fns = ((1 - p) * t).sum(axis=axes)
    expected = 1 - np.mean(inter / (inter + alpha * fps + beta * fns + 1e-7))
    got = float(losses.tversky_loss(jnp.array(logits), jnp.array(labels),
                                    alpha=alpha, beta=beta))
    assert np.isclose(got, expected, rtol=1e-5)


def test_tversky_half_half_is_dice():
    logits, labels = _rand(8)
    tv = float(losses.tversky_loss(jnp.array(logits), jnp.array(labels), 0.5, 0.5))
    di = float(losses.dice_loss(jnp.array(logits), jnp.array(labels)))
    assert np.isclose(tv, di, rtol=1e-5)


def test_torch_cross_check_tversky():
    """Independent torch formulation (softmax over class axis, NCHW)."""
    torch = pytest.importorskip("torch")
    logits, labels = _rand(9)
    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tt = torch.from_numpy(labels.astype(np.int64))
    p = torch.softmax(lt, dim=1)
    t = torch.nn.functional.one_hot(tt, 2).permute(0, 3, 1, 2).double()
    dims = (0, 2, 3)
    inter = (p.double() * t).sum(dims)
    fps = (p.double() * (1 - t)).sum(dims)
    fns = ((1 - p.double()) * t).sum(dims)
    expected = 1 - (inter / (inter + 0.1 * fps + 0.9 * fns + 1e-7)).mean().item()
    got = float(losses.tversky_loss(jnp.array(logits), jnp.array(labels), 0.1, 0.9))
    assert np.isclose(got, expected, rtol=1e-5)


def test_get_loss_fn_dispatch():
    logits, labels = _rand(10)
    for name in ["bce", "wbce", "focal", "dice", "jaccard", "tversky"]:
        cfg = Config(loss_function=name)
        fn = losses.get_loss_fn(cfg)
        val = float(fn(jnp.array(logits), jnp.array(labels)))
        assert np.isfinite(val) and 0 <= val < 10


def test_losses_are_differentiable():
    import jax
    logits, labels = _rand(11)
    cfg = Config(loss_function="tversky")
    fn = losses.get_loss_fn(cfg)
    g = jax.grad(lambda lg: fn(lg, jnp.array(labels)))(jnp.array(logits))
    assert np.all(np.isfinite(np.asarray(g)))
