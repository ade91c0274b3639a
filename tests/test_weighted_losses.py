"""Mask-padding exactness: losses/metrics over a zero-weight-padded batch
must equal the unpadded computation (the eval-batch contract)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fabric_tpu import losses
from fabric_tpu.metrics import confusion_counts


def _data(n=6, h=8, w=8, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(n, h, w, 2), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 2, (n, h, w)), jnp.int32)
    return logits, labels


def _padded(logits, labels, pad=3):
    zl = jnp.concatenate([logits, jnp.zeros((pad,) + logits.shape[1:])])
    ll = jnp.concatenate([labels, jnp.zeros((pad,) + labels.shape[1:],
                                            jnp.int32)])
    w = jnp.concatenate([jnp.ones(logits.shape[0]), jnp.zeros(pad)])
    return zl, ll, w


@pytest.mark.parametrize("fn,kw", [
    (losses.cross_entropy_loss, {}),
    (losses.weighted_bce_loss, {"pos_weight": 3.0}),
    (losses.focal_loss, {"gamma": 2.0, "alpha": 0.25}),
    (losses.dice_loss, {}),
    (losses.jaccard_loss, {}),
    (losses.tversky_loss, {"alpha": 0.1, "beta": 0.9}),
])
def test_padded_equals_unpadded(fn, kw):
    logits, labels = _data()
    plain = float(fn(logits, labels, **kw))
    pl_, ll, w = _padded(logits, labels)
    padded = float(fn(pl_, ll, weights=w, **kw))
    assert np.isclose(padded, plain, rtol=1e-5), (padded, plain)


def test_confusion_counts_padded_equal():
    logits, labels = _data(seed=1)
    preds = jnp.argmax(logits, -1)
    plain = {k: int(v) for k, v in confusion_counts(preds, labels).items()}
    pl_, ll, w = _padded(logits, labels)
    padded_preds = jnp.argmax(pl_, -1)
    padded = {k: int(v) for k, v in
              confusion_counts(padded_preds, ll, weights=w).items()}
    assert plain == padded
