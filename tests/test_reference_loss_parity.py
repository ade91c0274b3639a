"""Loss parity against the reference's own torch implementations
(/root/reference/utils/metrics.py, imported read-only as an oracle).

This covers the exact shipped behavior — including the (batch, H)-only
reduction quirk the soft losses exhibit with (B, H, W) labels (see
fabric_tpu/losses.py docstring) — which our ``compat_reference=True`` mode
must reproduce bit-for-bit for parity runs.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from fabric_tpu import losses

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "utils")),
    reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_metrics():
    sys.path.insert(0, REFERENCE)
    try:
        from utils import metrics as ref
    finally:
        sys.path.pop(0)
    return ref


def _data(seed=0, n=2, h=8, w=8):
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, h, w, 2).astype(np.float32)
    labels = rng.randint(0, 2, (n, h, w))
    lt = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(labels.astype(np.int64))
    return logits, labels, lt, tt


def test_tversky_compat_matches_reference(ref_metrics):
    logits, labels, lt, tt = _data(1)
    ref = float(ref_metrics.TverskyLoss(alpha=0.1, beta=0.9)(lt, tt))
    ours = float(losses.tversky_loss(jnp.asarray(logits), jnp.asarray(labels),
                                     alpha=0.1, beta=0.9,
                                     compat_reference=True))
    assert np.isclose(ours, ref, rtol=1e-5), (ours, ref)


def test_dice_compat_matches_reference(ref_metrics):
    logits, labels, lt, tt = _data(2)
    ref = float(ref_metrics.dice_loss(lt, tt))
    ours = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  compat_reference=True))
    assert np.isclose(ours, ref, rtol=1e-5), (ours, ref)


def test_jaccard_compat_matches_reference(ref_metrics):
    logits, labels, lt, tt = _data(3)
    ref = float(ref_metrics.jaccard_loss(lt, tt))
    ours = float(losses.jaccard_loss(jnp.asarray(logits), jnp.asarray(labels),
                                     compat_reference=True))
    assert np.isclose(ours, ref, rtol=1e-5), (ours, ref)


def test_focal_matches_reference(ref_metrics):
    logits, labels, lt, tt = _data(4)
    ref = float(ref_metrics.FocalLoss(gamma=2.0)(lt, tt))
    ours = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   gamma=2.0))
    assert np.isclose(ours, ref, rtol=1e-4), (ours, ref)


def test_focal_with_alpha_matches_reference(ref_metrics):
    logits, labels, lt, tt = _data(5)
    ref = float(ref_metrics.FocalLoss(gamma=1.5, alpha=0.25)(lt, tt))
    ours = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   gamma=1.5, alpha=0.25))
    assert np.isclose(ours, ref, rtol=1e-4), (ours, ref)
