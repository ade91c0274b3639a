"""Segmentation losses in JAX, matching the reference formulas.

Reference implementations live at /root/reference/utils/metrics.py:
``FocalLoss`` (:8-48), ``dice_loss`` (:51-83), ``jaccard_loss`` (:86-119),
``TverskyLoss`` (:122-171).  This module re-derives them for NHWC logits
(TPU-native layout) as pure jittable functions.

Layout convention: ``logits`` is ``(N, H, W, C)`` float, ``labels`` is
``(N, H, W)`` integer class ids.  All losses return a float32 scalar.

Reference quirk, replicated behind a flag: the reference reduces the soft
losses over ``dims = (0,) + range(2, labels.ndim)``.  With the ``(B, H, W)``
labels actually passed by ``train.py:92``, that is ``(batch, H)`` only —
leaving a per-(class, column) ratio that is then averaged.  The docstrings in
the reference claim full spatial reduction.  We default to the documented
(and saner) full reduction over (batch, H, W); pass ``compat_reference=True``
to reproduce the shipped (batch, H) behavior for bit-parity runs.

The reference's ``bce`` option is broken (``nn.BCEWithLogitsLoss`` at
``utils/helpers.py:304`` against ``(N,2,H,W)`` logits + integer labels raises
at runtime).  Here ``bce`` is repaired as mean softmax cross-entropy and
``wbce`` adds a positive-class weight (the "weighted BCE" of the north star).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def _probs_onehot(logits: Array, labels: Array) -> tuple[Array, Array]:
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return probs, onehot


def _reduce_axes(labels_ndim: int, compat_reference: bool) -> tuple[int, ...]:
    # Full reduction = batch + all spatial axes (class axis is last and kept).
    # Reference-compat = batch + first spatial axis only (see module docstring).
    if compat_reference:
        return (0, 1)
    return tuple(range(labels_ndim))  # (0, 1, 2) for (N, H, W) labels


def _pixel_weights(labels: Array, sample_weights: Array | None) -> Array | None:
    """Broadcast per-sample weights (N,) to per-pixel (N, H, W...)."""
    if sample_weights is None:
        return None
    w = jnp.asarray(sample_weights, jnp.float32)
    return w.reshape(w.shape + (1,) * (labels.ndim - 1))


def cross_entropy_loss(logits: Array, labels: Array,
                       class_weights: Array | None = None,
                       weights: Array | None = None) -> Array:
    """Mean (optionally class-weighted) softmax cross-entropy.

    This is the repaired semantics of the reference's 'bce' option
    (utils/helpers.py:304 is unusable with the model's 2-class logits).
    ``weights`` is an optional per-sample (N,) weight vector — 0 excludes a
    padded sample exactly.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    ll = ll[..., 0]
    w = jnp.ones_like(ll)
    if class_weights is not None:
        w = w * jnp.asarray(class_weights, jnp.float32)[labels]
    pw = _pixel_weights(labels, weights)
    if pw is not None:
        w = w * pw
    return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1e-7)


def weighted_bce_loss(logits: Array, labels: Array,
                      pos_weight: float = 1.0,
                      weights: Array | None = None) -> Array:
    """Softmax cross-entropy with extra weight on the change class (label 1)."""
    class_weights = jnp.array([1.0, float(pos_weight)], jnp.float32)
    return cross_entropy_loss(logits, labels, class_weights=class_weights,
                              weights=weights)


def focal_loss(logits: Array, labels: Array, gamma: float = 2.0,
               alpha: float | tuple | None = None,
               weights: Array | None = None) -> Array:
    """Focal loss, matching utils/metrics.py:8-48.

    ``-(1 - pt)^gamma * log(pt)`` with optional per-class ``alpha`` weighting
    applied to ``log(pt)`` (exactly as the reference does — alpha multiplies
    logpt *before* the focal factor).
    """
    num_classes = logits.shape[-1]
    flat_logits = logits.reshape(-1, num_classes).astype(jnp.float32)
    flat_labels = labels.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(flat_logits, axis=-1)
    logpt = jnp.take_along_axis(logp, flat_labels[:, None], axis=-1)[:, 0]
    pt = jnp.exp(jax.lax.stop_gradient(logpt))
    if alpha is not None:
        if isinstance(alpha, (int, float)):
            at = jnp.array([alpha, 1.0 - alpha], jnp.float32)[flat_labels]
        else:
            at = jnp.asarray(alpha, jnp.float32)[flat_labels]
        logpt = logpt * at
    loss = -((1.0 - pt) ** gamma) * logpt
    if weights is not None:
        pw = jnp.repeat(jnp.asarray(weights, jnp.float32),
                        loss.shape[0] // weights.shape[0])
        return jnp.sum(loss * pw) / jnp.maximum(jnp.sum(pw), 1e-7)
    return jnp.mean(loss)


def _soft_counts(logits: Array, labels: Array, compat_reference: bool,
                 weights: Array | None):
    probs, onehot = _probs_onehot(logits, labels)
    pw = _pixel_weights(labels, weights)
    if pw is not None:
        # zeroing both probs and onehot makes a weight-0 sample contribute
        # nothing to intersection, fps, or fns
        probs = probs * pw[..., None]
        onehot = onehot * pw[..., None]
    axes = _reduce_axes(labels.ndim, compat_reference)
    intersection = jnp.sum(probs * onehot, axis=axes)
    return probs, onehot, axes, intersection


def dice_loss(logits: Array, labels: Array, eps: float = 1e-7,
              compat_reference: bool = False,
              weights: Array | None = None) -> Array:
    """Soft Sørensen–Dice loss (utils/metrics.py:51-83)."""
    probs, onehot, axes, intersection = _soft_counts(
        logits, labels, compat_reference, weights)
    cardinality = jnp.sum(probs + onehot, axis=axes)
    dice = jnp.mean(2.0 * intersection / (cardinality + eps))
    return 1.0 - dice


def jaccard_loss(logits: Array, labels: Array, eps: float = 1e-7,
                 compat_reference: bool = False,
                 weights: Array | None = None) -> Array:
    """Soft IoU/Jaccard loss (utils/metrics.py:86-119)."""
    probs, onehot, axes, intersection = _soft_counts(
        logits, labels, compat_reference, weights)
    cardinality = jnp.sum(probs + onehot, axis=axes)
    union = cardinality - intersection
    jacc = jnp.mean(intersection / (union + eps))
    return 1.0 - jacc


def tversky_loss(logits: Array, labels: Array, alpha: float = 0.5,
                 beta: float = 0.5, eps: float = 1e-7,
                 compat_reference: bool = False,
                 weights: Array | None = None) -> Array:
    """Soft Tversky loss (utils/metrics.py:122-171).

    ``alpha`` penalizes false positives, ``beta`` false negatives;
    alpha=beta=0.5 reduces to dice.  The reference default config uses
    alpha=0.1, beta=0.9 (metadata.json:42-44) — heavily recall-weighted.
    """
    probs, onehot, axes, intersection = _soft_counts(
        logits, labels, compat_reference, weights)
    fps = jnp.sum(probs * (1.0 - onehot), axis=axes)
    fns = jnp.sum((1.0 - probs) * onehot, axis=axes)
    denom = intersection + alpha * fps + beta * fns
    tversky = jnp.mean(intersection / (denom + eps))
    return 1.0 - tversky


def get_loss_fn(cfg) -> Callable[[Array, Array], Array]:
    """String → loss dispatch, mirroring utils/helpers.py:288-314.

    Accepts a Config (or anything with the same attribute names).
    """
    name = cfg.loss_function
    compat = bool(getattr(cfg, "compat_reference_losses", False))
    if name == "bce":
        return cross_entropy_loss
    if name == "wbce":
        return functools.partial(weighted_bce_loss,
                                 pos_weight=getattr(cfg, "bce_pos_weight", 1.0))
    if name == "focal":
        return functools.partial(focal_loss, gamma=cfg.focal_gamma)
    if name == "dice":
        return functools.partial(dice_loss, compat_reference=compat)
    if name == "jaccard":
        return functools.partial(jaccard_loss, compat_reference=compat)
    if name == "tversky":
        return functools.partial(tversky_loss, alpha=cfg.tversky_alpha,
                                 beta=cfg.tversky_beta, compat_reference=compat)
    raise ValueError(f"unknown loss_function: {name!r}")
