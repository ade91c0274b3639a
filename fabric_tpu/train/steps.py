"""jit-compiled train/eval steps.

TPU-native re-design of the reference inner loop (train.py:76-118): the
forward, loss, backward, optimizer update, argmax, and confusion counts all
live inside ONE jitted function, so XLA fuses the whole step and only five
scalars (loss + tp/fp/fn/tn) ever leave the device — versus the reference's
full device→host label/pred copy per batch for sklearn (train.py:103-106,
flagged in SURVEY.md §3.2 as the throughput killer).

Under a Mesh with batches sharded over ('data', 'spatial'), jit's SPMD
partitioner inserts the gradient all-reduce (params are replicated, loss is
a global mean) and conv halo exchanges automatically — no hand-written
collectives in the step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from fabric_tpu.metrics import confusion_counts


def make_train_step(model, loss_fn: Callable, donate: bool = True,
                    compiler_options: dict | None = None):
    """Returns jitted ``train_step(state, batch) -> (state, stats)``.

    ``compiler_options``: XLA backend flags for THIS computation (e.g.
    ``{"xla_tpu_scoped_vmem_limit_kib": "98304"}``).  The env-var route
    (``XLA_FLAGS``) cannot carry TPU flags here — the local CPU XLA
    client aborts on unknown flags — but per-jit options ride the PJRT
    compile call through the axon tunnel and are validated remotely
    (bogus names are rejected), so they are the one working channel for
    TPU compiler tuning on this setup."""

    def train_step(state, batch):
        def loss_of(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if "imgs" in batch:  # multi-date variants (N, T, H, W, C)
                logits, updates = state.apply_fn(
                    variables, batch["imgs"], train=True,
                    mutable=["batch_stats"])
            else:
                logits, updates = state.apply_fn(
                    variables, batch["img1"], batch["img2"], train=True,
                    mutable=["batch_stats"])
            loss = loss_fn(logits, batch["label"],
                           weights=batch.get("weight"))
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"])
        preds = jnp.argmax(logits, axis=-1)
        stats = confusion_counts(preds, batch["label"],
                                 weights=batch.get("weight"))
        stats["loss"] = loss
        return state, stats

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums,
                   compiler_options=compiler_options)


def make_eval_step(model, loss_fn: Callable):
    """Returns jitted ``eval_step(state, batch) -> stats`` (running-average
    BN, no grads — reference validation phase train.py:125-172)."""

    def eval_step(state, batch):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if "imgs" in batch:
            logits = state.apply_fn(variables, batch["imgs"], train=False)
        else:
            logits = state.apply_fn(variables, batch["img1"], batch["img2"],
                                    train=False)
        loss = loss_fn(logits, batch["label"], weights=batch.get("weight"))
        preds = jnp.argmax(logits, axis=-1)
        stats = confusion_counts(preds, batch["label"],
                                 weights=batch.get("weight"))
        stats["loss"] = loss
        stats["preds"] = preds
        return stats

    return jax.jit(eval_step)


def make_infer_step(model):
    """Returns jitted ``infer_step(state, *imgs) -> preds`` for tiled
    whole-scene inference (argmax class map, reference train.py:187-201).
    Bi-date: ``infer_step(state, img1, img2)``; multi-date:
    ``infer_step(state, imgs)`` with imgs (N, T, ps, ps, C)."""

    def infer_step(state, *imgs):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits = state.apply_fn(variables, *imgs, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    return jax.jit(infer_step)


def make_infer_probs_step(model):
    """Like make_infer_step but returns change-class probabilities, needed
    for overlap-averaged stitching (BASELINE config 4)."""

    def infer_step(state, *imgs):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits = state.apply_fn(variables, *imgs, train=False)
        return jax.nn.softmax(logits, axis=-1)[..., 1]

    return jax.jit(infer_step)
