"""Train state: params + BN batch_stats + optimizer state, and its factory.

Replaces the reference's ``load_model`` (utils/helpers.py:317-337 — which
hardcodes BiDateNet(13, 2) and wraps it in DataParallel) with a model
factory + optax transform chosen from config.  The reference optimizer is
plain SGD (train.py:55).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_schedule(cfg):
    """Learning-rate schedule from config (reference used a constant lr,
    train.py:55; cosine/warmup-cosine are the production extensions)."""
    name = getattr(cfg, "lr_schedule", "constant")
    lr = cfg.learning_rate
    if name == "constant":
        return lr
    steps = getattr(cfg, "lr_decay_steps", 0)
    if steps <= 0:
        raise ValueError(f"lr_schedule={name!r} requires lr_decay_steps > 0")
    warmup = getattr(cfg, "lr_warmup_steps", 0)
    if name == "cosine":
        if warmup:
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr, warmup_steps=warmup,
                decay_steps=steps)
        return optax.cosine_decay_schedule(lr, decay_steps=steps)
    if name == "linear":
        return optax.linear_schedule(lr, 0.0, transition_steps=steps,
                                     transition_begin=warmup)
    raise ValueError(f"unknown lr_schedule: {name!r}")


def make_optimizer(cfg) -> optax.GradientTransformation:
    name = getattr(cfg, "optimizer", "sgd")
    lr = make_schedule(cfg)
    if name == "sgd":
        mom = getattr(cfg, "momentum", 0.0)
        tx = optax.sgd(lr, momentum=mom if mom else None)
    elif name == "adam":
        tx = optax.adam(lr)
    elif name == "adamw":
        tx = optax.adamw(lr, weight_decay=getattr(cfg, "weight_decay", 1e-2))
    else:
        raise ValueError(f"unknown optimizer: {name!r}")
    accum = getattr(cfg, "grad_accum_steps", 1)
    if accum and accum > 1:
        # micro-batch gradient accumulation: the params update every
        # `accum` train steps with the mean gradient — large effective
        # batches beyond per-chip memory (no reference equivalent)
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def create_state(cfg, model, rng: jax.Array | None = None,
                 sample_shape: tuple | None = None,
                 variables: dict | None = None) -> TrainState:
    """Initialize model variables and the optimizer.

    ``sample_shape`` is (H, W); init runs on batch 1 (shapes don't matter
    for param shapes, only channel counts do).  ``variables`` warm-starts
    from an existing {params, batch_stats} tree (transfer learning, or the
    loop-parity oracle seeding from the torch reference's init).
    """
    if variables is None:
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        h = w = cfg.patch_size
        if sample_shape is not None:
            h, w = sample_shape
        dummy = jnp.zeros((1, h, w, cfg.n_channels), jnp.float32)
        if cfg.model in ("unet_lstm", "unet3d"):
            seq = jnp.zeros((1, cfg.num_dates, h, w, cfg.n_channels),
                            jnp.float32)
            variables = model.init(rng, seq, train=False)
        else:
            variables = model.init(rng, dummy, dummy, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg),
    )


def param_count(state: TrainState) -> int:
    import numpy as np
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(state.params))
