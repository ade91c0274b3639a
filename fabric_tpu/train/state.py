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


def make_optimizer(cfg) -> optax.GradientTransformation:
    name = getattr(cfg, "optimizer", "sgd")
    lr = cfg.learning_rate
    if name == "sgd":
        mom = getattr(cfg, "momentum", 0.0)
        return optax.sgd(lr, momentum=mom if mom else None)
    if name == "adam":
        return optax.adam(lr)
    if name == "adamw":
        return optax.adamw(lr, weight_decay=getattr(cfg, "weight_decay", 1e-2))
    raise ValueError(f"unknown optimizer: {name!r}")


def create_state(cfg, model, rng: jax.Array | None = None,
                 sample_shape: tuple | None = None) -> TrainState:
    """Initialize model variables and the optimizer.

    ``sample_shape`` is (H, W); init runs on batch 1 (shapes don't matter
    for param shapes, only channel counts do).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    h = w = cfg.patch_size
    if sample_shape is not None:
        h, w = sample_shape
    dummy = jnp.zeros((1, h, w, cfg.n_channels), jnp.float32)
    if cfg.model in ("unet_lstm", "unet3d"):
        seq = jnp.zeros((1, cfg.num_dates, h, w, cfg.n_channels), jnp.float32)
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
