"""Optimizer factory extensions: LR schedules and gradient accumulation
(train/state.py — the reference only had constant-lr plain SGD,
/root/reference/train.py:55)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from fabric_tpu.config import Config
from fabric_tpu.train.state import make_optimizer, make_schedule


def _cfg(**kw):
    return Config(dtype="float32", patch_size=16, **kw)


def test_constant_schedule_default():
    assert make_schedule(_cfg()) == 0.001


def test_cosine_schedule_decays_to_zero():
    sched = make_schedule(_cfg(lr_schedule="cosine", lr_decay_steps=100))
    assert np.isclose(float(sched(0)), 0.001)
    assert float(sched(100)) < 1e-5


def test_warmup_cosine_starts_at_zero():
    sched = make_schedule(_cfg(lr_schedule="cosine", lr_decay_steps=100,
                               lr_warmup_steps=10))
    assert float(sched(0)) == 0.0
    assert np.isclose(float(sched(10)), 0.001, rtol=1e-3)


def test_schedule_requires_decay_steps():
    with pytest.raises(ValueError, match="lr_decay_steps"):
        make_schedule(_cfg(lr_schedule="cosine"))


def test_grad_accumulation_matches_large_batch():
    """K micro-batch steps with grad_accum_steps=K produce the same update
    as one step on the concatenated batch (mean-gradient semantics)."""
    params = {"w": jnp.asarray(np.random.RandomState(0).randn(4), jnp.float32)}
    rng = np.random.RandomState(1)
    micro = [jnp.asarray(rng.randn(8, 4), jnp.float32) for _ in range(4)]

    def loss(p, x):
        return jnp.mean((x @ p["w"]) ** 2)

    # accumulated: 4 micro steps
    tx = make_optimizer(_cfg(grad_accum_steps=4, learning_rate=0.1))
    state = tx.init(params)
    p = params
    for x in micro:
        g = jax.grad(loss)(p, x)
        updates, state = tx.update(g, state, p)
        p = optax.apply_updates(p, updates)

    # one big-batch step
    tx1 = make_optimizer(_cfg(learning_rate=0.1))
    s1 = tx1.init(params)
    gbig = jax.grad(loss)(params, jnp.concatenate(micro))
    updates, _ = tx1.update(gbig, s1, params)
    pbig = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(pbig["w"]),
                               rtol=1e-6)


def test_train_e2e_with_accum_and_schedule(tmp_path):
    """The loop runs with accumulation + cosine schedule enabled."""
    from fabric_tpu.data.synthetic import generate_synthetic_dataset
    from fabric_tpu.train.loop import train
    cfg = Config(dataset_dir=str(tmp_path / "d"), weight_dir=str(tmp_path / "w"),
                 log_dir=str(tmp_path / "l"), patch_size=16, stride=16,
                 batch_size=4, epochs=1, steps_per_epoch=4, dtype="float32",
                 model_base=8, validation_cities=["beta"], num_workers=0,
                 prefetch=0, grad_accum_steps=2, lr_schedule="cosine",
                 lr_decay_steps=10)
    generate_synthetic_dataset(cfg.dataset_dir, cfg,
                               cities=["alpha", "beta"],
                               sizes=[(48, 48), (40, 40)], seed=1)
    state, history = train(cfg, run_scene_inference=False)
    assert np.isfinite(history["train"][0]["cd_losses"])
