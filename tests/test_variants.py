"""Multi-date model variants (BASELINE configs 3/5): UNetLSTM + 3D U-Net,
the multi-date data pipeline, and a training-step smoke test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fabric_tpu.config import Config
from fabric_tpu.models import build_model
from fabric_tpu.models.unet_lstm import UNetLSTM, multi_date_fuse
from fabric_tpu.models.unet3d import UNet3D


def _seq(n=2, t=3, h=16, w=16, c=13, seed=0):
    return jnp.array(np.random.RandomState(seed).randn(n, t, h, w, c),
                     jnp.float32)


def test_unet_lstm_shapes():
    model = UNetLSTM(base=8)
    seq = _seq()
    variables = model.init(jax.random.PRNGKey(0), seq, train=False)
    out = model.apply(variables, seq, train=False)
    assert out.shape == (2, 16, 16, 2) and out.dtype == jnp.float32


def test_convlstm_cell_is_order_sensitive():
    # the recurrence must distinguish date order (at the full-model level
    # the randomly-initialized bottleneck contributes weakly, so probe the
    # cell directly)
    from fabric_tpu.models.unet_lstm import ConvLSTMCell
    cell = ConvLSTMCell(8)
    rng = np.random.RandomState(1)
    x1 = jnp.array(rng.randn(1, 8, 8, 8), jnp.float32)
    x2 = jnp.array(rng.randn(1, 8, 8, 8), jnp.float32)
    h0 = jnp.zeros((1, 8, 8, 8), jnp.float32)
    variables = cell.init(jax.random.PRNGKey(0), (h0, h0), x1)

    def run(seq):
        carry = (h0, h0)
        for x in seq:
            carry, _ = cell.apply(variables, carry, x)
        return carry[0]

    h_fwd = run([x1, x2])
    h_rev = run([x2, x1])
    assert not np.allclose(np.asarray(h_fwd), np.asarray(h_rev), atol=1e-4)


def test_multi_date_fuse_matches_bidate_at_t2():
    rng = np.random.RandomState(2)
    a = jnp.array(rng.randn(2, 8, 8, 4), jnp.float32)
    b = jnp.array(rng.randn(2, 8, 8, 4), jnp.float32)
    stacked = jnp.stack([a, b], axis=1)
    fused = multi_date_fuse(stacked)
    expected = jnp.maximum(a * b, 0)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(expected),
                               atol=1e-6)


def test_unet3d_shapes():
    model = UNet3D(base=4)
    seq = _seq(t=5)
    variables = model.init(jax.random.PRNGKey(0), seq, train=False)
    out = model.apply(variables, seq, train=False)
    assert out.shape == (2, 16, 16, 2) and out.dtype == jnp.float32


def test_build_model_variants():
    assert isinstance(build_model(Config(model="unet_lstm",
                                         dtype="float32")), UNetLSTM)
    assert isinstance(build_model(Config(model="unet3d",
                                         dtype="float32")), UNet3D)


def test_multi_date_pipeline(tmp_path):
    from fabric_tpu.data.synthetic import generate_synthetic_dataset
    from fabric_tpu.data import full_load, get_train_val_metadata, PatchSampler, batch_iterator
    cfg = Config(dataset_dir=str(tmp_path), num_dates=4,
                 validation_cities=["beta"], patch_size=16, stride=16)
    generate_synthetic_dataset(cfg.dataset_dir, cfg, num_dates=4)
    data = full_load(cfg.dataset_dir, cfg)
    assert data["alpha"]["images"].shape[0] == 4
    train_md, _ = get_train_val_metadata(cfg.dataset_dir, ["beta"], 16, 16)
    sampler = PatchSampler(data, train_md, 16, augment=True, multi_date=True)
    imgs, lbl = sampler.sample(0)
    assert imgs.shape == (4, 16, 16, 13) and lbl.shape == (16, 16)
    batch = next(batch_iterator(sampler, 4, shuffle=False))
    assert batch["imgs"].shape == (4, 4, 16, 16, 13)
    assert "img1" not in batch


def test_multi_date_train_step_learns():
    from fabric_tpu.losses import get_loss_fn
    from fabric_tpu.train.state import create_state
    from fabric_tpu.train.steps import make_train_step
    cfg = Config(model="unet_lstm", num_dates=3, patch_size=16,
                 dtype="float32", learning_rate=0.05)
    model = UNetLSTM(base=8)
    rng = np.random.RandomState(0)
    imgs = rng.randn(4, 3, 16, 16, 13).astype(np.float32)
    label = (imgs[:, -1, :, :, 0] > 1.0).astype(np.int32)
    seq = jnp.asarray(imgs)
    variables = model.init(jax.random.PRNGKey(0), seq, train=False)
    from fabric_tpu.train.state import TrainState, make_optimizer
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              batch_stats=variables["batch_stats"],
                              tx=make_optimizer(cfg))
    step = make_train_step(model, get_loss_fn(cfg), donate=False)
    batch = {"imgs": seq, "label": jnp.asarray(label),
             "weight": jnp.ones(4, jnp.float32)}
    losses = []
    for _ in range(5):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0]
