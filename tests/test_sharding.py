"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4: the standard JAX idiom replacing multi-node testing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fabric_tpu.config import Config
from fabric_tpu.losses import get_loss_fn
from fabric_tpu.models import build_model
from fabric_tpu.parallel.mesh import (
    make_mesh, batch_shardings, shard_batch, pad_batch_to_multiple)
from fabric_tpu.train.state import create_state
from fabric_tpu.train.steps import make_train_step, make_eval_step


def _cfg(**kw):
    base = dict(patch_size=16, dtype="float32", batch_size=8)
    base.update(kw)
    return Config(**base)


def _batch(n=8, ps=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "img1": rng.randn(n, ps, ps, 13).astype(np.float32),
        "img2": rng.randn(n, ps, ps, 13).astype(np.float32),
        "label": rng.randint(0, 2, (n, ps, ps)).astype(np.int32),
        "weight": np.ones(n, np.float32),
    }


def test_requires_8_devices():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"


def test_mesh_construction():
    mesh = make_mesh(data=-1, spatial=1, model=1)
    assert mesh.shape["data"] == jax.device_count()
    mesh2 = make_mesh(data=2, spatial=2, model=2)
    assert mesh2.shape == {"data": 2, "spatial": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=-1, spatial=3)  # 8 not divisible by 3


def test_data_parallel_train_step_matches_single_device():
    cfg = _cfg()
    model = build_model(cfg)
    state = create_state(cfg, model)
    loss_fn = get_loss_fn(cfg)
    step = make_train_step(model, loss_fn, donate=False)
    batch = _batch()

    # single device
    state1, stats1 = step(state, jax.device_put(batch))

    # 8-way data parallel via mesh sharding
    mesh = make_mesh(data=8)
    sharded = shard_batch(batch, mesh)
    rep = NamedSharding(mesh, P())
    state_r = jax.device_put(state, rep)
    state8, stats8 = step(state_r, sharded)

    assert np.allclose(float(stats1["loss"]), float(stats8["loss"]), atol=1e-5)
    for k in ("tp", "fp", "fn", "tn"):
        assert int(stats1[k]) == int(stats8[k])
    p1 = jax.tree_util.tree_leaves(state1.params)
    p8 = jax.tree_util.tree_leaves(state8.params)
    assert all(np.allclose(a, b, atol=1e-4) for a, b in zip(p1, p8))


def test_spatial_sharding_eval_step():
    # spatial axis shards H; XLA handles conv halo exchange internally
    cfg = _cfg(patch_size=32)
    model = build_model(cfg)
    state = create_state(cfg, model)
    loss_fn = get_loss_fn(cfg)
    estep = make_eval_step(model, loss_fn)
    batch = _batch(n=4, ps=32)

    stats1 = estep(state, jax.device_put(batch))

    mesh = make_mesh(data=2, spatial=4)
    sharded = shard_batch(batch, mesh)
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    stats8 = estep(state_r, sharded)
    assert np.allclose(float(stats1["loss"]), float(stats8["loss"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(stats1["preds"]),
                                  np.asarray(stats8["preds"]))


def test_model_axis_param_sharding():
    # tensor parallelism: shard the widest conv kernels over 'model'
    cfg = _cfg()
    model = build_model(cfg)
    state = create_state(cfg, model)
    mesh = make_mesh(data=4, model=2)

    def shard_param(path, p):
        if p.ndim == 4 and p.shape[-1] >= 256:  # wide conv kernels
            return jax.device_put(p, NamedSharding(mesh, P(None, None, None, "model")))
        return jax.device_put(p, NamedSharding(mesh, P()))

    params = jax.tree_util.tree_map_with_path(shard_param, state.params)
    loss_fn = get_loss_fn(cfg)
    estep = make_eval_step(model, loss_fn)
    state_s = state.replace(params=params)
    batch = shard_batch(_batch(n=4), mesh)
    stats = estep(state_s, batch)
    assert np.isfinite(float(stats["loss"]))


def test_pad_batch_to_multiple():
    batch = _batch(n=6)
    padded = pad_batch_to_multiple(batch, 8)
    assert padded["img1"].shape[0] == 8
    assert float(padded["weight"].sum()) == 6.0
