"""On-device scene inference must match the host tile/stitch path exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from fabric_tpu.config import Config
from fabric_tpu.infer.device_tiling import make_scene_infer, _axis_positions
from fabric_tpu.infer.runner import predict_scene
from fabric_tpu.models import build_model
from fabric_tpu.train.state import create_state
from fabric_tpu.train.steps import make_infer_step, make_infer_probs_step


def test_axis_positions_reference_grid():
    # 97/32: grid 0,32,64 then edge-anchored 65
    assert _axis_positions(97, 32, 32).tolist() == [0, 32, 64, 65]
    assert _axis_positions(96, 32, 32).tolist() == [0, 32, 64]
    assert _axis_positions(97, 32, 24).tolist() == [0, 24, 48, 65]


@pytest.fixture(scope="module")
def setup():
    cfg = Config(patch_size=16, dtype="float32")
    model = build_model(cfg)
    state = create_state(cfg, model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = np.random.RandomState(0)
    d1 = rng.randn(40, 55, 13).astype(np.float32)
    d2 = rng.randn(40, 55, 13).astype(np.float32)
    return cfg, model, state, variables, d1, d2


def test_device_matches_host_reference_mode(setup):
    cfg, model, state, variables, d1, d2 = setup
    host = predict_scene(make_infer_step(model), state, d1, d2,
                         patch_size=16, batch_size=8)
    run = make_scene_infer(model, 16, d1.shape[:2], batch_size=8,
                           dtype=jnp.float32)
    dev = np.asarray(run(variables, jnp.asarray(d1), jnp.asarray(d2)))
    assert dev.shape == host.shape == (40, 55)
    np.testing.assert_array_equal(dev, host)


@pytest.mark.parametrize("shape", [(48, 55), (40, 48), (48, 48)])
def test_device_matches_host_single_axis_edges(setup, shape):
    # pin every branch of the static edge-band stitch: y-edge only,
    # x-edge only, and fully aligned
    cfg, model, state, variables, _, _ = setup
    rng = np.random.RandomState(1)
    d1 = rng.randn(*shape, 13).astype(np.float32)
    d2 = rng.randn(*shape, 13).astype(np.float32)
    host = predict_scene(make_infer_step(model), state, d1, d2,
                         patch_size=16, batch_size=8)
    run = make_scene_infer(model, 16, shape, batch_size=8,
                           dtype=jnp.float32)
    dev = np.asarray(run(variables, jnp.asarray(d1), jnp.asarray(d2)))
    np.testing.assert_array_equal(dev, host)


def test_device_matches_host_overlap_mode(setup):
    cfg, model, state, variables, d1, d2 = setup
    host = predict_scene(make_infer_step(model), state, d1, d2,
                         patch_size=16, batch_size=8, overlap=8,
                         prob_step=make_infer_probs_step(model))
    run = make_scene_infer(model, 16, d1.shape[:2], batch_size=8,
                           overlap=8, dtype=jnp.float32)
    dev = np.asarray(run(variables, jnp.asarray(d1), jnp.asarray(d2)))
    np.testing.assert_array_equal(dev, host)


def test_device_tiling_sharded_over_mesh(setup):
    import jax
    from fabric_tpu.parallel.mesh import make_mesh
    cfg, model, state, variables, d1, d2 = setup
    single = make_scene_infer(model, 16, d1.shape[:2], batch_size=8,
                              dtype=jnp.float32)
    ref = np.asarray(single(variables, jnp.asarray(d1), jnp.asarray(d2)))
    mesh = make_mesh(data=8)
    sharded = make_scene_infer(model, 16, d1.shape[:2], batch_size=8,
                               dtype=jnp.float32, mesh=mesh)
    got = np.asarray(sharded(variables, jnp.asarray(d1), jnp.asarray(d2)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("shape,band_rows", [((40, 55), 2), ((48, 48), 3),
                                             ((41, 40), 1), ((40, 40), 99)])
def test_banded_overlap_matches_unbanded(setup, shape, band_rows):
    """Banded overlap accumulation (bounded memory for scenes whose tile
    set exceeds HBM — BASELINE config 4 at 10k²) must reproduce the
    unbanded overlap mask exactly: tail bands, the edge-anchored stop row,
    and band counts larger than the grid all included."""
    from fabric_tpu.infer.device_tiling import make_banded_overlap_infer
    cfg, model, state, variables, _, _ = setup
    rng = np.random.RandomState(2)
    d1 = rng.randn(*shape, 13).astype(np.float32)
    d2 = rng.randn(*shape, 13).astype(np.float32)
    ref_run = make_scene_infer(model, 16, shape, batch_size=8, overlap=8,
                               dtype=jnp.float32)
    ref = np.asarray(ref_run(variables, jnp.asarray(d1), jnp.asarray(d2)))
    banded = make_banded_overlap_infer(model, 16, shape, batch_size=8,
                                       overlap=8, band_tile_rows=band_rows,
                                       dtype=jnp.float32)
    got = np.asarray(banded(variables, jnp.asarray(d1), jnp.asarray(d2)))
    np.testing.assert_array_equal(got, ref)


def test_banded_overlap_rejects_grid_mode():
    from fabric_tpu.infer.device_tiling import make_banded_overlap_infer
    with pytest.raises(ValueError, match="grid mode"):
        make_banded_overlap_infer(lambda *a, **k: None, 16, (40, 40),
                                  overlap=0)


def test_packed_matches_single_scene(setup):
    """Fleet-packed runner (r4 VERDICT #1): per-scene masks bit-identical
    to the single-scene runner, including a non-divisible scene shape
    (edge strips) and the zero-padded dummy scene slot."""
    from fabric_tpu.infer.device_tiling import make_packed_scene_infer
    cfg, model, state, variables, _, _ = setup
    shape = (40, 55)  # non-divisible by 16: right/bottom edge tiles
    rng = np.random.RandomState(3)
    scenes = [(rng.randn(*shape, 13).astype(np.float32),
               rng.randn(*shape, 13).astype(np.float32))
              for _ in range(3)]
    single = make_scene_infer(model, 16, shape, batch_size=8,
                              dtype=jnp.float32)
    want = [np.asarray(single(variables, jnp.asarray(a), jnp.asarray(b)))
            for a, b in scenes]

    packed = make_packed_scene_infer(model, 16, shape, pack=4,
                                     batch_size=8, dtype=jnp.float32)
    s1 = np.stack([a for a, _ in scenes]
                  + [np.zeros((*shape, 13), np.float32)])
    s2 = np.stack([b for _, b in scenes]
                  + [np.zeros((*shape, 13), np.float32)])
    got = np.asarray(packed(variables, jnp.asarray(s1), jnp.asarray(s2)))
    assert got.shape == (4, *shape)
    for i in range(3):
        np.testing.assert_array_equal(got[i], want[i])


def test_packed_multidate_matches_single_scene():
    from fabric_tpu.infer.device_tiling import (
        make_packed_scene_infer, make_scene_infer_multidate)
    cfg = Config(patch_size=16, dtype="float32", model="unet_lstm",
                 model_base=8, num_dates=3)
    model = build_model(cfg)
    state = create_state(cfg, model,
                         sample_shape=(cfg.patch_size, cfg.patch_size))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    shape = (32, 41)
    rng = np.random.RandomState(4)
    stacks = [rng.randn(3, *shape, 13).astype(np.float32)
              for _ in range(2)]
    single = make_scene_infer_multidate(model, 16, shape, num_dates=3,
                                        batch_size=8, dtype=jnp.float32)
    want = [np.asarray(single(variables, jnp.asarray(s))) for s in stacks]
    packed = make_packed_scene_infer(model, 16, shape, pack=2,
                                     batch_size=8, dtype=jnp.float32,
                                     num_dates=3)
    got = np.asarray(packed(variables, jnp.asarray(np.stack(stacks))))
    assert got.shape == (2, *shape)
    for i in range(2):
        np.testing.assert_array_equal(got[i], want[i])
