"""Scene-sharded inference (infer/sharded_scene.py): the scene lives
H-banded across the mesh 'data' axis; each device tiles and stitches its
band locally.  Must be bit-identical to the single-device pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fabric_tpu.config import Config
from fabric_tpu.infer.device_tiling import make_scene_infer
from fabric_tpu.infer.sharded_scene import (
    make_sharded_scene_infer, put_scene_sharded)
from fabric_tpu.models import build_model
from fabric_tpu.parallel.mesh import make_mesh
from fabric_tpu.train.state import create_state


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = Config(patch_size=16, dtype="float32", model_base=8)
    model = build_model(cfg)
    state = create_state(cfg, model, sample_shape=(16, 16))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh = make_mesh(data=8)
    return model, variables, mesh


def test_matches_single_device_pipeline(setup):
    model, variables, mesh = setup
    h, w = 8 * 16 * 2, 3 * 16  # 2 tile rows per band, 3 cols
    rng = np.random.RandomState(0)
    s1 = jnp.asarray(rng.randn(h, w, 13), jnp.float32)
    s2 = jnp.asarray(rng.randn(h, w, 13), jnp.float32)
    run_ref = make_scene_infer(model, 16, (h, w), batch_size=4,
                               dtype=jnp.float32)
    run_sh = make_sharded_scene_infer(model, 16, (h, w), mesh,
                                      batch_size=4, dtype=jnp.float32)
    m_ref = np.asarray(run_ref(variables, s1, s2))
    m_sh = np.asarray(run_sh(variables, s1, s2))
    assert m_sh.shape == (h, w)
    np.testing.assert_array_equal(m_ref, m_sh)


def test_put_scene_sharded_layout(setup):
    _, _, mesh = setup
    scene = np.zeros((8 * 16, 16, 13), np.float32)
    arr = put_scene_sharded(scene, mesh)
    # every device holds exactly one (H/8, W, C) band
    shards = arr.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape == (16, 16, 13) for s in shards)


def test_misaligned_height_raises(setup):
    model, variables, mesh = setup
    with pytest.raises(ValueError):
        make_sharded_scene_infer(model, 16, (8 * 16 + 16, 32), mesh)
    with pytest.raises(ValueError):
        make_sharded_scene_infer(model, 16, (8 * 32, 40), mesh)


def test_int8_apply_in_sharded_scene(setup):
    from fabric_tpu.infer import quant
    from fabric_tpu.ops.fold_bn import fold_batchnorm

    model, variables, mesh = setup
    folded = fold_batchnorm(variables["params"], variables["batch_stats"])
    rng = np.random.RandomState(1)
    calib = [(jnp.asarray(rng.randn(2, 16, 16, 13), jnp.float32),
              jnp.asarray(rng.randn(2, 16, 16, 13), jnp.float32))]
    scales = quant.calibrate(folded, calib)
    apply_q = quant.make_int8_apply(folded, scales, jnp.float32)
    h, w = 8 * 16, 2 * 16
    s1 = jnp.asarray(rng.randn(h, w, 13), jnp.float32)
    s2 = jnp.asarray(rng.randn(h, w, 13), jnp.float32)
    run = make_sharded_scene_infer(apply_q, 16, (h, w), mesh, batch_size=4,
                                   dtype=jnp.float32)
    mask = np.asarray(run({"params": folded, "batch_stats": {}}, s1, s2))
    assert mask.shape == (h, w)
    assert set(np.unique(mask)) <= {0, 1}


def test_scene_predictor_shard_scene(setup):
    from fabric_tpu.infer.service import ScenePredictor

    _, _, mesh = setup
    cfg = Config(patch_size=16, eval_batch_size=4, dtype="float32",
                 model_base=8)
    plain = ScenePredictor(cfg, checkpoint=None, bucket=128)
    # same weights: reuse plain's variables in a sharded predictor
    sharded = ScenePredictor(cfg, checkpoint=None, bucket=128, mesh=mesh,
                             shard_scene=True)
    sharded.variables = plain.variables
    assert sharded.bucket == 128  # already aligned to 8*16
    rng = np.random.RandomState(0)
    d1 = rng.randn(100, 50, 13).astype(np.float32)  # odd size -> bucketed
    d2 = rng.randn(100, 50, 13).astype(np.float32)
    m_plain = plain.predict(d1, d2)
    m_shard = sharded.predict(d1, d2)
    np.testing.assert_array_equal(m_plain, m_shard)


def test_scene_predictor_shard_scene_requires_mesh():
    from fabric_tpu.infer.service import ScenePredictor
    cfg = Config(patch_size=16, dtype="float32", model_base=8)
    with pytest.raises(ValueError):
        ScenePredictor(cfg, shard_scene=True)


def test_put_scene_sharded_from_memmap(setup, tmp_path):
    """A memory-mapped scene streams band-by-band: the callback slices
    only each device's band, so scenes larger than host RAM work."""
    _, _, mesh = setup
    h, w, c = 8 * 16, 32, 13
    path = tmp_path / "scene.npy"
    np.save(path, np.arange(h * w * c, dtype=np.float32).reshape(h, w, c))
    mm = np.load(path, mmap_mode="r")
    arr = put_scene_sharded(mm, mesh)
    assert arr.shape == (h, w, c)
    np.testing.assert_array_equal(np.asarray(arr),
                                  np.asarray(mm))
