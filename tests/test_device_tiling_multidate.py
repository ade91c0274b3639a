"""On-device whole-scene inference for the multi-date variants
(device_tiling.make_scene_infer_multidate)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fabric_tpu.infer.device_tiling import make_scene_infer_multidate
from fabric_tpu.models.unet_lstm import UNetLSTM


@pytest.fixture(scope="module")
def model_vars():
    model = UNetLSTM(base=8, dtype=jnp.float32)
    seq = jnp.zeros((1, 3, 16, 16, 13), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), seq, train=False)
    return model, variables


def test_matches_direct_tile_forward(model_vars):
    """Aligned grid: the pipeline's mask equals applying the model to the
    hand-tiled scene directly (tiling is a pure reshape)."""
    model, variables = model_vars
    t, h, w, p = 3, 48, 32, 16
    rng = np.random.RandomState(0)
    scenes = jnp.asarray(rng.randn(t, h, w, 13), jnp.float32)
    run = make_scene_infer_multidate(model, p, (h, w), num_dates=t,
                                     batch_size=4, dtype=jnp.float32)
    mask = np.asarray(run(variables, scenes))
    assert mask.shape == (h, w)

    # hand tiling: (T,H,W,C) -> (K,T,p,p,C), row-major over the grid
    s = np.asarray(scenes)
    tiles = s.reshape(t, h // p, p, w // p, p, 13).transpose(
        1, 3, 0, 2, 4, 5).reshape(-1, t, p, p, 13)
    logits = model.apply(variables, jnp.asarray(tiles), train=False)
    want = np.asarray(jnp.argmax(logits, -1), np.uint8).reshape(
        h // p, w // p, p, p).transpose(0, 2, 1, 3).reshape(h, w)
    np.testing.assert_array_equal(mask, want)


def test_unaligned_and_overlap_modes(model_vars):
    model, variables = model_vars
    rng = np.random.RandomState(1)
    scenes = jnp.asarray(rng.randn(3, 40, 56, 13), jnp.float32)
    for overlap in (0, 4):
        run = make_scene_infer_multidate(model, 16, (40, 56), num_dates=3,
                                         batch_size=4, overlap=overlap,
                                         dtype=jnp.float32)
        mask = np.asarray(run(variables, scenes))
        assert mask.shape == (40, 56)
        assert set(np.unique(mask)) <= {0, 1}


def test_scene_predictor_multidate(tmp_path):
    """ScenePredictor serves the multi-date variants end-to-end: folded
    UNetLSTM, bucketed runner, synthetic 3-date city."""
    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.config import Config
    from fabric_tpu.data.synthetic import generate_synthetic_dataset
    from fabric_tpu.infer.service import ScenePredictor
    from fabric_tpu.models import build_model
    from fabric_tpu.train.state import create_state

    cfg = Config(model="unet_lstm", num_dates=3, patch_size=16,
                 eval_batch_size=4, dtype="float32", model_base=8,
                 dataset_dir=str(tmp_path / "data"))
    generate_synthetic_dataset(cfg.dataset_dir, cfg, cities=["alpha"],
                               sizes=[(48, 40)], num_dates=3)
    state = create_state(cfg, build_model(cfg))
    ckpt.save(state, str(tmp_path / "w"), epoch=0)
    pred = ScenePredictor(cfg, checkpoint=str(tmp_path / "w"), bucket=32)
    assert pred.multi_date
    mask = pred.predict_city("alpha")
    assert mask.shape == (48, 40)
    assert set(np.unique(mask)) <= {0, 1}
    # direct multidate predict with an odd-size stack (bucket pads)
    rng = np.random.RandomState(2)
    mask2 = pred.predict_multidate(
        rng.randn(3, 33, 50, 13).astype(np.float32))
    assert mask2.shape == (33, 50)


def test_scene_predictor_multidate_guards(tmp_path):
    from fabric_tpu.config import Config
    from fabric_tpu.infer.service import ScenePredictor
    from fabric_tpu.parallel.mesh import make_mesh

    cfg = Config(model="unet_lstm", patch_size=16, dtype="float32",
                 model_base=8)
    with pytest.raises(ValueError):
        ScenePredictor(cfg, shard_scene=True, mesh=make_mesh(data=1))
    bidate = Config(patch_size=16, dtype="float32", model_base=8)
    p = ScenePredictor(bidate, checkpoint=None, bucket=32)
    with pytest.raises(ValueError):
        p.predict_multidate(np.zeros((3, 32, 32, 13), np.float32))
