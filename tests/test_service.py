"""ScenePredictor serving tests: bucketing, compile reuse, checkpoint load."""

import numpy as np
import pytest

from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset
from fabric_tpu.infer.service import ScenePredictor


@pytest.fixture(scope="module")
def predictor():
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    return ScenePredictor(cfg, checkpoint=None, bucket=32, fold_bn=True)


def test_predict_shapes_and_values(predictor):
    rng = np.random.RandomState(0)
    d1 = rng.randn(45, 53, 13).astype(np.float32)
    d2 = rng.randn(45, 53, 13).astype(np.float32)
    mask = predictor.predict(d1, d2)
    assert mask.shape == (45, 53)
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 1}


def test_bucket_compile_reuse(predictor):
    rng = np.random.RandomState(1)
    # 45x53 and 60x40 both pad to the (64, 64) bucket -> ONE compilation
    predictor.predict(rng.randn(45, 53, 13).astype(np.float32),
                      rng.randn(45, 53, 13).astype(np.float32))
    n_before = len(predictor._compiled)
    predictor.predict(rng.randn(60, 40, 13).astype(np.float32),
                      rng.randn(60, 40, 13).astype(np.float32))
    assert len(predictor._compiled) == n_before
    # a bigger scene needs a new bucket
    predictor.predict(rng.randn(70, 70, 13).astype(np.float32),
                      rng.randn(70, 70, 13).astype(np.float32))
    assert len(predictor._compiled) == n_before + 1


def test_predict_city_with_checkpoint(tmp_path):
    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.models import build_model
    from fabric_tpu.train.state import create_state
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8, dataset_dir=str(tmp_path))
    generate_synthetic_dataset(cfg.dataset_dir, cfg, cities=["alpha"],
                               sizes=[(48, 56)])
    state = create_state(cfg, build_model(cfg))
    ckpt.save(state, str(tmp_path / "w"), epoch=0)
    predictor = ScenePredictor(cfg, checkpoint=str(tmp_path / "w"),
                               bucket=32)
    mask = predictor.predict_city("alpha")
    assert mask.shape == (48, 56)


def test_missing_checkpoint_raises(tmp_path):
    cfg = Config(patch_size=16, dtype="float32", model_base=8)
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        ScenePredictor(cfg, checkpoint=str(tmp_path / "empty"))


def test_int8_predictor_self_calibrates():
    cfg = Config(patch_size=16, eval_batch_size=8, dtype="float32",
                 model_base=8)
    pred = ScenePredictor(cfg, checkpoint=None, bucket=32, quant="int8")
    rng = np.random.RandomState(2)
    d1 = rng.randn(45, 53, 13).astype(np.float32)
    d2 = rng.randn(45, 53, 13).astype(np.float32)
    mask = pred.predict(d1, d2)
    assert mask.shape == (45, 53)
    assert set(np.unique(mask)) <= {0, 1}
    # after self-calibration the serving forward is the quantized callable
    assert not hasattr(pred.model, "apply")
    # second predict must NOT recalibrate (runner cache persists)
    n = len(pred._compiled)
    pred.predict(d1, d2)
    assert len(pred._compiled) == n


def test_int8_requires_fold_bn():
    cfg = Config(patch_size=16, dtype="float32", model_base=8)
    with pytest.raises(ValueError):
        ScenePredictor(cfg, fold_bn=False, quant="int8")
