"""End-to-end driver run for the multi-date variants (BASELINE configs 3/5):
train a tiny UNetLSTM through the full loop, including whole-scene
inference with all dates."""

import os

import pytest

from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset


@pytest.mark.parametrize("model_name", ["unet_lstm", "unet3d"])
def test_variant_train_loop(tmp_path, model_name):
    from fabric_tpu.train.loop import train
    cfg = Config(
        model=model_name, model_base=8, num_dates=3,
        dataset_dir=str(tmp_path / "data"),
        weight_dir=str(tmp_path / "weights"),
        log_dir=str(tmp_path / "logs"),
        patch_size=16, stride=16, batch_size=4, epochs=1,
        learning_rate=0.05, dtype="float32",
        validation_cities=["beta"], steps_per_epoch=3, prefetch=1,
    )
    generate_synthetic_dataset(cfg.dataset_dir, cfg, num_dates=3, seed=11)
    state, history = train(cfg, run_scene_inference=True)
    assert len(history["train"]) == 1
    assert history["train"][0]["cd_losses"] > 0
    # checkpoint written, scene inference image produced with 3 dates
    assert any(f.endswith(".msgpack") for f in os.listdir(cfg.weight_dir))
    run_dir = os.path.join(cfg.log_dir, sorted(os.listdir(cfg.log_dir))[-1])
    assert any("beta_epoch" in f for f in os.listdir(run_dir))
