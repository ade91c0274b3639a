"""Periodic (step-based) checkpointing and distributed no-op init."""

import os

from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset


def test_checkpoint_every_writes_periodic(tmp_path):
    from fabric_tpu.train.loop import train
    cfg = Config(dataset_dir=str(tmp_path / "d"),
                 weight_dir=str(tmp_path / "w"),
                 log_dir=str(tmp_path / "l"),
                 model_base=8, patch_size=16, stride=16, batch_size=4,
                 epochs=1, steps_per_epoch=4, dtype="float32",
                 validation_cities=["beta"], checkpoint_every=2, prefetch=0)
    generate_synthetic_dataset(cfg.dataset_dir, cfg, seed=1)
    train(cfg, run_scene_inference=False)
    files = os.listdir(cfg.weight_dir)
    assert any(f.startswith("periodic_epoch_") for f in files)
    # best-metric checkpoint is still written too
    assert any(f.startswith("checkpoint_epoch_") for f in files)


def test_distributed_noop_on_single_host():
    from fabric_tpu.parallel.distributed import maybe_initialize, is_primary
    assert maybe_initialize() is False
    assert is_primary() is True
