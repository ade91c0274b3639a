"""Standalone evaluation (fabric_tpu.evaluate / cli.evaluate): a trained
checkpoint's recorded validation metrics must be exactly reproducible
outside the training driver (the reference's val phase only exists inside
train.py:125-205)."""

import json
import os
import re

import numpy as np
import pytest

from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval")
    cfg = Config(
        dataset_dir=str(root / "data"), weight_dir=str(root / "weights"),
        log_dir=str(root / "logs"), patch_size=16, stride=16,
        batch_size=8, epochs=2, learning_rate=0.05, dtype="float32",
        validation_cities=["beta"], augmentation=True,
        num_workers=0, prefetch=1, seed=0,
    )
    generate_synthetic_dataset(cfg.dataset_dir, cfg, seed=3)
    from fabric_tpu.train.loop import train
    train(cfg, run_scene_inference=True)
    return cfg


def _best_checkpoint_metadata(weight_dir: str) -> dict:
    from fabric_tpu import checkpoint as ckpt
    best = ckpt.read_pointer(weight_dir, "best")
    assert best, "training should have written a best pointer"
    epoch = int(re.search(r"_epoch_(\d+)\.msgpack$", best).group(1))
    with open(os.path.join(weight_dir, f"metadata_epoch_{epoch}.json")) as f:
        return json.load(f)


def test_evaluate_reproduces_training_val_metrics(env):
    """evaluate() on the best checkpoint == the val metrics the loop saved
    with it (same mask-padded batching, counts, and aggregation)."""
    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.evaluate import evaluate
    recorded = _best_checkpoint_metadata(env.weight_dir)["validation_metrics"]
    cfg = Config.from_dict({**env.to_dict(),
                            "resume": ckpt.read_pointer(env.weight_dir,
                                                        "best")})
    result = evaluate(cfg, run_scene_inference=True)
    for k in ("cd_losses", "cd_corrects", "cd_precisions", "cd_recalls",
              "cd_f1scores", "global_f1"):
        np.testing.assert_allclose(result["patch"][k], recorded[k],
                                   rtol=0, atol=1e-6, err_msg=k)
    # scene F1 matches the loop's recorded per-city scene metric
    np.testing.assert_allclose(result["scenes"]["beta"]["f1"],
                               recorded["beta_scene_f1"], rtol=0, atol=1e-6)
    assert 0.0 <= result["scenes"]["beta"]["change_pct"] <= 100.0


def test_evaluate_cli(env, tmp_path):
    from fabric_tpu.cli.evaluate import main
    out = str(tmp_path / "metrics.json")
    rc = main(["--dataset_dir", env.dataset_dir,
               "--resume", env.weight_dir,
               "--patch_size", "16", "--stride", "16", "--dtype", "float32",
               "--validation_cities", '["beta"]',
               "--output", out])
    assert rc == 0
    with open(out) as f:
        result = json.load(f)
    assert result["patch"]["num_batches"] >= 1
    assert result["patch"]["cd_f1scores"] > 0.45  # the model learned
    assert "beta" in result["scenes"]


def test_evaluate_cli_requires_resume(env):
    from fabric_tpu.cli.evaluate import main
    assert main(["--dataset_dir", env.dataset_dir]) == 2
