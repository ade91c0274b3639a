"""Profiling is wired into the training loop (SURVEY.md §5): a jax trace is
captured for the first N steps and throughput lands in metrics.jsonl."""

import glob
import json
import os

import pytest

from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset


def test_profile_dir_and_examples_per_sec(tmp_path):
    from fabric_tpu.train.loop import train
    cfg = Config(
        dataset_dir=str(tmp_path / "data"), weight_dir=str(tmp_path / "w"),
        log_dir=str(tmp_path / "log"), patch_size=16, stride=16,
        batch_size=4, epochs=1, steps_per_epoch=3, dtype="float32",
        model_base=8, validation_cities=["beta"], num_workers=0,
        prefetch=0, profile_dir=str(tmp_path / "trace"), profile_steps=2)
    generate_synthetic_dataset(cfg.dataset_dir, cfg,
                               cities=["alpha", "beta"],
                               sizes=[(48, 48), (40, 40)], seed=1)
    train(cfg, run_scene_inference=False)

    # a TensorBoard-format trace was produced
    traces = glob.glob(os.path.join(str(tmp_path / "trace"), "**", "*"),
                       recursive=True)
    assert any(os.path.isfile(t) for t in traces), traces

    # examples/sec + step-time percentiles stream to metrics.jsonl
    run_dir = os.path.join(cfg.log_dir, os.listdir(cfg.log_dir)[0])
    with open(os.path.join(run_dir, "metrics.jsonl")) as fin:
        records = [json.loads(line) for line in fin]
    perf = [r for r in records if "train_examples_per_sec" in r]
    assert perf and perf[0]["train_examples_per_sec"] > 0
    assert "train_p50_step_s" in perf[0]


def test_step_timer_summary():
    import time
    from fabric_tpu.utils.profiling import StepTimer
    t = StepTimer()
    for _ in range(4):
        with t:
            time.sleep(0.002)
    s = t.summary(batch_size=8)
    assert s["steps"] == 4
    assert s["examples_per_sec"] > 0
    assert s["p95_step_s"] >= s["p50_step_s"] > 0
