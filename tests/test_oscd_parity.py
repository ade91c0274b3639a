"""Hermetic end-to-end drive of the turnkey OSCD parity harness
(tools/oscd_parity.py, r4 VERDICT #3): on the synthetic OSCD-layout
fixture the tool must run the actual reference train.py offline, run our
compat-mode loop, and report a within-bar F1 delta + matching checkpoint
decisions — the same command a user points at the real OSCD directory
(deploy/RUNBOOK.md "OSCD F1 parity")."""

import json
import os

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "models")),
    reason="reference repo not mounted")


@pytest.fixture(scope="module")
def report_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("oscd_parity")
    data_dir = str(root / "data") + "/"
    from fabric_tpu.config import Config
    from fabric_tpu.data.synthetic import generate_synthetic_dataset
    cfg = Config(dataset_dir=data_dir, patch_size=32, stride=32,
                 batch_size=6, epochs=2, learning_rate=0.001,
                 loss_function="tversky", tversky_alpha=0.1,
                 tversky_beta=0.9, augmentation=True,
                 validation_cities=["gamma"])
    generate_synthetic_dataset(data_dir, cfg,
                               cities=["alpha", "beta", "gamma"],
                               sizes=[(128, 128), (96, 128), (70, 140)],
                               seed=7)
    from fabric_tpu.tools.oscd_parity import run_parity
    out = str(root / "report")
    report = run_parity(cfg, out, timeout_s=900)
    return report, out


def test_report_f1_within_bar(report_env):
    report, _ = report_env
    # identical math on both sides: the delta must be far inside the 1%
    # bar, not merely under it
    assert report["f1_within_bar"]
    assert abs(report["final_val_f1"]["delta"]) < 3e-3
    assert report["checkpoint_epochs"]["match"]


def test_report_per_epoch_rows_complete(report_env):
    report, _ = report_env
    assert len(report["epochs"]) == 2
    for row in report["epochs"]:
        for phase in ("train", "validate"):
            for m in ("cd_losses", "cd_precisions", "cd_recalls",
                      "cd_f1scores"):
                cell = row[f"{phase}_{m}"]
                assert set(cell) == {"ref", "ours", "delta"}
                assert abs(cell["delta"]) < 0.02


def test_report_files_written(report_env):
    report, out = report_env
    with open(os.path.join(out, "report.json")) as f:
        assert json.load(f)["f1_within_bar"] == report["f1_within_bar"]
    md = open(os.path.join(out, "report.md")).read()
    assert "PASS" in md and "| epoch | phase | metric |" in md


def test_scene_mask_agreement(report_env):
    report, _ = report_env
    rec = report["scene_mask_agreement"]["gamma"]
    assert rec["shape"] == [70, 140]  # non-square: W/H orientation pinned
    assert rec["agreement"] > 0.995
