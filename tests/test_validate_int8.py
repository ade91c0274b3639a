"""tools/validate_int8: per-city int8-vs-bf16 scene validation gate."""

import json

import numpy as np
import pytest

from fabric_tpu import checkpoint as ckpt
from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset
from fabric_tpu.models import build_model
from fabric_tpu.tools.validate_int8 import main, validate
from fabric_tpu.train.state import create_state


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("v8")
    cfg = Config(dataset_dir=str(root / "data"),
                 weight_dir=str(root / "w"), patch_size=16,
                 dtype="float32", model_base=8,
                 validation_cities=["alpha"], resume=str(root / "w"))
    generate_synthetic_dataset(cfg.dataset_dir, cfg, cities=["alpha"],
                               sizes=[(64, 48)])
    state = create_state(cfg, build_model(cfg))
    ckpt.save(state, cfg.weight_dir, epoch=0)
    return cfg


def test_validate_reports(env):
    reports, ok = validate(env, cities=["alpha"], max_f1_drop=1.0)
    assert len(reports) == 1
    r = reports[0]
    assert r["city"] == "alpha"
    assert 0.0 <= r["mask_agreement"] <= 1.0
    assert "f1_bf16" in r and "f1_int8" in r and "f1_delta" in r
    assert ok and r["verdict"] == "ok"


def test_cli_gate_pass_and_fail(env, capsys):
    base = ["--dataset_dir", env.dataset_dir, "--resume", env.weight_dir,
            "--patch_size", "16", "--dtype", "float32", "--model_base",
            "8", "--validation_cities", '["alpha"]']
    rc = main(base + ["--max_f1_drop", "1.0"])
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert rc == 0
    assert lines[-1]["summary"] == "ok"
    # an impossible budget forces the FAIL exit path
    rc = main(base + ["--max_f1_drop", "-1.0"])
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert rc == 1
    assert lines[-1]["summary"] == "FAIL"


def test_validate_multidate(tmp_path):
    """The gate covers the multi-date variants too (predict_city
    dispatches to predict_multidate; int8 via quant_multidate): reports
    and the agreement gate work for a UNetLSTM checkpoint."""
    cfg = Config(dataset_dir=str(tmp_path / "data"),
                 weight_dir=str(tmp_path / "w"), patch_size=16,
                 dtype="float32", model="unet_lstm", model_base=8,
                 num_dates=3, validation_cities=["alpha"],
                 resume=str(tmp_path / "w"))
    generate_synthetic_dataset(cfg.dataset_dir, cfg, cities=["alpha"],
                               sizes=[(64, 48)], num_dates=3)
    state = create_state(cfg, build_model(cfg))
    ckpt.save(state, cfg.weight_dir, epoch=0)
    reports, ok = validate(cfg, cities=["alpha"], max_f1_drop=1.0,
                           min_agreement=0.0)
    assert len(reports) == 1 and reports[0]["city"] == "alpha"
    assert 0.0 <= reports[0]["mask_agreement"] <= 1.0
    assert "f1_delta" in reports[0]
