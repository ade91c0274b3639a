"""Serving-bundle export (tools/export.py): fold + calibrate offline,
serve from one artifact with no checkpoint machinery."""

import json
import os

import numpy as np
import pytest

from fabric_tpu import checkpoint as ckpt
from fabric_tpu.config import Config
from fabric_tpu.infer.service import ScenePredictor
from fabric_tpu.models import build_model
from fabric_tpu.tools.export import export_bundle, load_bundle, main
from fabric_tpu.train.state import create_state


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("run")
    cfg = Config(patch_size=16, dtype="float32", model_base=8)
    state = create_state(cfg, build_model(cfg))
    ckpt.save(state, str(d), epoch=0)
    return cfg, str(d)


def test_export_and_load_roundtrip(run_dir, tmp_path):
    cfg, d = run_dir
    out = str(tmp_path / "bundle.npz")
    meta = export_bundle(cfg, d, out, quant="int8")
    assert meta["quant"] == "int8" and meta["fold_bn"]
    params, scales, meta2 = load_bundle(out)
    assert meta2 == meta
    assert scales and all(v > 0 for v in scales.values())
    # folded tree has conv kernels but no BN params
    assert "kernel" in params["inc"]["conv1"]
    assert "bn1" not in params["inc"]


def test_bundle_serves(run_dir, tmp_path):
    cfg, d = run_dir
    out = str(tmp_path / "bundle.npz")
    export_bundle(cfg, d, out, quant="int8")
    served = ScenePredictor(cfg, bundle=out, bucket=32)
    assert served.quant == "int8"
    assert not hasattr(served.model, "apply")  # pre-calibrated callable
    rng = np.random.RandomState(0)
    d1 = rng.randn(40, 44, 13).astype(np.float32)
    d2 = rng.randn(40, 44, 13).astype(np.float32)
    mask = served.predict(d1, d2)
    assert mask.shape == (40, 44)
    # checkpoint-backed bf16 predictor mostly agrees
    direct = ScenePredictor(cfg, checkpoint=d, bucket=32)
    ref = direct.predict(d1, d2)
    assert (mask == ref).mean() > 0.9


def test_cli_main(run_dir, tmp_path, capsys):
    cfg, d = run_dir
    out = str(tmp_path / "b.npz")
    rc = main(["--out", out, "--quant", "none", "--resume", d,
               "--patch_size", "16", "--model_base", "8",
               "--dtype", "float32"])
    assert rc == 0 and os.path.exists(out)
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["quant"] == "none"
    params, scales, _ = load_bundle(out)
    assert scales is None and "inc" in params


def test_bundle_channel_mismatch_raises(run_dir, tmp_path):
    cfg, d = run_dir
    out = str(tmp_path / "bundle.npz")
    export_bundle(cfg, d, out)
    bad = Config(patch_size=16, dtype="float32", model_base=8,
                 band_ids=["B02", "B03", "B04", "B08"])
    with pytest.raises(ValueError):
        ScenePredictor(bad, bundle=out)
