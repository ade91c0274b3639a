"""Config tests: JSON loading (reference metadata.json compatible), CLI
overrides (fixing the reference's dead argparse), precedence."""

import json

from fabric_tpu.config import Config, load_config


def test_defaults_match_reference_metadata():
    cfg = Config()
    assert cfg.patch_size == 90 and cfg.stride == 180
    assert cfg.batch_size == 32 and cfg.learning_rate == 0.001
    assert cfg.loss_function == "tversky"
    assert cfg.tversky_alpha == 0.1 and cfg.tversky_beta == 0.9
    assert cfg.validation_cities == ["cupertino", "rennes"]
    assert cfg.n_channels == 13 and cfg.n_classes == 2
    means, stds = cfg.band_stats_arrays()
    assert means.shape == (13,) and stds.shape == (13,)


def test_load_reference_metadata_json(tmp_path):
    meta = {"patch_size": 64, "loss_function": "dice",
            "_comment": "unknown keys must be ignored"}
    p = tmp_path / "metadata.json"
    p.write_text(json.dumps(meta))
    cfg = load_config(argv=["--config", str(p)])
    assert cfg.patch_size == 64 and cfg.loss_function == "dice"


def test_cli_overrides_json(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(json.dumps({"batch_size": 8, "learning_rate": 0.5}))
    cfg = load_config(argv=["--config", str(p), "--batch_size", "16",
                            "--augmentation", "false",
                            "--validation_cities", '["pisa"]'])
    assert cfg.batch_size == 16          # CLI wins over JSON
    assert cfg.learning_rate == 0.5      # JSON wins over default
    assert cfg.augmentation is False
    assert cfg.validation_cities == ["pisa"]


def test_focal_gamma_has_default():
    # reference bug: focal loss crashed because metadata.json lacks focal_gamma
    cfg = load_config(argv=["--loss_function", "focal"])
    assert isinstance(cfg.focal_gamma, float)


def test_roundtrip_dict():
    cfg = Config(batch_size=4)
    cfg2 = Config.from_dict(cfg.to_dict())
    assert cfg2.batch_size == 4 and cfg2.band_ids == cfg.band_ids


def test_loads_actual_reference_metadata_json():
    """The reference's shipped metadata.json must load unchanged."""
    import os
    path = "/root/reference/metadata.json"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference not mounted")
    cfg = load_config(argv=["--config", path])
    assert cfg.patch_size == 90 and cfg.stride == 180
    assert cfg.loss_function == "tversky"
    assert cfg.tversky_alpha == 0.1 and cfg.tversky_beta == 0.9
    assert cfg.validation_cities == ["cupertino", "rennes"]
    assert cfg.dataset_name == "onera_w_mask.tar.gz"
    assert cfg.num_gpus == 1  # accepted for compat even though unused
    means, stds = cfg.band_stats_arrays()
    assert means.shape == (13,)
