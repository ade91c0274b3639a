"""End-to-end slice (SURVEY.md §7 stage 4-5): train on a synthetic dataset
on CPU, check the loss decreases, checkpoints are written, resume works,
and whole-scene inference produces a mask."""

import os

import numpy as np
import pytest

from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset
from fabric_tpu.track import Tracker


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    cfg = Config(
        dataset_dir=str(root / "data"), weight_dir=str(root / "weights"),
        log_dir=str(root / "logs"), patch_size=16, stride=16,
        batch_size=8, epochs=2, learning_rate=0.05, dtype="float32",
        validation_cities=["beta"], augmentation=True,
        num_workers=0, prefetch=1, seed=0,
    )
    generate_synthetic_dataset(cfg.dataset_dir, cfg, seed=3)
    return cfg


def test_train_loop_e2e(env):
    from fabric_tpu.train.loop import train
    cfg = env
    state, history = train(cfg, run_scene_inference=True)
    assert len(history["train"]) == 2
    # loss must decrease across epochs on the strongly-signalled synthetic set
    assert history["train"][1]["cd_losses"] < history["train"][0]["cd_losses"]
    # best-metric checkpoint exists
    files = os.listdir(cfg.weight_dir)
    assert any(f.endswith(".msgpack") for f in files)
    assert any(f.startswith("metadata_epoch_") for f in files)
    # scene inference image was logged by the tracker
    runs = os.listdir(cfg.log_dir)
    assert runs
    run_dir = os.path.join(cfg.log_dir, sorted(runs)[-1])
    assert any("beta_epoch" in f for f in os.listdir(run_dir))
    # learning happened: val F1 measures ~0.60 on this config (blob-change
    # data is designed easy); 0.45 leaves margin without letting a
    # near-broken model pass (r1 weak #7 asked for >0.15 to be tightened)
    assert history["val"][-1]["cd_f1scores"] > 0.45


def test_resume_continues_from_checkpoint(env):
    from fabric_tpu.train.loop import train
    cfg = Config.from_dict({**env.to_dict(), "epochs": 3,
                            "resume": env.weight_dir,
                            "steps_per_epoch": 2})
    state, history = train(cfg, run_scene_inference=False)
    # resumed: ran only the epochs after the checkpointed one
    assert len(history["train"]) < 3
    assert int(state.step) > 0


def test_infer_cli_writes_mask(env, tmp_path):
    from fabric_tpu.cli.infer import main
    out_dir = str(tmp_path / "masks")
    rc = main(["--dataset_dir", env.dataset_dir,
               "--resume", env.weight_dir,
               "--patch_size", "16", "--dtype", "float32",
               "--city", "alpha", "--output_dir", out_dir])
    assert rc == 0
    out = os.path.join(out_dir, "alpha_mask.png")
    assert os.path.exists(out)
    from fabric_tpu.utils.image import read_png_gray
    mask = read_png_gray(out)
    assert mask.shape == (97, 113)
    assert set(np.unique(mask)) <= {0, 255}


def test_infer_cli_int8_quant(env, tmp_path):
    """--quant int8 serves through ScenePredictor (self-calibrated) and
    mostly agrees with the exact-path CLI mask."""
    from fabric_tpu.cli.infer import main
    from fabric_tpu.utils.image import read_png_gray
    out_a = str(tmp_path / "exact")
    out_b = str(tmp_path / "int8")
    base = ["--dataset_dir", env.dataset_dir, "--resume", env.weight_dir,
            "--patch_size", "16", "--dtype", "float32", "--city", "alpha"]
    assert main(base + ["--output_dir", out_a]) == 0
    assert main(base + ["--output_dir", out_b, "--quant", "int8"]) == 0
    ref = read_png_gray(os.path.join(out_a, "alpha_mask.png"))
    got = read_png_gray(os.path.join(out_b, "alpha_mask.png"))
    assert got.shape == ref.shape
    assert (got == ref).mean() > 0.9


def test_infer_cli_banded_overlap(env, tmp_path):
    """--overlap_band_rows routes the CLI through the bounded-memory banded
    overlap path and reproduces the unbanded overlap mask exactly."""
    from fabric_tpu.cli.infer import main
    from fabric_tpu.config import Config
    from fabric_tpu.infer.service import ScenePredictor
    from fabric_tpu.utils.image import read_png_gray
    out_dir = str(tmp_path / "masks")
    rc = main(["--dataset_dir", env.dataset_dir, "--resume", env.weight_dir,
               "--patch_size", "16", "--dtype", "float32",
               "--infer_overlap", "8", "--overlap_band_rows", "2",
               "--city", "alpha", "--output_dir", out_dir])
    assert rc == 0
    got = read_png_gray(os.path.join(out_dir, "alpha_mask.png"))
    assert got.shape == (97, 113)
    cfg = Config.from_dict({**env.to_dict(), "infer_overlap": 8})
    ref = ScenePredictor(cfg, checkpoint=env.weight_dir).predict_city(
        "alpha")
    np.testing.assert_array_equal(got, ref * 255)


def test_infer_cli_from_bundle(env, tmp_path):
    from fabric_tpu.cli.infer import main
    from fabric_tpu.tools.export import export_bundle
    from fabric_tpu.utils.image import read_png_gray
    bundle = str(tmp_path / "b.npz")
    export_bundle(env, env.weight_dir, bundle, quant="int8")
    out_dir = str(tmp_path / "masks")
    rc = main(["--dataset_dir", env.dataset_dir, "--bundle", bundle,
               "--patch_size", "16", "--dtype", "float32",
               "--city", "alpha", "--output_dir", out_dir])
    assert rc == 0
    mask = read_png_gray(os.path.join(out_dir, "alpha_mask.png"))
    assert mask.shape == (97, 113)


def test_infer_cli_packed_fleet(env, tmp_path):
    """--pack serves the requested cities through the fleet-packed
    ScenePredictor path with masks bit-identical to the same predictor's
    per-scene serving (the pack guarantee; the slow reference-shaped CLI
    path serves unfolded BN so it is compared loosely, like the int8
    test)."""
    from fabric_tpu.cli.infer import main
    from fabric_tpu.infer.service import ScenePredictor
    from fabric_tpu.utils.image import read_png_gray
    out_dir = str(tmp_path / "packed")
    rc = main(["--dataset_dir", env.dataset_dir, "--resume", env.weight_dir,
               "--patch_size", "16", "--dtype", "float32",
               "--city", "alpha", "--city", "beta",
               "--output_dir", out_dir, "--pack", "2"])
    assert rc == 0
    pred = ScenePredictor(env, checkpoint=env.weight_dir)
    for city in ("alpha", "beta"):
        got = read_png_gray(os.path.join(out_dir, f"{city}_mask.png"))
        np.testing.assert_array_equal(got, pred.predict_city(city) * 255)
