"""Tools tests: band stats (compute_band_stat.ipynb replacement), label
rasterizer (label_maker.ipynb replacement), profiling utilities."""

import json

import numpy as np

from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset
from fabric_tpu.tools.band_stats import compute_band_stats
from fabric_tpu.tools.make_labels import rasterize_geojson


def test_band_stats_recovers_synthetic_stats(tmp_path):
    cfg = Config(dataset_dir=str(tmp_path))
    generate_synthetic_dataset(cfg.dataset_dir, cfg, seed=5)
    stats = compute_band_stats(cfg.dataset_dir, cfg.band_ids)
    # synthetic bands are ~N(mean_b, std_b) plus the injected change
    # signature (+2 sigma inside blobs on later dates), so recovered stats
    # must sit within ~0.5 sigma of the configured values
    for b in cfg.band_ids:
        assert abs(stats["band_means"][b] - cfg.band_means[b]) \
            < 0.5 * cfg.band_stds[b] + 1.0
        assert 0.7 < stats["band_stds"][b] / cfg.band_stds[b] < 1.4


def test_band_stats_cli(tmp_path):
    from fabric_tpu.tools.band_stats import main
    cfg = Config(dataset_dir=str(tmp_path / "d"))
    generate_synthetic_dataset(cfg.dataset_dir, cfg)
    out = str(tmp_path / "stats.json")
    assert main(["--dataset_dir", cfg.dataset_dir, "--output", out]) == 0
    stats = json.load(open(out))
    assert set(stats) == {"band_means", "band_stds"}
    assert len(stats["band_means"]) == 13


def test_rasterize_rectangle():
    gj = {"type": "Polygon",
          "coordinates": [[[10, 5], [30, 5], [30, 15], [10, 15]]]}
    mask = rasterize_geojson(gj, 20, 40)
    assert mask[10, 20] == 1      # inside
    assert mask[2, 20] == 0       # above
    assert mask[10, 35] == 0      # right of
    # filled area ~ (30-10) x (15-5) = 200 px
    assert 150 < mask.sum() < 250


def test_rasterize_feature_collection_multipolygon():
    gj = {"type": "FeatureCollection", "features": [
        {"geometry": {"type": "MultiPolygon", "coordinates": [
            [[[0, 0], [5, 0], [5, 5], [0, 5]]],
            [[[10, 10], [15, 10], [15, 15], [10, 15]]],
        ]}}]}
    mask = rasterize_geojson(gj, 20, 20)
    assert mask[2, 2] == 1 and mask[12, 12] == 1 and mask[8, 8] == 0


def test_step_timer():
    import time
    from fabric_tpu.utils.profiling import StepTimer
    timer = StepTimer()
    for _ in range(3):
        with timer:
            time.sleep(0.01)
    s = timer.summary(batch_size=4)
    assert s["steps"] == 3
    assert s["mean_step_s"] >= 0.01
    assert s["examples_per_sec"] > 0
