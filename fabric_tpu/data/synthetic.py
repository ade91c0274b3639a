"""Synthetic OSCD-layout dataset generator for tests, CI, and benchmarks.

Writes the exact on-disk layout the loaders expect
(images/<city>/imgs_{1,2}/<prefix><BAND>.npy, labels/<city>/cm/cm.png,
images/<city>/pair/img{1,2}.png) with band statistics matching the
configured per-band mean/std, so normalized values are ~N(0,1), change
masks are blob-shaped, and date-2 differs from date-1 inside change regions
— enough signal that a few training steps measurably reduce the loss.
"""

from __future__ import annotations

import os

import numpy as np

from fabric_tpu.utils.image import write_png


def _blob_mask(h: int, w: int, rng: np.random.RandomState,
               n_blobs: int = 4) -> np.ndarray:
    mask = np.zeros((h, w), bool)
    for _ in range(n_blobs):
        cy, cx = rng.randint(0, h), rng.randint(0, w)
        ry, rx = rng.randint(h // 16 + 1, h // 4 + 2), rng.randint(w // 16 + 1, w // 4 + 2)
        yy, xx = np.ogrid[:h, :w]
        mask |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    return mask


def generate_synthetic_dataset(root: str, cfg, cities: list[str] | None = None,
                               sizes: list[tuple[int, int]] | None = None,
                               seed: int = 0, num_dates: int = 2) -> list[str]:
    """Create a synthetic dataset under ``root``; returns the city list.

    ``num_dates > 2`` writes imgs_1..imgs_T for the multi-date variants
    (UNetLSTM / 3D U-Net, BASELINE configs 3/5); change appears gradually
    over the sequence, fully developed by the last date.
    """
    rng = np.random.RandomState(seed)
    cities = cities or ["alpha", "beta", "gamma"]
    sizes = sizes or [(97, 113), (128, 96), (75, 75)]
    means, stds = cfg.band_stats_arrays()
    for city, (h, w) in zip(cities, sizes):
        mask = _blob_mask(h, w, rng)
        base = rng.randn(h, w, len(cfg.band_ids)).astype(np.float32)
        dates = []
        for t in range(num_dates):
            d = base + rng.randn(h, w, len(cfg.band_ids)).astype(np.float32) * 0.1
            # change signature ramps up over the sequence (0 at date 1)
            d[mask] += 2.0 * t / max(num_dates - 1, 1)
            dates.append(d)
        for t, cube in enumerate(dates):
            date = f"imgs_{t + 1}"
            ddir = os.path.join(root, "images", city, date)
            os.makedirs(ddir, exist_ok=True)
            for k, band in enumerate(cfg.band_ids):
                raw = cube[:, :, k] * stds[k] + means[k]
                np.save(os.path.join(ddir, f"{city}_{date}_{band}.npy"),
                        raw.astype(np.float32))
        ldir = os.path.join(root, "labels", city, "cm")
        os.makedirs(ldir, exist_ok=True)
        write_png(os.path.join(ldir, "cm.png"),
                  mask.astype(np.uint8) * 255)
        pdir = os.path.join(root, "images", city, "pair")
        os.makedirs(pdir, exist_ok=True)
        rgb1 = np.clip((dates[0][:, :, 1:4] + 3) * 42, 0, 255).astype(np.uint8)
        rgb2 = np.clip((dates[-1][:, :, 1:4] + 3) * 42, 0, 255).astype(np.uint8)
        write_png(os.path.join(pdir, "img1.png"), rgb1)
        write_png(os.path.join(pdir, "img2.png"), rgb2)
    return list(cities)
