"""OSCD/Onera dataset semantics: city listing, patch grids, city loading.

Re-derivation of /root/reference/utils/dataloaders.py for NHWC and a
thread-pooled host pipeline:

- ``patch_grid``/``get_train_val_metadata`` reproduce the stride-grid patch
  enumeration of dataloaders.py:51-78 ([city, i, j] for every grid point
  whose patch fits inside the label raster).
- ``load_city`` reproduces city_loader (dataloaders.py:86-112): per band
  read → (x - mean) / std → bilinear-resize to label dims; dates stacked.
  Output is (2, H, W, 13) float32 — NHWC per date, TPU layout — vs the
  reference's (2, 13, H, W).
- ``full_load`` reproduces full_onera_loader (dataloaders.py:115-145) with a
  ThreadPoolExecutor instead of a fork-per-city multiprocessing Pool (the
  heavy lifting is in C libraries that release the GIL; threads avoid
  copying multi-GB arrays across fork boundaries).

On-disk layout (reference-compatible):
``images/<city>/imgs_{1,2}/<prefix><BAND>.{tif,npy}``,
``labels/<city>/cm/cm.png``.
"""

from __future__ import annotations

import glob
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from fabric_tpu.data.geotiff import read_band
from fabric_tpu.utils.image import read_png_gray, resize_bilinear


def list_cities(data_dir: str) -> list[str]:
    """Sorted city names under labels/ (dataloaders.py:52-55)."""
    root = os.path.join(data_dir, "labels")
    cities = [c for c in os.listdir(root)
              if not c.startswith(".") and os.path.isdir(os.path.join(root, c))]
    cities.sort()
    return cities


def patch_grid(label_shape: tuple[int, int], patch_size: int,
               stride: int) -> list[tuple[int, int]]:
    """Stride-grid patch coordinates whose patch fits inside the raster
    (dataloaders.py:60-66 semantics)."""
    h, w = label_shape
    return [(i, j)
            for i in range(0, h, stride)
            for j in range(0, w, stride)
            if i + patch_size <= h and j + patch_size <= w]


def get_train_val_metadata(data_dir: str, val_cities: list[str],
                           patch_size: int, stride: int):
    """([(city, i, j)], [(city, i, j)]) for train/val (dataloaders.py:51-78).

    Train cities = all cities minus val; enumeration order is per sorted
    city, row-major grid.  (The reference shuffles later, in the preloader.)
    """
    cities = list_cities(data_dir)
    train_cities = sorted(set(cities) - set(val_cities))
    def enumerate_for(city_list):
        out = []
        for city in city_list:
            label = load_label(data_dir, city)
            out.extend((city, i, j)
                       for i, j in patch_grid(label.shape, patch_size, stride))
        return out
    return enumerate_for(train_cities), enumerate_for(val_cities)


def metadata_from_dataset(dataset: dict, val_cities: list[str],
                          patch_size: int, stride: int):
    """:func:`get_train_val_metadata` over an IN-MEMORY dataset dict —
    grids come from ``dataset[city]['labels'].shape``, so an injected
    dataset needs no on-disk layout at all (r2 weak #6: the loop used to
    re-open every label PNG even when the dataset was passed in memory)."""
    cities = sorted(dataset)
    train_cities = sorted(set(cities) - set(val_cities))

    def enumerate_for(city_list):
        out = []
        for city in city_list:
            shape = dataset[city]["labels"].shape
            out.extend((city, i, j)
                       for i, j in patch_grid(shape, patch_size, stride))
        return out
    return enumerate_for(train_cities), enumerate_for(val_cities)


def load_label(data_dir: str, city: str) -> np.ndarray:
    """(H, W) uint8 change mask in {0, 1} (dataloaders.py:81-83)."""
    path = os.path.join(data_dir, "labels", city, "cm", "cm.png")
    return (read_png_gray(path).astype(np.float64) / 255).astype(np.uint8)


def band_files(image_dir: str, band_ids: list[str]) -> list[str]:
    """Resolve the per-band files of one date dir, in band_ids order.

    The reference derives a path prefix by stripping the band suffix from
    the first glob hit (dataloaders.py:92) — equivalent to matching
    ``<prefix><BAND>.<ext>`` per band, which is what we do explicitly.
    """
    files = sorted(glob.glob(os.path.join(image_dir, "*")))
    out = []
    for band in band_ids:
        hits = [f for f in files
                if os.path.splitext(os.path.basename(f))[0].endswith(band)]
        if not hits:
            raise FileNotFoundError(f"band {band} not found in {image_dir}")
        out.append(hits[0])
    return out


def num_dates_on_disk(data_dir: str, city: str) -> int:
    """Count imgs_1..imgs_T date directories for a city."""
    root = os.path.join(data_dir, "images", city)
    t = 0
    while os.path.isdir(os.path.join(root, f"imgs_{t + 1}")):
        t += 1
    return t


def load_city(data_dir: str, city: str, cfg,
              out_shape: tuple[int, int] | None = None,
              num_dates: int | None = None) -> np.ndarray:
    """(T, H, W, 13) float32: all dates, normalized, resized to label dims
    (dataloaders.py:86-112; the reference is fixed to T=2).  ``out_shape``
    overrides the target size (whole-scene inference passes the template
    band's dims, inference.py:47-51); ``num_dates`` defaults to what's on
    disk."""
    if out_shape is None:
        label = load_label(data_dir, city)
        out_h, out_w = label.shape
    else:
        out_h, out_w = out_shape
    if num_dates is None:
        num_dates = num_dates_on_disk(data_dir, city) or 2
    means, stds = cfg.band_stats_arrays()
    from fabric_tpu import native
    use_native = native.available()
    dates = []
    for date_dir in (f"imgs_{t + 1}" for t in range(num_dates)):
        image_dir = os.path.join(data_dir, "images", city, date_dir)
        paths = band_files(image_dir, cfg.band_ids)
        bands = []
        for k, path in enumerate(paths):
            band = read_band(path)
            if use_native:
                out = native.normalize_resize(band, means[k], stds[k],
                                              out_h, out_w)
                if out is not None:
                    bands.append(out)
                    continue
            band = (band - means[k]) / stds[k]
            if band.shape != (out_h, out_w):
                band = resize_bilinear(band, out_h, out_w)
            bands.append(band.astype(np.float32))
        dates.append(np.stack(bands, axis=-1))  # (H, W, 13) NHWC
    return np.stack(dates)  # (T, H, W, 13)


def full_load(data_dir: str, cfg, max_workers: int | None = None) -> dict:
    """{city: {'images': (2,H,W,13) f32, 'labels': (H,W) u8}} — the whole
    dataset resident in host RAM (dataloaders.py:115-145)."""
    cities = list_cities(data_dir)
    workers = max_workers or max(2, (os.cpu_count() or 1) * 2)
    t = getattr(cfg, "num_dates", None)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        labels = list(pool.map(lambda c: load_label(data_dir, c), cities))
        images = list(pool.map(
            lambda c: load_city(data_dir, c, cfg, num_dates=t), cities))
    return {c: {"images": img, "labels": lab}
            for c, img, lab in zip(cities, images, labels)}
