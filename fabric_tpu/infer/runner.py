"""Whole-scene inference: tile → batched sharded forward → stitch.

TPU-native rework of the reference's per-epoch full-image inference
(train.py:177-205 + utils/inference.py:20-131): fixed-shape batches (the
tile count is padded to a batch multiple so jit compiles exactly once per
patch size), batches sharded over the mesh's data axis so a v5p slice
processes tiles in parallel, and stitching in either reference-exact or
overlap-averaged mode.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from fabric_tpu.data.geotiff import band_dims
from fabric_tpu.data.oscd import load_city
from fabric_tpu.infer.tiling import (
    extract_tiles, stitch_tiles, extract_tiles_overlap, stitch_average)


def _run_tiles(infer_step, state, tile_stacks, batch_size, mesh=None):
    """Run tile stacks through the jitted step in fixed-shape batches.

    ``tile_stacks`` is a list of per-date (K, ps, ps, C) arrays — passed as
    separate args for bi-date models (len 2) or stacked into (K, T, ps, ps,
    C) for multi-date models (len > 2).  Returns (K, ps, ps) outputs.
    """
    import jax
    k = tile_stacks[0].shape[0]
    pad = (-k) % batch_size
    if pad:
        zeros = np.zeros((pad,) + tile_stacks[0].shape[1:],
                         tile_stacks[0].dtype)
        tile_stacks = [np.concatenate([t, zeros]) for t in tile_stacks]
    stacked = None
    if len(tile_stacks) != 2:
        stacked = np.stack(tile_stacks, axis=1)  # (K, T, ps, ps, C)
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = (P("data", None, "spatial", None, None) if stacked is not None
                else P("data", "spatial", None, None))
        sharding = NamedSharding(mesh, spec)
    outs = []
    total = tile_stacks[0].shape[0]
    for i in range(0, total, batch_size):
        if stacked is not None:
            args = [stacked[i:i + batch_size]]
        else:
            args = [t[i:i + batch_size] for t in tile_stacks]
        if sharding is not None:
            args = [jax.device_put(a, sharding) for a in args]
        outs.append(np.asarray(infer_step(state, *args)))
    return np.concatenate(outs)[:k]


def predict_scene(infer_step, state, *dates: np.ndarray,
                  patch_size: int, batch_size: int, mesh=None,
                  overlap: int = 0, prob_step=None) -> np.ndarray:
    """Predict a change mask for one scene: 2+ date arrays of (H, W, C).

    overlap == 0: reference-exact grid tiling + argmax paste-back.
    overlap > 0: stride = patch_size - overlap sliding window; requires
    ``prob_step`` (change-class probability step); probabilities are
    overlap-averaged then thresholded at 0.5.
    """
    if overlap:
        stride = patch_size - overlap
        stacks, meta = [], None
        for d in dates:
            tiles, meta = extract_tiles_overlap(d, patch_size, stride)
            stacks.append(tiles)
        step = prob_step if prob_step is not None else infer_step
        probs = _run_tiles(step, state, stacks, batch_size, mesh)
        avg = stitch_average(probs.astype(np.float32), meta, patch_size)
        return (avg > 0.5).astype(np.uint8)
    stacks, meta = [], None
    for d in dates:
        tiles, meta = extract_tiles(d, patch_size)
        stacks.append(tiles)
    preds = _run_tiles(infer_step, state, stacks, batch_size, mesh)
    return stitch_tiles(preds.astype(np.uint8), meta, patch_size)


def scene_dims(data_dir: str, city: str, cfg) -> tuple[int, int]:
    """(H, W) template dims for a city scene: taken from the third sorted
    band file of date 1, as the reference does (inference.py:39-51)."""
    d1_dir = os.path.join(data_dir, "images", city, "imgs_1")
    files = sorted(glob.glob(os.path.join(d1_dir, "*")))
    if len(files) < 3:
        raise FileNotFoundError(f"not enough band files in {d1_dir}")
    width, height = band_dims(files[2])
    return height, width


def infer_city(infer_step, state, cfg, city: str, mesh=None,
               prob_step=None) -> np.ndarray:
    """Full-city change-map inference (reference generate_patches +
    batched forward, train.py:182-205).  Returns the (H, W) uint8 mask.
    Multi-date models get all cfg.num_dates dates."""
    dims = scene_dims(cfg.dataset_dir, city, cfg)
    num_dates = cfg.num_dates if cfg.model in ("unet_lstm", "unet3d") else 2
    stacked = load_city(cfg.dataset_dir, city, cfg, out_shape=dims,
                        num_dates=num_dates)
    return predict_scene(infer_step, state, *stacked,
                         patch_size=cfg.patch_size,
                         batch_size=cfg.eval_batch_size, mesh=mesh,
                         overlap=getattr(cfg, "infer_overlap", 0),
                         prob_step=prob_step)
