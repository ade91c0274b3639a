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


def _run_tiles(infer_step, state, tiles1, tiles2, batch_size, mesh=None,
               dtype=np.float32):
    """Run (K, ps, ps, C) tile stacks through the jitted step in fixed-shape
    batches; returns (K, ps, ps) outputs."""
    import jax
    k = tiles1.shape[0]
    pad = (-k) % batch_size
    if pad:
        zeros = np.zeros((pad,) + tiles1.shape[1:], tiles1.dtype)
        tiles1 = np.concatenate([tiles1, zeros])
        tiles2 = np.concatenate([tiles2, zeros])
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P("data", "spatial", None, None))
    outs = []
    for i in range(0, tiles1.shape[0], batch_size):
        b1, b2 = tiles1[i:i + batch_size], tiles2[i:i + batch_size]
        if sharding is not None:
            b1 = jax.device_put(b1, sharding)
            b2 = jax.device_put(b2, sharding)
        outs.append(np.asarray(infer_step(state, b1, b2)))
    return np.concatenate(outs)[:k]


def predict_scene(infer_step, state, d1: np.ndarray, d2: np.ndarray,
                  patch_size: int, batch_size: int, mesh=None,
                  overlap: int = 0, prob_step=None) -> np.ndarray:
    """Predict a change mask for one scene pair (H, W, C) each.

    overlap == 0: reference-exact grid tiling + argmax paste-back.
    overlap > 0: stride = patch_size - overlap sliding window; requires
    ``prob_step`` (change-class probability step); probabilities are
    overlap-averaged then thresholded at 0.5.
    """
    if overlap:
        stride = patch_size - overlap
        tiles1, meta = extract_tiles_overlap(d1, patch_size, stride)
        tiles2, _ = extract_tiles_overlap(d2, patch_size, stride)
        step = prob_step if prob_step is not None else infer_step
        probs = _run_tiles(step, state, tiles1, tiles2, batch_size, mesh)
        avg = stitch_average(probs.astype(np.float32), meta, patch_size)
        return (avg > 0.5).astype(np.uint8)
    tiles1, meta = extract_tiles(d1, patch_size)
    tiles2, _ = extract_tiles(d2, patch_size)
    preds = _run_tiles(infer_step, state, tiles1, tiles2, batch_size, mesh)
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
    batched forward, train.py:182-205).  Returns the (H, W) uint8 mask."""
    dims = scene_dims(cfg.dataset_dir, city, cfg)
    stacked = load_city(cfg.dataset_dir, city, cfg, out_shape=dims)
    return predict_scene(infer_step, state, stacked[0], stacked[1],
                         cfg.patch_size, cfg.eval_batch_size, mesh=mesh,
                         overlap=getattr(cfg, "infer_overlap", 0),
                         prob_step=prob_step)
