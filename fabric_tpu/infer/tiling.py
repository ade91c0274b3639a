"""Whole-scene tiling and stitching.

Reference-exact mode reproduces utils/inference.py:134-236: a non-overlapping
stride=patch grid, plus last-column strips, last-row strips, and the corner
patch to cover the remainders; stitching pastes the grid then overwrites the
right column, bottom row, and corner.  Implemented with numpy stride tricks
(the sklearn ``extract_patches`` dependency reduces to ``as_strided``).

Overlap-averaged mode (BASELINE config 4) slides with an arbitrary stride,
accumulates per-pixel probability sums and counts, and normalizes — smoother
seams than the reference's hard paste-back.
"""

from __future__ import annotations

import numpy as np


def _grid_view(img: np.ndarray, patch: int) -> np.ndarray:
    """(hs, ws, patch, patch, C) non-overlapping view via as_strided."""
    h, w, c = img.shape
    hs = (h - patch) // patch + 1
    ws = (w - patch) // patch + 1
    sh, sw, sc = img.strides
    return np.lib.stride_tricks.as_strided(
        img, shape=(hs, ws, patch, patch, c),
        strides=(sh * patch, sw * patch, sh, sw, sc), writeable=False)


def extract_tiles(img: np.ndarray, patch: int):
    """Tile an (H, W, C) scene the reference way (inference.py:134-181).

    Returns (tiles (K, patch, patch, C), meta) where meta = dict with
    hs, ws, lc, lr, h, w — the reconstruction metadata.
    Tile order: row-major grid, then last-column strips, last-row strips,
    corner (matching the reference vstack order).
    """
    h, w, c = img.shape
    if h < patch or w < patch:
        raise ValueError(f"scene {h}x{w} smaller than patch {patch}")
    grid = _grid_view(img, patch)
    hs, ws = grid.shape[:2]
    tiles = [grid.reshape(-1, patch, patch, c)]
    last_col = img[:, w - patch:, :]           # (H, patch, C)
    lc = (h - patch) // patch + 1
    tiles.append(_grid_view(last_col, patch).reshape(-1, patch, patch, c))
    last_row = img[h - patch:, :, :]           # (patch, W, C)
    lr = (w - patch) // patch + 1
    tiles.append(_grid_view(last_row, patch).reshape(-1, patch, patch, c))
    tiles.append(img[None, h - patch:, w - patch:, :])
    out = np.concatenate(tiles, axis=0)
    meta = {"hs": hs, "ws": ws, "lc": lc, "lr": lr, "h": h, "w": w}
    return np.ascontiguousarray(out), meta


def stitch_tiles(tiles: np.ndarray, meta: dict, patch: int) -> np.ndarray:
    """Inverse of extract_tiles for per-pixel predictions (K, patch, patch)
    (reference _get_bands, inference.py:184-236): paste grid, then overwrite
    right column, bottom row, and corner."""
    hs, ws, lc, lr = meta["hs"], meta["ws"], meta["lc"], meta["lr"]
    h, w = meta["h"], meta["w"]
    corner = tiles[-1]
    last_row = tiles[-lr - 1:-1]
    last_col = tiles[-lc - lr - 1:-lr - 1]
    grid = tiles[:hs * ws]
    img = np.zeros((h, w), tiles.dtype)
    img[:hs * patch, :ws * patch] = (
        grid.reshape(hs, ws, patch, patch)
            .transpose(0, 2, 1, 3).reshape(hs * patch, ws * patch))
    for i in range(lc):
        img[i * patch:(i + 1) * patch, w - patch:] = last_col[i]
    for i in range(lr):
        img[h - patch:, i * patch:(i + 1) * patch] = last_row[i]
    img[h - patch:, w - patch:] = corner
    return img


def _positions(size: int, patch: int, stride: int) -> np.ndarray:
    pos = list(range(0, size - patch + 1, stride))
    if pos[-1] != size - patch:
        pos.append(size - patch)
    return np.array(pos)


def extract_tiles_overlap(img: np.ndarray, patch: int, stride: int):
    """Sliding-window tiles with overlap; returns (tiles, positions)."""
    h, w, c = img.shape
    ys = _positions(h, patch, stride)
    xs = _positions(w, patch, stride)
    tiles = np.empty((len(ys) * len(xs), patch, patch, c), img.dtype)
    k = 0
    for y in ys:
        for x in xs:
            tiles[k] = img[y:y + patch, x:x + patch]
            k += 1
    return tiles, {"ys": ys, "xs": xs, "h": h, "w": w}


def stitch_average(values: np.ndarray, meta: dict, patch: int) -> np.ndarray:
    """Overlap-average per-pixel values (K, patch, patch) back to (H, W)."""
    h, w = meta["h"], meta["w"]
    acc = np.zeros((h, w), np.float64)
    cnt = np.zeros((h, w), np.float64)
    k = 0
    for y in meta["ys"]:
        for x in meta["xs"]:
            acc[y:y + patch, x:x + patch] += values[k]
            cnt[y:y + patch, x:x + patch] += 1.0
            k += 1
    return (acc / np.maximum(cnt, 1.0)).astype(np.float32)
