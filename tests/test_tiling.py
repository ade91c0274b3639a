"""Tiling property tests: extract→stitch must be an exact identity
(the reference's _get_patches/_get_bands pair, inference.py:134-236)."""

import numpy as np
import pytest

from fabric_tpu.infer.tiling import (
    extract_tiles, stitch_tiles, extract_tiles_overlap, stitch_average)


@pytest.mark.parametrize("h,w,patch", [(97, 113, 32), (64, 64, 32),
                                       (90, 90, 90), (100, 250, 45)])
def test_reference_tiling_roundtrip_identity(h, w, patch):
    rng = np.random.RandomState(0)
    img = rng.rand(h, w, 1).astype(np.float32)
    tiles, meta = extract_tiles(img, patch)
    # stitch the per-pixel "predictions" (here: the input itself)
    back = stitch_tiles(tiles[:, :, :, 0], meta, patch)
    np.testing.assert_array_equal(back, img[:, :, 0])


def test_tile_counts_match_reference_formula():
    # sklearn extract_patches with step=patch: (dim - patch)//patch + 1
    img = np.zeros((97, 113, 13), np.float32)
    tiles, meta = extract_tiles(img, 32)
    hs = (97 - 32) // 32 + 1
    ws = (113 - 32) // 32 + 1
    lc = hs   # strips down the last column
    lr = ws   # strips along the last row
    assert (meta["hs"], meta["ws"], meta["lc"], meta["lr"]) == (hs, ws, lc, lr)
    assert tiles.shape == (hs * ws + lc + lr + 1, 32, 32, 13)


def test_tiling_rejects_small_scene():
    with pytest.raises(ValueError):
        extract_tiles(np.zeros((16, 100, 3), np.float32), 32)


@pytest.mark.parametrize("h,w,patch,stride", [(97, 113, 32, 24),
                                              (64, 64, 32, 32),
                                              (70, 90, 32, 16)])
def test_overlap_roundtrip_identity(h, w, patch, stride):
    rng = np.random.RandomState(1)
    img = rng.rand(h, w, 1).astype(np.float32)
    tiles, meta = extract_tiles_overlap(img, patch, stride)
    back = stitch_average(tiles[:, :, :, 0], meta, patch)
    # averaging identical overlapping values reproduces the input exactly
    np.testing.assert_allclose(back, img[:, :, 0], atol=1e-6)


def test_overlap_covers_every_pixel():
    img = np.ones((71, 53, 1), np.float32)
    tiles, meta = extract_tiles_overlap(img, 32, 27)
    back = stitch_average(tiles[:, :, :, 0], meta, 32)
    assert np.all(back == 1.0)  # no pixel left uncovered
