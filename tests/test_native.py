"""Native C++ host ops must be bit-compatible with the numpy/cv2 paths."""

import numpy as np
import pytest

from fabric_tpu import native
from fabric_tpu.utils import image as fimg

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no compiler)")


def test_native_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    img = rng.rand(53, 71).astype(np.float32)
    ours = native.resize_bilinear(img, 90, 110)
    theirs = cv2.resize(img, (110, 90), interpolation=cv2.INTER_LINEAR)
    assert np.allclose(ours, theirs, atol=1e-5)


def test_native_resize_matches_numpy_path():
    rng = np.random.RandomState(1)
    img = rng.rand(90, 110).astype(np.float32)
    ours = native.resize_bilinear(img, 37, 53)
    ref = fimg.resize_bilinear(img, 37, 53, use_cv2=False)
    assert np.allclose(ours, ref, atol=1e-5)


def test_native_normalize_resize_fused():
    rng = np.random.RandomState(2)
    img = rng.rand(64, 48).astype(np.float32) * 1000
    mean, std = 500.0, 250.0
    ours = native.normalize_resize(img, mean, std, 32, 24)
    ref = fimg.resize_bilinear((img - mean) / std, 32, 24, use_cv2=False)
    # fused normalizes after resize; linear ops commute exactly up to fp error
    assert np.allclose(ours, ref, atol=1e-4)


def test_native_stretch_matches_numpy():
    rng = np.random.RandomState(3)
    band = (rng.rand(64, 64).astype(np.float32) * 3000) - 100  # some <= 0
    ours = native.stretch_8bit(band)
    ref = fimg.stretch_8bit(band)
    # uint8 rounding at bin edges may differ by 1 for a handful of pixels
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int)) <= 1) == 1.0
    assert np.mean(ours == ref) > 0.99


def test_native_used_in_load_city(tmp_path):
    from fabric_tpu.config import Config
    from fabric_tpu.data.synthetic import generate_synthetic_dataset
    from fabric_tpu.data import load_city
    cfg = Config(dataset_dir=str(tmp_path))
    generate_synthetic_dataset(cfg.dataset_dir, cfg)
    img = load_city(cfg.dataset_dir, "alpha", cfg)
    assert img.shape == (2, 97, 113, 13)
    assert abs(float(img.mean())) < 0.5
