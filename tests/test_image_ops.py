"""Host image op tests: stretch/scale/resize parity with the cv2-backed
reference semantics (utils/dataloaders.py:32-48, utils/helpers.py:152-173)."""

import numpy as np
import pytest

from fabric_tpu.utils import image as fimg


def test_stretch_8bit_range_and_dtype():
    rng = np.random.RandomState(0)
    band = rng.rand(64, 64).astype(np.float32) * 4000
    out = fimg.stretch_8bit(band)
    assert out.dtype == np.uint8
    assert out.min() >= 0 and out.max() <= 255
    # the 98th-percentile region must saturate near 255
    assert out.max() == 255


def test_stretch_8bit_matches_reference_formula():
    rng = np.random.RandomState(1)
    band = rng.rand(32, 32).astype(np.float32) * 1000 + 10
    real = band[band > 0]
    c = np.percentile(real, 2)
    d = np.percentile(real, 98)
    t = (band - c) * (255.0 / (d - c))
    t = np.clip(t, 0, 255).astype(np.uint8)
    assert np.array_equal(fimg.stretch_8bit(band), t)


def test_scale_matches_reference_formula():
    rng = np.random.RandomState(2)
    x = rng.randn(16, 16).astype(np.float32)
    got = fimg.scale(x)
    lo, hi = x.min(), x.max()
    y = (x - (hi + lo) / 2) / (hi - lo)
    expected = y * 255 + 255 / 2
    assert np.allclose(got, expected, atol=1e-4)
    assert np.isclose(got.min(), 0, atol=1e-4) and np.isclose(got.max(), 255, atol=1e-3)


@pytest.mark.parametrize("shape,out", [((37, 53), (90, 110)),
                                       ((90, 110), (37, 53)),
                                       ((64, 64, 3), (128, 96))])
def test_resize_bilinear_matches_cv2(shape, out):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(3)
    img = rng.rand(*shape).astype(np.float32)
    ours = fimg.resize_bilinear(img, out[0], out[1], use_cv2=False)
    theirs = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_LINEAR)
    assert np.allclose(ours, theirs, atol=1e-5), float(np.abs(ours - theirs).max())


def test_png_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    mask = (rng.rand(40, 30) > 0.5).astype(np.uint8) * 255
    p = str(tmp_path / "mask.png")
    fimg.write_png(p, mask)
    back = fimg.read_png_gray(p)
    assert np.array_equal(back, mask)
