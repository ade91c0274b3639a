"""Host-side image ops: percentile stretch, min-max scale, bilinear resize.

The reference delegates these to OpenCV (utils/dataloaders.py:32-48,
utils/helpers.py:152-173).  F1 parity hinges on reproducing cv2's bilinear
resize semantics exactly (SURVEY.md §7 "hard parts"), so this module carries
a self-contained vectorized numpy implementation verified against cv2 in
tests, with an optional cv2 fast path and (later) a C++ fast path in csrc/.
"""

from __future__ import annotations

import numpy as np

try:  # optional fast path; the numpy path is semantics-defining
    import cv2  # type: ignore
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def stretch_8bit(band: np.ndarray, lower_percent: float = 2,
                 higher_percent: float = 98) -> np.ndarray:
    """2–98 percentile contrast stretch to uint8.

    Matches /root/reference/utils/dataloaders.py:38-48: percentiles are taken
    over strictly-positive pixels only, then the whole band is linearly
    mapped and clipped to [0, 255].
    """
    a, b = 0.0, 255.0
    real = band.reshape(-1)
    real = real[real > 0]
    if real.size == 0:
        return np.zeros(band.shape, np.uint8)
    c = np.percentile(real, lower_percent)
    d = np.percentile(real, higher_percent)
    denom = (d - c) if d != c else 1.0
    t = a + (band.astype(np.float64) - c) * ((b - a) / denom)
    t = np.clip(t, a, b)
    return t.astype(np.uint8)


def scale(x: np.ndarray, out_range=(0, 255)) -> np.ndarray:
    """Min-max scale to a range (reference utils/helpers.py:152-173)."""
    lo, hi = float(np.min(x)), float(np.max(x))
    denom = (hi - lo) if hi != lo else 1.0
    y = (x - (hi + lo) / 2.0) / denom
    return (y * (out_range[1] - out_range[0])
            + (out_range[1] + out_range[0]) / 2.0)


def _linear_coeffs(dst_size: int, src_size: int):
    """cv2 INTER_LINEAR coordinate mapping with border clamping.

    src = (dst + 0.5) * scale - 0.5 ; indices clamped so that the two taps
    stay inside the image (cv2 resize border behavior for linear).
    """
    scale_ = src_size / dst_size
    fxs = (np.arange(dst_size, dtype=np.float64) + 0.5) * scale_ - 0.5
    sx = np.floor(fxs).astype(np.int64)
    fx = fxs - sx
    fx[sx < 0] = 0.0
    sx[sx < 0] = 0
    if src_size > 1:
        over = sx >= src_size - 1
        fx[over] = 1.0
        sx[over] = src_size - 2
    else:
        sx[:] = 0
        fx[:] = 0.0
    return sx, fx.astype(np.float32)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int,
                    use_cv2: bool = True) -> np.ndarray:
    """Bilinear resize matching ``cv2.resize(img, (out_w, out_h))``.

    Accepts (H, W) or (H, W, C) float or integer arrays; returns float32
    (or the input float dtype).  NOTE the reference calls
    ``cv2.resize(band, (h, w))`` at utils/dataloaders.py:98 where the tuple
    is cv2's (width, height) — callers here pass explicit out_h/out_w.
    """
    if _HAS_CV2 and use_cv2:
        out = cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
        return out
    squeeze = img.ndim == 2
    x = img[..., None].astype(np.float32) if squeeze else img.astype(np.float32)
    h, w = x.shape[:2]
    sy, fy = _linear_coeffs(out_h, h)
    sx, fx = _linear_coeffs(out_w, w)
    sy1 = np.minimum(sy + 1, h - 1)
    sx1 = np.minimum(sx + 1, w - 1)
    top = x[sy][:, sx] * (1 - fx)[None, :, None] + x[sy][:, sx1] * fx[None, :, None]
    bot = x[sy1][:, sx] * (1 - fx)[None, :, None] + x[sy1][:, sx1] * fx[None, :, None]
    out = top * (1 - fy)[:, None, None] + bot * fy[:, None, None]
    return out[..., 0] if squeeze else out


def write_png(path: str, array: np.ndarray) -> None:
    """Minimal dependency-free grayscale/RGB PNG writer.

    Replaces the reference's ``cv2.imwrite`` (utils/inference.py:106) for
    change-mask rasters without requiring OpenCV at runtime.
    """
    import struct
    import zlib

    arr = np.asarray(array)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        data = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (1, 3):
        channels = arr.shape[2]
        color_type = 0 if channels == 1 else 2
        data = arr
    else:
        raise ValueError(f"unsupported PNG shape {arr.shape}")
    h, w = data.shape[:2]
    raw = b"".join(b"\x00" + data[i].tobytes() for i in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    header = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as fout:
        fout.write(png)


def read_png_gray(path: str) -> np.ndarray:
    """Read a PNG as grayscale uint8 (reference label_loader uses cv2.imread
    flag 0 — utils/dataloaders.py:81-83).  Uses PIL when available, else a
    minimal decoder for PNGs written by :func:`write_png`."""
    try:
        from PIL import Image  # type: ignore
        return np.array(Image.open(path).convert("L"), np.uint8)
    except Exception:  # pragma: no cover
        if _HAS_CV2:
            return cv2.imread(path, 0)
        raise
