"""Raster band readers with graceful backend fallback.

The reference reads Sentinel-2 bands with rasterio/GDAL
(utils/dataloaders.py:19,95,104).  rasterio is not guaranteed in this
environment, so reading dispatches: ``.npy`` (the synthetic/test format) →
numpy; ``.tif``/``.tiff`` → rasterio, else tifffile, else OpenCV
(IMREAD_UNCHANGED handles 16-bit GeoTIFF via libtiff).  All return a 2-D
float32 array (the first band of the file, matching ``rasterio.read()[0]``).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import rasterio  # type: ignore
    _HAS_RASTERIO = True
except Exception:  # pragma: no cover
    rasterio = None
    _HAS_RASTERIO = False

try:
    import cv2  # type: ignore
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def read_band(path: str) -> np.ndarray:
    """Read one raster band file as float32 (H, W)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        arr = np.load(path)
    elif ext in (".tif", ".tiff"):
        arr = _read_tif(path)
    else:
        raise ValueError(f"unsupported band file: {path}")
    arr = np.asarray(arr)
    if arr.ndim == 3:  # (bands, H, W) or (H, W, C): take the first plane
        arr = arr[0] if arr.shape[0] < arr.shape[-1] else arr[..., 0]
    return arr.astype(np.float32)


def _read_tif(path: str) -> np.ndarray:
    if _HAS_RASTERIO:
        with rasterio.open(path) as src:
            return src.read()[0]
    try:
        import tifffile  # type: ignore
        return tifffile.imread(path)
    except Exception:
        pass
    if _HAS_CV2:
        arr = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if arr is not None:
            return arr
    raise RuntimeError(
        f"no GeoTIFF backend available for {path} "
        "(install rasterio or tifffile, or convert bands to .npy)")


def band_dims(path: str) -> tuple[int, int]:
    """(width, height) of a raster, used as the template dims for whole-scene
    inference (reference utils/inference.py:47-51)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        arr = np.load(path, mmap_mode="r")
        return arr.shape[1], arr.shape[0]
    if _HAS_RASTERIO:
        with rasterio.open(path) as src:
            return src.width, src.height
    arr = _read_tif(path)
    return arr.shape[1], arr.shape[0]
