"""Run the ACTUAL reference training script as a black-box parity oracle.

Executes /root/reference/train.py (the module-level script, train.py:20-240)
end-to-end in this process — no reference code is copied — with its
unreachable externals replaced by recording stubs:

- ``comet_ml`` / ``polyaxon_client`` / ``polystores``: no-egress loggers;
  the polyaxon ``Experiment.log_metrics(**epoch_metrics)`` call
  (train.py:235) is the epoch-metric capture point, and
  ``outputs_store.upload_file`` (train.py:225) records checkpoint decisions.
- ``rasterio``: the synthetic dataset stores bands as .npy next to the
  .tif names the reference opens (dataloaders.py:94-106), so the stub's
  ``open(x.tif).read()[0]`` loads the matching .npy.
- ``sklearn.feature_extraction.image.extract_patches``: removed from
  sklearn >= 0.24; shimmed with the numpy sliding-window equivalent the
  original was (inference.py:151-153 caller).
- ``multiprocessing.Pool`` inside utils.dataloaders: serialized (the
  1-core CI host; semantics identical).

Determinism controls (parity harness, not reference edits): torch seeded
before the run, ``random.shuffle`` in OneraPreloader.__init__
(dataloaders.py:169) disabled, and DataLoader forced to
shuffle=False/num_workers=0 so the sample order is exactly the
``get_train_val_metadata`` order — which this driver dumps so the JAX side
can consume the identical order.

Usage: python ref_loop_driver.py <config.json> <out_dir> [reference_dir]
  config.json:   full metadata.json-style reference config
  out_dir:       working dir; receives metadata.json (the reference parser
                 reads it from cwd, utils/parser.py:5) and all dumps.
  reference_dir: the reference checkout (default /root/reference).

Dataset ingestion: a REAL rasterio install is used untouched when present
(real OSCD GeoTIFFs); otherwise the stub loads a ``.npy`` sibling of each
band path (the synthetic fixture layout) and falls back to ``tifffile``
for real ``.tif`` files — so ``tools/oscd_parity.py`` drives actual OSCD
data in rasterio-less environments too.

Run with PYTHONHASHSEED set (train_cities order goes through a python set,
dataloaders.py:53) and MPLBACKEND=Agg.
"""

import json
import os
import runpy
import shutil
import sys
import types

import numpy as np

REFERENCE = "/root/reference"

RECORD = {"epoch_metrics": [], "uploads": [], "mask_count": 0}
OUT_DIR = None


# ---------------------------------------------------------------- stubs

class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _CometStub:
    """comet_ml.Experiment lookalike: accepts everything, records nothing
    (metrics are captured at the polyaxon Experiment instead)."""

    def __init__(self, *a, **k):
        pass

    def train(self):
        return _NullCtx()

    def validate(self):
        return _NullCtx()

    def __getattr__(self, name):
        return lambda *a, **k: None


class _OutputsStore:
    def upload_file(self, path):
        RECORD["uploads"].append(os.path.basename(path))


class _PolyaxonExperiment:
    def __init__(self, *a, **k):
        self.outputs_store = _OutputsStore()

    def log_metrics(self, **kw):
        # train.py:235 — one call per epoch with epoch/train_*/validate_*
        RECORD["epoch_metrics"].append(
            {k: float(v) for k, v in kw.items()})


class _RasterioReader:
    """rasterio.open lookalike: .npy sibling (synthetic fixture) or a
    tifffile-decoded real GeoTIFF (rasterio-less real-OSCD runs)."""

    def __init__(self, path):
        # opened either with the glob hit itself (.npy) or with a
        # reconstructed prefix+band+'.tif' name (dataloaders.py:94-106)
        base = path[:-4] if path.endswith((".tif", ".npy")) else path
        if os.path.exists(base + ".npy"):
            self._arr = np.load(base + ".npy")
        else:
            import tifffile
            arr = np.asarray(tifffile.imread(path))
            if arr.ndim == 3:  # plane-first singleton, as rasterio reads
                arr = arr[0] if arr.shape[0] == 1 else arr[..., 0]
            self._arr = arr

    def read(self):
        return self._arr[None]

    @property
    def width(self):
        return self._arr.shape[1]

    @property
    def height(self):
        return self._arr.shape[0]

    def close(self):
        pass


class _SerialPool:
    """multiprocessing.Pool lookalike: serial map on the 1-core host."""

    def __init__(self, *a, **k):
        pass

    def map(self, fn, it):
        return [fn(x) for x in it]

    def close(self):
        pass


def _extract_patches(arr, patch_shape, extraction_step):
    """Old sklearn.feature_extraction.image.extract_patches semantics."""
    from numpy.lib.stride_tricks import sliding_window_view
    if isinstance(patch_shape, int):
        patch_shape = (patch_shape,) * arr.ndim
    if isinstance(extraction_step, int):
        extraction_step = (extraction_step,) * arr.ndim
    view = sliding_window_view(arr, patch_shape)
    return view[tuple(slice(None, None, s) for s in extraction_step)]


def _install_stubs():
    comet = types.ModuleType("comet_ml")
    comet.Experiment = _CometStub
    sys.modules["comet_ml"] = comet

    pc = types.ModuleType("polyaxon_client")
    pct = types.ModuleType("polyaxon_client.tracking")
    pct.Experiment = _PolyaxonExperiment
    pct.get_data_paths = lambda: {}
    pc.tracking = pct
    sys.modules["polyaxon_client"] = pc
    sys.modules["polyaxon_client.tracking"] = pct

    ps = types.ModuleType("polystores")
    pss = types.ModuleType("polystores.stores")
    psm = types.ModuleType("polystores.stores.manager")
    psm.StoreManager = type("StoreManager", (), {})
    pss.manager = psm
    ps.stores = pss
    sys.modules["polystores"] = ps
    sys.modules["polystores.stores"] = pss
    sys.modules["polystores.stores.manager"] = psm

    # a real rasterio install is used untouched (real OSCD GeoTIFFs);
    # without one, the stub serves .npy fixtures / tifffile-decoded .tifs
    import importlib.util
    if importlib.util.find_spec("rasterio") is None:
        rio = types.ModuleType("rasterio")
        rio.open = _RasterioReader
        sys.modules["rasterio"] = rio

    from sklearn.feature_extraction import image as sk_image
    if not hasattr(sk_image, "extract_patches"):
        sk_image.extract_patches = _extract_patches


def main():
    global OUT_DIR, REFERENCE
    cfg_path, OUT_DIR = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3:
        REFERENCE = sys.argv[3]
    os.makedirs(OUT_DIR, exist_ok=True)
    shutil.copyfile(cfg_path, os.path.join(OUT_DIR, "metadata.json"))

    os.environ.setdefault("MPLBACKEND", "Agg")
    _install_stubs()
    sys.path.insert(0, REFERENCE)
    # the reference parser reads ./metadata.json and train.py writes its
    # scene pngs to cwd
    os.chdir(OUT_DIR)
    sys.argv = ["train.py"]  # parse_args must see no CLI args

    import torch

    # deterministic sample order: loader-level shuffles off (see module doc)
    import utils.dataloaders as dl
    dl.Pool = _SerialPool
    dl.random.shuffle = lambda x: None

    # seed the global python-random stream the reference's augmentation
    # draws from (dataloaders.py:153-163): with the loader shuffle stubbed
    # above, the ONLY consumers are the per-sample (randint, random,
    # random) aug triples, in materialization order — which the JAX side
    # reproduces via PatchSampler(compat_aug_stream=random.Random(seed))
    import random as _pyrandom
    _pyrandom.seed(0)

    _RealDL = torch.utils.data.DataLoader

    class _DeterministicLoader(_RealDL):
        def __init__(self, ds, batch_size=1, shuffle=False, num_workers=0,
                     **kw):
            super().__init__(ds, batch_size=batch_size, shuffle=False,
                             num_workers=0, **kw)

    torch.utils.data.DataLoader = _DeterministicLoader

    import utils.helpers as helpers
    helpers.download_dataset = lambda *a, **k: None
    _real_load_model = helpers.load_model

    def _recording_load_model(opt, device):
        model = _real_load_model(opt, device)
        mod = model.module if hasattr(model, "module") else model
        torch.save(mod.state_dict(), os.path.join(OUT_DIR, "init_state.pt"))
        return model

    helpers.load_model = _recording_load_model

    # capture each stitched whole-scene mask (train.py:204 -> inference.py
    # _get_bands) before it is rescaled for logging
    import utils.inference as inference
    _real_get_bands = inference._get_bands

    def _recording_get_bands(*a, **k):
        mask = _real_get_bands(*a, **k)
        np.save(os.path.join(OUT_DIR, f"mask_{RECORD['mask_count']}.npy"),
                mask)
        RECORD["mask_count"] += 1
        return mask

    inference._get_bands = _recording_get_bands

    torch.manual_seed(0)
    g = runpy.run_path(os.path.join(REFERENCE, "train.py"),
                       run_name="ref_train_oracle")

    model = g["model"]
    mod = model.module if hasattr(model, "module") else model
    torch.save(mod.state_dict(), os.path.join(OUT_DIR, "final_state.pt"))
    dumps = {
        "epoch_metrics": RECORD["epoch_metrics"],
        "uploads": RECORD["uploads"],
        "mask_count": RECORD["mask_count"],
        "train_metadata": [list(m) for m in g["train_loader"].dataset.imgs],
        "val_metadata": [list(m) for m in g["val_loader"].dataset.imgs],
    }
    with open(os.path.join(OUT_DIR, "dumps.json"), "w") as f:
        json.dump(dumps, f)
    # the reference hardcodes its checkpoint path (train.py:219-224)
    for name in RECORD["uploads"]:
        p = os.path.join("/tmp", name)
        if os.path.exists(p):
            os.remove(p)
    print("REF_LOOP_DRIVER_OK")


if __name__ == "__main__":
    main()
