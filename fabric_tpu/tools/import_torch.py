"""Import a PyTorch reference checkpoint into a fabric-tpu checkpoint.

The reference trains with torch and saves whole pickled models
(``torch.save(model, '/tmp/checkpoint_epoch_N.pt')``,
/root/reference/train.py:222).  A user migrating to fabric-tpu should not
have to retrain: this tool converts either a full pickled model or a bare
``state_dict`` into a fabric-tpu checkpoint directory that ``--resume``,
``cli.infer``, ``ScenePredictor`` and ``tools/export`` (serving bundles)
all accept directly.

The conversion is pure tensor-layout mapping — OIHW conv weights become
HWIO kernels, BatchNorm affine/running tensors split into Flax
params/batch_stats — with NO reference code imported for ``state_dict``
files.  The mapping mirrors the reference module tree
(/root/reference/models/unet_parts.py: double_conv = Sequential[Conv, BN,
ReLU, Conv, BN, ReLU]; down = Sequential[MaxPool, double_conv]; up/inc
hold a double_conv at ``.conv``; /root/reference/models/bidate_model.py
names them inc/down1-4/up1-4/outc) and is verified numerically: the same
transfer logic run from a live torch module matches our logits to 2e-4
(tests/test_reference_parity.py); this tool's file-level path is pinned
round-trip in tests/test_import_torch.py.

Usage:
    python -m fabric_tpu.tools.import_torch \
        --pt checkpoint_epoch_5.pt --out ./imported_ckpt \
        [--ref_path /root/reference]   # only for full pickled models

``--ref_path`` is needed only when the .pt is a whole pickled model
(unpickling needs the reference's ``models`` package importable); plain
state_dicts convert with no torch-side code at all.
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

log = logging.getLogger("fabric_tpu")

_LEVELS = ("inc", "down1", "down2", "down3", "down4",
           "up1", "up2", "up3", "up4")


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.array(v, copy=True)


def load_state_dict(path: str, ref_path: str | None = None) -> dict:
    """Load ``path`` with torch and return a flat name->tensor dict.

    Accepts a bare ``state_dict`` or a whole pickled ``nn.Module`` (the
    reference's save format, train.py:222 — unpickling the latter needs
    ``ref_path`` on sys.path so ``models.bidate_model`` resolves).
    ``nn.DataParallel`` checkpoints (helpers.load_model wraps the model,
    /root/reference/utils/helpers.py:333-335) are handled by stripping
    the ``module.`` prefix."""
    import torch

    inserted = False
    if ref_path:
        sys.path.insert(0, ref_path)
        inserted = True
    try:
        try:
            obj = torch.load(path, map_location="cpu", weights_only=False)
        except TypeError:  # older torch: no weights_only kwarg
            obj = torch.load(path, map_location="cpu")
    finally:
        if inserted:
            sys.path.pop(0)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise ValueError(f"{path!r} is neither a state_dict nor a module "
                         f"(got {type(obj).__name__})")
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in obj.items()}


def convert_state_dict(sd: dict) -> tuple[dict, dict, dict]:
    """torch BiDateNet state_dict -> (params, batch_stats, arch) Flax
    trees.  ``arch`` carries the inferred n_channels/n_classes/base."""

    def conv(prefix):
        w = _np(sd[f"{prefix}.weight"])
        return {"kernel": w.transpose(2, 3, 1, 0),  # OIHW -> HWIO
                "bias": _np(sd[f"{prefix}.bias"])}

    def bn(prefix):
        p = {"scale": _np(sd[f"{prefix}.weight"]),
             "bias": _np(sd[f"{prefix}.bias"])}
        s = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
        return p, s

    def double(prefix):
        # Sequential[Conv(0), BN(1), ReLU(2), Conv(3), BN(4), ReLU(5)]
        p, s = {}, {}
        p["conv1"] = conv(f"{prefix}.0")
        p["bn1"], s["bn1"] = bn(f"{prefix}.1")
        p["conv2"] = conv(f"{prefix}.3")
        p["bn2"], s["bn2"] = bn(f"{prefix}.4")
        return p, s

    params, stats = {}, {}
    params["inc"], stats["inc"] = double("inc.conv.conv")
    for name in ("down1", "down2", "down3", "down4"):
        p, s = double(f"{name}.mpconv.1.conv")
        params[name], stats[name] = {"conv": p}, {"conv": s}
    for name in ("up1", "up2", "up3", "up4"):
        p, s = double(f"{name}.conv.conv")
        params[name], stats[name] = {"conv": p}, {"conv": s}
    params["outc"] = {"conv": conv("outc.conv")}

    w0 = params["inc"]["conv1"]["kernel"]
    head = params["outc"]["conv"]["kernel"]
    arch = {"n_channels": int(w0.shape[2]), "base": int(w0.shape[3]),
            "n_classes": int(head.shape[3])}
    return params, stats, arch


def import_checkpoint(pt_path: str, out_dir: str,
                      ref_path: str | None = None) -> str:
    """Convert ``pt_path`` and write a fabric-tpu checkpoint into
    ``out_dir`` (with latest/best pointers, epoch 0).  Returns the
    checkpoint file path."""
    import jax.numpy as jnp

    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.config import Config
    from fabric_tpu.models import BiDateNet
    from fabric_tpu.train.state import create_state

    sd = load_state_dict(pt_path, ref_path)
    params, stats, arch = convert_state_dict(sd)
    log.info("converted torch checkpoint: n_channels=%d n_classes=%d "
             "base=%d", arch["n_channels"], arch["n_classes"], arch["base"])

    cfg = Config(model_base=arch["base"])
    if (arch["n_channels"], arch["n_classes"]) != (cfg.n_channels,
                                                  cfg.n_classes):
        raise ValueError(
            f"checkpoint is a BiDateNet({arch['n_channels']}, "
            f"{arch['n_classes']}); fabric-tpu's config derives "
            f"({cfg.n_channels}, {cfg.n_classes}) from band_ids — adjust "
            "band_ids in your config to serve a non-OSCD channel count")
    model = BiDateNet(n_channels=arch["n_channels"],
                      n_classes=arch["n_classes"], base=arch["base"],
                      dtype=jnp.float32)
    state = create_state(cfg, model,
                         variables={"params": params,
                                    "batch_stats": stats})
    path = ckpt.save(state, out_dir, epoch=0,
                     metadata={"imported_from": pt_path,
                               "source_format": "torch", **arch})
    log.info("wrote %s", path)
    return path


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--pt", required=True,
                    help="torch checkpoint: a state_dict .pt or the "
                         "reference's whole pickled model")
    ap.add_argument("--out", required=True,
                    help="output fabric-tpu checkpoint directory "
                         "(usable as --resume / ScenePredictor "
                         "checkpoint=)")
    ap.add_argument("--ref_path", default=None,
                    help="path to the reference repo, only needed to "
                         "unpickle whole-model saves")
    args = ap.parse_args(argv)
    import_checkpoint(args.pt, args.out, args.ref_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
