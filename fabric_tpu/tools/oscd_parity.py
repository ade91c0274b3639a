"""Turnkey reference-vs-fabric parity harness on an OSCD-layout dataset.

The project's north-star accuracy claim is "OSCD change-class F1 within 1%
of the PyTorch reference" (BASELINE.md) — the number the reference exists
to produce (/root/reference/train.py:103-115 computes the per-batch binary
P/R/F1, :210-214 selects checkpoints on it).  This tool makes that claim
one command:

    python -m fabric_tpu.tools.oscd_parity \
        --dataset_dir /data/onera --out ./parity_report \
        [--epochs 3 --patch_size 90 --stride 180 --batch_size 32 ...]

It (1) runs the ACTUAL reference ``train.py`` end-to-end via
``ref_loop_driver.py`` (its unreachable externals stubbed offline; real
rasterio used when installed, tifffile fallback otherwise — no reference
code is copied), (2) runs ``fabric_tpu.train.loop.train`` in
``compat_reference`` mode from the reference's own torch initialization on
the identical sample order and augmentation stream, and (3) emits
``report.json`` + ``report.md`` with per-epoch metric deltas, the
checkpoint-decision comparison, final whole-scene mask agreement per
validation city, and the final change-class F1 delta judged against the
1% bar.

Works on the real OSCD/Onera directory layout (``images/<city>/imgs_1/
*.tif`` + ``labels/<city>/cm/cm.png``) and on the synthetic fixture
(``data/synthetic.py``), which is how the hermetic test drives it
(tests/test_oscd_parity.py).  RUNBOOK: deploy/RUNBOOK.md "OSCD F1 parity".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REFERENCE_DEFAULT = "/root/reference"

_METRICS = ("cd_losses", "cd_corrects", "cd_precisions", "cd_recalls",
            "cd_f1scores")


def _ref_config(cfg, dataset_rel: str) -> dict:
    """The metadata.json-style config the reference parser consumes
    (utils/parser.py:4-12 set_defaults from JSON; every key live)."""
    return {
        "band_ids": cfg.band_ids,
        "band_means": cfg.band_means,
        "band_stds": cfg.band_stds,
        "stretch_8bit": {"lower": 2, "higher": 98},
        "patch_size": cfg.patch_size, "stride": cfg.stride,
        "augmentation": bool(cfg.augmentation),
        "num_gpus": 0, "num_workers": 0,
        "epochs": cfg.epochs, "batch_size": cfg.batch_size,
        "learning_rate": cfg.learning_rate,
        "loss_function": cfg.loss_function,
        "tversky_alpha": cfg.tversky_alpha,
        "tversky_beta": cfg.tversky_beta,
        "gamma": getattr(cfg, "focal_gamma", 2.0),
        "focal_gamma": getattr(cfg, "focal_gamma", 2.0),
        "project_name": "oscd_parity", "dataset_name": "oscd",
        "validation_cities": list(cfg.validation_cities),
        # relative to the driver's cwd: generate_patches strips leading
        # '/' from path components (reference inference.py:15-17), so an
        # absolute dataset_dir would silently go relative there
        "dataset_dir": dataset_rel,
        "weight_dir": "/tmp/", "log_dir": "./log/",
    }


def run_parity(cfg, out_dir: str, reference_dir: str = REFERENCE_DEFAULT,
               f1_bar: float = 0.01, scene_masks: bool = True,
               timeout_s: float = 24 * 3600.0) -> dict:
    """Run both sides on ``cfg`` (dataset_dir/epochs/patch/loss/...) and
    return the report dict (also written to ``out_dir``)."""
    os.makedirs(out_dir, exist_ok=True)
    ref_out = os.path.join(os.path.abspath(out_dir), "ref_out")
    data_dir = os.path.abspath(cfg.dataset_dir)
    dataset_rel = os.path.relpath(data_dir, ref_out) + "/"

    cfg_path = os.path.join(out_dir, "ref_config.json")
    with open(cfg_path, "w") as f:
        json.dump(_ref_config(cfg, dataset_rel), f, indent=2)

    # --- side 1: the actual reference script, offline ------------------
    driver = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "ref_loop_driver.py")
    env = dict(os.environ, PYTHONHASHSEED="0", MPLBACKEND="Agg")
    # the driver is a pure-torch subprocess: it must not inherit a
    # PYTHONPATH that injects this repo's jax test conftest
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, driver, cfg_path, ref_out, reference_dir],
        capture_output=True, text=True, timeout=timeout_s, env=env)
    if proc.returncode != 0 or "REF_LOOP_DRIVER_OK" not in proc.stdout:
        raise RuntimeError(
            f"reference driver failed (rc={proc.returncode}):\n"
            f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")
    with open(os.path.join(ref_out, "dumps.json")) as f:
        dumps = json.load(f)

    # --- side 2: fabric-tpu, compat mode, same init + sample order -----
    from fabric_tpu.config import Config
    from fabric_tpu.tools.import_torch import (convert_state_dict,
                                               load_state_dict)
    sd = load_state_dict(os.path.join(ref_out, "init_state.pt"))
    params, stats, _ = convert_state_dict(sd)
    init_variables = {"params": params, "batch_stats": stats}

    ours_cfg = Config.from_dict({
        **cfg.to_dict(),
        "dataset_dir": data_dir,
        "compat_reference": True, "shuffle_train": False,
        "dtype": "float32", "num_workers": 0,
        # keep every best checkpoint: the report compares our saved
        # epochs file-by-file against the reference's uploads, and the
        # default keep_last=3 retention would prune older ones on runs
        # with >3 improving epochs, reading as a spurious MISMATCH
        "keep_last": 0,
        "weight_dir": os.path.join(out_dir, "weights"),
        "log_dir": os.path.join(out_dir, "log")})
    metadata = ([tuple(m) for m in dumps["train_metadata"]],
                [tuple(m) for m in dumps["val_metadata"]])

    from fabric_tpu.train.loop import train
    state, history = train(ours_cfg, run_scene_inference=False,
                           init_variables=init_variables,
                           metadata=metadata)

    # --- compare --------------------------------------------------------
    report: dict = {"config": cfg.to_dict(), "f1_bar": f1_bar,
                    "epochs": []}
    for e, ref in enumerate(dumps["epoch_metrics"]):
        row: dict = {"epoch": e}
        for phase, hist_key in (("train", "train"), ("validate", "val")):
            ours = history[hist_key][e]
            for m in _METRICS:
                r, o = ref[f"{phase}_{m}"], float(ours[m])
                row[f"{phase}_{m}"] = {"ref": r, "ours": o,
                                       "delta": o - r}
        report["epochs"].append(row)

    final = report["epochs"][-1]["validate_cd_f1scores"]
    report["final_val_f1"] = final
    report["f1_within_bar"] = bool(abs(final["delta"]) <= f1_bar)

    ref_saved = sorted({int(n.split("_")[-1].split(".")[0])
                        for n in dumps["uploads"]
                        if n.startswith("checkpoint_epoch_")})
    ours_saved = sorted(
        int(f.split("_")[-1].split(".")[0])
        for f in os.listdir(ours_cfg.weight_dir)
        if f.startswith("checkpoint_epoch_") and f.endswith(".msgpack"))
    report["checkpoint_epochs"] = {"ref": ref_saved, "ours": ours_saved,
                                   "match": ref_saved == ours_saved}

    if scene_masks and dumps["mask_count"]:
        from fabric_tpu.infer.runner import infer_city
        from fabric_tpu.models import build_model
        from fabric_tpu.train.steps import make_infer_step
        model = build_model(ours_cfg)
        istep = make_infer_step(model)
        cities = list(cfg.validation_cities)
        base = dumps["mask_count"] - len(cities)  # last epoch's masks
        masks = {}
        for i, city in enumerate(cities):
            ref_mask = np.load(os.path.join(ref_out,
                                            f"mask_{base + i}.npy"))
            ours_mask = infer_city(istep, state, ours_cfg, city)
            masks[city] = {
                "shape": list(ref_mask.shape),
                "agreement": float(np.mean(
                    ours_mask == ref_mask.astype(ours_mask.dtype)))}
        report["scene_mask_agreement"] = masks

    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    _write_markdown(report, os.path.join(out_dir, "report.md"))
    return report


def _write_markdown(report: dict, path: str) -> None:
    lines = ["# OSCD parity report — reference train.py vs fabric-tpu", ""]
    final = report["final_val_f1"]
    verdict = "PASS" if report["f1_within_bar"] else "FAIL"
    lines += [
        f"**Final validation change-class F1**: reference "
        f"{final['ref']:.4f}, fabric-tpu {final['ours']:.4f}, delta "
        f"{final['delta']:+.4f} — **{verdict}** vs the "
        f"±{report['f1_bar']:.0%} bar.", "",
        "Both sides ran the identical config, torch initialization, "
        "sample order, and augmentation stream; the reference side is "
        "the actual /root/reference/train.py (offline-stubbed).", "",
        "| epoch | phase | metric | reference | fabric-tpu | delta |",
        "|---|---|---|---|---|---|"]
    for row in report["epochs"]:
        for phase in ("train", "validate"):
            for m in _METRICS:
                c = row[f"{phase}_{m}"]
                lines.append(
                    f"| {row['epoch']} | {phase} | {m} | {c['ref']:.4f} "
                    f"| {c['ours']:.4f} | {c['delta']:+.5f} |")
    ck = report["checkpoint_epochs"]
    lines += ["",
              f"Best-checkpoint decisions (train.py:210-214): reference "
              f"saved epochs {ck['ref']}, fabric-tpu {ck['ours']} — "
              f"{'match' if ck['match'] else 'MISMATCH'}."]
    if "scene_mask_agreement" in report:
        lines += ["", "Final whole-scene masks (validation cities):", ""]
        for city, rec in report["scene_mask_agreement"].items():
            lines.append(f"- {city} {rec['shape'][0]}x{rec['shape'][1]}: "
                         f"{rec['agreement']:.2%} pixel agreement")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main(argv=None) -> int:
    import argparse

    # honor JAX_PLATFORMS=cpu (RUNBOOK: deterministic vs the CPU torch
    # reference) even where sitecustomize pins the platform at config
    # level, which outranks the env var
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        import jax
        jax.config.update("jax_platforms", want)

    from fabric_tpu.config import Config

    ap = argparse.ArgumentParser(
        description="Reference-vs-fabric OSCD parity report")
    ap.add_argument("--dataset_dir", required=True,
                    help="OSCD-layout dataset root (images/ + labels/)")
    ap.add_argument("--out", required=True, help="report directory")
    ap.add_argument("--reference_dir", default=REFERENCE_DEFAULT)
    ap.add_argument("--f1_bar", type=float, default=0.01)
    ap.add_argument("--no_scene_masks", action="store_true",
                    help="skip the per-city whole-scene mask comparison")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--patch_size", type=int, default=90)
    ap.add_argument("--stride", type=int, default=180)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--learning_rate", type=float, default=0.001)
    ap.add_argument("--loss_function", default="tversky")
    ap.add_argument("--tversky_alpha", type=float, default=0.1)
    ap.add_argument("--tversky_beta", type=float, default=0.9)
    ap.add_argument("--augmentation", type=lambda s: s.lower() != "false",
                    default=True)
    ap.add_argument("--validation_cities", nargs="+",
                    default=["cupertino", "rennes"])
    args = ap.parse_args(argv)

    cfg = Config(dataset_dir=args.dataset_dir, epochs=args.epochs,
                 patch_size=args.patch_size, stride=args.stride,
                 batch_size=args.batch_size,
                 learning_rate=args.learning_rate,
                 loss_function=args.loss_function,
                 tversky_alpha=args.tversky_alpha,
                 tversky_beta=args.tversky_beta,
                 augmentation=args.augmentation,
                 validation_cities=list(args.validation_cities))
    report = run_parity(cfg, args.out, reference_dir=args.reference_dir,
                        f1_bar=args.f1_bar,
                        scene_masks=not args.no_scene_masks)
    final = report["final_val_f1"]
    print(json.dumps({
        "final_f1_ref": final["ref"], "final_f1_ours": final["ours"],
        "delta": final["delta"],
        "within_bar": report["f1_within_bar"],
        "checkpoint_decisions_match": report["checkpoint_epochs"]["match"],
        "report": os.path.join(args.out, "report.md")}))
    return 0 if report["f1_within_bar"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
