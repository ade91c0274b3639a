"""Config system: dataclass schema + JSON loading + real CLI overrides.

Mirrors every key of the reference's ``metadata.json`` (see
/root/reference/metadata.json:1-53) and fixes its dead CLI: the reference's
``utils/parser.py:4-12`` calls ``parser.set_defaults(**metadata)`` without
registering any arguments, so no CLI override is possible.  Here every field
is a first-class ``argparse`` argument whose public name matches the
reference JSON key, plus TPU-native extensions (mesh axes, dtype, model
variant, resume path).

Also fixes the reference bug where ``focal_gamma`` is read by
``utils/helpers.py:306`` but never defined in ``metadata.json`` (selecting
focal loss crashes the reference).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any

# Per-band normalization stats from the reference's compute_band_stat.ipynb
# output (/root/reference/metadata.json:4-29).  These are dataset statistics
# for OSCD/Onera, not code.
DEFAULT_BAND_IDS = [
    "B01", "B02", "B03", "B04", "B05", "B06", "B07", "B08", "B8A",
    "B09", "B10", "B11", "B12",
]
DEFAULT_BAND_MEANS = {
    "B01": 1617.5661643050978, "B02": 1422.3719453248793,
    "B03": 1359.3729378266555, "B04": 1414.6782051630655,
    "B05": 1557.9375814996074, "B06": 1986.2235117016169,
    "B07": 2210.5037144727444, "B08": 2118.5600261598356,
    "B09": 711.83906025521844, "B10": 15.75398180230429,
    "B11": 2133.9020389587163, "B12": 1584.2672746823432,
    "B8A": 2344.7920358515848,
}
DEFAULT_BAND_STDS = {
    "B01": 319.11895245135725, "B02": 456.24958899714318,
    "B03": 590.13027145320575, "B04": 849.36709395436458,
    "B05": 811.31234423936974, "B06": 813.54673546588663,
    "B07": 891.84688914609933, "B08": 901.61466840470621,
    "B09": 370.95321479704359, "B10": 9.2311736178846093,
    "B11": 1116.5923795237484, "B12": 985.12262217902412,
    "B8A": 954.76957663021938,
}


@dataclasses.dataclass
class Config:
    """All run configuration.

    Field names intentionally match the reference ``metadata.json`` keys so a
    reference user's config files and CLI muscle memory carry over.
    """

    # ---- dataset statistics / ingestion (metadata.json:1-34) ----
    band_ids: list = dataclasses.field(default_factory=lambda: list(DEFAULT_BAND_IDS))
    band_means: dict = dataclasses.field(default_factory=lambda: dict(DEFAULT_BAND_MEANS))
    band_stds: dict = dataclasses.field(default_factory=lambda: dict(DEFAULT_BAND_STDS))
    stretch_8bit: dict = dataclasses.field(default_factory=lambda: {"lower": 2, "higher": 98})
    patch_size: int = 90
    stride: int = 180
    augmentation: bool = True

    # ---- host / loader (metadata.json:36-37) ----
    # Accepted for reference config-file compat and IGNORED: the device
    # count always comes from jax.devices() / the mesh axes below.
    num_gpus: int = 1
    num_workers: int = 2

    # ---- optimization (metadata.json:39-44) ----
    epochs: int = 1
    batch_size: int = 32
    learning_rate: float = 0.001
    loss_function: str = "tversky"  # bce | wbce | focal | dice | jaccard | tversky
    tversky_alpha: float = 0.1
    tversky_beta: float = 0.9
    focal_gamma: float = 2.0  # missing in reference metadata.json (bug); default here
    bce_pos_weight: float = 1.0  # weight on the change class for wbce

    # ---- experiment / paths (metadata.json:46-51) ----
    project_name: str = "ChangeDetection"
    dataset_name: str = "onera_w_mask.tar.gz"
    validation_cities: list = dataclasses.field(
        default_factory=lambda: ["cupertino", "rennes"])
    dataset_dir: str = "./onera/"
    weight_dir: str = "./outputs/"
    log_dir: str = "./log/"

    # ---- TPU-native extensions (no reference equivalent) ----
    model: str = "bidate"  # bidate | unet_lstm | unet3d
    model_base: int = 0    # encoder width; 0 = architecture default (64 / 32)
    num_dates: int = 2     # temporal depth for unet_lstm / unet3d (BASELINE config 3/5)
    dtype: str = "bfloat16"  # compute dtype on TPU; params stay float32
    # Accepted for parity with distributed-BN flags elsewhere, but a no-op
    # here: train/eval steps run under jit SPMD where BatchNorm statistics
    # are already computed over the GLOBAL batch (XLA inserts the cross-
    # device reduction for the sharded batch axis), i.e. sync-BN is the
    # only semantics on the jit path.
    sync_batchnorm: bool = False
    seed: int = 0
    optimizer: str = "sgd"  # sgd | adam | adamw
    momentum: float = 0.0   # reference uses plain SGD (train.py:55)
    weight_decay: float = 0.0
    lr_schedule: str = "constant"  # constant | cosine | linear
    lr_warmup_steps: int = 0
    lr_decay_steps: int = 0  # required for cosine/linear schedules
    # update params every K steps with the mean of K micro-batch gradients
    # (effective batch = K * batch_size); 1 = off
    grad_accum_steps: int = 1
    # Mesh axis sizes; -1 on data = "all remaining devices".
    mesh_data: int = -1
    mesh_spatial: int = 1
    mesh_model: int = 1
    resume: str = ""  # checkpoint path/dir to resume from ("" = fresh);
    # gs:// and file:// URIs are fetched locally first (fabric_tpu/store.py)
    # Mirror checkpoints + tracker output to a remote store (gs://bucket/
    # prefix or file:///path) after each atomic local save — primary-only,
    # async, failure-tolerant (the reference uploaded every best checkpoint
    # to its outputs store in-loop, train.py:225-226).  "" = local only.
    output_store: str = ""
    checkpoint_every: int = 0  # extra step-based checkpointing (0 = best-metric only)
    # Retention: prune all but the newest N checkpoints per tag on save
    # (checkpoint.prune — never the ones latest.json/best.json reference).
    # The reference accumulated one ~53 MB checkpoint per improved epoch
    # forever (train.py:219-222).  0 = keep everything.
    keep_last: int = 3
    # Graceful preemption: latch SIGTERM (TPU maintenance/preemption notice),
    # checkpoint mid-epoch at the next step boundary, exit cleanly with
    # status "preempted"; relaunching with resume= completes the run exactly
    # (train/preemption.py).  The reference dies uncheckpointed.
    handle_preemption: bool = True
    prefetch: int = 2  # device prefetch depth for the input pipeline
    use_pallas: bool = False  # route fused ops through Pallas kernels
    remat: bool = False  # rematerialize U-Net stages (memory vs FLOPs)
    # Space-to-depth lane packing for the Cout=64 full-res 3x3 convs
    # (ops/s2d_conv.py): measured 1.42x per ISOLATED conv at patch>=96 on
    # the v5e, but a 1.6-2.1x LOSS in the full train graph (the layout
    # shuffles break XLA's conv+BN fusion clusters — BASELINE.md r3
    # analysis), so it stays off; kept for measurement reproducibility.
    lane_pack: bool = False
    lane_pack_bwd: bool = False  # also pack the dgrad convs (see ops/s2d_conv.py)
    # Train with the shift-invariant decoder upsample
    # (ops/resize.upsample2x_local) instead of the reference's
    # align-corners grid — parameter-free either way (any checkpoint
    # serves through either decoder), but training with it makes the
    # seamless fully-convolutional serving mode (infer/fullconv.py,
    # ScenePredictor fullconv_band_rows) serve EXACTLY the trained
    # network instead of a decoder-swapped variant of it.  Off by
    # default: the align-corners grid is the reference-parity decoder.
    local_upsample: bool = False
    compat_reference_losses: bool = False  # replicate reference's (B,H)-only loss reduce
    # True: apply the shared encoder per date so train-mode BatchNorm uses
    # per-date batch statistics, exactly as the reference's twice-applied
    # encoder does (/root/reference/models/bidate_model.py:23-33).  False
    # (default): stack both dates into one 2N batch — bigger MXU tiles, one
    # encoder launch; eval is identical either way (running averages).
    per_date_batchnorm: bool = False
    # Umbrella flag: reproduce the reference's training semantics end-to-end
    # (per-date BN batch statistics + the (B,H)-only loss reduction quirk).
    # Verified one-SGD-step-exact by tests/test_reference_train_parity.py.
    compat_reference: bool = False
    eval_batch_size: int = 0  # 0 = use batch_size
    # batches between per-batch tracker metric writes; 0 (default) streams
    # per-epoch only (set 1 for the reference's every-batch comet behavior)
    log_every: int = 0
    infer_overlap: int = 0  # overlap (px) for overlap-averaged stitching; 0 = ref grid
    steps_per_epoch: int = 0  # 0 = full pass; >0 caps batches per epoch (debug)
    shuffle_train: bool = True  # False = deterministic metadata-order batches
    # capture a jax profiler trace (TensorBoard/Perfetto format) of the
    # first profile_steps train steps into this directory ("" = off)
    profile_dir: str = ""
    profile_steps: int = 5

    def __post_init__(self) -> None:
        if self.eval_batch_size == 0:
            self.eval_batch_size = self.batch_size
        if self.compat_reference:
            self.compat_reference_losses = True
            self.per_date_batchnorm = True
        if isinstance(self.stretch_8bit, (list, tuple)):
            self.stretch_8bit = {"lower": self.stretch_8bit[0],
                                 "higher": self.stretch_8bit[1]}

    @property
    def n_channels(self) -> int:
        return len(self.band_ids)

    @property
    def n_classes(self) -> int:
        return 2

    def band_stats_arrays(self):
        """(means, stds) as float32 arrays ordered by band_ids."""
        import numpy as np
        means = np.array([self.band_means[b] for b in self.band_ids], np.float32)
        stds = np.array([self.band_stds[b] for b in self.band_ids], np.float32)
        return means, stds

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in fields}
        return cls(**known)


_SIMPLE_TYPES = (int, float, str, bool)


def _add_field_arg(parser: argparse.ArgumentParser, f: dataclasses.Field) -> None:
    name = "--" + f.name
    if f.type in ("int", int):
        parser.add_argument(name, type=int, default=None)
    elif f.type in ("float", float):
        parser.add_argument(name, type=float, default=None)
    elif f.type in ("bool", bool):
        parser.add_argument(name, type=_parse_bool, default=None)
    elif f.type in ("str", str):
        parser.add_argument(name, type=str, default=None)
    else:
        # lists/dicts: accept JSON literals on the CLI
        parser.add_argument(name, type=json.loads, default=None)


def _parse_bool(s: str) -> bool:
    if s.lower() in ("1", "true", "yes", "on"):
        return True
    if s.lower() in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"not a boolean: {s!r}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="fabric-tpu: TPU-native change-detection training")
    parser.add_argument("--config", type=str, default=None,
                        help="JSON config file (reference metadata.json compatible)")
    for f in dataclasses.fields(Config):
        _add_field_arg(parser, f)
    return parser


def load_config(argv: list[str] | None = None,
                json_path: str | None = None,
                overrides: dict[str, Any] | None = None) -> Config:
    """Build a Config from (lowest to highest precedence):
    dataclass defaults < JSON file < ``overrides`` dict < CLI args.

    Unknown JSON keys (e.g. the reference's ``_comment``) are ignored.
    """
    parser = build_parser()
    args = parser.parse_args(argv if argv is not None else [])
    path = args.config or json_path

    merged: dict[str, Any] = {}
    if path:
        with open(path) as fin:
            merged.update(json.load(fin))
    if overrides:
        merged.update(overrides)
    field_names = {f.name for f in dataclasses.fields(Config)}
    for k, v in vars(args).items():
        if k in field_names and v is not None:
            merged[k] = v
    return Config.from_dict(merged)
