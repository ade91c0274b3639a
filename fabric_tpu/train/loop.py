"""The training driver: epochs of train/val + whole-scene inference +
best-metric checkpointing with resume.

Functional re-design of the reference's module-level script
(/root/reference/train.py:65-240): same phases (train epoch → val epoch →
per-validation-city full-scene inference → best-metric checkpoint →
epoch metric logging), rebuilt as a function over a Mesh with a local
tracker, padding-masked eval batches, and a real resume path (the reference
has none — SURVEY.md §3.4).
"""

from __future__ import annotations

import logging
import time

import numpy as np

from fabric_tpu import checkpoint as ckpt
from fabric_tpu.data import (
    get_train_val_metadata, full_load, PatchSampler, batch_iterator,
    prefetch_to_device,
)
from fabric_tpu.infer.runner import infer_city
from fabric_tpu.losses import get_loss_fn
from fabric_tpu.metrics import MetricAccumulator
from fabric_tpu.models import build_model
from fabric_tpu.parallel.mesh import make_mesh_from_config, batch_shardings
from fabric_tpu.track import Tracker
from fabric_tpu.train.state import create_state
from fabric_tpu.train.steps import (
    make_train_step, make_eval_step, make_infer_step, make_infer_probs_step)

log = logging.getLogger("fabric_tpu")


def _epoch(step_fn, state, batches, accumulator, train: bool,
           on_first_batch=None, on_step=None, tracker=None,
           log_every: int = 0, prefix: str = ""):
    first = True
    for i, batch in enumerate(batches):
        if train:
            state, stats = step_fn(state, batch)
        else:
            stats = step_fn(state, batch)
        if first and on_first_batch is not None:
            on_first_batch(batch, stats)
            first = False
        accumulator.update(
            float(stats["loss"]),
            {k: int(stats[k]) for k in ("tp", "fp", "fn", "tn")})
        if tracker is not None and log_every and (i + 1) % log_every == 0:
            # per-batch running-mean stream, the reference's comet channel
            # (train.py:114-115); mean-of-batches semantics preserved
            tracker.log_metrics(accumulator.means(), prefix=prefix,
                                step=int(state.step) if train else i + 1)
        if on_step is not None:
            on_step(state)
    return state


def _denorm_rgb(img: np.ndarray) -> np.ndarray:
    """RGB preview from a normalized 13-band patch: bands 1:4 reversed
    (B04,B03,B02 = R,G,B), min-max scaled — reference
    utils/helpers.py:128-150 semantics in NHWC."""
    from fabric_tpu.utils.image import scale
    rgb = np.asarray(img)[..., 1:4][..., ::-1]
    return scale(rgb).astype(np.uint8)


def _log_val_patches(tracker, epoch: int, batch, stats) -> None:
    """Sample-patch comparison figures on the first val batch
    (reference log_patches, train.py:141-148 + utils/helpers.py:92-125:
    every 10th sample of the batch)."""
    imgs1 = batch.get("img1")
    if imgs1 is None:  # multi-date: use first/last dates as the pair
        imgs1 = batch["imgs"][:, 0]
        imgs2 = batch["imgs"][:, -1]
    else:
        imgs2 = batch["img2"]
    preds = np.asarray(stats["preds"])
    labels = np.asarray(batch["label"])
    for sample in range(0, imgs1.shape[0], 10):
        tracker.log_figure(
            f"epoch_{epoch}_cd_sample_{sample}",
            _denorm_rgb(imgs1[sample]), _denorm_rgb(imgs2[sample]),
            labels[sample], preds[sample])


def _log_scene_figure(tracker, cfg, city: str, epoch: int,
                      mask: np.ndarray) -> None:
    """2x2 scene comparison (pair previews / groundtruth / prediction),
    mirroring the reference's log_full_image (utils/inference.py:106-131).
    Silently skipped if the pair previews are absent."""
    import os
    from fabric_tpu.data.oscd import load_label
    from fabric_tpu.utils.image import read_png_gray, stretch_8bit
    pair = os.path.join(cfg.dataset_dir, "images", city, "pair")
    p1, p2 = (os.path.join(pair, f"img{i}.png") for i in (1, 2))
    if not (os.path.exists(p1) and os.path.exists(p2)):
        return
    lo = cfg.stretch_8bit.get("lower", 2)
    hi = cfg.stretch_8bit.get("higher", 98)
    try:
        img1 = stretch_8bit(read_png_gray(p1).astype(np.float32), lo, hi)
        img2 = stretch_8bit(read_png_gray(p2).astype(np.float32), lo, hi)
        gt = load_label(cfg.dataset_dir, city) * 255
        tracker.log_figure(f"{city}_epoch_{epoch}_figure",
                           img1, img2, gt, mask * 255)
    except Exception:
        pass


def improved(mean_val: dict, best: dict) -> bool:
    """Reference checkpoint policy: save if ANY of precision/recall/F1
    improved (train.py:210-214)."""
    return (mean_val["cd_precisions"] > best["cd_precisions"]
            or mean_val["cd_recalls"] > best["cd_recalls"]
            or mean_val["cd_f1scores"] > best["cd_f1scores"])


def train(cfg, dataset: dict | None = None, tracker: Tracker | None = None,
          run_scene_inference: bool = True):
    """Run the full training driver; returns (state, history dict)."""
    if dataset is None:
        # resolve before log_params so the recorded config matches what is
        # actually read (archives may nest the dataset one level down)
        from fabric_tpu.data.download import ensure_dataset
        cfg.dataset_dir = ensure_dataset(cfg)
    tracker = tracker or Tracker(cfg.log_dir, project=cfg.project_name)
    tracker.log_params(cfg.to_dict())

    mesh = make_mesh_from_config(cfg)
    if cfg.batch_size % mesh.shape["data"]:
        # the data axis must divide the batch; shrink it rather than fail
        import math
        from fabric_tpu.parallel.mesh import make_mesh
        new_data = math.gcd(cfg.batch_size, mesh.shape["data"])
        log.warning("batch_size %d not divisible by data axis %d; "
                    "shrinking mesh to data=%d", cfg.batch_size,
                    mesh.shape["data"], new_data)
        mesh = make_mesh(new_data, mesh.shape["spatial"],
                         mesh.shape["model"])
    multi_date = cfg.model in ("unet_lstm", "unet3d")
    shardings = batch_shardings(mesh, multi_date=multi_date)

    log.info("loading dataset from %s", cfg.dataset_dir)
    data = dataset if dataset is not None else full_load(
        cfg.dataset_dir, cfg, max_workers=cfg.num_workers or None)
    train_md, val_md = get_train_val_metadata(
        cfg.dataset_dir, cfg.validation_cities, cfg.patch_size, cfg.stride)
    log.info("train samples: %d  val samples: %d", len(train_md), len(val_md))

    model = build_model(cfg)
    loss_fn = get_loss_fn(cfg)
    state = create_state(cfg, model)
    state, resumed_epoch = ckpt.resume_if_requested(cfg, state)
    if resumed_epoch >= 0:
        log.info("resumed from epoch %d (step %d)", resumed_epoch, state.step)

    train_step = make_train_step(model, loss_fn)
    eval_step = make_eval_step(model, loss_fn)
    infer_step = make_infer_step(model)
    prob_step = make_infer_probs_step(model)

    best = {"cd_f1scores": -1.0, "cd_recalls": -1.0, "cd_precisions": -1.0}
    history = {"train": [], "val": []}
    start_epoch = resumed_epoch + 1

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        train_acc, val_acc = MetricAccumulator(), MetricAccumulator()

        sampler = PatchSampler(data, train_md, cfg.patch_size,
                               augment=cfg.augmentation,
                               seed=cfg.seed + epoch,
                               multi_date=multi_date)
        batches = prefetch_to_device(
            batch_iterator(sampler, cfg.batch_size, shuffle=True,
                           pad_mode="wrap", seed=cfg.seed + epoch,
                           max_batches=cfg.steps_per_epoch),
            size=cfg.prefetch, sharding=shardings)

        on_step = None
        if cfg.checkpoint_every > 0:
            # periodic step-based checkpointing (fault tolerance: resume
            # loses at most checkpoint_every steps; the reference could
            # only restart from scratch — SURVEY.md §5)
            def on_step(s, _epoch=epoch):
                if int(s.step) % cfg.checkpoint_every == 0:
                    ckpt.save(s, cfg.weight_dir, _epoch, tag="periodic",
                              metadata={"periodic": True})

        state = _epoch(train_step, state, batches, train_acc, train=True,
                       on_step=on_step, tracker=tracker,
                       log_every=cfg.log_every, prefix="batch_train_")
        mean_train = train_acc.means()
        tracker.log_metrics(mean_train, step=epoch, prefix="train_")
        log.info("epoch %d train %s", epoch,
                 {k: round(v, 4) for k, v in mean_train.items()})

        val_sampler = PatchSampler(data, val_md, cfg.patch_size,
                                   augment=False, multi_date=multi_date)
        val_batches = prefetch_to_device(
            batch_iterator(val_sampler, cfg.eval_batch_size, shuffle=False,
                           pad_mode="mask",
                           max_batches=cfg.steps_per_epoch),
            size=cfg.prefetch, sharding=shardings)
        _epoch(eval_step, state, val_batches, val_acc, train=False,
               on_first_batch=lambda b, s: _log_val_patches(
                   tracker, epoch, b, s),
               tracker=tracker, log_every=cfg.log_every,
               prefix="batch_validate_")
        mean_val = val_acc.means()
        mean_val.update(val_acc.global_prf1())
        tracker.log_metrics(mean_val, step=epoch, prefix="validate_")
        log.info("epoch %d val %s", epoch,
                 {k: round(v, 4) for k, v in mean_val.items()
                  if k.startswith("cd_")})

        if run_scene_inference:
            from fabric_tpu.data.oscd import load_label
            from fabric_tpu.metrics import prf1_from_counts
            for city in cfg.validation_cities:
                try:
                    mask = infer_city(infer_step, state, cfg, city,
                                      mesh=mesh, prob_step=prob_step)
                    tracker.log_image(f"{city}_epoch_{epoch}", mask * 255)
                    _log_scene_figure(tracker, cfg, city, epoch, mask)
                    # full-scene F1 vs ground truth (the reference only
                    # logged images; the scene-level metric is new)
                    label = load_label(cfg.dataset_dir, city)
                    if label.shape == mask.shape:
                        tp = int(np.sum((mask == 1) & (label == 1)))
                        fp = int(np.sum((mask == 1) & (label == 0)))
                        fn = int(np.sum((mask == 0) & (label == 1)))
                        p, r, f1 = prf1_from_counts(
                            {"tp": tp, "fp": fp, "fn": fn})
                        tracker.log_metrics(
                            {f"{city}_scene_precision": p,
                             f"{city}_scene_recall": r,
                             f"{city}_scene_f1": f1}, step=epoch)
                        mean_val[f"{city}_scene_f1"] = f1
                except Exception as e:  # scene missing on disk etc.
                    log.warning("scene inference failed for %s: %s", city, e)

        if improved(mean_val, best):
            meta = dict(cfg.to_dict())
            meta["validation_metrics"] = mean_val
            ckpt.save(state, cfg.weight_dir, epoch, metadata=meta)
            best = {k: mean_val[k] for k in best}
            log.info("epoch %d: new best, checkpointed", epoch)

        history["train"].append(mean_train)
        history["val"].append(mean_val)
        tracker.log_metrics({"epoch": epoch,
                             "epoch_seconds": time.time() - t0}, step=epoch)
        tracker.set_status("running")

    tracker.set_status("complete")
    return state, history
