"""Standalone checkpoint evaluation: patch-level val metrics + scene F1.

The reference can only produce validation metrics as a side effect of
training (/root/reference/train.py:125-205 — the val phase and the
per-city whole-scene inference live inside the epoch loop).  A user who
has a trained checkpoint and wants to know how it scores must re-enter
the training driver.  Here evaluation is a first-class entry point:

    python -m fabric_tpu.cli.evaluate --config metadata.json --resume <dir>

It reuses the exact machinery of the training loop's val phase — the
mask-padded fixed-shape eval batches, the on-device confusion counts with
one epoch-end device→host sync, the reference's mean-of-per-batch
aggregation (utils/helpers.py:45-59) plus the sound global
confusion-matrix aggregation — and the reference-exact tiling/stitch
scene inference, so its numbers are bit-identical to what the training
loop would have reported for the same weights.
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger("fabric_tpu")


def evaluate(cfg, dataset: dict | None = None, cities: list[str] | None = None,
             run_scene_inference: bool = True, state=None):
    """Evaluate a checkpoint (``cfg.resume``) on validation patches + scenes.

    ``dataset`` optionally injects an in-memory ``{city: {images, labels}}``
    dict (tests); otherwise the on-disk dataset at ``cfg.dataset_dir`` is
    loaded.  ``cities`` overrides ``cfg.validation_cities``.  ``state``
    optionally supplies already-restored weights (skips the checkpoint
    load).  Returns::

        {"patch": {cd_losses, cd_corrects, cd_precisions, cd_recalls,
                   cd_f1scores, global_precision, global_recall, global_f1,
                   global_accuracy, num_batches, num_samples},
         "scenes": {city: {precision, recall, f1, change_pct}}}
    """
    import jax

    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.data import (
        PatchSampler, batch_iterator, full_load, get_train_val_metadata,
        metadata_from_dataset, prefetch_to_device)
    from fabric_tpu.infer.runner import infer_city
    from fabric_tpu.losses import get_loss_fn
    from fabric_tpu.metrics import MetricAccumulator, prf1_from_counts
    from fabric_tpu.models import build_model
    from fabric_tpu.parallel.mesh import batch_shardings, make_mesh_from_config
    from fabric_tpu.train.loop import _epoch
    from fabric_tpu.train.state import create_state
    from fabric_tpu.train.steps import (
        make_eval_step, make_infer_probs_step, make_infer_step)

    cities = list(cities or cfg.validation_cities)
    if dataset is None:
        from fabric_tpu.data.download import ensure_dataset
        cfg.dataset_dir = ensure_dataset(cfg)

    multi_date = cfg.model in ("unet_lstm", "unet3d")
    mesh = make_mesh_from_config(cfg)
    if cfg.eval_batch_size % mesh.shape["data"]:
        # the data axis must divide the (mask-padded, fixed-shape) eval
        # batch; shrink it rather than fail (same policy as train.loop)
        import math
        from fabric_tpu.parallel.mesh import make_mesh
        new_data = math.gcd(cfg.eval_batch_size, mesh.shape["data"])
        log.warning("eval_batch_size %d not divisible by data axis %d; "
                    "shrinking mesh to data=%d", cfg.eval_batch_size,
                    mesh.shape["data"], new_data)
        mesh = make_mesh(new_data, mesh.shape["spatial"],
                         mesh.shape["model"])
    shardings = batch_shardings(mesh, multi_date=multi_date)

    model = build_model(cfg)
    loss_fn = get_loss_fn(cfg)
    if state is None:
        state = create_state(cfg, model)
        state, epoch, _ = ckpt.resume_if_requested(cfg, state)
        if epoch >= 0:
            log.info("evaluating checkpoint from epoch %d (step %d)",
                     epoch, int(state.step))

    data = dataset if dataset is not None else full_load(
        cfg.dataset_dir, cfg, max_workers=cfg.num_workers or None)
    if dataset is not None:
        _, val_md = metadata_from_dataset(
            data, cities, cfg.patch_size, cfg.stride)
    else:
        _, val_md = get_train_val_metadata(
            cfg.dataset_dir, cities, cfg.patch_size, cfg.stride)
    log.info("val samples: %d over %s", len(val_md), cities)

    eval_step = make_eval_step(model, loss_fn)
    sampler = PatchSampler(data, val_md, cfg.patch_size, augment=False,
                           multi_date=multi_date)
    pidx, pcount = jax.process_index(), jax.process_count()
    batches = prefetch_to_device(
        batch_iterator(sampler, cfg.eval_batch_size, shuffle=False,
                       pad_mode="mask", max_batches=cfg.steps_per_epoch,
                       process_index=pidx, process_count=pcount),
        size=cfg.prefetch, sharding=shardings)

    acc = MetricAccumulator()
    _epoch(eval_step, state, batches, acc, train=False)
    patch = acc.means()
    patch.update(acc.global_prf1())
    patch["num_batches"] = len(acc)
    patch["num_samples"] = len(val_md)

    scenes: dict[str, dict[str, float]] = {}
    if run_scene_inference and dataset is None:
        from fabric_tpu.data.oscd import load_label
        infer_step = make_infer_step(model)
        prob_step = make_infer_probs_step(model)
        scene_mesh, scene_state = mesh, state
        if pcount > 1:  # replicate per process, as the training loop does
            scene_mesh = None
            scene_state = jax.tree_util.tree_map(np.asarray, state)
        for city in cities:
            mask = infer_city(infer_step, scene_state, cfg, city,
                              mesh=scene_mesh, prob_step=prob_step)
            label = load_label(cfg.dataset_dir, city)
            row = {"change_pct": 100.0 * float(mask.mean())}
            if label.shape == mask.shape:
                p, r, f1 = prf1_from_counts({
                    "tp": int(np.sum((mask == 1) & (label == 1))),
                    "fp": int(np.sum((mask == 1) & (label == 0))),
                    "fn": int(np.sum((mask == 0) & (label == 1)))})
                row.update({"precision": p, "recall": r, "f1": f1})
            scenes[city] = row

    return {"patch": patch, "scenes": scenes}
