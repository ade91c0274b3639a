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

import functools
import logging
import os
import time

import numpy as np

from fabric_tpu import checkpoint as ckpt
from fabric_tpu.data import (
    get_train_val_metadata, metadata_from_dataset, full_load, PatchSampler,
    batch_iterator, prefetch_to_device,
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


_STAT_KEYS = ("loss", "tp", "fp", "fn", "tn")


class _ProfileCapture:
    """Trace the first N train steps into cfg.profile_dir (SURVEY.md §5:
    profiling is first-class here; the reference had none)."""

    def __init__(self, logdir: str, nsteps: int):
        import jax
        self._active = True
        self._left = max(nsteps, 1)
        jax.profiler.start_trace(logdir)
        log.info("profiler trace started -> %s (%d steps)", logdir, nsteps)

    def on_step(self, state, stats=None) -> None:
        if not self._active:
            return
        self._left -= 1
        if self._left <= 0:
            self.stop(state)

    def stop(self, state=None) -> None:
        if not self._active:
            return
        import jax
        if state is not None:
            from fabric_tpu.utils.profiling import sync
            sync(state.params)  # capture the device work, not just dispatch
        jax.profiler.stop_trace()
        self._active = False


def _epoch(step_fn, state, batches, accumulator, train: bool,
           on_first_batch=None, on_step=None, tracker=None,
           log_every: int = 0, prefix: str = "", timer=None):
    """One pass over ``batches``.

    Default path: per-batch stats stay ON DEVICE as five scalars per step
    (JAX dispatch is async, so appending them never blocks) and are pulled
    in ONE device→host transfer at epoch end — no per-step sync, the exact
    throughput killer the reference commits with its per-batch sklearn call
    (train.py:103-106) and that r1 re-committed in miniature here.
    Mean-of-per-batch aggregation is preserved bit-for-bit because every
    batch's counts survive individually.  ``log_every > 0`` opts back into
    the streaming path (one host sync per batch) for the reference's
    every-batch comet behavior.
    """
    first = True
    stream = tracker is not None and log_every > 0
    rows: list[dict] = []
    for i, batch in enumerate(batches):
        if timer is not None:
            with timer:
                if train:
                    state, stats = step_fn(state, batch)
                else:
                    stats = step_fn(state, batch)
        elif train:
            state, stats = step_fn(state, batch)
        else:
            stats = step_fn(state, batch)
        if first and on_first_batch is not None:
            on_first_batch(batch, stats)
            first = False
        if stream:
            loss_val = float(stats["loss"])
            if train and not np.isfinite(loss_val):
                if tracker is not None:
                    tracker.set_status("diverged")
                raise FloatingPointError(
                    f"non-finite training loss at batch {i + 1} "
                    f"(loss={loss_val})")
            accumulator.update(
                loss_val,
                {k: int(stats[k]) for k in ("tp", "fp", "fn", "tn")})
            if (i + 1) % log_every == 0:
                # per-batch running-mean stream, the reference's comet
                # channel (train.py:114-115)
                tracker.log_metrics(accumulator.means(), prefix=prefix,
                                    step=int(state.step) if train else i + 1)
        else:
            rows.append({k: stats[k] for k in _STAT_KEYS})
        if on_step is not None:
            on_step(state, stats)
    if rows:
        stacked = _stack_rows(rows)
        if train and not np.all(np.isfinite(stacked["loss"])):
            # divergence detection (SURVEY.md §5 failure handling): a NaN/inf
            # loss must halt the run loudly at the epoch boundary (the one
            # host sync), not silently poison every later epoch's metrics
            # and checkpoints.  Resume from the last finite checkpoint with
            # a lower LR; the tuner records this as a failed trial.
            bad = int(np.argmax(~np.isfinite(np.asarray(stacked["loss"]))))
            if tracker is not None:
                tracker.set_status("diverged")
            raise FloatingPointError(
                f"non-finite training loss at step {bad + 1}/{len(rows)} "
                f"of this epoch (loss={np.asarray(stacked['loss'])[bad]})")
        for j in range(len(rows)):
            accumulator.update(
                float(stacked["loss"][j]),
                {k: int(stacked[k][j]) for k in ("tp", "fp", "fn", "tn")})
    return state


def _stack_rows(rows: list[dict]) -> dict:
    """One (steps, 5) device→host transfer for a whole epoch's stats.

    The stack runs INSIDE jit: eagerly stacking hundreds of scalars that
    are replicated over a multi-device mesh aborted in the XLA:CPU client
    under the 8-virtual-device test environment (Fatal Python error in
    apply_primitive/broadcast_in_dim); a compiled stack takes the ordinary
    executable path.  One compile per distinct epoch length.
    """
    import jax
    return jax.device_get(_stack_jit()(rows))


@functools.lru_cache(maxsize=1)
def _stack_jit():
    import jax
    import jax.numpy as jnp
    # jit re-traces per input pytree structure, i.e. per epoch length
    return jax.jit(lambda rs: {k: jnp.stack([r[k] for r in rs])
                               for k in _STAT_KEYS})


def _denorm_rgb(img: np.ndarray) -> np.ndarray:
    """RGB preview from a normalized 13-band patch: bands 1:4 reversed
    (B04,B03,B02 = R,G,B), min-max scaled — reference
    utils/helpers.py:128-150 semantics in NHWC."""
    from fabric_tpu.utils.image import scale
    rgb = np.asarray(img)[..., 1:4][..., ::-1]
    return scale(rgb).astype(np.uint8)


def _host_rows(x) -> np.ndarray:
    """Materialize an array on host.  Multi-host: a globally-sharded batch is
    not fully addressable, so fall back to this process's local rows (figure
    previews only need *some* samples; assumes spatial axis unsharded)."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards])
    return np.asarray(x)


def _log_val_patches(tracker, epoch: int, batch, stats) -> None:
    """Sample-patch comparison figures on the first val batch
    (reference log_patches, train.py:141-148 + utils/helpers.py:92-125:
    every 10th sample of the batch)."""
    imgs1 = batch.get("img1")
    if imgs1 is None:  # multi-date: use first/last dates as the pair
        imgs1 = _host_rows(batch["imgs"])[:, 0]
        imgs2 = _host_rows(batch["imgs"])[:, -1]
    else:
        imgs1 = _host_rows(imgs1)
        imgs2 = _host_rows(batch["img2"])
    preds = _host_rows(stats["preds"])
    labels = _host_rows(batch["label"])
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
    except OSError as e:  # unreadable preview/label file: figure is optional
        log.warning("scene figure skipped for %s: %s", city, e)
        return
    tracker.log_figure(f"{city}_epoch_{epoch}_figure",
                       img1, img2, gt, mask * 255)


def improved(mean_val: dict, best: dict) -> bool:
    """Reference checkpoint policy: save if ANY of precision/recall/F1
    improved (train.py:210-214)."""
    return (mean_val["cd_precisions"] > best["cd_precisions"]
            or mean_val["cd_recalls"] > best["cd_recalls"]
            or mean_val["cd_f1scores"] > best["cd_f1scores"])


def train(cfg, dataset: dict | None = None, tracker: Tracker | None = None,
          run_scene_inference: bool = True, init_variables: dict | None = None,
          metadata: tuple[list, list] | None = None,
          preemption_guard=None):
    """Run the full training driver; returns (state, history dict).

    ``init_variables`` warm-starts from an existing {params, batch_stats}
    tree; ``metadata`` overrides the (train, val) patch lists (entries are
    (city, x, y)) — both used by the loop-parity oracle to pin the exact
    starting point and sample order of the reference script.

    ``preemption_guard`` injects a pre-built
    :class:`fabric_tpu.train.preemption.PreemptionGuard` (tests, external
    notice channels); with ``cfg.handle_preemption`` (the default) one is
    installed on SIGTERM for the duration of the run — a preempted run
    checkpoints mid-epoch, returns with ``history["status"]=="preempted"``,
    and resumes exactly (see train/preemption.py)."""
    if dataset is None:
        # resolve before log_params so the recorded config matches what is
        # actually read (archives may nest the dataset one level down)
        from fabric_tpu.data.download import ensure_dataset
        cfg.dataset_dir = ensure_dataset(cfg)
    # Multi-host: only process 0 touches the filesystem (tracker files,
    # checkpoints, figures); every process still computes everything.
    from fabric_tpu.parallel.distributed import is_primary
    primary = is_primary()
    if tracker is None:
        from fabric_tpu.track import NullTracker
        tracker = (Tracker(cfg.log_dir, project=cfg.project_name)
                   if primary else NullTracker())
    run_params = cfg.to_dict()
    if dataset is None:
        # dataset identity next to the config (reference helpers.py:275-280
        # logged the tarball + hash to comet); in-memory datasets have no
        # on-disk identity to record
        from fabric_tpu.data.download import dataset_provenance
        run_params["dataset_provenance"] = dataset_provenance(
            cfg, cfg.dataset_dir)
    tracker.log_params(run_params)
    import jax
    pidx, pcount = jax.process_index(), jax.process_count()

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
    if metadata is not None:
        train_md, val_md = metadata
    elif dataset is not None:
        # in-memory dataset: grids come from the label arrays themselves
        train_md, val_md = metadata_from_dataset(
            dataset, cfg.validation_cities, cfg.patch_size, cfg.stride)
    else:
        train_md, val_md = get_train_val_metadata(
            cfg.dataset_dir, cfg.validation_cities, cfg.patch_size,
            cfg.stride)
    log.info("train samples: %d  val samples: %d", len(train_md), len(val_md))

    if (cfg.compat_reference and pcount == 1 and mesh.shape["data"] > 1
            and len(train_md) % cfg.batch_size
            and (not cfg.steps_per_epoch or cfg.steps_per_epoch
                 >= -(-len(train_md) // cfg.batch_size))):
        # the epoch will reach the reference's RAGGED final batch
        # (drop_last=False); a ragged global batch does not shard over a
        # data axis, and wrap-padding it instead would change the
        # gradient, the train-BN batch statistics, and the compat aug
        # stream's draw count.  compat_reference is the parity mode —
        # collapse data parallelism rather than diverge silently.
        from fabric_tpu.parallel.mesh import make_mesh
        log.warning("compat_reference with %d samples %% batch_size %d "
                    "!= 0 trains a ragged final batch; shrinking mesh "
                    "data axis %d -> 1 (ragged batches do not shard)",
                    len(train_md), cfg.batch_size, mesh.shape["data"])
        mesh = make_mesh(1, mesh.shape["spatial"], mesh.shape["model"])
        shardings = batch_shardings(mesh, multi_date=multi_date)

    model = build_model(cfg)
    loss_fn = get_loss_fn(cfg)
    state = create_state(cfg, model, variables=init_variables)
    if cfg.resume:
        # remote resume target: materialize it locally first (per-process
        # cache — every process restores, only the primary writes);
        # fetch_resume passes local paths through untouched
        from fabric_tpu.store import fetch_resume
        cfg.resume = fetch_resume(
            cfg.resume, os.path.join(cfg.weight_dir, ".resume_cache",
                                     f"p{pidx}"))
    state, resumed_epoch, resumed_meta = ckpt.resume_if_requested(cfg, state)
    if resumed_epoch >= 0:
        log.info("resumed from epoch %d (step %d)", resumed_epoch, state.step)

    train_step = make_train_step(model, loss_fn)
    eval_step = make_eval_step(model, loss_fn)
    infer_step = make_infer_step(model)
    prob_step = make_infer_probs_step(model)

    best = {"cd_f1scores": -1.0, "cd_recalls": -1.0, "cd_precisions": -1.0}
    # seed best from the resumed checkpoint's saved validation metrics (best
    # saves) or carried best dict (periodic saves) so a post-resume
    # regression is not re-checkpointed as a "new best"
    for source in ("validation_metrics", "best_metrics"):
        for k, v in (resumed_meta.get(source) or {}).items():
            if k in best:
                best[k] = float(v)
    history = {"train": [], "val": []}
    start_epoch = resumed_epoch + 1
    # Mid-epoch resume (SURVEY.md §5 failure recovery, r2 VERDICT #5): a
    # periodic checkpoint carries how far into its epoch it was saved plus
    # the epoch's per-batch stat rows so far; restart INSIDE that epoch,
    # fast-forward the deterministic batch stream, and replay the stats —
    # the resumed trajectory and the epoch's reported metrics both equal
    # the uninterrupted run's.
    resume_skip, resume_rows = 0, []
    if resumed_meta.get("periodic") and resumed_meta.get("batches_done"):
        start_epoch = resumed_epoch
        resume_skip = int(resumed_meta["batches_done"])
        resume_rows = [[float(v) for v in row]
                       for row in resumed_meta.get("train_rows") or []]
        log.info("mid-epoch resume: completing epoch %d from batch %d",
                 start_epoch, resume_skip)

    profiler = None
    if cfg.profile_dir and primary:
        profiler = _ProfileCapture(cfg.profile_dir, cfg.profile_steps)

    # Remote artifact egress (fabric_tpu/store.py): mirror each atomic
    # local checkpoint save (and, at exit, the tracker directory) to
    # cfg.output_store — primary-only, async, failure-tolerant.  The
    # reference uploaded every best checkpoint in-loop and synchronously
    # (train.py:225-226).
    store = None
    if cfg.output_store and primary:
        from fabric_tpu.store import open_store
        store = open_store(cfg.output_store)
        log.info("mirroring checkpoints + tracker output to %s",
                 cfg.output_store)

    from fabric_tpu.train.preemption import PreemptionGuard, TrainingPreempted
    guard, owned_guard = preemption_guard, False
    if guard is None and getattr(cfg, "handle_preemption", True):
        guard = PreemptionGuard()
        owned_guard = guard.install()  # False off the main thread: latch-only
        log.info("preemption guard: SIGTERM handler %s",
                 "installed" if owned_guard else
                 "NOT installed (not the main thread); latch-only")

    try:
        state = _run_epochs(
            cfg, state, data, train_md, val_md, shardings, mesh, tracker,
            train_step, eval_step, infer_step, prob_step, best, history,
            start_epoch, resume_skip, resume_rows, profiler, guard,
            run_scene_inference, pidx, pcount, multi_date, store)
    except TrainingPreempted as e:
        # the preemption checkpoint is already on disk (primary); report a
        # clean, resumable exit instead of propagating the unwind
        tracker.set_status("preempted")
        history["status"] = "preempted"
        log.warning("training preempted: resume with resume=%s to complete "
                    "the run exactly", cfg.weight_dir)
        _store_epilogue(store, tracker)
        return (e.state if e.state is not None else state), history
    finally:
        if owned_guard:
            guard.uninstall()

    tracker.set_status("complete")
    history["status"] = "complete"
    _store_epilogue(store, tracker)
    return state, history


def _store_epilogue(store, tracker) -> None:
    """End-of-run artifact egress: mirror the tracker directory (metrics
    stream, figures, status) and wait for queued checkpoint uploads —
    bounded, so a wedged remote cannot hang process exit."""
    if store is None:
        return
    tdir = getattr(tracker, "dir", None)
    if tdir and os.path.isdir(tdir):
        store.upload_dir(tdir, rel=os.path.join(
            "tracker", os.path.basename(os.path.normpath(tdir))))
    failed = store.flush()
    if failed:
        log.warning("%d artifact uploads failed this run (local copies "
                    "are intact)", failed)


def _run_epochs(cfg, state, data, train_md, val_md, shardings, mesh, tracker,
                train_step, eval_step, infer_step, prob_step, best, history,
                start_epoch, resume_skip, resume_rows, profiler, guard,
                run_scene_inference, pidx, pcount, multi_date, store=None):
    """The epoch loop body of :func:`train` (split out so the preemption
    unwind path stays readable)."""
    import jax
    from fabric_tpu.train.preemption import TrainingPreempted
    from fabric_tpu.parallel.distributed import is_primary
    primary = is_primary()

    # compat_reference + augmentation: consume the reference's exact
    # sequential python-random augmentation stream
    # (dataloaders.py:153-163) instead of the keyed per-row RNG, so the
    # aug-on loop-parity harness compares identical patches.  The stream
    # spans epochs (the reference never reseeds); on resume, fast-forward
    # it past the completed epochs' draws.
    # compat_reference + a dataset that doesn't divide the batch: the
    # reference's torch DataLoader trains a RAGGED final batch
    # (drop_last=False) — wrap-pad rows would change its gradient, its
    # train-mode BN batch statistics, AND over-consume the sequential
    # augmentation stream.  Emit the tail ragged instead (one extra jit
    # compile); needs the whole batch on one process / one data-mesh
    # device (a ragged global batch does not shard).
    compat_ragged = (cfg.compat_reference and pcount == 1
                     and (mesh is None
                          or dict(zip(mesh.axis_names,
                                      mesh.devices.shape)).get("data", 1)
                          == 1))
    compat_aug = None
    if cfg.augmentation and cfg.compat_reference:
        if pcount == 1:
            import random as pyrandom
            from fabric_tpu.data.pipeline import (replay_aug_draws,
                                                  epoch_train_rows)
            compat_aug = pyrandom.Random(cfg.seed)
            if start_epoch:
                replay_aug_draws(compat_aug, start_epoch * epoch_train_rows(
                    len(train_md), cfg.batch_size, cfg.steps_per_epoch,
                    ragged_tail=compat_ragged))
        else:
            log.warning("compat_reference augmentation stream is "
                        "single-process only; multi-process run keeps the "
                        "keyed per-row augmentation RNG")

    for epoch in range(start_epoch, cfg.epochs):
        if guard is not None and guard.requested:
            # signal landed between epochs (val / scene inference): the
            # state IS an epoch boundary, so save it as a zero-progress
            # periodic checkpoint of the previous epoch — resume then
            # starts this epoch from its exact top.  EXCEPT while a
            # mid-epoch resume is still pending (resume_skip unconsumed):
            # the state is already resume_skip batches INTO this epoch,
            # and saving it as a zero-progress epoch-1 checkpoint would
            # make the next resume replay those batches onto weights
            # that already trained on them — the on-disk mid-epoch
            # checkpoint we restored from is the correct resume point,
            # so just unwind.
            if primary and epoch > 0 and not resume_skip:
                p = ckpt.save(state, cfg.weight_dir, epoch - 1,
                              tag="periodic",
                              metadata={"periodic": True,
                                        "batches_done": 0,
                                        "best_metrics": dict(best)},
                              keep_last=cfg.keep_last)
                if store is not None:
                    store.upload_checkpoint(cfg.weight_dir, p)
            raise TrainingPreempted(state)
        t0 = time.time()
        train_acc, val_acc = MetricAccumulator(), MetricAccumulator()
        skip, replay_rows = (resume_skip, resume_rows) if resume_skip else \
            (0, [])
        resume_skip, resume_rows = 0, []  # only the first resumed epoch
        for row in replay_rows:
            train_acc.update(row[0], dict(zip(("tp", "fp", "fn", "tn"),
                                              row[1:])))

        sampler = PatchSampler(data, train_md, cfg.patch_size,
                               augment=cfg.augmentation,
                               seed=cfg.seed + epoch,
                               multi_date=multi_date,
                               compat_aug_stream=compat_aug)
        batches = prefetch_to_device(
            batch_iterator(sampler, cfg.batch_size,
                           shuffle=cfg.shuffle_train,
                           pad_mode="wrap", seed=cfg.seed + epoch,
                           max_batches=cfg.steps_per_epoch,
                           process_index=pidx, process_count=pcount,
                           skip_batches=skip,
                           ragged_tail=compat_ragged),
            size=cfg.prefetch, sharding=shardings)

        callbacks = []
        if primary and (cfg.checkpoint_every > 0 or guard is not None):
            # periodic step-based checkpointing (fault tolerance: resume
            # loses at most checkpoint_every steps; the reference could
            # only restart from scratch — SURVEY.md §5).  The sidecar
            # carries epoch progress + the epoch's stat rows so far + the
            # best dict, for exact mid-epoch resume.  A latched preemption
            # forces the same save at the very next step boundary, then
            # unwinds — that one sidecar is the whole graceful-exit story.
            epoch_rows = list(replay_rows)

            def _periodic(s, stats, _epoch=epoch, _rows=epoch_rows):
                # stats scalars stay on device until a save syncs them
                _rows.append(stats)
                preempt = guard is not None and guard.requested
                if preempt or (cfg.checkpoint_every > 0 and
                               int(s.step) % cfg.checkpoint_every == 0):
                    host_rows = [r if isinstance(r, list) else
                                 [float(r[k]) for k in _STAT_KEYS]
                                 for r in _rows]
                    _rows[:] = host_rows
                    losses = np.asarray([r[0] for r in host_rows])
                    if not np.all(np.isfinite(losses)):
                        # halt at the save's host sync, BEFORE overwriting
                        # periodic_epoch_N with NaN params — the last finite
                        # periodic checkpoint stays resumable (the epoch-end
                        # check alone would let every later save poison it)
                        bad = int(np.argmax(~np.isfinite(losses)))
                        tracker.set_status("diverged")
                        raise FloatingPointError(
                            f"non-finite training loss at batch {bad + 1} of "
                            f"epoch {_epoch} (loss={losses[bad]}); caught at "
                            f"the periodic-checkpoint sync — the last finite "
                            f"periodic checkpoint is preserved")
                    p = ckpt.save(s, cfg.weight_dir, _epoch, tag="periodic",
                                  metadata={"periodic": True,
                                            "batches_done": len(_rows),
                                            "train_rows": host_rows,
                                            "best_metrics": dict(best)},
                                  keep_last=cfg.keep_last)
                    if store is not None:
                        store.upload_checkpoint(cfg.weight_dir, p)
                    if preempt:
                        raise TrainingPreempted(s)
            callbacks.append(_periodic)
        elif guard is not None:
            # non-primary processes write nothing; they just unwind at the
            # same boundary so the whole job exits within the grace window
            def _preempt_check(s, stats):
                if guard.requested:
                    raise TrainingPreempted(s)
            callbacks.append(_preempt_check)
        if profiler is not None:
            callbacks.append(profiler.on_step)
        on_step = None
        if callbacks:
            def on_step(s, stats, _cbs=tuple(callbacks)):
                for cb in _cbs:
                    cb(s, stats)

        from fabric_tpu.utils.profiling import StepTimer
        timer = StepTimer()
        state = _epoch(train_step, state, batches, train_acc, train=True,
                       on_step=on_step, tracker=tracker,
                       log_every=cfg.log_every, prefix="batch_train_",
                       timer=timer)
        if profiler is not None:  # close out even on very short epochs
            profiler.stop(state)
            profiler = None
        train_seconds = time.time() - t0
        mean_train = train_acc.means()
        if timer.times:
            # epoch-level throughput: _epoch ends with a device sync (the
            # stacked-stats device_get), so wall-clock is honest; the
            # StepTimer percentiles describe per-step dispatch behavior
            perf = {"examples_per_sec":
                    len(timer.times) * cfg.batch_size / train_seconds}
            perf.update({k: v for k, v in
                         timer.summary(cfg.batch_size).items()
                         if k in ("steps", "p50_step_s", "p95_step_s")})
            tracker.log_metrics(perf, step=epoch, prefix="train_")
        tracker.log_metrics(mean_train, step=epoch, prefix="train_")
        log.info("epoch %d train %s", epoch,
                 {k: round(v, 4) for k, v in mean_train.items()})

        val_sampler = PatchSampler(data, val_md, cfg.patch_size,
                                   augment=False, multi_date=multi_date)
        val_batches = prefetch_to_device(
            batch_iterator(val_sampler, cfg.eval_batch_size, shuffle=False,
                           pad_mode="mask",
                           max_batches=cfg.steps_per_epoch,
                           process_index=pidx, process_count=pcount),
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
            # multi-host: scene tiling runs replicated per process (the tile
            # runner's device_put/np.asarray path is single-process), from a
            # host copy of the (replicated) state; the NullTracker drops
            # non-primary writes
            scene_mesh, scene_state = mesh, state
            if pcount > 1:
                scene_mesh = None
                scene_state = jax.tree_util.tree_map(np.asarray, state)
            for city in cfg.validation_cities:
                try:
                    mask = infer_city(infer_step, scene_state, cfg, city,
                                      mesh=scene_mesh, prob_step=prob_step)
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
                except OSError as e:
                    # scene files missing/unreadable on disk — a real bug in
                    # tiling/stitching (shape mismatch etc.) must PROPAGATE,
                    # not be reported as "scene missing" (r1 weak #6)
                    log.warning("scene inference skipped for %s: %s", city, e)

        if improved(mean_val, best):
            if primary:
                meta = dict(cfg.to_dict())
                meta["validation_metrics"] = mean_val
                p = ckpt.save(state, cfg.weight_dir, epoch, metadata=meta,
                              keep_last=cfg.keep_last)
                if store is not None:
                    store.upload_checkpoint(cfg.weight_dir, p)
            best = {k: mean_val[k] for k in best}
            log.info("epoch %d: new best, checkpointed", epoch)

        history["train"].append(mean_train)
        history["val"].append(mean_val)
        tracker.log_metrics({"epoch": epoch,
                             "epoch_seconds": time.time() - t0}, step=epoch)
        tracker.set_status("running")

    return state
