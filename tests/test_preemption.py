"""Graceful preemption (train/preemption.py): a SIGTERM-latched run must
checkpoint mid-epoch at the next step boundary, return cleanly with status
"preempted", and resume bit-exactly — the TPU maintenance-event story the
reference lacks entirely (/root/reference/train.py:210-228 has no resume).

Builds on the mid-epoch sidecar machinery proven in
tests/test_midepoch_resume.py; here the save is triggered by the latch
(checkpoint_every=0), not the step cadence.
"""

import os
import signal

import numpy as np
import pytest

from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset
from fabric_tpu.train import loop as loop_mod
from fabric_tpu.train.preemption import PreemptionGuard

EPOCHS = 2
# alpha 16 + beta 12 = 28 train patches @ batch 4 -> 7 steps/epoch;
# the latch fires during epoch 1 (pre-step counts 7..13)
PREEMPT_AT = 10


def _cfg(root, **kw):
    return Config(dataset_dir=str(root / "data"), patch_size=32, stride=32,
                  batch_size=4, epochs=EPOCHS, dtype="float32",
                  augmentation=True, validation_cities=["gamma"],
                  weight_dir=str(root / kw.pop("weights")),
                  log_dir=str(root / kw.pop("logs")),
                  checkpoint_every=0, seed=3, **kw)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt")
    cfg = Config(patch_size=32, stride=32, dtype="float32")
    generate_synthetic_dataset(str(root / "data"), cfg,
                               cities=["alpha", "beta", "gamma"],
                               sizes=[(128, 128), (96, 128), (64, 64)],
                               seed=11)
    return root


def test_preempt_saves_and_resumes_exactly(dataset_root, monkeypatch):
    root = dataset_root

    # --- uninterrupted reference run --------------------------------------
    cfg_a = _cfg(root, weights="w_full", logs="l_full")
    state_a, hist_a = loop_mod.train(cfg_a, run_scene_inference=False)
    assert hist_a.get("status") == "complete"

    # --- preempted run: the latch fires mid-step, as a real signal would --
    guard = PreemptionGuard()
    real_make = loop_mod.make_train_step

    def _latching_make(model, loss_fn):
        step = real_make(model, loss_fn)

        def wrapped(state, batch):
            if int(state.step) >= PREEMPT_AT:
                guard.request()  # signal lands while the step is in flight
            return step(state, batch)
        return wrapped

    monkeypatch.setattr(loop_mod, "make_train_step", _latching_make)
    cfg_b = _cfg(root, weights="w_pre", logs="l_pre")
    state_b, hist_b = loop_mod.train(cfg_b, run_scene_inference=False,
                                     preemption_guard=guard)
    monkeypatch.setattr(loop_mod, "make_train_step", real_make)

    # clean return (no raise), preempted status everywhere
    assert hist_b.get("status") == "preempted"
    assert len(hist_b["train"]) == 1  # only epoch 0 completed
    assert int(state_b.step) == PREEMPT_AT + 1  # state at the unwind point
    import glob
    import json
    paths = glob.glob(os.path.join(cfg_b.log_dir, "*", "status.json"))
    assert paths and json.load(open(paths[0]))["status"] == "preempted"

    # the preemption checkpoint is a mid-epoch periodic sidecar even with
    # checkpoint_every=0 (latch-only save)
    import fabric_tpu.checkpoint as ckpt
    latest = ckpt.latest_checkpoint(cfg_b.weight_dir)
    assert latest is not None and "periodic_epoch_1" in latest

    # --- resumed run completes the interrupted epoch exactly --------------
    cfg_c = _cfg(root, weights="w_pre", logs="l_res",
                 resume=str(root / "w_pre"))
    state_c, hist_c = loop_mod.train(cfg_c, run_scene_inference=False)
    assert hist_c.get("status") == "complete"
    assert int(state_c.step) == int(state_a.step) == EPOCHS * 7

    import jax
    for (pa, a), (pc, c) in zip(
            jax.tree_util.tree_leaves_with_path(state_a.params),
            jax.tree_util.tree_leaves_with_path(state_c.params)):
        assert pa == pc
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c),
                                      err_msg=f"param {pa}")
    for key in ("cd_losses", "cd_precisions", "cd_recalls", "cd_f1scores"):
        assert hist_c["train"][0][key] == pytest.approx(
            hist_a["train"][1][key], abs=1e-9), key


def test_guard_latches_real_sigterm_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard()
    assert guard.install()  # pytest runs tests on the main thread
    try:
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGTERM)  # handler only sets the latch
        assert guard.requested
    finally:
        guard.uninstall()
    assert signal.getsignal(signal.SIGTERM) is before
    # idempotent / re-installable
    assert guard.install()
    guard.uninstall()


def test_preempt_during_pending_midepoch_resume_keeps_resume_point(
        dataset_root, monkeypatch):
    """A latch already set when a MID-EPOCH resume starts must unwind
    without saving: the state at the loop-top check is resume_skip batches
    into the epoch, and a zero-progress epoch-1 periodic save there would
    make the next resume replay those batches onto weights that already
    trained on them (advisor r3 finding, train/loop.py loop-top guard)."""
    import json

    import fabric_tpu.checkpoint as ckpt
    root = dataset_root

    # uninterrupted reference trajectory
    cfg_a = _cfg(root, weights="w_mid_full", logs="l_mid_full")
    state_a, _ = loop_mod.train(cfg_a, run_scene_inference=False)

    # run 1: preempt mid-epoch -> periodic_epoch_1 with batches_done > 0
    guard = PreemptionGuard()
    real_make = loop_mod.make_train_step

    def _latching_make(model, loss_fn):
        step = real_make(model, loss_fn)

        def wrapped(state, batch):
            if int(state.step) >= PREEMPT_AT:
                guard.request()
            return step(state, batch)
        return wrapped

    monkeypatch.setattr(loop_mod, "make_train_step", _latching_make)
    cfg_b = _cfg(root, weights="w_mid", logs="l_mid")
    loop_mod.train(cfg_b, run_scene_inference=False, preemption_guard=guard)
    monkeypatch.setattr(loop_mod, "make_train_step", real_make)

    latest_before = ckpt.latest_checkpoint(cfg_b.weight_dir)
    assert latest_before is not None and "periodic_epoch_1" in latest_before
    meta_before = json.load(open(os.path.join(
        cfg_b.weight_dir, "metadata_periodic_epoch_1.json")))
    assert meta_before["batches_done"] > 0

    # run 2: resume with the latch ALREADY set -> must unwind WITHOUT
    # clobbering the mid-epoch checkpoint or the latest pointer
    guard2 = PreemptionGuard()
    guard2.request()
    cfg_c = _cfg(root, weights="w_mid", logs="l_mid2",
                 resume=str(root / "w_mid"))
    _, hist_c = loop_mod.train(cfg_c, run_scene_inference=False,
                               preemption_guard=guard2)
    assert hist_c.get("status") == "preempted"
    latest_after = ckpt.latest_checkpoint(cfg_b.weight_dir)
    assert latest_after == latest_before
    meta_after = json.load(open(os.path.join(
        cfg_b.weight_dir, "metadata_periodic_epoch_1.json")))
    assert meta_after == meta_before

    # run 3: a clean resume still reproduces the uninterrupted run exactly
    cfg_d = _cfg(root, weights="w_mid", logs="l_mid3",
                 resume=str(root / "w_mid"))
    state_d, hist_d = loop_mod.train(cfg_d, run_scene_inference=False)
    assert hist_d.get("status") == "complete"
    assert int(state_d.step) == int(state_a.step)
    import jax
    for a, d in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_d.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(d))


def test_preempt_before_first_step_exits_cleanly(dataset_root):
    """A latch already set when training starts unwinds at the first epoch
    boundary without writing a bogus checkpoint."""
    guard = PreemptionGuard()
    guard.request()
    cfg = _cfg(dataset_root, weights="w_imm", logs="l_imm")
    state, hist = loop_mod.train(cfg, run_scene_inference=False,
                                 preemption_guard=guard)
    assert hist.get("status") == "preempted"
    assert hist["train"] == []
    assert not os.path.exists(cfg.weight_dir) or not os.listdir(cfg.weight_dir)
