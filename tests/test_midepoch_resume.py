"""Mid-epoch resume fidelity: a kill between periodic checkpoints must
resume INSIDE the interrupted epoch and reproduce the uninterrupted run
exactly — parameters bit-for-bit and epoch metrics included (r2 VERDICT
#5; the reference can only restart from scratch, train.py:210-228).

Mechanics under test: the periodic sidecar carries (batches_done,
train_rows, best_metrics); ``batch_iterator(skip_batches=)`` fast-forwards
the deterministic batch stream; the loop replays the saved stat rows into
the epoch accumulator.
"""

import numpy as np
import pytest

from fabric_tpu.config import Config
from fabric_tpu.data.synthetic import generate_synthetic_dataset
from fabric_tpu.train import loop as loop_mod


EPOCHS = 2
# alpha 16 + beta 12 = 28 train patches @ batch 4 -> 7 steps/epoch
KILL_AFTER = 10  # dies during epoch 1 (steps 8..14), after the step-10 save


def _cfg(root, **kw):
    return Config(dataset_dir=str(root / "data"), patch_size=32, stride=32,
                  batch_size=4, epochs=EPOCHS, dtype="float32",
                  augmentation=True, validation_cities=["gamma"],
                  weight_dir=str(root / kw.pop("weights")),
                  log_dir=str(root / kw.pop("logs")),
                  checkpoint_every=5, seed=3, **kw)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("midepoch")
    cfg = Config(patch_size=32, stride=32, dtype="float32")
    generate_synthetic_dataset(str(root / "data"), cfg,
                               cities=["alpha", "beta", "gamma"],
                               sizes=[(128, 128), (96, 128), (64, 64)],
                               seed=11)
    return root


class _Killed(RuntimeError):
    pass


def test_kill_and_resume_matches_uninterrupted(dataset_root, monkeypatch):
    root = dataset_root

    # --- uninterrupted reference run --------------------------------------
    cfg_a = _cfg(root, weights="w_full", logs="l_full")
    state_a, hist_a = loop_mod.train(cfg_a, run_scene_inference=False)

    # --- killed run: train_step raises after KILL_AFTER optimizer steps ---
    real_make = loop_mod.make_train_step

    def _lethal_make(model, loss_fn):
        step = real_make(model, loss_fn)

        def wrapped(state, batch):
            if int(state.step) >= KILL_AFTER:
                raise _Killed(f"simulated crash at step {int(state.step)}")
            return step(state, batch)
        return wrapped

    monkeypatch.setattr(loop_mod, "make_train_step", _lethal_make)
    cfg_b = _cfg(root, weights="w_kill", logs="l_kill")
    with pytest.raises(_Killed):
        loop_mod.train(cfg_b, run_scene_inference=False)
    monkeypatch.setattr(loop_mod, "make_train_step", real_make)

    # the latest periodic save is mid-epoch-1 (step 10 of 14 = batch 3/7)
    import fabric_tpu.checkpoint as ckpt
    latest = ckpt.latest_checkpoint(cfg_b.weight_dir)
    assert latest is not None and "periodic_epoch_1" in latest

    # --- resumed run ------------------------------------------------------
    cfg_c = _cfg(root, weights="w_kill", logs="l_resume",
                 resume=str(root / "w_kill"))
    state_c, hist_c = loop_mod.train(cfg_c, run_scene_inference=False)

    # resumed run re-ran only the tail of epoch 1 (4 of 7 batches)
    assert len(hist_c["train"]) == 1  # one (completed) epoch reported

    # trajectory: bit-identical parameters and optimizer step count
    assert int(state_c.step) == int(state_a.step) == 14
    import jax
    for (pa, a), (pc, c) in zip(
            jax.tree_util.tree_leaves_with_path(state_a.params),
            jax.tree_util.tree_leaves_with_path(state_c.params)):
        assert pa == pc
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c),
                                      err_msg=f"param {pa}")
    for a, c in zip(jax.tree_util.tree_leaves(state_a.batch_stats),
                    jax.tree_util.tree_leaves(state_c.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # epoch metrics: the resumed epoch's mean-of-per-batch stats replay the
    # pre-kill rows, so they equal the uninterrupted epoch's
    for key in ("cd_losses", "cd_corrects", "cd_precisions", "cd_recalls",
                "cd_f1scores"):
        assert hist_c["train"][0][key] == pytest.approx(
            hist_a["train"][1][key], abs=1e-9), key
        assert hist_c["val"][0][key] == pytest.approx(
            hist_a["val"][1][key], abs=1e-9), key


def test_periodic_sidecar_never_clobbers_best_metadata(dataset_root):
    root = dataset_root
    import os
    import json
    cfg = _cfg(root, weights="w_sidecar", logs="l_sidecar")
    loop_mod.train(cfg, run_scene_inference=False)
    names = set(os.listdir(cfg.weight_dir))
    # periodic and best sidecars coexist for the same epoch
    assert "metadata_periodic_epoch_0.json" in names
    assert "metadata_epoch_0.json" in names
    with open(os.path.join(cfg.weight_dir, "metadata_epoch_0.json")) as f:
        assert "validation_metrics" in json.load(f)
    with open(os.path.join(cfg.weight_dir,
                           "metadata_periodic_epoch_0.json")) as f:
        side = json.load(f)
    assert side["periodic"] and side["batches_done"] >= 1
    assert len(side["train_rows"]) == side["batches_done"]


def test_nonfinite_loss_halts_with_diverged_status(dataset_root,
                                                   monkeypatch):
    """Divergence detection (SURVEY §5): a NaN loss halts the run at the
    epoch boundary with status 'diverged' instead of silently poisoning
    later epochs' metrics and checkpoints."""
    import json
    import os
    import jax.numpy as jnp
    import pytest as _pytest

    real_make = loop_mod.make_train_step

    def _nan_make(model, loss_fn):
        step = real_make(model, loss_fn)

        def wrapped(state, batch):
            new, stats = step(state, batch)
            stats["loss"] = stats["loss"] * jnp.float32("nan")
            return new, stats
        return wrapped

    monkeypatch.setattr(loop_mod, "make_train_step", _nan_make)
    cfg = _cfg(dataset_root, weights="w_nan", logs="l_nan")
    with _pytest.raises(FloatingPointError, match="non-finite"):
        loop_mod.train(cfg, run_scene_inference=False)
    # Tracker writes under log_dir/<run_name>/status.json
    import glob
    paths = glob.glob(os.path.join(cfg.log_dir, "*", "status.json"))
    assert paths, f"no status.json under {cfg.log_dir}"
    with open(paths[0]) as f:
        assert json.load(f)["status"] == "diverged"


def test_nan_after_periodic_save_preserves_finite_checkpoint(dataset_root,
                                                             monkeypatch):
    """A NaN appearing AFTER a finite periodic save must halt at the next
    periodic sync WITHOUT overwriting the finite checkpoint (r3 review:
    epoch-end-only detection let every later save poison the one
    resumable file)."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    real_make = loop_mod.make_train_step

    def _late_nan_make(model, loss_fn):
        step = real_make(model, loss_fn)

        def wrapped(state, batch):
            new, stats = step(state, batch)
            if int(new.step) >= 5:  # finite through the step-4 save
                stats["loss"] = stats["loss"] * jnp.float32("nan")
            return new, stats
        return wrapped

    monkeypatch.setattr(loop_mod, "make_train_step", _late_nan_make)
    cfg = _cfg(dataset_root, weights="w_latenan", logs="l_latenan")
    # saves at steps 2/4 are finite; the step-6 save must detect the NaN
    # (7 steps/epoch, so the epoch-end check alone would come too late to
    # stop the overwrite... and with every=5 it would come FIRST, leaving
    # the overwrite scenario untested)
    cfg.checkpoint_every = 2
    with _pytest.raises(FloatingPointError, match="periodic-checkpoint"):
        loop_mod.train(cfg, run_scene_inference=False)
    monkeypatch.setattr(loop_mod, "make_train_step", real_make)

    # the step-5 finite checkpoint survived (a step-10 save never happened)
    import fabric_tpu.checkpoint as ckpt
    from fabric_tpu.models import build_model
    from fabric_tpu.train.state import create_state
    cfg_r = _cfg(dataset_root, weights="w_latenan", logs="l_latenan2",
                 resume=cfg.weight_dir)
    template = create_state(cfg_r, build_model(cfg_r))
    resumed, epoch, meta = ckpt.resume_if_requested(cfg_r, template)
    assert int(resumed.step) == 4 and epoch == 0
    assert meta["batches_done"] == 4
    assert all(np.all(np.isfinite(np.asarray(leaf)))
               for leaf in jax.tree_util.tree_leaves(resumed.params))
