"""Checkpoint save/restore/resume tests (the reference has no resume path
at all — utils/helpers.py:317-337)."""

import numpy as np
import jax
import jax.numpy as jnp

from fabric_tpu import checkpoint as ckpt
from fabric_tpu.config import Config
from fabric_tpu.models import build_model
from fabric_tpu.train.state import create_state


def _small_cfg(tmp, **kw):
    return Config(patch_size=16, dtype="float32", weight_dir=str(tmp),
                  **kw)


def test_save_restore_roundtrip(tmp_path):
    cfg = _small_cfg(tmp_path)
    model = build_model(cfg)
    state = create_state(cfg, model)
    path = ckpt.save(state, str(tmp_path), epoch=3,
                     metadata={"validation_metrics": {"cd_f1scores": 0.5}})
    # perturb, then restore into the perturbed template
    perturbed = state.replace(
        params=jax.tree_util.tree_map(lambda p: p + 1.0, state.params),
        step=999)
    restored = ckpt.restore(perturbed, path)
    orig = jax.tree_util.tree_leaves(state.params)
    back = jax.tree_util.tree_leaves(restored.params)
    assert all(np.allclose(a, b) for a, b in zip(orig, back))
    assert restored.step == int(state.step)


def test_latest_checkpoint_and_resume(tmp_path):
    cfg = _small_cfg(tmp_path)
    model = build_model(cfg)
    state = create_state(cfg, model)
    ckpt.save(state, str(tmp_path), epoch=0)
    state2 = state.replace(step=42)
    ckpt.save(state2, str(tmp_path), epoch=5)
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint_epoch_5.msgpack")

    cfg_resume = _small_cfg(tmp_path, resume=str(tmp_path))
    fresh = create_state(cfg_resume, model)
    resumed, epoch, _ = ckpt.resume_if_requested(cfg_resume, fresh)
    assert epoch == 5 and resumed.step == 42


def test_resume_empty_dir_is_fresh(tmp_path):
    cfg = _small_cfg(tmp_path, resume=str(tmp_path / "nope"))
    model = build_model(cfg)
    state = create_state(cfg, model)
    (tmp_path / "nope").mkdir()
    resumed, epoch, meta = ckpt.resume_if_requested(cfg, state)
    assert epoch == -1


def test_metadata_sidecar_written(tmp_path):
    import json, os
    cfg = _small_cfg(tmp_path)
    model = build_model(cfg)
    state = create_state(cfg, model)
    ckpt.save(state, str(tmp_path), epoch=2, metadata={"loss_function": "dice"})
    with open(os.path.join(str(tmp_path), "metadata_epoch_2.json")) as fin:
        meta = json.load(fin)
    assert meta["epoch"] == 2 and meta["loss_function"] == "dice"


def test_latest_prefers_newer_periodic(tmp_path):
    import time
    cfg = _small_cfg(tmp_path)
    model = build_model(cfg)
    state = create_state(cfg, model)
    ckpt.save(state, str(tmp_path), epoch=1, tag="checkpoint")
    time.sleep(0.05)
    ckpt.save(state.replace(step=77), str(tmp_path), epoch=1, tag="periodic")
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert "periodic_epoch_1" in latest
    # resume picks it up and restores the step
    cfg2 = _small_cfg(tmp_path, resume=str(tmp_path))
    resumed, epoch, _ = ckpt.resume_if_requested(cfg2, create_state(cfg2, model))
    assert epoch == 1 and resumed.step == 77
    # tag-filtered lookup still works
    only_best = ckpt.latest_checkpoint(str(tmp_path), tag="checkpoint")
    assert "checkpoint_epoch_1" in only_best


def test_restore_mismatched_model_clear_error(tmp_path):
    import pytest
    cfg = _small_cfg(tmp_path)
    model = build_model(cfg)
    state = create_state(cfg, model)
    path = ckpt.save(state, str(tmp_path), epoch=0)
    # a differently-sized model must fail with a pointed message
    cfg2 = Config(patch_size=16, dtype="float32", model_base=8,
                  weight_dir=str(tmp_path))
    small = create_state(cfg2, build_model(cfg2))
    with pytest.raises(ValueError, match="does not match the configured"):
        ckpt.restore(small, path)


def test_pointer_files_and_metadata_resume(tmp_path):
    """save() writes latest/best pointers; resume returns the sidecar so the
    loop can seed its best-metric tracking (advisor finding r1)."""
    import json, os
    cfg = _small_cfg(tmp_path)
    model = build_model(cfg)
    state = create_state(cfg, model)
    ckpt.save(state, str(tmp_path), epoch=0,
              metadata={"validation_metrics": {"cd_f1scores": 0.7}})
    ckpt.save(state.replace(step=9), str(tmp_path), epoch=3, tag="periodic")
    with open(os.path.join(str(tmp_path), "latest.json")) as fin:
        assert json.load(fin)["file"] == "periodic_epoch_3.msgpack"
    with open(os.path.join(str(tmp_path), "best.json")) as fin:
        assert json.load(fin)["file"] == "checkpoint_epoch_0.msgpack"
    assert ckpt.read_pointer(str(tmp_path), "best").endswith(
        "checkpoint_epoch_0.msgpack")
    # latest_checkpoint uses the pointer (no mtime race)
    assert ckpt.latest_checkpoint(str(tmp_path)).endswith(
        "periodic_epoch_3.msgpack")
    # resume from the best-metric checkpoint returns its validation metrics
    cfgr = _small_cfg(tmp_path, resume=os.path.join(
        str(tmp_path), "checkpoint_epoch_0.msgpack"))
    _, epoch, meta = ckpt.resume_if_requested(cfgr, create_state(cfgr, model))
    assert epoch == 0
    assert meta["validation_metrics"]["cd_f1scores"] == 0.7


def test_embedded_metadata_is_atomic_with_weights(tmp_path):
    """The metadata rides inside the msgpack payload: deleting the sidecar
    cannot desynchronize resume from the weights (crash-torn pairs were the
    r3 review finding)."""
    import os
    cfg = _small_cfg(tmp_path)
    model = build_model(cfg)
    state = create_state(cfg, model)
    path = ckpt.save(state.replace(step=12), str(tmp_path), epoch=4,
                     tag="periodic",
                     metadata={"periodic": True, "batches_done": 12})
    os.remove(os.path.join(str(tmp_path), "metadata_periodic_epoch_4.json"))
    cfgr = _small_cfg(tmp_path, resume=path)
    _, epoch, meta = ckpt.resume_if_requested(cfgr, create_state(cfgr, model))
    assert epoch == 4
    assert meta["batches_done"] == 12 and meta["step"] == 12


def test_legacy_torn_sidecar_is_ignored(tmp_path, caplog):
    """Checkpoints written before meta_json was embedded relied on a separate
    sidecar write; if its step disagrees with the weights (crash mid-save),
    resume must drop the sidecar instead of fast-forwarding into divergence."""
    import json, logging, os
    from flax import serialization
    cfg = _small_cfg(tmp_path)
    model = build_model(cfg)
    state = create_state(cfg, model).replace(step=10)
    legacy = {"params": jax.tree_util.tree_map(np.asarray, state.params),
              "batch_stats": jax.tree_util.tree_map(np.asarray,
                                                    state.batch_stats),
              "opt_state": jax.tree_util.tree_map(np.asarray,
                                                  state.opt_state),
              "step": 10}
    path = os.path.join(str(tmp_path), "periodic_epoch_2.msgpack")
    with open(path, "wb") as fout:
        fout.write(serialization.to_bytes(legacy))
    with open(os.path.join(str(tmp_path),
                           "metadata_periodic_epoch_2.json"), "w") as fout:
        json.dump({"periodic": True, "batches_done": 5, "step": 5,
                   "epoch": 2}, fout)
    cfgr = _small_cfg(tmp_path, resume=path)
    with caplog.at_level(logging.WARNING, logger="fabric_tpu"):
        resumed, epoch, meta = ckpt.resume_if_requested(
            cfgr, create_state(cfgr, model))
    assert resumed.step == 10 and epoch == 2
    assert meta == {}  # torn pair: no mid-epoch fast-forward
    assert any("different saves" in r.message for r in caplog.records)

    # a CONSISTENT legacy sidecar (step matches) is still honored
    with open(os.path.join(str(tmp_path),
                           "metadata_periodic_epoch_2.json"), "w") as fout:
        json.dump({"periodic": True, "batches_done": 10, "step": 10,
                   "epoch": 2}, fout)
    _, _, meta = ckpt.resume_if_requested(cfgr, create_state(cfgr, model))
    assert meta["batches_done"] == 10


def test_keep_last_prunes_old_checkpoints(tmp_path):
    """Retention (r4 VERDICT #5): keep_last bounds per-tag accumulation;
    pointer-referenced files survive."""
    import os
    cfg = _small_cfg(tmp_path, model_base=8)
    state = create_state(cfg, build_model(cfg))
    for epoch in range(6):
        ckpt.save(state, str(tmp_path), epoch, tag="periodic",
                  metadata={"periodic": True, "batches_done": 0},
                  keep_last=2)
    names = sorted(os.listdir(str(tmp_path)))
    kept = [n for n in names if n.startswith("periodic_epoch_")
            and n.endswith(".msgpack")]
    assert kept == ["periodic_epoch_4.msgpack", "periodic_epoch_5.msgpack"]
    # sidecars pruned alongside
    sidecars = [n for n in names if n.startswith("metadata_periodic_")]
    assert sidecars == ["metadata_periodic_epoch_4.json",
                        "metadata_periodic_epoch_5.json"]
    # latest pointer still resolves
    assert ckpt.read_pointer(str(tmp_path), "latest").endswith(
        "periodic_epoch_5.msgpack")


def test_keep_last_never_deletes_pointer_targets(tmp_path):
    """The best-metric checkpoint survives any number of later periodic
    saves, and resume-from-dir still lands on the protected latest."""
    import os
    cfg = _small_cfg(tmp_path, model_base=8)
    state = create_state(cfg, build_model(cfg))
    # best-metric save at epoch 0 (tag=checkpoint updates best pointer)
    ckpt.save(state, str(tmp_path), 0, metadata={"m": 1}, keep_last=1)
    best = ckpt.read_pointer(str(tmp_path), "best")
    # a flood of periodic saves with keep_last=1 prunes periodics only
    for epoch in range(1, 5):
        ckpt.save(state, str(tmp_path), epoch, tag="periodic",
                  metadata={"periodic": True, "batches_done": 3},
                  keep_last=1)
    assert os.path.exists(best)  # best never pruned
    periodics = [n for n in os.listdir(str(tmp_path))
                 if n.startswith("periodic_") and n.endswith(".msgpack")]
    assert periodics == ["periodic_epoch_4.msgpack"]
    # mid-epoch resume after pruning: the surviving latest carries its
    # embedded metadata (batches_done) for the fast-forward
    cfgr = _small_cfg(tmp_path, model_base=8, resume=str(tmp_path))
    _, epoch, meta = ckpt.resume_if_requested(
        cfgr, create_state(cfgr, build_model(cfgr)))
    assert epoch == 4 and meta["batches_done"] == 3


def test_prune_direct_respects_protection(tmp_path):
    cfg = _small_cfg(tmp_path, model_base=8)
    state = create_state(cfg, build_model(cfg))
    for epoch in range(3):
        ckpt.save(state, str(tmp_path), epoch)  # keep_last=0: no pruning
    import os
    assert len([n for n in os.listdir(str(tmp_path))
                if n.endswith(".msgpack")]) == 3
    deleted = ckpt.prune(str(tmp_path), keep_last=1, tag="checkpoint")
    assert len(deleted) == 2  # epochs 0 and 1; epoch 2 (newest, pointed)
    left = [n for n in os.listdir(str(tmp_path)) if n.endswith(".msgpack")]
    assert left == ["checkpoint_epoch_2.msgpack"]
