"""Checkpointing with real resume.

The reference only *saves* (whole-module pickle on any P/R/F1 improvement,
train.py:210-228) and has no load path at all (utils/helpers.py:317-337) —
training always restarts from scratch.  Here: msgpack serialization of
{params, batch_stats, opt_state, step} via flax.serialization, a JSON
metadata sidecar (mirroring the reference's ``metadata_epoch_N.json``), a
``latest``/``best`` pointer scheme, and ``restore``/``latest_checkpoint``
for resume.  Dependency-free (no orbax) so checkpoints remain portable.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import numpy as np
from flax import serialization


def sidecar_name(tag: str, epoch: int) -> str:
    """The metadata sidecar filename for one save.  Best-metric saves
    keep the reference-mirroring name (``metadata_epoch_N.json``,
    train.py:219-220); other tags are qualified so e.g. a mid-epoch
    periodic save never clobbers the epoch's best-metric metadata.
    Single source of truth — save/prune/restore here and
    ``store.upload_checkpoint`` all derive the name from it."""
    return (f"metadata_epoch_{epoch}.json" if tag == "checkpoint"
            else f"metadata_{tag}_epoch_{epoch}.json")


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save(state, directory: str, epoch: int, metadata: dict | None = None,
         tag: str = "checkpoint", keep_last: int = 0) -> str:
    """Write ``<dir>/<tag>_epoch_<N>.msgpack`` (+ ``.json`` sidecar).

    The metadata rides INSIDE the msgpack payload (``meta_json``), so the
    weights and the metadata that interprets them (``batches_done`` for
    mid-epoch resume) are one atomic ``os.replace`` — a crash can never
    leave step-10 weights paired with a step-5 sidecar.  The JSON sidecar
    is a human-readable mirror (and the legacy fallback for resume).

    ``keep_last`` > 0 prunes this tag's older checkpoints after the save
    (see :func:`prune`) — the reference accumulated a checkpoint per
    improved epoch forever (/root/reference/train.py:219-222: ~53 MB
    each to /tmp + GCS, never deleted); a 50-epoch tuned run leaves GBs
    behind.  Files referenced by the ``latest``/``best`` pointers are
    never deleted.  0 = keep everything.
    """
    os.makedirs(directory, exist_ok=True)
    meta = dict(metadata or {})
    meta.update({"epoch": epoch, "step": int(state.step)})
    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "meta_json": json.dumps(meta, default=float),
    }
    path = os.path.join(directory, f"{tag}_epoch_{epoch}.msgpack")
    # tmp name unique per process: concurrent writers (a misconfigured
    # multi-host run where every process saves) can interleave but never
    # corrupt — the os.replace stays atomic per writer
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fout:
        # to_bytes = to_state_dict (tuples/namedtuples -> dicts) + msgpack
        fout.write(serialization.to_bytes(payload))
    os.replace(tmp, path)
    sidecar = os.path.join(directory, sidecar_name(tag, epoch))
    tmp = f"{sidecar}.tmp.{os.getpid()}"
    with open(tmp, "w") as fout:
        json.dump(meta, fout, indent=2, default=float)
    os.replace(tmp, sidecar)
    _write_pointer(directory, "latest", path, epoch, tag)
    if tag == "checkpoint":
        # best-metric saves (the loop only calls tag="checkpoint" on
        # improvement) also update the best pointer
        _write_pointer(directory, "best", path, epoch, tag)
    if keep_last > 0:
        prune(directory, keep_last, tag)
    return path


def prune(directory: str, keep_last: int, tag: str) -> list[str]:
    """Delete all but the newest ``keep_last`` checkpoints of one tag
    (plus their metadata sidecars); returns the deleted paths.

    Never deletes a file the ``latest.json``/``best.json`` pointers
    reference — the best-metric weights survive any number of later
    periodic saves, and a pending mid-epoch resume point (which is what
    ``latest`` points at after a preemption save) can't be pruned out
    from under a resume.  Order is (epoch, mtime), matching
    :func:`latest_checkpoint`.
    """
    protected = set()
    for name in ("latest", "best"):
        p = read_pointer(directory, name)
        if p:
            protected.add(os.path.basename(p))
    pat = re.compile(rf"{re.escape(tag)}_epoch_(\d+)\.msgpack$")
    found = []
    for name in os.listdir(directory):
        m = pat.match(name)
        if m:
            path = os.path.join(directory, name)
            found.append(((int(m.group(1)), os.path.getmtime(path)), name))
    found.sort(key=lambda kv: kv[0])
    deleted: list[str] = []
    for _, name in found[:-keep_last] if keep_last else []:
        if name in protected:
            continue
        epoch = int(pat.match(name).group(1))
        path = os.path.join(directory, name)
        os.remove(path)
        deleted.append(path)
        sidecar = os.path.join(directory, sidecar_name(tag, epoch))
        if os.path.exists(sidecar):
            os.remove(sidecar)
    return deleted


def _write_pointer(directory: str, name: str, path: str, epoch: int,
                   tag: str) -> None:
    ptr = os.path.join(directory, f"{name}.json")
    tmp = f"{ptr}.tmp.{os.getpid()}"
    with open(tmp, "w") as fout:
        json.dump({"file": os.path.basename(path), "epoch": epoch,
                   "tag": tag}, fout)
    os.replace(tmp, ptr)


def read_pointer(directory: str, name: str) -> str | None:
    """Resolve a ``latest``/``best`` pointer file to a checkpoint path."""
    ptr = os.path.join(directory, f"{name}.json")
    if not os.path.exists(ptr):
        return None
    try:
        with open(ptr) as fin:
            rec = json.load(fin)
        path = os.path.join(directory, rec["file"])
    except (ValueError, KeyError, TypeError):
        return None
    return path if os.path.exists(path) else None


def _read_payload(state, path: str) -> dict:
    """Deserialize + shape-validate a checkpoint against a template state."""
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": 0,
        "meta_json": "",
    }
    with open(path, "rb") as fin:
        blob = fin.read()
    try:
        payload = serialization.from_bytes(target, blob)
    except (ValueError, KeyError) as e:
        # checkpoints written before meta_json was embedded
        legacy = {k: v for k, v in target.items() if k != "meta_json"}
        try:
            payload = serialization.from_bytes(legacy, blob)
        except (ValueError, KeyError):
            raise ValueError(
                f"checkpoint {path!r} does not match the configured model/"
                f"optimizer (wrong --model/--model_base/--optimizer?): {e}"
            ) from e
        payload["meta_json"] = ""
    # flax restores arrays without shape validation; catch silent mismatch
    for (kp, exp), got in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_leaves(payload["params"])):
        if getattr(exp, "shape", None) != getattr(got, "shape", None):
            raise ValueError(
                f"checkpoint {path!r} does not match the configured model: "
                f"param {jax.tree_util.keystr(kp)} has shape "
                f"{getattr(got, 'shape', None)} in the checkpoint but "
                f"{getattr(exp, 'shape', None)} in the model "
                f"(wrong --model/--model_base?)")
    return payload


def restore(state, path: str):
    """Load a checkpoint file into an existing (template) TrainState."""
    payload = _read_payload(state, path)
    return state.replace(params=payload["params"],
                         batch_stats=payload["batch_stats"],
                         opt_state=payload["opt_state"],
                         step=int(payload["step"]))


def latest_checkpoint(directory: str, tag: str | None = None) -> str | None:
    """Most-recent checkpoint path in a directory, or None.

    The ``latest.json`` pointer written by :func:`save` is authoritative;
    directories from older runs (or with a deleted pointer) fall back to a
    filename scan where, with ``tag=None``, both best-metric ("checkpoint")
    and step-based ("periodic") checkpoints are considered and ties on epoch
    resolve by file mtime.
    """
    if not os.path.isdir(directory):
        return None
    if tag is None:
        pointed = read_pointer(directory, "latest")
        if pointed is not None:
            return pointed
    tags = [tag] if tag else ["checkpoint", "periodic"]
    best, best_key = None, (-1, -1.0)
    for t in tags:
        pat = re.compile(rf"{re.escape(t)}_epoch_(\d+)\.msgpack$")
        for name in os.listdir(directory):
            m = pat.match(name)
            if not m:
                continue
            path = os.path.join(directory, name)
            key = (int(m.group(1)), os.path.getmtime(path))
            if key > best_key:
                best, best_key = path, key
    return best


def resume_if_requested(cfg, state):
    """Honor cfg.resume: '' → fresh; a file → load it; a dir → load latest.

    Returns (state, resumed_epoch, metadata): resumed_epoch is -1 and
    metadata {} when fresh; otherwise metadata is the checkpoint's JSON
    sidecar (so the loop can seed its best-metric tracking from the saved
    ``validation_metrics`` instead of re-checkpointing a regression as a
    "new best" — advisor finding r1).
    """
    target = getattr(cfg, "resume", "")
    if not target:
        return state, -1, {}
    path = target
    if os.path.isdir(target):
        path = latest_checkpoint(target)
        if path is None:
            return state, -1, {}
    epoch, tag = -1, "checkpoint"
    m = re.search(r"(?:^|/)([a-z]+)_epoch_(\d+)\.msgpack$", path)
    if m:
        tag, epoch = m.group(1), int(m.group(2))
    payload = _read_payload(state, path)
    meta = {}
    if payload.get("meta_json"):
        # embedded metadata travels in the same atomic write as the weights
        meta = json.loads(payload["meta_json"])
    else:
        # legacy checkpoint: the sidecar was a separate (non-atomic) write,
        # so guard the pairing — a sidecar from a different save than the
        # weights must not drive a mid-epoch fast-forward
        sidecar = os.path.join(os.path.dirname(path),
                               sidecar_name(tag, epoch))
        if epoch >= 0 and os.path.exists(sidecar):
            try:
                with open(sidecar) as fin:
                    meta = json.load(fin)
            except ValueError:
                meta = {}
        if meta and int(meta.get("step", payload["step"])) != int(
                payload["step"]):
            import logging
            logging.getLogger("fabric_tpu").warning(
                "checkpoint %s (step %d) and its metadata sidecar (step %s) "
                "are from different saves (torn by a crash mid-save?); "
                "ignoring the sidecar — resume will restart at the next "
                "epoch boundary instead of fast-forwarding mid-epoch",
                path, int(payload["step"]), meta.get("step"))
            meta = {}
    return state.replace(params=payload["params"],
                         batch_stats=payload["batch_stats"],
                         opt_state=payload["opt_state"],
                         step=int(payload["step"])), epoch, meta
