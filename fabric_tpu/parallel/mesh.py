"""Device mesh and sharding layout — the framework's parallelism core.

The reference's only parallelism is single-host ``nn.DataParallel``
(utils/helpers.py:333-335).  The TPU-native replacement (SURVEY.md §2.2) is a
``jax.sharding.Mesh`` with three axes:

- ``data``  — batch parallelism.  Batches are sharded over it; since params
  are replicated and the loss is a global mean, XLA inserts the gradient
  all-reduce over ICI automatically under jit.
- ``spatial`` — shards the image H axis.  XLA:TPU SPMD partitions
  convolutions spatially with internal halo exchanges, which is this
  framework's answer to sequence/context parallelism for 10k×10k scenes
  (SURVEY.md §5 long-context).
- ``model`` — tensor parallelism over conv output channels for the wide
  decoder/bottleneck layers (optional; the net is small enough that DP+SP is
  usually the right config).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``; the
mesh then spans all processes' devices, with DCN handling the cross-slice
axis (jax device order already groups by slice).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "spatial", "model")


def make_mesh(data: int = -1, spatial: int = 1, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, spatial, model) mesh.  data=-1 → all remaining."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % (spatial * model):
            raise ValueError(f"{n} devices not divisible by "
                             f"spatial*model={spatial * model}")
        data = n // (spatial * model)
    total = data * spatial * model
    if total > n:
        raise ValueError(f"mesh {data}x{spatial}x{model} needs {total} "
                         f"devices, have {n}")
    dev_array = mesh_utils.create_device_mesh(
        (data, spatial, model), devices=devices[:total])
    return Mesh(dev_array, AXES)


def make_mesh_from_config(cfg) -> Mesh:
    return make_mesh(cfg.mesh_data, cfg.mesh_spatial, cfg.mesh_model)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(mesh: Mesh,
                    multi_date: bool = False) -> dict[str, NamedSharding]:
    """Shardings for one training batch dict.

    Bi-date images (N,H,W,C): batch over data, H over spatial; multi-date
    stacks (N,T,H,W,C): batch over data, H over spatial (T replicated —
    it's tiny).  Labels (N,H,W) likewise.  Per-sample weights (N,): data.
    """
    label = NamedSharding(mesh, P("data", "spatial", None))
    weight = NamedSharding(mesh, P("data"))
    if multi_date:
        return {
            "imgs": NamedSharding(mesh, P("data", None, "spatial", None, None)),
            "label": label, "weight": weight,
        }
    img = NamedSharding(mesh, P("data", "spatial", None, None))
    return {"img1": img, "img2": img, "label": label, "weight": weight}


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """device_put a host batch into its mesh layout."""
    sh = batch_shardings(mesh, multi_date="imgs" in batch)
    return {k: jax.device_put(v, sh[k]) if k in sh else jax.device_put(v)
            for k, v in batch.items()}


def pad_batch_to_multiple(batch: dict[str, Any], multiple: int) -> dict[str, Any]:
    """Pad the batch axis (with zero weight) so it divides the data axis."""
    n = batch["label"].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, widths)
    if "weight" in out:
        out["weight"][n:] = 0.0
    return out
