"""Mesh-sharded whole-scene inference: the scene itself is distributed.

``infer.device_tiling.make_scene_infer`` keeps the full scene resident on
every device and shards only the tile BATCH over the mesh.  That caps the
scene size at one chip's HBM (a 16384^2 x 13-band bi-date pair is ~13 GB in
bf16 — already marginal on a v5e).  This module is the long-context answer
(SURVEY.md §5): the scene is sharded over the mesh ``data`` axis as
H-bands, and each device tiles, predicts, and stitches ONLY its own band
inside a ``shard_map`` — per-device memory scales as 1/N, no cross-device
communication at all (band boundaries align with the tile grid, and grid
tiling is per-band independent).

Constraints: grid mode only (overlap-averaged stitching would need a halo
exchange), and H must divide into patch-aligned equal bands
(``H % (n_data * patch) == 0``) with ``W % patch == 0`` — the bucketed
serving path guarantees this.  Use ``make_scene_infer`` otherwise.

Reference equivalent being replaced: none — the reference serially tiles
on the host (utils/inference.py:134-181) and could not exceed host RAM,
let alone scale scene residency across accelerators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fabric_tpu.infer.device_tiling import _gather_tiles, _axis_positions


def make_sharded_scene_infer(model, patch: int, scene_shape: tuple[int, int],
                             mesh, batch_size: int = 256,
                             dtype=jnp.bfloat16):
    """Build ``(variables, scene1, scene2) -> (H, W) uint8 mask`` with the
    scenes H-sharded over ``mesh``'s ``data`` axis.

    ``model``: Flax module or ``(variables, d1, d2, train=False) -> logits``
    callable (the int8 quantized apply drops in).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    h, w = scene_shape
    n_data = mesh.shape["data"]
    if h % (n_data * patch):
        raise ValueError(
            f"H={h} must divide into {n_data} patch-aligned bands "
            f"(H % (n_data*patch={n_data * patch}) == 0); pad the scene "
            "or use make_scene_infer")
    if w % patch:
        raise ValueError(f"W={w} must be a multiple of patch={patch}")
    band = h // n_data
    ys = _axis_positions(band, patch, patch)
    xs = _axis_positions(w, patch, patch)
    k = len(ys) * len(xs)
    bs = min(batch_size, k)
    pad = (-k) % bs
    n_chunks = (k + pad) // bs

    apply_fn = model.apply if hasattr(model, "apply") else model

    def band_fn(variables, s1, s2):
        # s1, s2: (band, w, c) — this device's H-band
        t1 = _gather_tiles(s1.astype(dtype), ys, xs, patch)
        t2 = _gather_tiles(s2.astype(dtype), ys, xs, patch)
        if pad:
            z = jnp.zeros((pad, patch, patch, t1.shape[-1]), t1.dtype)
            t1 = jnp.concatenate([t1, z])
            t2 = jnp.concatenate([t2, z])
        t1 = t1.reshape(n_chunks, bs, patch, patch, -1)
        t2 = t2.reshape(n_chunks, bs, patch, patch, -1)

        def fwd(ab):
            logits = apply_fn(variables, ab[0], ab[1], train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        outs = jax.lax.map(fwd, (t1, t2)).reshape(-1, patch, patch)[:k]
        # aligned grid: stitching the band is the inverse reshape
        t = outs.reshape(len(ys), len(xs), patch, patch)
        return t.transpose(0, 2, 1, 3).reshape(band, w)

    sharded = shard_map(
        band_fn, mesh=mesh,
        in_specs=(P(), P("data", None, None), P("data", None, None)),
        out_specs=P("data", None))

    @jax.jit
    def run(variables, scene1, scene2):
        spec = NamedSharding(mesh, P("data", None, None))
        scene1 = jax.lax.with_sharding_constraint(scene1, spec)
        scene2 = jax.lax.with_sharding_constraint(scene2, spec)
        return sharded(variables, scene1, scene2)

    return run


def put_scene_sharded(scene, mesh, dtype=None) -> jax.Array:
    """Place a host (H, W, C) scene directly into its H-banded layout.

    Built on ``jax.make_array_from_callback``: each device's band is
    sliced out of ``scene`` individually, so neither any device nor the
    host ever materializes more than one band at a time beyond what
    ``scene`` itself occupies — pass a ``np.memmap`` (or any
    ndarray-slicing lazy reader) and a scene larger than host RAM streams
    band-by-band from disk to its devices.

    ``dtype``: cast each band host-side before upload (e.g.
    ``jnp.bfloat16``) — serving an fp32 source into a bf16 pipeline
    without this doubles per-device HBM and transfer bytes."""
    sharding = NamedSharding(mesh, P("data", None, None))
    import numpy as np  # local: callback converts lazy slices

    def band(idx):
        b = np.ascontiguousarray(scene[idx])
        return b.astype(dtype) if dtype is not None else b

    return jax.make_array_from_callback(scene.shape, sharding, band)
