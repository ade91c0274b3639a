"""Ahead-of-time serving artifacts: serialized scene runners via jax.export.

A serving bundle (tools/export.py) removes training-side work from server
start, but the server still pays Python model construction + tracing +
XLA lowering for every scene bucket on first use.  This module freezes a
predictor's compiled scene runner into a portable StableHLO artifact:

- ``export_runners(predictor, shapes, platforms)`` traces + lowers the
  runner once per scene bucket — including **cross-platform**: a CPU dev
  machine can emit TPU artifacts (``platforms=("tpu",)``) with no TPU
  attached, because jax.export lowers through StableHLO without a backend.
- ``export_aot(predictor, directory, shapes)`` exports AND persists the
  artifact with an ``aot_meta.json`` recording the frozen serving
  configuration — model family, quant mode, and (int8) the PINNED
  calibration scales.  ``save_aot`` / ``load_aot`` are the raw layers.
- ``ScenePredictor(..., aot_dir=...)`` then serves from the artifact:
  no tracing, no Python-side lowering for artifact-covered buckets — the
  device just compiles the shipped StableHLO (and the persistent
  compilation cache makes restarts near-instant).  Missing buckets fall
  back to in-process jit with a warning.

The artifact pins the exact exported math: masks are bit-identical to the
in-process jit path (asserted in tests/test_aot.py, incl. int8 — whose
scales are frozen at export: ``export_runners`` rejects predictors that
would still recalibrate, and the serving side seeds its scales from the
meta so the clip probe and fallback buckets stay consistent).  Scope: the
pure-jit serving modes (grid / overlap / banded overlap / in-HBM
fullconv, incl. int8), plus the fleet-packed grid runners
(``export_aot(..., packs=[N])`` freezes ``runner_HxW_packN.jaxexp``
artifacts served by ``predict_many(pack=N)``; missing bucket x pack
combos fall back to in-process jit with a warning).  Host-streamed and
mesh-sharded modes stay in-process — their runners do host work per band
that has no StableHLO form.

The reference has no deployment artifact at all (it pickles the live torch
module mid-training, /root/reference/train.py:222).
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

log = logging.getLogger("fabric_tpu")

_META = "aot_meta.json"


def _runner_name(h: int, w: int, pack: int = 0) -> str:
    if pack:
        return f"runner_{h}x{w}_pack{pack}.jaxexp"
    return f"runner_{h}x{w}.jaxexp"


def export_scene_runner(run, variables, scene_shape, n_channels: int,
                        dtype, platforms=("tpu",),
                        num_dates: int = 0) -> bytes:
    """Serialize one ``(variables, scene1, scene2) -> mask`` runner.

    ``run`` must be pure jit (no host callbacks); ``scene_shape`` is the
    (already bucket-padded) (H, W).  ``num_dates > 0`` exports the
    multi-date signature ``(variables, (T, H, W, C) stack) -> mask``.
    """
    import jax
    from jax import export as jexport

    h, w = scene_shape
    if not hasattr(run, "lower"):  # plain python wrapper around jit calls
        run = jax.jit(run)
    var_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        variables)
    if num_dates:
        args = (var_spec,
                jax.ShapeDtypeStruct((num_dates, h, w, n_channels), dtype))
    else:
        scene = jax.ShapeDtypeStruct((h, w, n_channels), dtype)
        args = (var_spec, scene, scene)
    exported = jexport.export(run, platforms=list(platforms))(*args)
    return exported.serialize()


def export_packed_runner(run, variables, scene_shape, pack: int,
                         n_channels: int, dtype, platforms=("tpu",),
                         num_dates: int = 0) -> bytes:
    """Serialize one fleet-packed runner (device_tiling.
    make_packed_scene_infer): ``(variables, (pack, H, W, C) x2) ->
    (pack, H, W)`` masks, or the ``(variables, (pack, T, H, W, C))``
    multi-date signature."""
    import jax
    from jax import export as jexport

    h, w = scene_shape
    if not hasattr(run, "lower"):
        run = jax.jit(run)
    var_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        variables)
    if num_dates:
        args = (var_spec, jax.ShapeDtypeStruct(
            (pack, num_dates, h, w, n_channels), dtype))
    else:
        scenes = jax.ShapeDtypeStruct((pack, h, w, n_channels), dtype)
        args = (var_spec, scenes, scenes)
    exported = jexport.export(run, platforms=list(platforms))(*args)
    return exported.serialize()


def load_serialized_runner(data: bytes):
    """bytes -> a ``(variables, *scenes) -> mask`` callable."""
    from jax import export as jexport
    exported = jexport.deserialize(bytearray(data))

    def run(variables, *scenes):
        return exported.call(variables, *scenes)

    return run


def save_aot(directory: str, runners: dict, meta: dict) -> None:
    """Write ``runner_HxW[_packP].jaxexp`` files + a meta sidecar.
    Keys are ``(h, w)`` single-scene buckets or ``(h, w, pack)``
    fleet-packed buckets."""
    os.makedirs(directory, exist_ok=True)
    for key, blob in runners.items():
        path = os.path.join(directory, _runner_name(*key))
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    meta = dict(meta)
    meta["shapes"] = sorted([list(k) for k in runners if len(k) == 2])
    packed = sorted([list(k) for k in runners if len(k) == 3])
    if packed:
        meta["packed_shapes"] = packed
    with open(os.path.join(directory, _META), "w") as f:
        json.dump(meta, f, indent=1)


def load_aot(directory: str, h: int, w: int, pack: int = 0):
    """Load the artifact for bucket (h, w) (``pack`` > 0: the
    fleet-packed runner); None when absent."""
    path = os.path.join(directory, _runner_name(h, w, pack))
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        data = f.read()
    log.info("serving %dx%d%s from AOT artifact %s", h, w,
             f" (pack {pack})" if pack else "", path)
    return load_serialized_runner(data)


def export_runners(predictor, scene_shapes, platforms=("tpu",),
                   packs=()) -> dict:
    """Export a predictor's runner for each scene shape (pre-bucket dims;
    artifacts are keyed by the padded bucket dims, exactly as the
    predictor will look them up).  ``packs``: additionally export
    fleet-packed runners (``predict_many(pack=N)``,
    device_tiling.make_packed_scene_infer) for each pack count, per
    bucket — grid serving mode only.  Returns {(H, W): bytes} plus
    {(H, W, pack): bytes} entries for the packed runners."""
    if predictor.fullconv_stream or predictor.shard_scene \
            or predictor.mesh is not None:
        raise ValueError(
            "AOT export covers the single-device pure-jit serving modes; "
            "streamed/sharded runners do per-band host work and must stay "
            "in-process")
    if predictor.quant == "int8":
        # the artifact freezes the quantized math, including the
        # activation scales baked into it as compile-time constants —
        # a predictor that would still (re)calibrate cannot be frozen
        # faithfully (its scales mutate and re-jit; the artifact can't)
        if predictor._scales is None:
            raise ValueError(
                "int8 AOT export needs calibrated activation scales: "
                "call predictor.calibrate(...) (or serve from a "
                "calibrated bundle) before exporting")
        if predictor.recalibrate_every > 0:
            raise ValueError(
                "int8 AOT artifacts pin the calibration scales at export "
                "time; recalibrate_every > 0 would silently diverge from "
                "them — export from a predictor with recalibrate_every=0")
    if packs and predictor.serving_mode() != "grid":
        raise ValueError(
            "packs= exports fleet-packed runners, which serve the grid "
            f"tiling mode only (this predictor is configured for "
            f"{predictor.serving_mode()!r})")
    num_dates = predictor.cfg.num_dates if predictor.multi_date else 0
    out = {}
    for h, w in scene_shapes:
        ph, pw = predictor._bucket_dims(h, w)
        if (ph, pw) in out:
            continue
        run = predictor._get_runner(ph, pw)
        out[(ph, pw)] = export_scene_runner(
            run, predictor.variables, (ph, pw),
            predictor.cfg.n_channels, predictor.dtype, platforms,
            num_dates=num_dates)
        log.info("exported %dx%d runner (%d KiB, platforms=%s)",
                 ph, pw, len(out[(ph, pw)]) // 1024, list(platforms))
        for pack in packs:
            run = predictor._get_packed_runner(ph, pw, pack)
            out[(ph, pw, pack)] = export_packed_runner(
                run, predictor.variables, (ph, pw), pack,
                predictor.cfg.n_channels, predictor.dtype, platforms,
                num_dates=num_dates)
            log.info("exported %dx%d pack-%d runner (%d KiB)",
                     ph, pw, pack, len(out[(ph, pw, pack)]) // 1024)
    return out


def export_aot(predictor, directory: str, scene_shapes,
               platforms=("tpu",), packs=()) -> dict:
    """Export + persist a predictor's AOT serving artifact in one call:
    runners for every scene shape, plus an ``aot_meta.json`` recording the
    serving configuration the artifact was frozen from — model family,
    quant mode, and (for int8) the PINNED calibration scales, so a serving
    process can seed its scales from the artifact and its clip-probe /
    fallback-jit paths stay consistent with the frozen math.  Returns the
    meta dict."""
    import jax.numpy as jnp

    runners = export_runners(predictor, scene_shapes, platforms,
                             packs=packs)
    meta = {
        "format_version": 1,
        "model": predictor.cfg.model,
        "quant": predictor.quant,
        "dtype": ("bfloat16" if predictor.dtype == jnp.bfloat16
                  else "float32"),
        "bucket": predictor.bucket,
        "num_dates": (predictor.cfg.num_dates if predictor.multi_date
                      else 0),
        "fullconv_band_rows": predictor.fullconv_band_rows,
        "platforms": list(platforms),
        "weights_sha256": params_fingerprint(predictor.variables),
    }
    if predictor.quant == "int8":
        meta["int8_scales"] = {k: float(v)
                               for k, v in predictor._scales.items()}
    save_aot(directory, runners, meta)
    return meta


def read_meta(directory: str) -> dict:
    with open(os.path.join(directory, _META)) as f:
        return json.load(f)


def params_fingerprint(variables) -> str:
    """sha256 over every leaf (path, dtype, shape, bytes) of a variables
    pytree — identifies the exact weights an artifact was frozen from.

    The exported StableHLO bakes the weights in as constants, so serving a
    DIFFERENT checkpoint through an artifact would silently produce the
    export-time masks for artifact-covered buckets while fallback-jit
    buckets use the live checkpoint — per-bucket divergence with no error.
    ``ScenePredictor._init_aot`` compares this digest against
    ``aot_meta.json`` to reject that mismatch at startup (one D2H copy of
    the params, ~tens of ms on attached hosts)."""
    import hashlib

    import jax

    h = hashlib.sha256()
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        arr = np.asarray(leaf)
        h.update(jax.tree_util.keystr(path).encode())
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()
