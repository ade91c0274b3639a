"""ScenePredictor: production serving for whole-scene change detection.

Ties the inference stack together for deployment: load a checkpoint once,
fold BN, and predict arbitrarily-sized scenes through compile-amortized
buckets — city scenes come in many shapes, and jit compiles per shape, so
scenes are edge-padded up to the next bucket and the mask is cropped back.
One compilation serves every scene that falls in the same bucket (the
reference re-tiled and re-transferred per batch per scene with no compile
reuse at all, train.py:187-201).

Note on semantics: bucket padding shifts the remainder-tile anchors of the
reference-exact grid to the padded extent, so predictions in the last
partial-tile band may differ slightly from the unbucketed reference path
(interior pixels are identical; overlap mode is unaffected because
probabilities are averaged).  Use ``bucket=0`` for bit-exact reference
tiling at the cost of one compile per distinct scene shape.
"""

from __future__ import annotations

import logging
import time

import numpy as np

import jax
import jax.numpy as jnp

log = logging.getLogger("fabric_tpu")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ScenePredictor:
    """Checkpoint-backed whole-scene change-map server.

    Args:
      cfg: Config (model/patch/batch/dtype/overlap settings).
      checkpoint: path or directory (latest is taken) — optional; fresh
        random weights if omitted (benchmarks).
      bucket: scene dims are edge-padded up to multiples of this (0 =
        exact shapes, one compile per distinct shape).
      fold_bn: fold BatchNorm into conv weights (inference-only transform).
      mesh: optional Mesh to shard tile batches over its 'data' axis.
      quant: "int8" enables the post-training-quantized serving path
        (infer/quant.py; requires fold_bn and a bidate model) — measured
        116.8 vs 79.1 Mpx/sec/chip (+47%) on the v5e at >96% mask
        agreement; calibrate with :meth:`calibrate`, or it
        self-calibrates ONCE on the first predicted scene pair and
        reuses those scales for every later scene.  None (default)
        follows the bundle's exported mode; "none" forces exact bf16.
      split_up_concat: decoder Up blocks read their concat sources
        directly where the concat is lane-misaligned (same math; measured
        faster on the v5e).
      shard_scene: distribute the SCENE itself as H-bands over the mesh
        ``data`` axis (infer/sharded_scene.py) — per-device memory scales
        as 1/N, for scenes larger than one chip's HBM.  Grid mode
        (buckets auto-aligned to ``n_data * patch_size``), or seamless
        sharded fullconv when combined with ``fullconv_band_rows``
        (infer/fullconv.make_sharded_fullconv_infer: halo exchange over
        ICI, buckets auto-aligned to ``n_data * 256``).
      recalibrate_every: int8 mode: re-derive the activation scales from
        every Nth predicted scene (0 = calibrate once, on the first).
        Each recalibration bakes new scales into the quantized forward
        (compile-time constants) and so re-jits the scene runner — prefer
        sparse cadences, or rely on the clip probe to tell you when.
      overlap_band_rows: overlap mode (cfg.infer_overlap > 0): accumulate
        probabilities in bands of N tile rows instead of materializing
        every tile — bounded memory for large scenes (the unbanded overlap
        path OOMs around 8192²/overlap 32 on a 16 GB chip).  0 = unbanded.
      fullconv_band_rows: seamless fully-convolutional serving
        (infer/fullconv.py): run the network directly over halo-extended
        bands of N pixel rows instead of tiling — every pixel predicted
        once with its full receptive field, zero tile seams, ~4x cheaper
        than overlap-averaged stitching.  Larger bands amortize the halo
        recompute; measured v5e optima at 8192²-wide scenes: 768 exact
        bf16 (the largest that fits a 16 GB chip), 1024 for int8
        (BASELINE.md fullconv rows).  Uses the shift-invariant
        decoder upsample (masks differ slightly from the tiled
        reference-parity modes unless the checkpoint was trained with
        cfg.local_upsample).  Requires fold_bn; serves the bidate model
        (exact or int8) and the multi-date variants; mutually exclusive
        with overlap/shard_scene.  0 = off.
      fullconv_stream: with fullconv_band_rows: stream each halo-extended
        band from the HOST arrays (ndarray or np.memmap) instead of
        placing the scene in HBM — device footprint is one band
        regardless of scene size, so a single chip serves scenes bounded
        only by host storage (infer/fullconv.py
        make_fullconv_scene_infer_streamed; streamed == in-HBM pinned
        exactly).  Bidate and multi-date models, single device (use
        shard_scene for mesh-distributed scenes); masks can stream to an
        ``out=`` memmap via the runner directly.
      tracker: optional :class:`fabric_tpu.track.Tracker` — every served
        scene streams a ``serve_``-prefixed record into its
        ``metrics.jsonl``: scene id + dims, bucket, whether this scene
        compiled a new runner or hit a cached one, wall ms, Mpx/s,
        serving mode, quant mode, and (int8) the worst clip-probe
        site/ratio.  ``cli.infer`` wires one by default — the serving
        replacement for the reference's per-scene comet logging
        (/root/reference/utils/inference.py:107-131).
      aot_dir: serve from an ahead-of-time artifact (infer/aot.py
        ``export_aot``): scene runners load as serialized StableHLO —
        no tracing or Python-side lowering at serving time; masks are
        bit-identical to the in-process jit path (tests/test_aot.py).
        Buckets missing from the artifact fall back to in-process jit
        with a warning.  int8 artifacts pin their calibration scales
        (seeded from ``aot_meta.json``; ``recalibrate_every`` must be 0
        and :meth:`calibrate` is rejected — the frozen math cannot
        follow new scales).  Single-device pure-jit modes only.
      clip_warn_ratio: int8 mode: before each scene, probe its
        activation ranges against the calibrated scales
        (infer/quant.clip_report on the corner/center crops) and warn
        when any site's absmax exceeds this multiple of its covered
        range — the guardrail against silent clipping on scenes hotter
        than the calibration scene.  The per-scene report is kept in
        ``self.last_clip_report``.  0 disables probing.
    """

    def __init__(self, cfg, checkpoint: str | None = None, bucket: int = 512,
                 fold_bn: bool = True, mesh=None, quant: str | None = None,
                 split_up_concat: bool = True, bundle: str | None = None,
                 shard_scene: bool = False, recalibrate_every: int = 0,
                 clip_warn_ratio: float = 1.0,
                 overlap_band_rows: int = 0,
                 fullconv_band_rows: int = 0,
                 fullconv_stream: bool = False,
                 aot_dir: str | None = None,
                 tracker=None):
        from fabric_tpu import checkpoint as ckpt
        from fabric_tpu.models import build_model
        from fabric_tpu.train.state import create_state

        self.cfg = cfg
        self.bucket = bucket
        self.mesh = mesh
        self.tracker = tracker
        self.shard_scene = shard_scene
        self.multi_date = cfg.model in ("unet_lstm", "unet3d")
        self.dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.recalibrate_every = recalibrate_every
        self.clip_warn_ratio = clip_warn_ratio
        self.overlap_band_rows = overlap_band_rows
        self.fullconv_band_rows = fullconv_band_rows
        self.fullconv_stream = fullconv_stream
        if fullconv_stream:
            if not fullconv_band_rows:
                raise ValueError("fullconv_stream streams the fullconv "
                                 "bands from host memory — set "
                                 "fullconv_band_rows too")
            if shard_scene:
                raise ValueError("fullconv_stream streams bands from "
                                 "the host to ONE device (use "
                                 "shard_scene for mesh-distributed "
                                 "scenes)")
        if fullconv_band_rows:
            if ((mesh is not None and not shard_scene) or overlap_band_rows
                    or getattr(cfg, "infer_overlap", 0)
                    or not fold_bn):
                raise ValueError("fullconv_band_rows serves BN-folded "
                                 "models with grid/overlap tiling off (it "
                                 "replaces tiling entirely); exact and "
                                 "int8 modes both compose with it, the "
                                 "multi-date variants serve through it, "
                                 "and shard_scene=True distributes the "
                                 "bands over the mesh (halo exchange over "
                                 "ICI)")
            if shard_scene and self.multi_date:
                raise ValueError("sharded fullconv serves the bidate "
                                 "model only")
            if cfg.model == "unet3d" and (quant == "int8"):
                # measured r4 (BASELINE.md): int8 3D convs at full scene
                # width run ~40% SLOWER than bf16 (13.7 vs 22.8 Mpx/s @
                # band 512) — the opposite of every other int8 mode
                log.warning("unet3d int8 fullconv measured SLOWER than "
                            "bf16 on the v5e (13.7 vs 22.8 Mpx/s, "
                            "BASELINE.md); consider quant='none' for "
                            "this mode")
        if overlap_band_rows:
            if not getattr(cfg, "infer_overlap", 0):
                raise ValueError("overlap_band_rows requires "
                                 "cfg.infer_overlap > 0 (grid-mode tiles "
                                 "are disjoint — no banding needed)")
            if shard_scene or self.multi_date or mesh is not None:
                raise ValueError("overlap_band_rows supports the "
                                 "single-device bidate path only")
        self._scales: dict | None = None
        self._scenes_predicted = 0
        self.last_clip_report: dict | None = None
        if shard_scene and self.multi_date:
            raise ValueError("shard_scene currently supports the bidate "
                             "model only")
        if shard_scene:
            # scene lives H-banded across the mesh (infer/sharded_scene.py:
            # per-device memory ~1/N) — buckets must align with the bands
            if mesh is None:
                raise ValueError("shard_scene requires a mesh")
            if getattr(cfg, "infer_overlap", 0):
                raise ValueError("shard_scene supports grid and fullconv "
                                 "modes only (tiled overlap stitching "
                                 "needs its own halo machinery)")
            if fullconv_band_rows:
                # sharded fullconv: per-device band must be 16-aligned and
                # >= 2*halo (edge-device context clamping) — 256 covers the
                # default halo 128 (infer/fullconv.py)
                align = mesh.shape["data"] * 256
            else:
                align = mesh.shape["data"] * cfg.patch_size
            self.bucket = max(_round_up(bucket or align, align), align)

        if bundle is not None:
            # pre-folded (and possibly pre-calibrated) serving artifact
            # from tools/export.py — no checkpoint machinery at all
            from fabric_tpu.tools.export import load_bundle
            folded, scales, meta = load_bundle(bundle)
            if meta["n_channels"] != cfg.n_channels:
                raise ValueError(
                    f"bundle n_channels {meta['n_channels']} != config "
                    f"{cfg.n_channels}")
            bmodel = meta.get("model", "bidate")
            if bmodel != cfg.model:
                raise ValueError(f"bundle was exported from a "
                                 f"{bmodel!r} model; config says "
                                 f"{cfg.model!r}")
            # commit the npz's host arrays to the device once — they are
            # passed into the jitted runners on every scene, and host
            # leaves would re-upload the full weight set per call
            import jax
            self.variables = {"params": jax.device_put(folded),
                              "batch_stats": {}}
            common = dict(n_channels=meta["n_channels"],
                          n_classes=meta["n_classes"], dtype=self.dtype,
                          fold_bn=True,
                          local_upsample=bool(fullconv_band_rows))
            base = meta.get("model_base", 0)
            if bmodel == "bidate":
                from fabric_tpu.models import BiDateNet
                self.model = BiDateNet(
                    base=base or 64, split_up_concat=split_up_concat,
                    **common)
            elif bmodel == "unet_lstm":
                from fabric_tpu.models.unet_lstm import UNetLSTM
                self.model = UNetLSTM(base=base or 64, **common)
            else:
                from fabric_tpu.models.unet3d import UNet3D
                self.model = UNet3D(base=base or 32, **common)
            # quant=None follows the bundle's own mode; "none"/"int8"
            # force exact / quantized serving explicitly
            self.quant = quant if quant is not None else meta.get(
                "quant", "none")
            if self.quant == "int8" and scales:
                from fabric_tpu.infer import quant as q
                self.model = q.make_int8_apply(
                    folded, scales, self.dtype,
                    local_upsample=bool(fullconv_band_rows),
                    model=bmodel)
                self._scales = dict(scales)
            self._compiled = {}
            log.info("loaded serving bundle %s (model=%s quant=%s)",
                     bundle, bmodel, self.quant)
            self._init_aot(aot_dir)
            return

        model = build_model(cfg)
        state = create_state(cfg, model)
        if checkpoint:
            import os
            path = checkpoint
            if os.path.isdir(path):
                # serving wants the BEST-metric weights, not a possibly
                # newer mid-epoch periodic save (same policy as cli.infer
                # and tools/export)
                path = (ckpt.read_pointer(path, "best")
                        or ckpt.latest_checkpoint(path))
                if path is None:
                    raise FileNotFoundError(
                        f"no checkpoint found in {checkpoint!r}")
            state = ckpt.restore(state, path)
            log.info("loaded checkpoint %s", path)

        quant = quant or "none"
        folding = fold_bn and not cfg.use_pallas and cfg.model in (
            "bidate", "unet_lstm", "unet3d")
        if quant == "int8" and not folding:
            raise ValueError("quant='int8' requires fold_bn=True and "
                             "use_pallas off (the quantized forward runs "
                             "on BN-folded weights); every model family "
                             "serves quantized (infer/quant.py + "
                             "quant_multidate.py)")
        self.quant = quant
        if folding:
            from fabric_tpu.ops.fold_bn import fold_batchnorm
            base = getattr(cfg, "model_base", 0)
            common = dict(n_channels=cfg.n_channels,
                          n_classes=cfg.n_classes, dtype=self.dtype,
                          fold_bn=True)
            if cfg.model == "bidate":
                from fabric_tpu.models import BiDateNet
                self.model = BiDateNet(base=base or 64,
                                       split_up_concat=split_up_concat,
                                       local_upsample=bool(
                                           fullconv_band_rows),
                                       **common)
            elif cfg.model == "unet_lstm":
                from fabric_tpu.models.unet_lstm import UNetLSTM
                self.model = UNetLSTM(base=base or 64,
                                      local_upsample=bool(
                                          fullconv_band_rows), **common)
            else:
                from fabric_tpu.models.unet3d import UNet3D
                self.model = UNet3D(base=base or 32,
                                    local_upsample=bool(fullconv_band_rows),
                                    **common)
            self.variables = {
                "params": fold_batchnorm(state.params, state.batch_stats),
                "batch_stats": {}}
        else:
            self.model = model
            self.variables = {"params": state.params,
                              "batch_stats": state.batch_stats}
        self._compiled: dict[tuple[int, int], object] = {}
        self._init_aot(aot_dir)

    def _init_aot(self, aot_dir: str | None) -> None:
        """Validate + adopt an AOT serving artifact (infer/aot.py): check
        it was frozen from THIS serving configuration, and for int8 seed
        the pinned calibration scales so the clip probe and any
        fallback-jit bucket stay consistent with the frozen math."""
        self.aot_dir = aot_dir
        if not aot_dir:
            return
        from fabric_tpu.infer import aot as _aot
        if self.fullconv_stream or self.shard_scene or self.mesh is not None:
            raise ValueError(
                "aot_dir serves the single-device pure-jit modes; "
                "streamed/sharded runners do per-band host work and must "
                "stay in-process (the same modes export_aot rejects)")
        meta = _aot.read_meta(aot_dir)
        import jax.numpy as jnp
        from jax.export import default_export_platform
        here = default_export_platform()  # canonical ("tpu" under axon)
        if meta.get("platforms") and here not in meta["platforms"]:
            raise ValueError(
                f"AOT artifact {aot_dir} was exported for platforms "
                f"{meta['platforms']} but this process serves on "
                f"{here!r} — re-export with platforms=({here!r},) "
                f"(tools/export.py --aot_platform {here}); without this "
                f"check the mismatch surfaces as an opaque error deep "
                f"inside exported.call on the first scene")
        my_dtype = "bfloat16" if self.dtype == jnp.bfloat16 else "float32"
        for field, mine in (("model", self.cfg.model),
                            ("quant", self.quant),
                            ("fullconv_band_rows", self.fullconv_band_rows),
                            ("dtype", my_dtype),
                            ("bucket", self.bucket),
                            ("num_dates", (self.cfg.num_dates
                                           if self.multi_date else 0))):
            if field not in meta:
                continue  # hand-rolled save_aot meta; export_aot records all
            theirs = meta[field]
            if theirs != mine:
                raise ValueError(
                    f"AOT artifact {aot_dir} was frozen with "
                    f"{field}={theirs!r}; this predictor uses {mine!r} — "
                    f"served masks would silently diverge from the "
                    f"artifact's math (bucket/dtype mismatches would "
                    f"otherwise surface as every-bucket fallback or "
                    f"opaque aval errors deep in exported.call)")
        # The StableHLO bakes the export-time weights in as constants: a
        # different checkpoint would serve the frozen weights on
        # artifact-covered buckets and the live ones on fallback-jit
        # buckets — per-bucket silent divergence.  Reject it here.
        frozen = meta.get("weights_sha256")
        if frozen:
            mine = _aot.params_fingerprint(self.variables)
            if mine != frozen:
                raise ValueError(
                    f"AOT artifact {aot_dir} was exported from different "
                    f"weights (artifact sha256 {frozen[:12]}…, this "
                    f"checkpoint {mine[:12]}…) — re-export the artifact "
                    f"from the checkpoint being served (tools/export.py "
                    f"--aot_dir / infer.aot.export_aot)")
        else:
            log.warning(
                "AOT artifact %s records no weights fingerprint (exported "
                "by an older export_aot); cannot verify it matches this "
                "checkpoint — artifact-covered buckets serve the "
                "export-time weights regardless", aot_dir)
        if self.quant == "int8":
            if self.recalibrate_every > 0:
                raise ValueError(
                    "AOT int8 artifacts pin the calibration scales frozen "
                    "at export; recalibrate_every > 0 would mutate the "
                    "in-process scales away from them")
            scales = meta.get("int8_scales")
            if not scales:
                raise ValueError(
                    f"AOT artifact {aot_dir} is int8 but records no "
                    "pinned scales (re-export with infer/aot.export_aot)")
            from fabric_tpu.infer import quant as q
            self.model = q.make_int8_apply(
                self.variables["params"], scales, self.dtype,
                local_upsample=bool(self.fullconv_band_rows),
                model=self.cfg.model)
            self._scales = dict(scales)

    def calibrate(self, batches) -> None:
        """Calibrate int8 activation scales — on (d1, d2) NHWC batch pairs
        for the bi-date model, (N, T, patch, patch, C) stacks for the
        multi-date variants (e.g. patches cropped from held-out scenes) —
        and swap the serving forward to the quantized path.  Clears
        compiled runners."""
        from fabric_tpu.infer import quant as q
        if getattr(self, "aot_dir", None):
            raise ValueError(
                "this predictor serves a frozen AOT artifact whose int8 "
                "scales are pinned (aot_meta.json); recalibrating would "
                "diverge the in-process math from it — export a new "
                "artifact instead (infer/aot.export_aot)")
        local_up = bool(self.fullconv_band_rows)
        if getattr(self, "_stats_fwd", None) is None:
            self._stats_fwd = q.make_stats_forward(
                self.variables["params"], self.dtype,
                local_upsample=local_up, model=self.cfg.model)
        scales = q.calibrate(self.variables["params"], batches, self.dtype,
                             stats_forward=self._stats_fwd)
        self.model = q.make_int8_apply(self.variables["params"], scales,
                                       self.dtype,
                                       local_upsample=local_up,
                                       model=self.cfg.model)
        self._scales = dict(scales)
        self._compiled.clear()
        # the new scales invalidate any pending probe result: a scene
        # served right after calibration ran NO probe, and without this
        # the previous scene's report (vs the OLD scales) would be
        # attributed to it by _record_scene's synchronous-path fallback
        self.last_clip_report = None

    def _calibration_crops(self, d1, d2) -> tuple[np.ndarray, np.ndarray]:
        """Corner/center patch crops of a scene pair, edge-padded up to a
        full patch if the scene is smaller (used for int8 calibration and
        the per-scene clip probe)."""
        p = self.cfg.patch_size
        h0, w0 = d1.shape[:2]
        pads = [(0, max(p - h0, 0)), (0, max(p - w0, 0)), (0, 0)]
        e1, e2 = (np.pad(x, pads, mode="edge") for x in (d1, d2))
        crops1, crops2 = [], []
        for (y, x) in self._crop_anchors(h0, w0):
            crops1.append(e1[y:y + p, x:x + p])
            crops2.append(e2[y:y + p, x:x + p])
        return (np.stack(crops1).astype(np.float32),
                np.stack(crops2).astype(np.float32))

    def _crop_anchors(self, h0: int, w0: int) -> set:
        p = self.cfg.patch_size
        return {(0, 0),
                (max(h0 - p, 0), max(w0 - p, 0)),
                (max((h0 - p) // 2, 0), max((w0 - p) // 2, 0))}

    def _calibration_crops_multidate(self, scenes) -> np.ndarray:
        """(N, T, patch, patch, C) corner/center crops of a (T, H, W, C)
        date stack (the multi-date analogue of :meth:`_calibration_crops`)."""
        p = self.cfg.patch_size
        h0, w0 = scenes.shape[1:3]
        pads = [(0, 0), (0, max(p - h0, 0)), (0, max(p - w0, 0)), (0, 0)]
        e = np.pad(scenes, pads, mode="edge")
        crops = [e[:, y:y + p, x:x + p]
                 for (y, x) in self._crop_anchors(h0, w0)]
        return np.stack(crops).astype(np.float32)

    def _int8_scene_prologue(self, crops):
        """Shared per-scene int8 machinery: first-scene (or cadence-due)
        calibration (synchronous — it rebuilds the quantized forward),
        otherwise DISPATCH the activation-range clip probe and return its
        device-side stats without waiting.  ``crops`` is whatever
        :meth:`calibrate` accepts — a (d1, d2) pair for the bi-date
        model, an (N, T, p, p, C) stack for the multi-date ones.

        Returns the pending probe stats ({site: device absmax scalar}) to
        hand to :meth:`_int8_probe_check`, or None when this scene
        (re-)calibrated or probing is off.  Splitting dispatch from check
        lets serving overlap the probe — and, in :meth:`predict_many`,
        the scene forward itself — with host work (r4 VERDICT #2: the
        synchronous probe forced every int8 scene through the sequential
        path)."""
        # cadence counts from the FIRST scene: scene 0 only calibrates
        # when no scales exist yet, so a bundle's curated offline scales
        # survive until the cadence actually comes due (scene N, 2N, ...)
        due = (self._scales is None
               or (self.recalibrate_every > 0
                   and self._scenes_predicted > 0
                   and self._scenes_predicted % self.recalibrate_every
                   == 0))
        n_crops = (crops[0] if isinstance(crops, tuple) else crops).shape[0]
        if due:
            # (re-)calibrate on corner/center patches of THIS scene;
            # cadence via recalibrate_every (0 = first scene only)
            self.calibrate([crops])
            log.info("int8 calibration on scene %d (%d crops)",
                     self._scenes_predicted, n_crops)
            return None
        if not self.clip_warn_ratio:
            return None
        # guardrail: static scales from an earlier scene — probe whether
        # THIS scene's activation ranges overflow them (probe forward
        # compiled once, reused every scene; dispatch is async)
        from fabric_tpu.infer import quant as q
        if getattr(self, "_stats_fwd", None) is None:
            self._stats_fwd = q.make_stats_forward(
                self.variables["params"], self.dtype,
                local_upsample=bool(self.fullconv_band_rows),
                model=self.cfg.model)
        _, stats = self._stats_fwd(*q._as_args(crops))
        return stats

    def _int8_probe_check(self, stats, scene_idx: int) -> dict | None:
        """Complete a pending clip probe from :meth:`_int8_scene_prologue`:
        pull the (tiny) per-site absmax scalars to host, compute the
        overflow report, warn past ``clip_warn_ratio``.  The sync waits
        only on the probe's own few-crop forward — never on a scene
        forward dispatched after it."""
        if stats is None:
            return None
        report = {k: float(v) / (127.0 * self._scales[k])
                  for k, v in stats.items() if k in self._scales}
        self.last_clip_report = report
        site = max(report, key=report.get)
        if report[site] > self.clip_warn_ratio:
            log.warning(
                "int8 activation clipping on scene %d: site %s "
                "absmax is %.2fx the calibrated range (worst of "
                "%d sites); predictions may degrade there — "
                "recalibrate (ScenePredictor.calibrate / "
                "recalibrate_every) or raise calibration "
                "headroom", scene_idx, site,
                report[site], len(report))
        return report

    def serving_mode(self) -> str:
        """Human-readable name of the configured serving mode."""
        if self.fullconv_band_rows:
            if self.fullconv_stream:
                return "fullconv_stream"
            return ("sharded_fullconv" if self.shard_scene else "fullconv")
        if self.shard_scene:
            return "sharded_grid"
        if self.overlap_band_rows:
            return "banded_overlap"
        if getattr(self.cfg, "infer_overlap", 0):
            return "overlap"
        return "grid"

    _CLIP_UNSET = object()  # "caller didn't track this scene's probe"

    def _record_scene(self, scene_id, dims, runner_key, compiled_new,
                      wall_s, pipelined: bool = False,
                      clip_report=_CLIP_UNSET,
                      packed: int = 0) -> None:
        """Stream one served scene's record through the tracker (no-op
        without one): the serving-side observability the reference did
        via per-scene comet logging (utils/inference.py:107-131)."""
        if self.tracker is None:
            return
        h, w = dims
        rec = {
            "scene": scene_id,
            "height": h, "width": w,
            "bucket_h": runner_key[0], "bucket_w": runner_key[1],
            "compiled": bool(compiled_new),
            "wall_ms": round(wall_s * 1000.0, 2),
            "mpx_per_sec": round(h * w / wall_s / 1e6, 3),
            "mode": self.serving_mode(),
            "quant": self.quant,
            "aot": bool(getattr(self, "aot_dir", None)),
        }
        if pipelined:
            # predict_many keeps several scenes in flight: this scene's
            # wall clock overlaps its neighbors' compute
            rec["pipelined"] = True
        if packed:
            # fleet-packed dispatch: this scene shared its forward with
            # up to `packed`-1 other scenes (wall_ms covers the pack)
            rec["packed"] = packed
        if self.quant == "int8":
            # pipelined/packed scenes pass their own probe's report
            # (None = this scene ran no probe, e.g. it (re)calibrated —
            # no fallback, or the PREVIOUS scene's probe would be
            # attributed to it); the synchronous path omits the arg and
            # uses the probe that just ran
            report = (self.last_clip_report
                      if clip_report is ScenePredictor._CLIP_UNSET
                      else clip_report)
            if report:
                site = max(report, key=report.get)
                rec["clip_worst_site"] = site
                rec["clip_worst_ratio"] = round(report[site], 3)
        self.tracker.log_metrics(rec, step=self._scenes_predicted,
                                 prefix="serve_")

    def _runner_key(self, h: int, w: int) -> tuple[int, int]:
        """The _compiled key predict will use for an (h, w) scene."""
        if self.fullconv_stream:
            return (h, w)
        return self._bucket_dims(h, w)

    def _bucket_dims(self, h: int, w: int) -> tuple[int, int]:
        """Padded (H, W) for this scene under the bucket policy."""
        patch = self.cfg.patch_size
        if self.bucket:
            return (max(_round_up(h, self.bucket), patch),
                    max(_round_up(w, self.bucket), patch))
        return max(h, patch), max(w, patch)

    def _get_runner(self, h: int, w: int):
        key = (h, w)
        if key not in self._compiled:
            if getattr(self, "aot_dir", None):
                from fabric_tpu.infer.aot import load_aot
                loaded = load_aot(self.aot_dir, h, w)
                if loaded is not None:
                    self._compiled[key] = loaded
                    return loaded
                log.warning("no AOT artifact for bucket %dx%d in %s; "
                            "falling back to in-process jit", h, w,
                            self.aot_dir)
            log.info("compiling scene runner for %dx%d", h, w)
            if (self.multi_date and self.fullconv_band_rows
                    and self.fullconv_stream):
                from fabric_tpu.infer.fullconv import (
                    make_fullconv_scene_infer_multidate_streamed)
                # virtual bucket pad: byte-identical masks to the in-HBM
                # runner built for the bucket-padded scene
                self._compiled[key] = (
                    make_fullconv_scene_infer_multidate_streamed(
                        self.model, (h, w), num_dates=self.cfg.num_dates,
                        band_rows=self.fullconv_band_rows,
                        dtype=self.dtype,
                        padded_shape=self._bucket_dims(h, w)))
            elif self.multi_date and self.fullconv_band_rows:
                from fabric_tpu.infer.fullconv import (
                    make_fullconv_scene_infer_multidate)
                self._compiled[key] = make_fullconv_scene_infer_multidate(
                    self.model, (h, w), num_dates=self.cfg.num_dates,
                    band_rows=self.fullconv_band_rows, dtype=self.dtype)
            elif self.multi_date:
                from fabric_tpu.infer.device_tiling import (
                    make_scene_infer_multidate)
                self._compiled[key] = make_scene_infer_multidate(
                    self.model, self.cfg.patch_size, (h, w),
                    num_dates=self.cfg.num_dates,
                    batch_size=self.cfg.eval_batch_size,
                    overlap=getattr(self.cfg, "infer_overlap", 0),
                    dtype=self.dtype, mesh=self.mesh)
            elif self.shard_scene and self.fullconv_band_rows:
                from fabric_tpu.infer.fullconv import (
                    make_sharded_fullconv_infer)
                self._compiled[key] = make_sharded_fullconv_infer(
                    self.model, (h, w), self.mesh,
                    band_rows=self.fullconv_band_rows, dtype=self.dtype)
            elif self.shard_scene:
                from fabric_tpu.infer.sharded_scene import (
                    make_sharded_scene_infer)
                self._compiled[key] = make_sharded_scene_infer(
                    self.model, self.cfg.patch_size, (h, w), self.mesh,
                    batch_size=self.cfg.eval_batch_size, dtype=self.dtype)
            elif self.fullconv_band_rows and self.fullconv_stream:
                from fabric_tpu.infer.fullconv import (
                    make_fullconv_scene_infer_streamed)
                # virtual bucket pad: byte-identical masks to the in-HBM
                # runner built for the bucket-padded scene
                self._compiled[key] = make_fullconv_scene_infer_streamed(
                    self.model, (h, w),
                    band_rows=self.fullconv_band_rows, dtype=self.dtype,
                    padded_shape=self._bucket_dims(h, w))
            elif self.fullconv_band_rows:
                from fabric_tpu.infer.fullconv import (
                    make_fullconv_scene_infer)
                self._compiled[key] = make_fullconv_scene_infer(
                    self.model, (h, w),
                    band_rows=self.fullconv_band_rows, dtype=self.dtype)
            elif self.overlap_band_rows:
                from fabric_tpu.infer.device_tiling import (
                    make_banded_overlap_infer)
                self._compiled[key] = make_banded_overlap_infer(
                    self.model, self.cfg.patch_size, (h, w),
                    batch_size=self.cfg.eval_batch_size,
                    overlap=self.cfg.infer_overlap,
                    band_tile_rows=self.overlap_band_rows,
                    dtype=self.dtype)
            else:
                from fabric_tpu.infer.device_tiling import make_scene_infer
                self._compiled[key] = make_scene_infer(
                    self.model, self.cfg.patch_size, (h, w),
                    batch_size=self.cfg.eval_batch_size,
                    overlap=getattr(self.cfg, "infer_overlap", 0),
                    dtype=self.dtype, mesh=self.mesh)
        return self._compiled[key]

    def _oom_advice(self) -> str:
        """Mode-specific remedies for a device OOM during a scene run."""
        if self.fullconv_band_rows and not self.fullconv_stream:
            return ("reduce fullconv_band_rows (measured 16 GB-chip "
                    "maxima at 8192²-wide scenes: 768 exact bf16, 1536 "
                    "int8 — BASELINE.md), stream bands from the host "
                    "(fullconv_stream=True: device footprint one band "
                    "regardless of scene size), or distribute over a "
                    "mesh (shard_scene=True)")
        if self.overlap_band_rows or getattr(self.cfg, "infer_overlap", 0):
            return ("reduce overlap_band_rows (bounded-memory overlap "
                    "accumulation; 16 tile rows serves 10240² on a "
                    "16 GB chip) or eval_batch_size")
        return ("reduce eval_batch_size, shrink the bucket size, or — "
                "for scenes beyond one chip's HBM — use shard_scene=True "
                "(per-device memory ~1/N) or fullconv_band_rows with "
                "fullconv_stream=True (device footprint one band)")

    def _run_guarded(self, run, *args):
        """Call a compiled scene runner; on device OOM re-raise with the
        mode-specific sizing advice instead of a bare XLA error."""
        try:
            return run(self.variables, *args)
        except Exception as e:  # noqa: BLE001 — inspect, advise, re-raise
            msg = str(e)
            if ("RESOURCE_EXHAUSTED" in msg or "out of memory" in
                    msg.lower()):
                raise MemoryError(
                    f"device OOM while serving this scene: "
                    f"{self._oom_advice()}") from e
            raise

    def predict(self, d1: np.ndarray, d2: np.ndarray,
                scene_id: str | None = None) -> np.ndarray:
        """(H, W, C) scene pair -> (H, W) uint8 change mask."""
        if self.multi_date:
            raise ValueError("this predictor serves a multi-date model; "
                             "use predict_multidate((T, H, W, C))")
        t0 = time.perf_counter()
        if self.quant == "int8":
            probe = self._int8_scene_prologue(
                self._calibration_crops(d1, d2))
            self._int8_probe_check(probe, self._scenes_predicted)
        self._scenes_predicted += 1
        key = self._runner_key(*d1.shape[:2])
        fresh = key not in self._compiled
        mask, h, w = self._dispatch(d1, d2)
        out = np.asarray(mask)[:h, :w]
        self._record_scene(scene_id, (h, w), key, fresh,
                           time.perf_counter() - t0)
        return out

    def _dispatch(self, d1, d2):
        """Pad/upload/start one scene run WITHOUT waiting for the result:
        returns ``(mask, h, w)`` where ``mask`` is a (possibly still
        computing) device array (or a finished host array in streamed
        mode).  ``np.asarray(mask)[:h, :w]`` completes it."""
        h, w = d1.shape[:2]
        if self.fullconv_stream:
            # the streamed runner slices bands straight off the host
            # arrays (memmap-friendly) and handles edge padding itself —
            # no bucket padding (which would materialize a padded copy),
            # no whole-scene upload
            run = self._get_runner(h, w)
            return self._run_guarded(run, d1, d2), h, w
        ph, pw = self._bucket_dims(h, w)
        if (ph, pw) != (h, w):
            pads = [(0, ph - h), (0, pw - w), (0, 0)]
            d1 = np.pad(d1, pads, mode="edge")
            d2 = np.pad(d2, pads, mode="edge")
        run = self._get_runner(ph, pw)
        if self.shard_scene:
            # each device receives only its H-band; the full scene never
            # occupies a single device's memory
            from fabric_tpu.infer.sharded_scene import put_scene_sharded
            a1 = put_scene_sharded(d1, self.mesh, dtype=self.dtype)
            a2 = put_scene_sharded(d2, self.mesh, dtype=self.dtype)
        else:
            a1 = jnp.asarray(d1, self.dtype)
            a2 = jnp.asarray(d2, self.dtype)
        return self._run_guarded(run, a1, a2), h, w

    def _predict_pipelined(self, items, window, dispatch, dims_of,
                           crops_of, scene_ids=None) -> list[np.ndarray]:
        """Shared cross-scene pipelining driver for :meth:`predict_many` /
        :meth:`predict_many_multidate`: up to ``window`` scenes stay in
        flight (dispatch is async; only the drain at the window boundary
        waits).  int8 scenes pipeline too (r4 VERDICT #2): the clip probe
        is dispatched ahead of the scene and its (tiny) result is checked
        right after the scene's own async dispatch — before the NEXT
        scene dispatches — so the guardrail semantics are unchanged while
        the scene forwards overlap.  Only a cadence-due recalibration
        synchronizes (it rebuilds the quantized forward)."""
        from collections import deque

        results: list[np.ndarray] = []
        pending: deque = deque()

        def drain():
            m, h, w, key, fresh, sid, t0, report = pending.popleft()
            results.append(np.asarray(m)[:h, :w])
            # wall clock overlaps the other in-flight scenes' compute —
            # recorded with pipelined=True so readers don't sum it
            self._record_scene(sid, (h, w), key, fresh,
                               time.perf_counter() - t0, pipelined=True,
                               clip_report=report)

        for i, item in enumerate(items):
            sid = scene_ids[i] if scene_ids else None
            t0 = time.perf_counter()
            probe = None
            if self.quant == "int8":
                # calibration (first scene / cadence-due) synchronizes;
                # otherwise this only DISPATCHES the probe
                probe = self._int8_scene_prologue(crops_of(item))
            idx = self._scenes_predicted
            self._scenes_predicted += 1
            key = self._runner_key(*dims_of(item))
            fresh = key not in self._compiled
            mask_hw = dispatch(item)
            # act on the probe before the next scene's dispatch: the
            # probe ran ahead of this scene's forward, so the sync here
            # waits on a few-crop forward, not on the scene
            report = self._int8_probe_check(probe, idx)
            pending.append((*mask_hw, key, fresh, sid, t0, report))
            while len(pending) >= max(window, 1) + 1:
                drain()
        while pending:
            drain()
        return results

    def _get_packed_runner(self, ph: int, pw: int, pack: int):
        """Compile-cached fleet runner for a (ph, pw) bucket × pack.
        With ``aot_dir``, a matching ``runner_HxW_packP.jaxexp`` artifact
        (export_aot(..., packs=[P])) is preferred; missing combos fall
        back to in-process jit with a warning, like :meth:`_get_runner`."""
        key = (ph, pw, pack, "packed")
        if key not in self._compiled:
            if getattr(self, "aot_dir", None):
                from fabric_tpu.infer.aot import load_aot
                loaded = load_aot(self.aot_dir, ph, pw, pack=pack)
                if loaded is not None:
                    self._compiled[key] = loaded
                    return loaded
                log.warning("no AOT artifact for bucket %dx%d pack %d in "
                            "%s; falling back to in-process jit", ph, pw,
                            pack, self.aot_dir)
            from fabric_tpu.infer.device_tiling import (
                make_packed_scene_infer)
            log.info("compiling packed scene runner for %dx%d x%d",
                     ph, pw, pack)
            self._compiled[key] = make_packed_scene_infer(
                self.model, self.cfg.patch_size, (ph, pw), pack,
                batch_size=self.cfg.eval_batch_size, dtype=self.dtype,
                num_dates=(self.cfg.num_dates if self.multi_date else 0))
        return self._compiled[key]

    def _predict_packed(self, items, pack: int, window: int, scene_ids,
                        multidate: bool) -> list[np.ndarray]:
        """Fleet-packed serving driver (r4 VERDICT #1): group scenes by
        bucket, stack ``pack`` of them per dispatch so their tiles share
        one device-resident batch, and pipeline up to ``window`` packs in
        flight.  Partial final groups pad with zero scenes (their masks
        are discarded).  Per-scene masks are bit-identical to
        :meth:`predict` — per-tile math does not depend on batch
        position, and the chunked forward uses the same batch size.
        (One int8 cadence caveat: with ``recalibrate_every`` > 0, every
        scene in a pack serves with the scales current at the pack's
        dispatch, so scenes queued before a mid-pack recalibration pick
        up the NEW scales; the default calibrate-once cadence is exactly
        sequential-equivalent.)"""
        if self.serving_mode() != "grid":
            raise ValueError(
                f"pack= serves the grid tiling mode only (this predictor "
                f"is configured for {self.serving_mode()!r}); fullconv/"
                f"overlap/sharded scenes don't tile into packable "
                f"batches")
        if self.mesh is not None:
            raise ValueError("pack= is a single-device fast path (mesh "
                             "tile-sharding already fills the batch)")
        if pack != "auto" and pack < 1:
            raise ValueError(f"pack must be >= 1 or 'auto', got {pack}")

        from collections import deque

        # items may be a lazy iterator (cli.infer streams city loads):
        # scenes are consumed as packs fill, so host memory holds at most
        # the open partial pack per bucket + the in-flight window — not
        # the whole fleet
        results: dict[int, np.ndarray] = {}
        groups: dict[tuple[int, int], list] = {}
        packs: dict[tuple[int, int], int] = {}
        pending: deque = deque()

        def pack_for(bkey) -> int:
            """pack='auto': the first pack that fills the tile batch for
            this bucket (the measured sweet spot, BASELINE.md pack-depth
            sweep — deeper packs only add latency once the batch is
            full)."""
            if pack != "auto":
                return pack
            p = self.cfg.patch_size
            k = -(-bkey[0] // p) * -(-bkey[1] // p)  # tiles per scene
            return max(1, self.cfg.eval_batch_size // k)

        def dims_of(item):
            return item.shape[1:3] if multidate else item[0].shape[:2]

        def pad_item(item, ph, pw):
            if multidate:
                t, h, w = item.shape[:3]
                if (ph, pw) == (h, w):
                    return item
                return np.pad(item, [(0, 0), (0, ph - h), (0, pw - w),
                                     (0, 0)], mode="edge")
            d1, d2 = item
            h, w = d1.shape[:2]
            if (ph, pw) == (h, w):
                return d1, d2
            pads = [(0, ph - h), (0, pw - w), (0, 0)]
            return (np.pad(d1, pads, mode="edge"),
                    np.pad(d2, pads, mode="edge"))

        def flush(bkey):
            entries = groups.pop(bkey)
            ph, pw = bkey
            pk = packs[bkey]
            run_key = (ph, pw, pk, "packed")
            fresh = run_key not in self._compiled
            run = self._get_packed_runner(ph, pw, pk)
            n_pad = pk - len(entries)
            if multidate:
                stack = np.stack(
                    [e["scene"] for e in entries]
                    + [np.zeros_like(entries[0]["scene"])] * n_pad)
                masks = self._run_guarded(
                    run, jnp.asarray(stack, self.dtype))
            else:
                s1 = np.stack(
                    [e["scene"][0] for e in entries]
                    + [np.zeros_like(entries[0]["scene"][0])] * n_pad)
                s2 = np.stack(
                    [e["scene"][1] for e in entries]
                    + [np.zeros_like(entries[0]["scene"][1])] * n_pad)
                masks = self._run_guarded(run,
                                          jnp.asarray(s1, self.dtype),
                                          jnp.asarray(s2, self.dtype))
            pending.append((masks, entries, bkey, fresh))
            while len(pending) >= max(window, 1) + 1:
                drain()

        def drain():
            masks, entries, bkey, fresh = pending.popleft()
            host = np.asarray(masks)
            wall = None
            for slot, e in enumerate(entries):
                wall = time.perf_counter() - e["t0"]
                results[e["idx"]] = host[slot, :e["h"], :e["w"]]
                self._record_scene(e["sid"], (e["h"], e["w"]), bkey,
                                   fresh and slot == 0, wall,
                                   pipelined=True,
                                   clip_report=e["report"],
                                   packed=packs[bkey])

        for i, item in enumerate(items):
            sid = scene_ids[i] if scene_ids else None
            t0 = time.perf_counter()
            report = None
            if self.quant == "int8":
                crops = (self._calibration_crops_multidate(item)
                         if multidate
                         else self._calibration_crops(*item))
                # calibration (first scene / cadence-due) synchronizes —
                # and invalidates compiled runners, so it must happen
                # before this scene joins a pack; the probe's tiny sync
                # happens before the pack's own dispatch either way
                probe = self._int8_scene_prologue(crops)
                report = self._int8_probe_check(probe,
                                                self._scenes_predicted)
            self._scenes_predicted += 1
            h, w = dims_of(item)
            bkey = self._bucket_dims(h, w)
            packs.setdefault(bkey, pack_for(bkey))
            groups.setdefault(bkey, []).append(
                {"idx": i, "scene": pad_item(item, *bkey), "h": h,
                 "w": w, "sid": sid, "t0": t0, "report": report})
            if len(groups[bkey]) == packs[bkey]:
                flush(bkey)
        for bkey in list(groups):
            flush(bkey)
        while pending:
            drain()
        return [results[i] for i in range(len(results))]

    def predict_many(self, pairs, window: int = 2,
                     scene_ids=None, pack: int = 0) -> list[np.ndarray]:
        """Serve a sequence of ``(d1, d2)`` scene pairs with cross-scene
        pipelining: up to ``window`` scenes stay in flight, so scene
        n+1's host padding + upload + dispatch overlaps the device
        computing scene n (JAX dispatch is async; only the drain at the
        window boundary waits).  Equivalent to ``[predict(*p) for p in
        pairs]`` bit-for-bit — mixed shapes are fine (each bucket keeps
        its own compiled runner).  ``scene_ids``: optional per-scene
        labels for the tracker records.

        ``pack``: fleet-pack N same-bucket scenes' tiles into ONE
        device dispatch (grid mode only) — small scenes alone starve the
        optimal tile batch (a 512² scene yields 64 p64 tiles vs the
        measured-optimal 256), so packing restores the 8192²-class batch
        efficiency for fleets of city-sized scenes while keeping
        per-scene masks bit-identical to :meth:`predict` (per-tile math
        is batch-position-independent).  Scenes group by bucket; partial
        final packs pad with zero scenes.  ``pack="auto"`` picks, per
        bucket, the first pack that fills the tile batch
        (eval_batch_size // tiles-per-scene — the measured sweet spot;
        deeper packs only add latency, BASELINE.md pack-depth sweep).
        int8 composes (per-scene probes ride ahead of the packed
        dispatch).

        int8 pipelines too: the per-scene clip probe dispatches ahead of
        the scene and is checked after the scene's async dispatch, so
        scene forwards overlap back-to-back; only a cadence-due
        recalibration synchronizes.  The reference equivalent (inference
        loop over validation cities, train.py:177-205) is strictly
        sequential."""
        if self.multi_date:
            raise ValueError("predict_many serves bi-date pairs; use "
                             "predict_many_multidate for the T-date "
                             "variants")
        if pack:
            return self._predict_packed(pairs, pack, window,
                                        scene_ids, multidate=False)
        return self._predict_pipelined(
            pairs, window,
            dispatch=lambda p: self._dispatch(*p),
            dims_of=lambda p: p[0].shape[:2],
            crops_of=lambda p: self._calibration_crops(*p),
            scene_ids=scene_ids)

    def predict_multidate(self, scenes: np.ndarray,
                          scene_id: str | None = None) -> np.ndarray:
        """(T, H, W, C) date stack -> (H, W) uint8 change mask (the
        UNetLSTM / 3D U-Net serving path)."""
        if not self.multi_date:
            raise ValueError("predict_multidate requires a multi-date "
                             "model (cfg.model unet_lstm/unet3d)")
        t0 = time.perf_counter()
        if self.quant == "int8":
            probe = self._int8_scene_prologue(
                self._calibration_crops_multidate(scenes))
            self._int8_probe_check(probe, self._scenes_predicted)
        self._scenes_predicted += 1
        key = self._runner_key(*scenes.shape[1:3])
        fresh = key not in self._compiled
        mask, h, w = self._dispatch_multidate(scenes)
        out = np.asarray(mask)[:h, :w]
        self._record_scene(scene_id, (h, w), key, fresh,
                           time.perf_counter() - t0)
        return out

    def _dispatch_multidate(self, scenes):
        """Pad/upload/start one (T, H, W, C) scene run without waiting
        (the multi-date analogue of :meth:`_dispatch`)."""
        t, h, w = scenes.shape[:3]
        if self.fullconv_stream:
            run = self._get_runner(h, w)
            return self._run_guarded(run, scenes), h, w
        ph, pw = self._bucket_dims(h, w)
        if (ph, pw) != (h, w):
            pads = [(0, 0), (0, ph - h), (0, pw - w), (0, 0)]
            scenes = np.pad(scenes, pads, mode="edge")
        run = self._get_runner(ph, pw)
        return self._run_guarded(
            run, jnp.asarray(scenes, self.dtype)), h, w

    def predict_many_multidate(self, stacks, window: int = 2,
                               scene_ids=None, pack: int = 0) -> list:
        """Serve a sequence of (T, H, W, C) date stacks with cross-scene
        pipelining — the multi-date analogue of :meth:`predict_many`:
        bit-identical to ``[predict_multidate(s) for s in stacks]``, with
        up to ``window`` scenes in flight (int8 pipelines through the
        async clip probe, and ``pack`` fleet-packs same-bucket stacks
        into one dispatch, like predict_many)."""
        if not self.multi_date:
            raise ValueError("predict_many_multidate requires a "
                             "multi-date model; use predict_many for "
                             "bi-date pairs")
        if pack:
            return self._predict_packed(stacks, pack, window,
                                        scene_ids, multidate=True)
        return self._predict_pipelined(
            stacks, window,
            dispatch=self._dispatch_multidate,
            dims_of=lambda s: s.shape[1:3],
            crops_of=self._calibration_crops_multidate,
            scene_ids=scene_ids)

    def predict_city(self, city: str) -> np.ndarray:
        from fabric_tpu.data.oscd import load_city
        from fabric_tpu.infer.runner import scene_dims
        dims = scene_dims(self.cfg.dataset_dir, city, self.cfg)
        num_dates = self.cfg.num_dates if self.multi_date else 2
        stacked = load_city(self.cfg.dataset_dir, city, self.cfg,
                            out_shape=dims, num_dates=num_dates)
        if self.multi_date:
            return self.predict_multidate(np.asarray(stacked),
                                          scene_id=city)
        return self.predict(stacked[0], stacked[1], scene_id=city)
