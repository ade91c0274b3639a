"""``python -m fabric_tpu.cli.infer --config metadata.json --resume <ckpt>
[--city <name> ...]``

Standalone whole-scene inference: loads a checkpoint, tiles each requested
city scene (default: validation_cities), predicts, and writes
``<city>_mask.png`` change rasters — the reference only offered this inside
the training loop (train.py:177-205).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    argv = sys.argv[1:] if argv is None else argv
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--city", action="append", default=None)
    extra.add_argument("--output_dir", type=str, default=".")
    extra.add_argument("--bundle", type=str, default=None,
                       help="serve from a tools/export.py bundle instead "
                            "of a checkpoint")
    extra.add_argument("--quant", choices=["none", "int8"], default=None,
                       help="int8 = post-training-quantized serving "
                            "(unless the bundle carries scales, it "
                            "calibrates once on the FIRST scene and "
                            "reuses those scales for later cities); "
                            "none = force exact bf16 even for an int8 "
                            "bundle; unset = follow the bundle")
    extra.add_argument("--overlap_band_rows", type=int, default=0,
                       help="overlap mode (infer_overlap > 0) on the fast "
                            "serving path: accumulate in bands of N tile "
                            "rows for bounded memory on large scenes "
                            "(the unbanded overlap path OOMs around "
                            "8192²/overlap 32 on a 16 GB chip)")
    extra.add_argument("--fullconv_band_rows", type=int, default=0,
                       help="seamless fully-convolutional serving: run "
                            "the net over halo-extended bands of N pixel "
                            "rows (infer/fullconv.py) — no tiling, no "
                            "seams, every pixel predicted once with its "
                            "full receptive field; 0 = off")
    extra.add_argument("--fullconv_stream", action="store_true",
                       help="with --fullconv_band_rows: stream each band "
                            "from host memory instead of placing the "
                            "scene in HBM — device footprint is one band "
                            "regardless of scene size (single-chip "
                            "serving of scenes bounded only by host "
                            "storage)")
    extra.add_argument("--shard_scene", action="store_true",
                       help="distribute each scene as H-bands over the "
                            "mesh 'data' axis (per-device memory ~1/N; "
                            "infer/sharded_scene.py) — grid mode, or "
                            "seamless sharded fullconv when combined "
                            "with --fullconv_band_rows (halo exchange "
                            "over ICI)")
    extra.add_argument("--bucket", type=int, default=512,
                       help="scene dims pad up to multiples of this "
                            "(compile reuse across scene shapes; must "
                            "match the exporting --aot_bucket when "
                            "serving an AOT artifact)")
    extra.add_argument("--aot_dir", type=str, default=None,
                       help="serve from an ahead-of-time artifact "
                            "(infer/aot.py export_aot): scene runners "
                            "load as frozen StableHLO — no tracing or "
                            "lowering at serving time; masks are "
                            "bit-identical to the in-process path")
    extra.add_argument("--pack", default=0,
                       type=lambda s: s if s == "auto" else int(s),
                       help="fleet-pack N same-bucket scenes' tiles into "
                            "one device dispatch (grid mode; "
                            "ScenePredictor.predict_many(pack=N)) — "
                            "small city scenes alone starve the optimal "
                            "tile batch; measured 79.9 vs 33.7 Mpx/s at "
                            "512² on the v5e (BASELINE.md).  'auto' "
                            "picks, per bucket, the first pack that "
                            "fills the tile batch.  Masks are "
                            "bit-identical to unpacked serving")
    extra.add_argument("--no_tracker", action="store_true",
                       help="disable the serving metrics stream (by "
                            "default every served scene writes a "
                            "serve_* record — dims, bucket, compile-or-"
                            "cached, wall ms, Mpx/s, quant/clip state — "
                            "to <log_dir>/<run>/metrics.jsonl)")
    own, rest = extra.parse_known_args(argv)

    from fabric_tpu.config import load_config

    cfg = load_config(argv=rest)
    if not cfg.resume and not own.bundle:
        print("error: --resume <checkpoint> is required "
              "(or --bundle for the serving path)", file=sys.stderr)
        return 2
    tracker = None
    if not own.no_tracker:
        # serving observability (the reference logged every scene to its
        # experiment tracker, utils/inference.py:107-131): per-scene
        # serve_* records stream to <log_dir>/<run>/metrics.jsonl;
        # created only after argument validation, and every exit path
        # below closes it with a terminal status — a run left 'started'
        # means the process died, exactly like the reference lifecycle
        from fabric_tpu.track import Tracker
        tracker = Tracker(cfg.log_dir, project="serve")
        logging.info("serving metrics -> %s/metrics.jsonl", tracker.dir)
    try:
        return _serve(own, cfg, tracker)
    except BaseException:
        if tracker is not None:
            tracker.set_status("failed")
            tracker.close()
        raise


def _serve(own, cfg, tracker) -> int:
    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.infer.runner import infer_city
    from fabric_tpu.models import build_model
    from fabric_tpu.parallel.mesh import make_mesh_from_config
    from fabric_tpu.train.state import create_state
    from fabric_tpu.train.steps import make_infer_step, make_infer_probs_step
    from fabric_tpu.utils.image import write_png

    fast = (own.bundle is not None or own.quant == "int8"
            or own.overlap_band_rows > 0 or own.fullconv_band_rows > 0
            or own.fullconv_stream or own.shard_scene
            or own.aot_dir is not None or bool(own.pack))
    if fast:
        # fast serving path: ScenePredictor (BN-folded, split-concat,
        # optional int8, bucketed compile reuse, best-metric checkpoint,
        # mesh-sharded tile batches) instead of the reference-shaped
        # step runner
        from fabric_tpu.data.download import ensure_dataset
        from fabric_tpu.infer.service import ScenePredictor
        cfg.dataset_dir = ensure_dataset(cfg)
        mesh = (None if own.overlap_band_rows or own.aot_dir or own.pack
                or (own.fullconv_band_rows and not own.shard_scene)
                else make_mesh_from_config(cfg))
        pred = ScenePredictor(cfg, checkpoint=cfg.resume or None,
                              bundle=own.bundle, quant=own.quant,
                              bucket=own.bucket,
                              mesh=mesh, shard_scene=own.shard_scene,
                              overlap_band_rows=own.overlap_band_rows,
                              fullconv_band_rows=own.fullconv_band_rows,
                              fullconv_stream=own.fullconv_stream,
                              aot_dir=own.aot_dir, tracker=tracker)
        predict_city = pred.predict_city
    else:
        # reference-shaped step runner (bit-exact tiling semantics)
        if os.path.isdir(cfg.resume):
            # inference wants the BEST-metric weights, not a possibly-newer
            # mid-epoch periodic save; fall back to latest for old run dirs
            best = ckpt.read_pointer(cfg.resume, "best")
            if best:
                cfg.resume = best
                logging.info("using best-metric checkpoint %s", best)
        from fabric_tpu.data.download import ensure_dataset
        cfg.dataset_dir = ensure_dataset(cfg)
        mesh = make_mesh_from_config(cfg)
        model = build_model(cfg)
        state = create_state(cfg, model)
        state, _, _ = ckpt.resume_if_requested(cfg, state)
        infer_step = make_infer_step(model)
        prob_step = make_infer_probs_step(model)

        def predict_city(city):
            import time
            t0 = time.perf_counter()
            mask = infer_city(infer_step, state, cfg, city, mesh=mesh,
                              prob_step=prob_step)
            if tracker is not None:
                wall = time.perf_counter() - t0
                h, w = mask.shape[:2]
                tracker.log_metrics(
                    {"scene": city, "height": h, "width": w,
                     "wall_ms": round(wall * 1000.0, 2),
                     "mpx_per_sec": round(h * w / wall / 1e6, 3),
                     "mode": "reference_grid", "quant": "none"},
                    prefix="serve_")
            return mask

    cities = own.city or cfg.validation_cities
    os.makedirs(own.output_dir, exist_ok=True)
    if own.pack:
        # fleet-packed serving: scenes stream into the packer lazily —
        # a city loads only when its pack has room, so host memory holds
        # the open packs + in-flight window, not the whole fleet (masks
        # bit-identical to the per-city path)
        import numpy as np

        from fabric_tpu.data.oscd import load_city
        from fabric_tpu.infer.runner import scene_dims
        num_dates = cfg.num_dates if pred.multi_date else 2

        def _load(city):
            dims = scene_dims(cfg.dataset_dir, city, cfg)
            stacked = load_city(cfg.dataset_dir, city, cfg,
                                out_shape=dims, num_dates=num_dates)
            return (np.asarray(stacked) if pred.multi_date
                    else (stacked[0], stacked[1]))

        items = (_load(city) for city in cities)
        if pred.multi_date:
            masks = pred.predict_many_multidate(items, pack=own.pack,
                                                scene_ids=list(cities))
        else:
            masks = pred.predict_many(items, pack=own.pack,
                                      scene_ids=list(cities))
        results = zip(cities, masks)
    else:
        results = ((city, predict_city(city)) for city in cities)
    for city, mask in results:
        out = os.path.join(own.output_dir, f"{city}_mask.png")
        write_png(out, mask * 255)
        logging.info("wrote %s (%dx%d, %.2f%% change)", out,
                     mask.shape[0], mask.shape[1], 100.0 * mask.mean())
    if tracker is not None:
        tracker.set_status("succeeded")
        tracker.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
