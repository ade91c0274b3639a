"""Validate the int8 serving path against exact bf16 on real scenes.

The runbook's rule for `--quant int8` is "validate on a held-out city
before enabling in production" — this tool IS that validation: for each
requested city it predicts the full scene with the exact bf16 predictor
and the int8 predictor (same weights, same tiling), then reports
per-city change-class F1 against ground truth for both, the F1 delta,
and the pixel mask agreement.  One JSON line per city + a summary line.

Exit code is 1 if any city's F1 delta is worse than ``--max_f1_drop``
(default 0.01 — the project's "within 1%" accuracy budget), so this can
gate a deployment pipeline.

Usage:
  python -m fabric_tpu.tools.validate_int8 --config metadata.json \
      --resume ./outputs [--city X ...] [--max_f1_drop 0.01]
"""

from __future__ import annotations

import json

import numpy as np


def _scene_f1(mask: np.ndarray, label: np.ndarray) -> float:
    from fabric_tpu.metrics import prf1_from_counts
    tp = int(np.sum((mask == 1) & (label == 1)))
    fp = int(np.sum((mask == 1) & (label == 0)))
    fn = int(np.sum((mask == 0) & (label == 1)))
    return prf1_from_counts({"tp": tp, "fp": fp, "fn": fn})[2]


def validate(cfg, cities=None, max_f1_drop: float = 0.01,
             bundle: str | None = None,
             min_agreement: float = 0.95) -> tuple[list[dict], bool]:
    """-> (per-city reports, ok).  ``ok`` is False if any city's int8 F1
    drops more than ``max_f1_drop`` below bf16, OR its pixel mask
    agreement falls below ``min_agreement`` — the agreement gate also
    covers cities whose label raster mismatches the scene dims (which
    would otherwise be exempt from the F1 gate entirely)."""
    from fabric_tpu.data.oscd import load_label
    from fabric_tpu.infer.service import ScenePredictor

    cities = cities or cfg.validation_cities
    if bundle:
        # bundles always carry the folded params, so both predictors can
        # come from the same artifact
        exact = ScenePredictor(cfg, bundle=bundle, quant="none")
        q = ScenePredictor(cfg, bundle=bundle, quant="int8")
    else:
        exact = ScenePredictor(cfg, checkpoint=cfg.resume, quant="none")
        q = ScenePredictor(cfg, checkpoint=cfg.resume, quant="int8")

    reports, ok = [], True
    for city in cities:
        m_ref = exact.predict_city(city)
        m_q = q.predict_city(city)
        agree = float((m_ref == m_q).mean())
        rep = {"city": city, "mask_agreement": round(agree, 5)}
        if q.last_clip_report:
            # per-city activation-range overflow vs the calibration scene
            # (ScenePredictor's clip probe; >1 means silent clipping)
            rep["clip_overflow_ratio"] = round(
                max(q.last_clip_report.values()), 4)
        fail = agree < min_agreement
        label = load_label(cfg.dataset_dir, city)
        if label.shape == m_ref.shape:
            f1_ref = _scene_f1(m_ref, label)
            f1_q = _scene_f1(m_q, label)
            rep.update({"f1_bf16": round(f1_ref, 5),
                        "f1_int8": round(f1_q, 5),
                        "f1_delta": round(f1_q - f1_ref, 5)})
            fail = fail or (f1_ref - f1_q > max_f1_drop)
        else:
            rep["note"] = ("label shape mismatch; gated on mask "
                           "agreement only")
        rep["verdict"] = "FAIL" if fail else "ok"
        ok = ok and not fail
        reports.append(rep)
    return reports, ok


def main(argv=None) -> int:
    import argparse
    import sys

    from fabric_tpu.config import load_config

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0],
                                 add_help=False)
    ap.add_argument("--city", action="append", default=None)
    ap.add_argument("--max_f1_drop", type=float, default=0.01)
    ap.add_argument("--min_agreement", type=float, default=0.95)
    ap.add_argument("--bundle", type=str, default=None)
    own, rest = ap.parse_known_args(
        sys.argv[1:] if argv is None else argv)
    cfg = load_config(argv=rest)
    if not cfg.resume and not own.bundle:
        ap.error("--resume or --bundle is required")
    from fabric_tpu.data.download import ensure_dataset
    cfg.dataset_dir = ensure_dataset(cfg)
    reports, ok = validate(cfg, own.city, own.max_f1_drop, own.bundle,
                           min_agreement=own.min_agreement)
    for r in reports:
        print(json.dumps(r))
    print(json.dumps({"summary": "ok" if ok else "FAIL",
                      "cities": len(reports),
                      "max_f1_drop": own.max_f1_drop,
                      "min_agreement": own.min_agreement}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
