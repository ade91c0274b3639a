"""``python -m fabric_tpu.cli.evaluate --config metadata.json --resume <dir>
[--city <name> ...] [--no_scene] [--output metrics.json]``

Standalone checkpoint evaluation: patch-level validation metrics (the
reference's mean-of-per-batch cd_precisions/recalls/f1scores plus global
confusion-matrix P/R/F1) and per-city whole-scene F1 against the ground
truth — without re-entering the training driver.  The reference could only
produce these inside its epoch loop (/root/reference/train.py:125-205).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    argv = sys.argv[1:] if argv is None else argv
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--city", action="append", default=None,
                       help="city to evaluate (repeatable; default: "
                            "validation_cities)")
    extra.add_argument("--no_scene", action="store_true",
                       help="skip whole-scene inference, patch metrics only")
    extra.add_argument("--output", type=str, default=None,
                       help="also write the metrics dict to this JSON file")
    own, rest = extra.parse_known_args(argv)

    from fabric_tpu import checkpoint as ckpt
    from fabric_tpu.config import load_config
    from fabric_tpu.evaluate import evaluate

    cfg = load_config(argv=rest)
    if not cfg.resume:
        print("error: --resume <checkpoint file or run dir> is required",
              file=sys.stderr)
        return 2
    import os
    if os.path.isdir(cfg.resume):
        # evaluation wants the BEST-metric weights, not a possibly-newer
        # mid-epoch periodic save (same policy as cli.infer)
        best = ckpt.read_pointer(cfg.resume, "best")
        if best:
            cfg.resume = best
            logging.info("using best-metric checkpoint %s", best)

    result = evaluate(cfg, cities=own.city,
                      run_scene_inference=not own.no_scene)
    if own.output:
        with open(own.output, "w") as f:
            json.dump(result, f, indent=2, sort_keys=True)
        logging.info("wrote %s", own.output)
    print(json.dumps(result, indent=2, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
