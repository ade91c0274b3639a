"""Hyperparameter search maximizing validation change-class F1.

Replaces the reference's Polyaxon Bayesian-optimization group
(.polyaxon/.polyaxongroup — 16 iterations of UCB over lr∈[1e-3,1e-2],
tversky α∈[0,0.3], β∈[0.7,1], maximizing ``validate_cd_f1scores``) with a
local, dependency-free searcher: random search over the same box (the
robust default at this dimensionality) or an explicit grid, each trial a
full ``fabric_tpu.train.loop.train`` run, results streamed to JSONL.

Usage:
  python -m fabric_tpu.tools.tune --config metadata.json --trials 16
         [--epochs 5] [--search random|grid]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

SPACE = {  # the reference BO study's search box
    "learning_rate": (1e-3, 1e-2),
    "tversky_alpha": (0.0, 0.3),
    "tversky_beta": (0.7, 1.0),
}


def sample_params(rng: np.random.RandomState) -> dict:
    return {k: float(rng.uniform(lo, hi)) for k, (lo, hi) in SPACE.items()}


def grid_params(trials: int) -> list[dict]:
    per_axis = max(2, round(trials ** (1 / len(SPACE))))
    axes = {k: np.linspace(lo, hi, per_axis) for k, (lo, hi) in SPACE.items()}
    out = []
    for lr in axes["learning_rate"]:
        for a in axes["tversky_alpha"]:
            for b in axes["tversky_beta"]:
                out.append({"learning_rate": float(lr),
                            "tversky_alpha": float(a),
                            "tversky_beta": float(b)})
    return out


def run_search(base_cfg_dict: dict, trials: int = 16, search: str = "random",
               seed: int = 0, train_fn=None, log_path: str | None = None):
    """Returns (best_params, best_f1, all_results)."""
    from fabric_tpu.config import Config
    if train_fn is None:
        from fabric_tpu.train.loop import train as train_fn_  # noqa
        train_fn = train_fn_
    rng = np.random.RandomState(seed)
    candidates = (grid_params(trials)[:trials] if search == "grid"
                  else [sample_params(rng) for _ in range(trials)])
    results = []
    best, best_f1 = None, -1.0
    log = open(log_path, "a") if log_path else None
    for i, params in enumerate(candidates):
        cfg = Config.from_dict({**base_cfg_dict, **params,
                                "loss_function": "tversky"})
        _, history = train_fn(cfg, run_scene_inference=False)
        f1 = history["val"][-1]["cd_f1scores"] if history["val"] else 0.0
        rec = {"trial": i, **params, "validate_cd_f1scores": f1}
        results.append(rec)
        if log:
            log.write(json.dumps(rec) + "\n")
            log.flush()
        if f1 > best_f1:
            best, best_f1 = params, f1
    if log:
        log.close()
    return best, best_f1, results


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--trials", type=int, default=16)
    ap.add_argument("--search", choices=["random", "grid"], default="random")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log", default="tune_results.jsonl")
    args = ap.parse_args(argv)
    base = {}
    if args.config:
        with open(args.config) as fin:
            base.update(json.load(fin))
    if args.epochs:
        base["epochs"] = args.epochs
    best, best_f1, _ = run_search(base, args.trials, args.search, args.seed,
                                  log_path=args.log)
    print(json.dumps({"best_params": best,
                      "validate_cd_f1scores": best_f1}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
