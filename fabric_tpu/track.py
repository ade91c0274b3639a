"""Experiment tracking: a local JSONL/file backend replacing comet+polyaxon.

The reference logs through three channels (SURVEY.md §5): comet.ml
(per-batch metrics, figures, scene masks, status lifecycle), polyaxon
(per-epoch metrics), and stdout.  This tracker preserves *what* gets logged
with a pluggable local backend: metrics stream to ``metrics.jsonl``, images
to PNG files, figures via matplotlib when available, params and status to
JSON — all under one run directory, greppable and diffable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np

from fabric_tpu.utils.image import write_png, scale


class Tracker:
    def __init__(self, log_dir: str, run_name: str | None = None,
                 project: str | None = None):
        run_name = run_name or time.strftime(
            f"{project or 'run'}_%Y%m%d_%H%M%S")
        self.dir = os.path.join(log_dir, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self._metrics_file = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self.set_status("started")  # reference lifecycle: train.py:33,237-240

    def log_params(self, params: dict[str, Any]) -> None:
        with open(os.path.join(self.dir, "params.json"), "w") as fout:
            json.dump(params, fout, indent=2, default=str)

    def log_metrics(self, metrics: dict[str, Any], step: int | None = None,
                    prefix: str = "") -> None:
        rec = {("%s%s" % (prefix, k)): _jsonable(v) for k, v in metrics.items()}
        rec["_time"] = time.time()
        if step is not None:
            rec["_step"] = step
        self._metrics_file.write(json.dumps(rec) + "\n")
        self._metrics_file.flush()

    def log_image(self, name: str, array: np.ndarray,
                  rescale: bool = False) -> str:
        arr = np.asarray(array)
        if rescale:
            arr = scale(arr)
        path = os.path.join(self.dir, f"{name}.png")
        write_png(path, arr)
        return path

    def log_figure(self, name: str, img1, img2, groundtruth, prediction) -> str | None:
        """2x2 comparison figure (date1/date2/groundtruth/prediction),
        mirroring utils/helpers.py:176-208."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:  # pragma: no cover
            return None
        fig, axarr = plt.subplots(2, 2)
        for ax, (title, img) in zip(
                axarr.flat,
                [("Date 1", img1), ("Date 2", img2),
                 ("Groundtruth", groundtruth), ("Prediction", prediction)]):
            ax.set_title(title)
            ax.imshow(np.asarray(img))
            ax.set_xticks([]); ax.set_yticks([])
        path = os.path.join(self.dir, f"{name}.png")
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path

    def set_status(self, status: str) -> None:
        with open(os.path.join(self.dir, "status.json"), "w") as fout:
            json.dump({"status": status, "time": time.time()}, fout)

    def close(self) -> None:
        self._metrics_file.close()


class NullTracker:
    """Write-nothing Tracker used on non-primary processes of a multi-host
    run: every process computes metrics (they're replicated), but only
    process 0 may touch the shared filesystem (train/loop.py gates on
    parallel.distributed.is_primary)."""

    dir = None

    def log_params(self, params: dict[str, Any]) -> None:
        pass

    def log_metrics(self, metrics: dict[str, Any], step: int | None = None,
                    prefix: str = "") -> None:
        pass

    def log_image(self, name: str, array, rescale: bool = False) -> None:
        pass

    def log_figure(self, name: str, img1, img2, groundtruth,
                   prediction) -> None:
        pass

    def set_status(self, status: str) -> None:
        pass

    def close(self) -> None:
        pass


def _jsonable(v: Any):
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:
            pass
    if isinstance(v, (np.ndarray,)):
        return v.tolist()
    return v
