"""Metrics: jittable confusion counts + reference-compatible aggregation.

The reference computes, per batch, sklearn binary precision/recall/F1 with
``pos_label=1`` on flattened predictions (train.py:103-106) — forcing a
device→host sync every batch — plus a pixel-accuracy percentage
(train.py:96-101), and reports the *arithmetic mean over batches* of those
per-batch values (utils/helpers.py:24-89).  That mean-of-per-batch-F1 is NOT
the global confusion-matrix F1; parity requires reproducing it exactly.

TPU-native design: the per-batch confusion counts (tp/fp/fn/tn) are computed
on-device inside the jitted step (integer reductions, fused by XLA into the
step — no host sync), and only tiny count scalars come back to the host where
the P/R/F1 ratios and the reference aggregation are applied.  A global
confusion-matrix aggregation is also provided (the statistically sound one).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def confusion_counts(preds: Array, labels: Array,
                     weights: Array | None = None) -> dict[str, Array]:
    """tp/fp/fn/tn for the binary change class (1). Jittable; int32 scalars.

    ``weights`` is an optional per-sample (N,) vector; samples with weight 0
    (mask-padded eval batches) are excluded from every count.
    """
    p = preds.astype(jnp.int32)
    l = labels.astype(jnp.int32)  # noqa: E741
    pp = p == 1
    pl = l == 1
    if weights is not None:
        valid = (jnp.asarray(weights) > 0).reshape(
            weights.shape + (1,) * (labels.ndim - 1))
        valid = jnp.broadcast_to(valid, labels.shape)
    else:
        valid = jnp.ones(labels.shape, bool)
    tp = jnp.sum(pp & pl & valid, dtype=jnp.int32)
    fp = jnp.sum(pp & ~pl & valid, dtype=jnp.int32)
    fn = jnp.sum(~pp & pl & valid, dtype=jnp.int32)
    tn = jnp.sum(~pp & ~pl & valid, dtype=jnp.int32)
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn}


def accuracy_pct(counts: dict) -> float:
    """100 * correct / total — the reference's cd_corrects (train.py:96-101)."""
    tp, fp, fn, tn = (float(counts[k]) for k in ("tp", "fp", "fn", "tn"))
    total = tp + fp + fn + tn
    return 100.0 * (tp + tn) / total if total else 0.0


def prf1_from_counts(counts: dict) -> tuple[float, float, float]:
    """Binary precision/recall/F1 with sklearn zero-division→0 semantics."""
    tp, fp, fn = (float(counts[k]) for k in ("tp", "fp", "fn"))
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) > 0 else 0.0)
    return precision, recall, f1


class MetricAccumulator:
    """Reference-compatible epoch metrics.

    Keys match utils/helpers.py:24-42 (cd_losses, cd_corrects, cd_precisions,
    cd_recalls, cd_f1scores); ``means()`` is the mean-of-per-batch aggregation
    of utils/helpers.py:45-59.  Global confusion-matrix P/R/F1 is additionally
    exposed via ``global_prf1()``.
    """

    def __init__(self) -> None:
        self.lists: dict[str, list[float]] = {
            "cd_losses": [], "cd_corrects": [], "cd_precisions": [],
            "cd_recalls": [], "cd_f1scores": [],
        }
        self._sums = {k: 0.0 for k in self.lists}
        self._n = 0
        self._tp = self._fp = self._fn = self._tn = 0

    def update(self, loss: float, counts: dict) -> None:
        counts = {k: int(v) for k, v in counts.items()}
        precision, recall, f1 = prf1_from_counts(counts)
        values = {"cd_losses": float(loss),
                  "cd_corrects": accuracy_pct(counts),
                  "cd_precisions": precision,
                  "cd_recalls": recall,
                  "cd_f1scores": f1}
        for k, v in values.items():
            self.lists[k].append(v)
            self._sums[k] += v
        self._n += 1
        self._tp += counts["tp"]
        self._fp += counts["fp"]
        self._fn += counts["fn"]
        self._tn += counts["tn"]

    def means(self) -> dict[str, float]:
        # O(1) running means (this is called per batch when streaming)
        if not self._n:
            return {k: 0.0 for k in self.lists}
        return {k: s / self._n for k, s in self._sums.items()}

    def global_prf1(self) -> dict[str, float]:
        counts = {"tp": self._tp, "fp": self._fp, "fn": self._fn, "tn": self._tn}
        precision, recall, f1 = prf1_from_counts(counts)
        return {"global_precision": precision, "global_recall": recall,
                "global_f1": f1, "global_accuracy": accuracy_pct(counts)}

    def __len__(self) -> int:
        return len(self.lists["cd_losses"])
