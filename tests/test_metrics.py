"""Metric tests: confusion counts vs sklearn, reference aggregation."""

import numpy as np
import jax.numpy as jnp

from fabric_tpu import metrics


def test_confusion_counts_vs_sklearn():
    from sklearn.metrics import precision_recall_fscore_support as prfs
    rng = np.random.RandomState(0)
    preds = rng.randint(0, 2, size=(4, 16, 16))
    labels = rng.randint(0, 2, size=(4, 16, 16))
    counts = {k: int(v) for k, v in
              metrics.confusion_counts(jnp.array(preds), jnp.array(labels)).items()}
    p, r, f1 = metrics.prf1_from_counts(counts)
    ep, er, ef1, _ = prfs(labels.flatten(), preds.flatten(),
                          average="binary", pos_label=1)
    assert np.isclose(p, ep) and np.isclose(r, er) and np.isclose(f1, ef1)


def test_zero_division_semantics():
    preds = np.zeros((2, 4, 4), np.int32)
    labels = np.zeros((2, 4, 4), np.int32)
    counts = metrics.confusion_counts(jnp.array(preds), jnp.array(labels))
    p, r, f1 = metrics.prf1_from_counts({k: int(v) for k, v in counts.items()})
    assert p == 0.0 and r == 0.0 and f1 == 0.0
    assert metrics.accuracy_pct({k: int(v) for k, v in counts.items()}) == 100.0


def test_accumulator_mean_of_batches():
    acc = metrics.MetricAccumulator()
    acc.update(1.0, {"tp": 10, "fp": 0, "fn": 0, "tn": 10})   # P=R=F1=1
    acc.update(3.0, {"tp": 0, "fp": 10, "fn": 10, "tn": 0})   # P=R=F1=0
    m = acc.means()
    assert np.isclose(m["cd_losses"], 2.0)
    assert np.isclose(m["cd_f1scores"], 0.5)  # mean of per-batch F1s
    assert np.isclose(m["cd_precisions"], 0.5)
    g = acc.global_prf1()
    # globally: tp=10, fp=10, fn=10 -> P=R=0.5, F1=0.5
    assert np.isclose(g["global_f1"], 0.5)
    assert len(acc) == 2
