"""Tracing / profiling utilities (SURVEY.md §5: the reference has none —
only cluster-side gpustat; here profiling is first-class).

- ``trace(logdir)``: context manager around jax.profiler for XLA/TPU traces
  viewable in TensorBoard/Perfetto.
- ``StepTimer``: per-step wall-clock accounting with device-sync-aware
  throughput (works around block_until_ready being unreliable over the
  axon tunnel by syncing through a tiny D2H reduction).
- ``annotate``: named trace spans for host-side phases.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax profiler trace into ``logdir`` (TensorBoard format)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def sync(x) -> None:
    """Force completion of device work feeding ``x``.

    ``block_until_ready`` is a no-op over some remote-device transports
    (observed on the axon tunnel), so reduce to a scalar and pull it.
    """
    import jax.numpy as jnp
    leaf = x
    if isinstance(x, (list, tuple, dict)):
        import jax
        leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


class StepTimer:
    """Accumulates step wall-clock; reports steps/sec and examples/sec."""

    def __init__(self) -> None:
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self, batch_size: int | None = None,
                skip_first: int = 1) -> dict:
        times = self.times[skip_first:] or self.times
        if not times:
            return {}
        mean = float(np.mean(times))
        out = {"steps": len(self.times), "mean_step_s": mean,
               "p50_step_s": float(np.percentile(times, 50)),
               "p95_step_s": float(np.percentile(times, 95)),
               "steps_per_sec": 1.0 / mean if mean else 0.0}
        if batch_size:
            out["examples_per_sec"] = batch_size / mean if mean else 0.0
        return out
