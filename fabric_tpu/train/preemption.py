"""Graceful preemption handling for the training driver.

TPU VMs broadcast maintenance events and preemptions as SIGTERM with a
grace window; a production trainer must convert that signal into a
consistent checkpoint and a clean exit so the rescheduled job resumes
exactly where it stopped.  The reference has no story here at all — a
signal kills the process and training restarts from scratch
(/root/reference/train.py:210-228 saves only on metric improvement and
has no resume path).

Design: the signal handler only sets a flag (async-signal-safe); the
training loop polls the flag at step boundaries, forces a mid-epoch
periodic checkpoint through the same sidecar machinery that powers
kill/resume fidelity (tests/test_midepoch_resume.py), and unwinds with
:class:`TrainingPreempted`.  ``train()`` catches it, marks the tracker
status ``preempted``, and returns normally — so wrappers (CLI, tuner
trials) exit 0 and a relaunch with ``resume=<weight_dir>`` reproduces
the uninterrupted trajectory bit-for-bit.

Multi-host note: cluster schedulers deliver the signal to every host, so
each process unwinds on its own flag; only process 0 writes the
checkpoint (the loop's primary gating), and the restart re-synchronizes
every process from that file.
"""

from __future__ import annotations

import logging
import signal
import threading

log = logging.getLogger("fabric_tpu")


class TrainingPreempted(Exception):
    """Raised inside the epoch loop once the preemption checkpoint is
    written; carries the state current at the unwind point."""

    def __init__(self, state=None, message: str = "training preempted"):
        super().__init__(message)
        self.state = state


class PreemptionGuard:
    """Flag-based signal latch.

    ``install()`` swaps in a handler that records the request;
    ``uninstall()`` restores whatever was there before.  Installation is
    only possible from the main thread (CPython restriction) — elsewhere
    the guard degrades to a manual latch driven by :meth:`request`,
    which schedulers with out-of-band notice channels (GCE metadata
    maintenance events, SLURM REQUEUE hooks) can call directly.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._event = threading.Event()
        self._previous: dict = {}
        self.installed = False

    # -- latch ------------------------------------------------------------
    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def request(self) -> None:
        """Manually latch a preemption (tests, external notice channels)."""
        self._event.set()

    # -- signal wiring ----------------------------------------------------
    def _handler(self, signum, frame) -> None:  # noqa: ARG002 (signal API)
        self._event.set()
        # re-entrant safe: logging from a handler is tolerated for a
        # once-per-run event; the message is the run's only breadcrumb if
        # the grace window expires before the checkpoint lands
        log.warning("signal %s received: checkpointing at the next step "
                    "boundary, then exiting cleanly", signum)

    def install(self) -> bool:
        """Returns True when handlers were installed (main thread only)."""
        if self.installed:
            return True
        try:
            for sig in self._signals:
                self._previous[sig] = signal.signal(sig, self._handler)
        except ValueError:  # not the main thread: manual latch mode
            for sig, old in self._previous.items():
                signal.signal(sig, old)
            self._previous.clear()
            return False
        self.installed = True
        return True

    def uninstall(self) -> None:
        if not self.installed:
            return
        for sig, old in self._previous.items():
            signal.signal(sig, old)
        self._previous.clear()
        self.installed = False
