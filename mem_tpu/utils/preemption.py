"""Graceful-preemption handling for the training loops.

The reference's only failure story is restart-based recovery: rerun the
sbatch and ``--auto_resume`` picks up the newest checkpoint (SURVEY §5.3),
losing up to ``save_ckpt_freq`` epochs of work on every preemption. Here a
SIGTERM/SIGINT (what SLURM/GKE/Borg send before killing a pod) sets a flag;
the loop finishes the step in flight, saves a resumable checkpoint, and
exits 0 — so the requeued job continues from the interrupted epoch instead
of the last periodic save.

Usage:
    stopper = GracefulShutdown()
    for epoch in ...:
        for step, batch in ...:
            ...
            if stopper.requested:
                break
        if stopper.requested:
            save_checkpoint(...)   # tagged with the current epoch
            print("preempted: checkpoint saved; exiting for requeue")
            return
"""
from __future__ import annotations

import signal


class GracefulShutdown:
    """Latches SIGTERM (and optionally SIGINT) into a poll-able flag."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self.requested = False
        self._previous = {}
        for s in signals:
            try:
                self._previous[s] = signal.signal(s, self._handler)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass

    def _handler(self, signum, frame):
        self.requested = True

    def restore(self):
        for s, h in self._previous.items():
            signal.signal(s, h)
