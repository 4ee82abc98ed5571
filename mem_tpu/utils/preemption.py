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

# Exit code for the RSS-watchdog recycle path: the loop saved a resumable
# checkpoint and wants to be RELAUNCHED (scripts/run_resilient.sh loops
# while it sees this code). Distinct from 0 (done / graceful preemption)
# and 1 (error).
RESTART_EXIT_CODE = 3


def rss_gb() -> float:
    """Resident set size of this process in GB (psutil)."""
    import psutil

    return psutil.Process().memory_info().rss / 1e9


def validate_rss_flag(limit_gb: float) -> None:
    """Fail fast at startup when --rss_restart_gb is enabled but psutil is
    unavailable — otherwise the ModuleNotFoundError would only surface at
    the first epoch boundary, hours into a run, with a non-RESTART exit
    code that makes run_resilient.sh give up."""
    if limit_gb and limit_gb > 0:
        try:
            rss_gb()
        except ImportError as e:
            raise SystemExit(
                f"--rss_restart_gb {limit_gb} needs psutil, which failed to "
                f"import: {e}") from e


def rss_recycle_due(limit_gb: float) -> bool:
    """True when the memory-recycle watchdog should trigger.

    Why this exists: some runtime environments leak host memory per
    host->device transfer OUTSIDE this codebase's control (measured on this
    dev box's remote-TPU tunnel client: ~25 MB leaked per ``device_put`` of
    a 23 MB batch, unconditional — unaffected by ``.delete()``,
    ``jax.clear_caches()`` or gc; the CPU backend is flat over 60 epochs,
    so the framework itself does not leak — docs/PERF.md round-3 endurance
    section). The production-pattern quarantine is checkpoint + process
    recycle: the loop saves a resumable checkpoint and exits with
    ``RESTART_EXIT_CODE``; ``scripts/run_resilient.sh`` relaunches, and
    ``--auto_resume`` continues the run with a fresh process image.

    Multi-process runs AGREE on the decision (allgather of the max RSS):
    if one process tripped alone it would enter the multi-host checkpoint
    save — which every process must join — while its peers sit in the next
    epoch's collectives: distributed deadlock. With the agreed max-RSS
    predicate, either all processes save+exit(3) together
    (run_resilient.sh relaunches them as a group) or none do.
    """
    if not (limit_gb and limit_gb > 0):
        return False
    mine = rss_gb()
    import jax

    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        mine = float(multihost_utils.process_allgather(
            np.float32(mine)).max())
    return mine > limit_gb


class GracefulShutdown:
    """Latches SIGTERM (and optionally SIGINT) into a poll-able flag.

    Adopts any signal already latched by :mod:`mem_tpu._signals` (the
    stdlib-only early latch the CLIs install before importing jax), so a
    SIGTERM that lands during setup/first-compile is not lost.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        from mem_tpu import _signals

        self.requested = _signals.pending()
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
