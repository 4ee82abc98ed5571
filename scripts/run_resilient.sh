#!/usr/bin/env bash
# Relaunch-on-recycle wrapper for long training runs.
#
# Reruns the given command while it exits with the memory-recycle code
# (mem_tpu.utils.preemption.RESTART_EXIT_CODE = 3, produced by
# --rss_restart_gb when host RSS crosses the threshold at an epoch
# boundary after saving a resumable checkpoint). Any other exit code —
# 0 (done / graceful SIGTERM preemption) or an error — passes through.
#
# Usage: scripts/run_resilient.sh python -m mem_tpu.cli.run_mem_pretraining \
#            --rss_restart_gb 12 --auto_resume 1 ...
set -u
while true; do
  "$@"
  rc=$?
  if [ "$rc" -ne 3 ]; then
    exit "$rc"
  fi
  echo "[run_resilient] memory recycle (rc=3) — relaunching" >&2
done
