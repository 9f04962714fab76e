#!/bin/bash
# One-shot perf capture for a healthy-TPU window (CLAUDE.md: the axon
# backend flaps; run this as soon as a probe succeeds). Each step is
# budget-bounded with `timeout -k` — processes stuck on the axon
# backend ignore SIGTERM (CLAUDE.md), so escalate to SIGKILL.
# Results land in the log + BENCH_partial.json. For unattended capture
# across flap windows prefer scripts/tpu_watcher.sh.
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_capture.log}
{
  date
  timeout -k 30 300 python scripts/hbm_bandwidth.py
  timeout -k 30 480 python scripts/perf_16c32.py matvec
  timeout -k 30 480 python scripts/perf_16c32.py batched
  timeout -k 30 480 python scripts/perf_16c32.py multichain4x4
  timeout -k 30 900 python bench.py
  date
} >> "$LOG" 2>&1
tail -20 "$LOG"
