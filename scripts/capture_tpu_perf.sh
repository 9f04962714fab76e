#!/bin/bash
# One-shot perf capture for a healthy-TPU window (CLAUDE.md: the axon
# backend flaps; run this as soon as a probe succeeds). Each step is
# budget-bounded; results land in the log + BENCH_partial.json.
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_capture.log}
{
  date
  timeout 480 python scripts/perf_16c32.py matvec
  timeout 480 python scripts/perf_16c32.py batched
  timeout 480 python scripts/perf_16c32.py multichain4x4
  timeout 900 python bench.py
  date
} >> "$LOG" 2>&1
tail -20 "$LOG"
