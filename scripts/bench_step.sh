#!/bin/bash
# Watcher step wrapper: bench.py always exits 0 (it must always print
# one JSON line), so gate the step's "done" marker on a complex64 tier
# having actually landed in BENCH_partial.json.
cd "$(dirname "$0")/.."
env BENCH_DEADLINE_S=${BENCH_DEADLINE_S:-1020} python bench.py
python - <<'EOF'
import json, sys
try:
    d = json.load(open("BENCH_partial.json"))
except Exception:
    sys.exit(1)
sys.exit(0 if ("tier1" in d or "tier2" in d) else 1)
EOF
