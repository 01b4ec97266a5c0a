#!/usr/bin/env bash
# Round close gate: regenerate every machine-readable gate artifact
# AFTER the last registration, in dependency order. Run solo (the
# bench and variance legs are contention-sensitive).
#
#   bash tools/close_gate.sh            # full gate (~45 min)
#   bash tools/close_gate.sh --fast     # skip variance refresh
#
# Artifacts refreshed:
#   - pytest            (console)
#   - plan audit        (console; must end "0 flagged")
#   - CORRECTNESS_FULL.json   (full registry x sf0.001/0.01/0.1)
#   - BENCH_DETAIL.json + stdout bench record (regression flags)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -x -q

echo "== plan audit (sf0.001) =="
python tools/plan_audit.py --sf /root/testdata/sf0.001

echo "== full sweep: sf0.001 / sf0.01 / sf0.1 =="
python tools/full_sweep.py --sf /root/testdata/sf0.001
python tools/full_sweep.py --sf /root/testdata/sf0.01
python tools/full_sweep.py --sf /root/testdata/sf0.1

if [[ "${1:-}" != "--fast" ]]; then
  echo "== 3-run variance refresh =="
  python tools/bench_variance.py 3
fi

echo "== bench (sf0.1, regression-adjudicated) =="
python bench.py

echo "close gate complete"
