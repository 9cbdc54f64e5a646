#!/bin/sh
# Release gate: fast suite + slow suite + multichip dryrun in one command.
# Run before any bench milestone (README cadence); tee the output into
# bench_logs/ for the round's evidence trail, e.g.:
#   sh tools/release_check.sh 2>&1 | tee bench_logs/r4_release_check.log
# Keep the TPU chip idle while this runs: the suites force the CPU
# backend, but they occupy both host cores (CLAUDE.md compile gotcha).
set -e
cd "$(dirname "$0")/.."

echo "== fast suite =="
python -m pytest tests/ -q

echo "== slow suite (production unrolls, multi-minute XLA:CPU compiles) =="
python -m pytest tests/ -q -m slow

echo "== multichip dryrun (8 virtual devices) =="
JAX_PLATFORMS=cpu python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun_multichip(8) ok')
"

echo "== release check: ALL GREEN =="
