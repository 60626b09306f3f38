#!/bin/bash
# Round-3 TPU measurement backlog — run when the tunnel recovers.
#
# Everything here was wired and CPU-parity-tested during the 2026-08-17/18
# axon outage (CLAUDE.md "Round-3 late-session notes"); this script captures
# the pending on-chip numbers in ONE serialized session (two TPU processes
# at once deadlock on this platform — never parallelize these steps).
#
# Usage: bash experiments/tpu_backlog.sh [results_log]
# Each step is bounded; a step that fails logs and continues so one
# regression doesn't block the rest of the capture.

set -u
cd "$(dirname "$0")/.."
LOG="${1:-experiments/tpu_backlog_results.log}"

step() {
    local name="$1"; shift
    echo "=== $name === $(date -u +%FT%TZ)" | tee -a "$LOG"
    timeout "$STEP_TIMEOUT" "$@" >> "$LOG" 2>&1
    local rc=$?
    echo "--- $name rc=$rc" | tee -a "$LOG"
}

echo "==== TPU backlog capture $(date -u) ====" | tee -a "$LOG"

# 0. bounded backend probe — bail early if the tunnel is still dead
STEP_TIMEOUT=360
step probe python -c "
from bench import _probe_backend
_probe_backend(attempts=1, probe_timeout=300)
print('backend ok')
"
grep -q "backend ok" "$LOG" || { echo "tunnel still down — aborting" | tee -a "$LOG"; exit 1; }

# 1. on-chip parity (megakernel / CCL) — the make-bench gate
STEP_TIMEOUT=1800
step tpu_parity env PLUMEKIT_RUN_TPU=1 python -m pytest tests/test_tpu_only.py -q -p no:cacheprovider --noconftest

# 2. headline bench at the measured optimum (4x8192² granules/program)
STEP_TIMEOUT=2400
step bench_default python bench.py

# 3. int8 serving headline — the round-3 2x-MXU lever, throughput pending
#    (quality already measured: IoU-free, BASELINE.md int8 row)
STEP_TIMEOUT=2400
step bench_int8 env PLUMEKIT_BENCH_INT8=1 python bench.py

# 4. int8 at overlap 0 (fast tiling): compounds with the 293.9 MPix/s row
STEP_TIMEOUT=2400
step bench_int8_fast env PLUMEKIT_BENCH_INT8=1 PLUMEKIT_BENCH_OVERLAP=0 python bench.py

# 5. quantized training transfers on the production loop (uint16/uint8
#    uploads vs fp32; capture harness from the round-3 queue)
STEP_TIMEOUT=2400
step quantize_transfer python experiments/loop_dispatch_bench.py --quantize

echo "==== backlog capture done $(date -u) ====" | tee -a "$LOG"
