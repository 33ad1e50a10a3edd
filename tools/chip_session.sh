#!/bin/bash
# Round-4 chip-revalidation checklist (BENCH_NOTES "Round 4") in one
# command, for the next window where the axon relay is alive. STRICTLY
# sequential — never two TPU jobs at once (CLAUDE.md: a concurrent job or
# a killed profiler can brick the relay for the whole session).
#
#   bash tools/chip_session.sh          # logs to chip_session_<sha>.log
#
# Each step is individually timed out so one hang cannot eat the window;
# continue-on-error so a single failure still leaves the rest captured.
set -u
cd "$(dirname "$0")/.."
SHA=$(git rev-parse --short HEAD)
LOG="chip_session_${SHA}_$(date +%m%d_%H%M).log"
run() {
    echo "=== [$(date +%H:%M:%S)] $*" | tee -a "$LOG"
    timeout "$1" "${@:2}" 2>&1 | tee -a "$LOG"
    # PIPESTATUS[0]: $? alone would record tee's rc (always 0), hiding a
    # failed or timed-out step from the scarce live-chip window's log.
    echo "=== rc=${PIPESTATUS[0]} ===" | tee -a "$LOG"
}
echo "chip session at HEAD=$SHA -> $LOG" | tee -a "$LOG"

# 1. The official artifact + pack/H2D A/B decomposition (BENCH_r04 shape).
run 3600 python bench.py

# 2. Native serving stack at HEAD: export + per-program byte-exact + e2e
#    pixel-exact (needs the native build; serving_check orchestrates).
run 3600 python tools/serving_check.py --birefnet general:1024

# 3. Encoder table (plain + the w8a8 re-measure with round-3/4 kernels).
run 3600 python tools/tpu_microbench.py encoders
run 3600 python tools/tpu_microbench.py encoders --quant w8a8

# 4. BiRefNet per-stage ledger at 1024 AND 2048 (the 6.9x question).
run 5400 python tools/tpu_microbench.py birefnet-stages

# 5. Batch/throughput refresh (BASELINE configs 3/5).
run 3600 python tools/tpu_microbench.py batch

echo "DONE — write 'HEAD revalidated at ${SHA}' + numbers into BENCH_NOTES.md" | tee -a "$LOG"
