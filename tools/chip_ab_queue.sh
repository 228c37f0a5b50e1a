#!/bin/bash
# Round-3 chip A/B queue — run top to bottom on the real chip the moment
# the tunnel answers; every step logs to $OUT and failures don't stop the
# rest. Priorities: (1) confirm the shipping 255 seg/s baseline, (2) A/B
# the staged backward VMEM diet (branch staged/bwd-vmem-diet) at the
# tower level, (3) full-step backend A/Bs, (4) serving decode check.
set -u
OUT=${OUT:-/tmp/chip_ab}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name: $* (timeout ${t}s) $(date)" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "--- $name exit=$? $(date)" | tee -a "$OUT/queue.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue.log"
}

# 1. shipping baseline (vit_pallas default) — expect ~255 seg/s/chip
run bench_default 1800 python bench.py

# 2. tower A/B on MAIN (chip-validated kernel)
run towers_main_pallas 1200 python tools/bench_attn_towers.py pallas all
run towers_main_xla 1200 python tools/bench_attn_towers.py xla all

# 3. tower A/B on the staged VMEM-diet branch (worktree; main untouched)
git worktree add -f /tmp/diet_wt staged/bwd-vmem-diet 2>> "$OUT/queue.log"
( cd /tmp/diet_wt && \
  timeout 1200 python tools/bench_attn_towers.py pallas all \
    > "$OUT/towers_diet_pallas.log" 2>&1; \
  echo "--- towers_diet_pallas exit=$?" )
tail -3 "$OUT/towers_diet_pallas.log" | tee -a "$OUT/queue.log"

# 4. full-step backend A/Bs (only if the diet towers did NOT crash —
#    read towers_diet_pallas.log first; these run on MAIN)
run bench_vitlang 1800 env BENCH_BATCH=8 BENCH_ATTN=vitlang_pallas python bench.py
run bench_allpallas 1800 env BENCH_BATCH=8 BENCH_ATTN=pallas python bench.py

# 5. serving decode on 'auto' (validates the axon platform-name fix)
run grover_decode 1500 env BENCH_MODE=grover python bench.py

echo "QUEUE DONE $(date)" | tee -a "$OUT/queue.log"
