#!/bin/bash
# Round-5 chip queue: waits for the axon transport to recover (round-3 saw
# >2h outages; tonight's probe hung and callfloor hit 42 ms), then runs the
# queued hardware work in dependency order.  Aborts the perf/bench steps if
# the mandatory parity gate fails.  All logs under out/r5_chipq/.
set -u
cd "$(dirname "$0")/.."
mkdir -p out/r5_chipq
LOG=out/r5_chipq

probe() {
  timeout 90 python - <<'EOF'
import time
import jax, jax.numpy as jnp
x = jnp.ones(8)
float(x.sum())  # first call: connection + compile
t0 = time.time()
for _ in range(10):
    float(jnp.ones(8).sum())
per = (time.time() - t0) / 10 * 1e3
print(f"callfloor ~{per:.1f} ms")
exit(0 if per < 34.0 else 3)
EOF
}

echo "[chipq] waiting for healthy transport..." | tee $LOG/status.txt
until probe >> $LOG/status.txt 2>&1; do
  echo "[chipq] transport unhealthy at $(date -u +%H:%M:%SZ); retry in 120s" \
    | tee -a $LOG/status.txt
  sleep 120
done
echo "[chipq] transport healthy at $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[chipq] START $name $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "[chipq] DONE  $name rc=$rc $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
  return $rc
}

# 1. mandatory hardware parity gate (op-cut kernel changes)
if ! run parity 3000 python tools/tpu_parity_check.py; then
  echo "[chipq] PARITY FAILED - aborting perf/bench queue" | tee -a $LOG/status.txt
  exit 1
fi

# 2. op-cut A/B on a healthy transport (r4 baseline: bsweep 12.97 raw @ 28ms floor)
run ab_cuts 1800 python tools/sweep_bench.py --which bsweep,bstub,blaunch,step

# 3. UNALIGNED x CH matrix (interpret-parity-pinned on CPU first).  The op
#    cuts changed the per-row/per-chunk cost ratio, so the r4 CH verdicts
#    (192/256 lose) may have moved; UNALIGNED kills the head slack that made
#    larger CH lose lanes.  bsweep-only probes, ~3 min each.
SPH_BLOCK_UNALIGNED=1 run ab_unaligned 1800 \
  python tools/sweep_bench.py --which bsweep,bstub
SPH_BLOCK_UNALIGNED=1 SPH_BLOCK_CH=192 run ab_u_ch192 1200 \
  python tools/sweep_bench.py --which bsweep
SPH_BLOCK_UNALIGNED=1 SPH_BLOCK_CH=256 run ab_u_ch256 1200 \
  python tools/sweep_bench.py --which bsweep
SPH_BLOCK_UNALIGNED=1 SPH_BLOCK_CH=64 run ab_u_ch64 1200 \
  python tools/sweep_bench.py --which bsweep
SPH_BLOCK_CH=192 run ab_a_ch192 1200 \
  python tools/sweep_bench.py --which bsweep

# 3b. hardware parity for the UNALIGNED variant (mandatory before any
#     default flip - interpret mode cannot catch Mosaic lowering bugs; the
#     unaligned dynamic sublane DMA offset is exactly that blind spot)
SPH_BLOCK_UNALIGNED=1 run parity_unaligned 3000 python tools/tpu_parity_check.py

# 4. the bench artifact EARLY (has its own parity gate; exit 1 cannot post a
#    number) - before the multi-hour deck runs so a late transport recovery
#    still lands the perf number.
run bench 3000 python bench.py

# 5. full Duckling Dp0.01 deck end-to-end (t_end = 1.0 s)
run duckling 7200 python examples/duckling_mdbc.py --pallas \
  --save out/r5_chipq/duckling --watchdog 600
run duckling_analyze 600 python tools/analyze_case.py \
  out/r5_chipq/duckling/CaseDuckling.vtkhdf --band 950 1100 --every 5

# 6. full MovingSquare Dp0.04 deck end-to-end (t_end = 2.5 s)
run msq 7200 python examples/moving_square_2d.py --pallas \
  --save out/r5_chipq/msq --watchdog 600
run msq_analyze 600 python tools/analyze_case.py \
  out/r5_chipq/msq/MovingSquare2D.vtkhdf --band 900 1150 --allow-outliers 2 \
  --track-marker 3 --speed 2.8 --direction 0 --duration 3.0 --track-tol 2e-3

echo "[chipq] QUEUE COMPLETE $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
