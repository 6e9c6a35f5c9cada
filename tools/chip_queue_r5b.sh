#!/bin/bash
# Round-5 second chip queue: the three reference decks that did not yet have
# FULL-t_end runs on silicon (the first queue covered Duckling Dp0.01 and
# MovingSquare Dp0.04; dam-break 3D has the 23.3-min headline artifact).
# After this queue every reference example deck has an end-to-end chip run
# with an analyze_case physics check.  Logs under out/r5_chipq2/.
set -u
cd "$(dirname "$0")/.."
mkdir -p out/r5_chipq2
LOG=out/r5_chipq2

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
# These runs are end-to-end correctness evidence, not timed probes: any
# LIVE transport will do (a slow call floor only pads the wall clock),
# so the gate is liveness, not the <34 ms perf bar the A/B queue used.
exit(0 if per < 200.0 else 3)
EOF
}

echo "[chipq2] waiting for healthy transport..." | tee $LOG/status.txt
until probe >> $LOG/status.txt 2>&1; do
  echo "[chipq2] transport unhealthy at $(date -u +%H:%M:%SZ); retry in 120s" \
    | tee -a $LOG/status.txt
  sleep 120
done
echo "[chipq2] transport healthy at $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "[chipq2] START $name $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "[chipq2] DONE  $name rc=$rc $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
  return $rc
}

# The transport stalls for minutes-to-hours at random (first run of this
# queue lost 10+ min to a soft-watchdog hang): every deck runs HARD-
# watchdogged under the exit-86 supervisor, checkpointing every 20
# outputs, so a stall costs ~5 min + the tail since the last checkpoint
# instead of the whole run.

# 1. StillWedge Dp0.02 full deck (t_end = 4.0 s, reference default)
run wedge 10800 bash tools/supervised_run.sh out/r5_chipq2/wedge -- \
  python examples/still_wedge_mdbc.py --pallas \
  --save out/r5_chipq2/wedge --checkpoint-every 20 \
  --watchdog 300 --watchdog-hard
run wedge_analyze 600 python tools/analyze_case.py \
  out/r5_chipq2/wedge/StillWedge.vtkhdf --band 980 1060 --every 10

# 2. StillWedgeMiddleSquare Dp0.02 full deck (t_end = 4.0 s)
run midsq 10800 bash tools/supervised_run.sh out/r5_chipq2/midsq -- \
  python examples/still_wedge_middle_square_mdbc.py --pallas \
  --save out/r5_chipq2/midsq --checkpoint-every 20 \
  --watchdog 300 --watchdog-hard
run midsq_analyze 600 python tools/analyze_case.py \
  out/r5_chipq2/midsq/StillWedgeMiddleSquare.vtkhdf --band 980 1060 --every 10

# 3. DamBreak2d MDBC full deck (t_end = 2.0 s, explicit output-time vector)
run db2d 10800 bash tools/supervised_run.sh out/r5_chipq2/db2d -- \
  python examples/dam_break_2d_mdbc.py --pallas \
  --save out/r5_chipq2/db2d --checkpoint-every 20 \
  --watchdog 300 --watchdog-hard
run db2d_analyze 600 python tools/analyze_case.py \
  out/r5_chipq2/db2d/DamBreak2D.vtkhdf --band 900 1150 --allow-outliers 2 \
  --every 5

echo "[chipq2] QUEUE COMPLETE $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
