#!/bin/bash
# Round-5 follow-up queue: decisive op-cut A/B (HEAD vs pre-op-cut parent
# 24c81f0) with interleaved reps=100 runs on ONE transport session, then the
# broadcast-orientation micro-probe.  The 05:03Z ab_cuts run was measured at
# a degraded 47.9 ms call floor and the 05:34Z bench came out 1.6 ms/step
# slower than r4 - this queue decides whether the op cuts net-lose on real
# hardware.  Logs under out/r5_ab2/.
set -u
cd "$(dirname "$0")/.."
mkdir -p out/r5_ab2
LOG=out/r5_ab2
WT=out/wt_precut

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

echo "[ab2] waiting for healthy transport..." | tee $LOG/status.txt
until probe >> $LOG/status.txt 2>&1; do
  echo "[ab2] transport unhealthy at $(date -u +%H:%M:%SZ); retry in 120s" \
    | tee -a $LOG/status.txt
  sleep 120
done
echo "[ab2] transport healthy at $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt

if [ ! -d "$WT" ]; then
  git worktree add "$WT" 24c81f0 >> $LOG/status.txt 2>&1
fi

run() {  # run <name> <timeout-s> <dir> <cmd...>
  local name=$1 to=$2 dir=$3; shift 3
  echo "[ab2] START $name $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
  ( cd "$dir" && timeout "$to" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "[ab2] DONE  $name rc=$rc $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
  return $rc
}

# Interleaved A/B, two rounds each: cut (HEAD) vs precut (24c81f0).
run cut1    1200 .     python tools/sweep_bench.py --which step,bsweep --reps 100
run precut1 1200 $WT   python tools/sweep_bench.py --which step,bsweep --reps 100
run cut2    1200 .     python tools/sweep_bench.py --which step,bsweep --reps 100
run precut2 1200 $WT   python tools/sweep_bench.py --which step,bsweep --reps 100

# Broadcast-orientation micro-probe (transposed-chunk-layout lever).
run bprobe 1200 . python tools/broadcast_probe.py

echo "[ab2] QUEUE COMPLETE $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
