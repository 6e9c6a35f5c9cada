#!/bin/bash
# Round-5 decisive queue, transport-hardened: every measurement is gated on
# a healthy-transport probe (first-device-op hang is the known axon failure
# mode) and verified to have produced its result lines, with up to 3
# attempts.  Order interleaves cut (HEAD) vs precut (24c81f0 worktree) so
# both variants see the same transport epoch.  Logs under out/r5_ab3/.
set -u
cd "$(dirname "$0")/.."
mkdir -p out/r5_ab3
LOG=out/r5_ab3
WT=out/wt_precut

probe() {
  timeout 120 python - <<'EOF'
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

wait_healthy() {
  until probe >> $LOG/status.txt 2>&1; do
    echo "[ab3] transport unhealthy at $(date -u +%H:%M:%SZ); retry in 120s" \
      | tee -a $LOG/status.txt
    sleep 120
  done
  echo "[ab3] transport healthy at $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
}

run_checked() {  # run_checked <name> <timeout-s> <dir> <grep-pattern> <cmd...>
  local name=$1 to=$2 dir=$3 pat=$4; shift 4
  local att
  for att in 1 2 3; do
    wait_healthy
    echo "[ab3] START $name (attempt $att) $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
    ( cd "$dir" && timeout "$to" "$@" ) > "$LOG/$name.log" 2>&1
    local rc=$?
    if [ $rc -eq 0 ] && grep -q "$pat" "$LOG/$name.log"; then
      echo "[ab3] DONE  $name rc=0 $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
      return 0
    fi
    echo "[ab3] FAIL  $name rc=$rc (attempt $att) $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
  done
  echo "[ab3] GIVEUP $name $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
  return 1
}

echo "[ab3] queue start $(date -u +%H:%M:%SZ)" | tee $LOG/status.txt

SB="python tools/sweep_bench.py --which step,bsweep --reps 100"
run_checked cut1    1200 .   'bsweep:' $SB
run_checked precut1 1200 $WT 'bsweep:' $SB
run_checked cut2    1200 .   'bsweep:' $SB
run_checked precut2 1200 $WT 'bsweep:' $SB
run_checked bprobe  1200 .   'headline-model saving' python tools/broadcast_probe.py

echo "[ab3] QUEUE COMPLETE $(date -u +%H:%M:%SZ)" | tee -a $LOG/status.txt
