#!/bin/bash
# Supervised simulation runner: restarts a run that the device-call watchdog
# killed (exit 86 = stalled device transport, utils/watchdog.py) from its
# latest checkpoint.  Any other exit code ends the loop.
#
# Usage:
#   bash tools/supervised_run.sh CKPT_DIR -- python examples/dam_break_3d.py \
#        --pallas --save out/db3 --checkpoint-every 5 \
#        --watchdog 300 --watchdog-hard
#
# The wrapped command must write checkpoints into CKPT_DIR (the example CLIs
# write checkpoint.npz under --save with --checkpoint-every) and accept
# --resume.
set -u
CKPT_DIR="$1"; shift
[ "$1" = "--" ] && shift

MAX_RESTARTS=${MAX_RESTARTS:-20}
restarts=0
while true; do
    latest=$(ls -1t "$CKPT_DIR"/checkpoint*.npz 2>/dev/null | head -1)
    if [ -n "$latest" ]; then
        echo "[supervised_run] starting (resume from $latest)" >&2
        "$@" --resume "$latest"
    else
        echo "[supervised_run] starting fresh" >&2
        "$@"
    fi
    rc=$?
    if [ "$rc" -ne 86 ]; then
        echo "[supervised_run] exited rc=$rc - done" >&2
        exit "$rc"
    fi
    restarts=$((restarts + 1))
    if [ "$restarts" -gt "$MAX_RESTARTS" ]; then
        echo "[supervised_run] too many watchdog restarts ($restarts)" >&2
        exit 86
    fi
    echo "[supervised_run] watchdog fired (rc=86), restart #$restarts in 60 s" >&2
    sleep 60
done
