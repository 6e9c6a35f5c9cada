#!/bin/bash
# Chip work queue for when the axon tunnel recovers: runs the mandatory
# parity gate, then the attribution probes, CH/unroll A/Bs, and the bench.
# Usage: bash tools/chip_queue.sh 2>&1 | tee /tmp/chip_queue.log
set -x
cd /root/repo

# 0. liveness
timeout 120 python -c "import jax; x=jax.numpy.ones((8,128)); print('LIVE', float((x@x.T).sum()))" || exit 1

# 1. mandatory compiled-parity gate (all three kernels)
timeout 1800 python tools/tpu_parity_check.py || exit 1

# 2. attribution at CH=128 (current default) + probes
timeout 1800 python tools/sweep_bench.py --which step,nostep,intonly,dtonly,bsweep,bstub,blaunch,rebuildcost

# 3. CH A/B
SPH_BLOCK_CH=192 timeout 1200 python tools/sweep_bench.py --which bsweep
SPH_BLOCK_CH=256 timeout 1200 python tools/sweep_bench.py --which bsweep

# 4. unroll A/B at best CH so far (re-run by hand at the winner)
timeout 1200 python tools/sweep_bench.py --which bsweep --unroll 2

# 4b. blocks-per-program A/B (amortizes the grid-pipeline floor)
SPH_BLOCK_BPB=2 timeout 1200 python tools/sweep_bench.py --which bsweep
SPH_BLOCK_BPB=4 timeout 1200 python tools/sweep_bench.py --which bsweep

# 4c. combined (the likely production combo if both win alone)
SPH_BLOCK_BPB=2 timeout 1200 python tools/sweep_bench.py --which bsweep --unroll 2

# 5. dual-window operand-cost probe
timeout 900 python tools/lane_select_probe.py

# 6. bench (includes the in-artifact parity gate)
timeout 2400 python bench.py
