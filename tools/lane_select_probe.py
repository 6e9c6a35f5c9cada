"""Measure the candidate-operand construction cost that gates a dual-window
block sweep.

The dual-window idea (PERFORMANCE.md round-3): pair two 64-lane half-groups
per tile, each fed by its OWN candidate buffer, so every tile row carries two
candidates.  The cover simulation says tile-rows drop 3.10M -> 2.34M on the
headline case (split=True K=3), but each of the ~13 candidate fields then
costs `select(lane < 64, bcast(bufL[:, f]), bcast(bufR[:, f]))` instead of a
single broadcast.  The cost model says +2 tile-ops x 13 fields cancels the
row win IF a select-of-broadcasts costs the naive 3 ops.  This probe measures
the real Mosaic cost of the three operand constructions:

  single : one broadcast per field               (today's kernel)
  dualsel: bcast + bcast + select per field      (naive dual-window)
  dualgat: static lane-gather buf[:, idxvec]     (possible cheap shuffle)

Each kernel streams CHUNKS chunks of [CH, 128] through the same dense
multiply-accumulate loop (NF fields, OPS mults each) so only the operand
construction differs.  Run on the TPU:

    python tools/lane_select_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

CH = 128
NF = 13
OPS = 4          # per-field dense ops after operand construction
CHUNKS = 4096
REPS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    idxvec = np.array([0] * 64 + [1] * 64, dtype=np.int32)

    def make_kernel(mode):
        def kernel(bufL_hbm, bufR_hbm, out_blk, bl, br, acc, sem):
            b = pl.program_id(0)

            @pl.when(b == 0)
            def _():
                pltpu.make_async_copy(bufL_hbm, bl, sem.at[0]).start()
                pltpu.make_async_copy(bufR_hbm, br, sem.at[1]).start()
                pltpu.make_async_copy(bufL_hbm, bl, sem.at[0]).wait()
                pltpu.make_async_copy(bufR_hbm, br, sem.at[1]).wait()

            acc[...] = jnp.zeros_like(acc)
            lane = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 1)
            laneA = lane < 64

            def body(g, c):
                s = jnp.zeros((CH, 128), jnp.float32)
                for f in range(NF):
                    if mode == "single":
                        op = jnp.broadcast_to(bl[:, f : f + 1], (CH, 128))
                    elif mode == "dualsel":
                        opL = jnp.broadcast_to(bl[:, f : f + 1], (CH, 128))
                        opR = jnp.broadcast_to(br[:, f : f + 1], (CH, 128))
                        op = jnp.where(laneA, opL, opR)
                    else:  # dualgat: static two-column lane gather
                        two = bl[:, f : f + 2]
                        op = jnp.take(two, idxvec, axis=1)
                    t = op
                    for _ in range(OPS):
                        t = t * op + op
                    s = s + t
                acc[...] += s[:8] + s[8:16]
                return c

            jax.lax.fori_loop(0, CHUNKS, body, 0)
            out_blk[...] = acc[...]

        return kernel

    bufL = jnp.asarray(np.random.rand(CH, 128).astype(np.float32))
    bufR = jnp.asarray(np.random.rand(CH, 128).astype(np.float32))

    for mode in ("single", "dualsel", "dualgat"):
        try:
            fn = pl.pallas_call(
                make_kernel(mode),
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
                out_specs=pl.BlockSpec((8, 128), lambda b: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((CH, 128), jnp.float32),
                    pltpu.VMEM((CH, 128), jnp.float32),
                    pltpu.VMEM((8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            out = fn(bufL, bufR)
            float(out.sum())  # compile+warm
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(bufL, bufR)
            float(out.sum())
            dt = (time.perf_counter() - t0) / REPS
            per_chunk = dt / CHUNKS * 1e9
            print(f"{mode:8s}: {dt*1e3:7.3f} ms/iter  {per_chunk:7.1f} ns/chunk")
        except Exception as e:  # noqa: BLE001 - probe, report and continue
            print(f"{mode:8s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
