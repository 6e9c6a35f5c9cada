"""Measure the real Mosaic cost of the block sweep's candidate-field
broadcasts - the last quantified single-chip lever (PERFORMANCE.md round 5).

In the production block kernel (ops/pallas_block_sweep.py) the chunk tile is
[CH sublanes = candidates, 128 lanes = selves]:

  * self fields are [1, 128] lane-rows - sublane-replicated operands,
    essentially free;
  * each of the ~12 candidate fields is a [CH, 1] column that must be
    LANE-broadcast to [CH, 128] (= 16 distinct vregs) EVERY chunk
    (`dense_cand`), ~14% of the pair-stage vreg stream by op count.

A transposed chunk layout ([128 sublanes = selves, CH lanes = candidates])
would swap who pays: candidate fields become [1, CH] rows (cheap IF Mosaic
gives row vectors a sublane-replicated layout), and the expensive
lane-broadcasts move to the SELF fields - hoistable out of the chunk loop
and amortized over the ~19 chunks per program.  Whether that wins depends
entirely on Mosaic's lowering of the two broadcast directions, which this
probe measures in isolation:

  colmajor : today's orientation - per chunk, NF lane-broadcasts
             [CH,1] -> [CH,128] + OPS dense fma per field
  rowmajor : transposed - per chunk, NF row-operands [1,CH] -> [128,CH]
             (Mosaic may or may not materialize them) + the same math
  hoisted  : rowmajor with the broadcast LIFTED out of the chunk loop
             (legal there because self fields are chunk-invariant; for
             candidate fields in the real kernel this is NOT available -
             shown as the floor of the rowmajor family)

Both modes run the identical dense multiply-accumulate chain on [CH, 128]
vs [128, CH] tiles and accumulate full tiles (the real kernels' per-chunk
reduce vs deferred reduce difference is ~4 vreg-ops/chunk, below what this
probe resolves).  Run on the TPU:

    python tools/broadcast_probe.py

Interpretation: (colmajor - rowmajor) ns/chunk x 23,583 chunks x 2 sweeps
is the per-step saving a transposed kernel could harvest BEFORE paying its
own costs (per-chunk [CH,16] -> [16,CH] transpose or dynamic-lane DMA, the
self-broadcast hoist, and the lane-direction final reduce).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

CH = 128
NF = 12
OPS = 4          # dense fma-ish ops per field after operand construction
CHUNKS = 4096
REPS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_kernel(mode):
        # buf_c: [CH, 16] column-major candidate pack (today's layout)
        # buf_r: [16, CH] row-major (transposed) candidate pack
        def kernel(bufc_hbm, bufr_hbm, out_blk, bc, br, acc, sem):
            b = pl.program_id(0)

            @pl.when(b == 0)
            def _():
                pltpu.make_async_copy(bufc_hbm, bc, sem.at[0]).start()
                pltpu.make_async_copy(bufr_hbm, br, sem.at[1]).start()
                pltpu.make_async_copy(bufc_hbm, bc, sem.at[0]).wait()
                pltpu.make_async_copy(bufr_hbm, br, sem.at[1]).wait()

            acc[...] = jnp.zeros_like(acc)
            shape = (CH, 128) if mode == "colmajor" else (128, CH)
            # chunk-invariant "self" tiles (free lane-rows in colmajor,
            # pre-hoisted lane-broadcasts in the transposed family - their
            # build cost is amortized over every chunk and not timed here)
            selfs = [
                jnp.full(shape, np.float32(1.0 + 0.125 * k)) for k in range(4)
            ]
            if mode == "hoisted":
                hoist = [
                    jnp.broadcast_to(br[f : f + 1, :], (128, CH))
                    for f in range(NF)
                ]

            def body(g, c):
                s = jnp.zeros(shape, jnp.float32)
                for f in range(NF):
                    if mode == "colmajor":
                        op = jnp.broadcast_to(bc[:, f : f + 1], (CH, 128))
                    elif mode == "rowmajor":
                        op = jnp.broadcast_to(br[f : f + 1, :], (128, CH))
                    else:  # hoisted
                        op = hoist[f]
                    t = op
                    for k in range(OPS):
                        t = t * op + selfs[k]
                    s = s + t
                acc[...] += s[:8, :128] + s[8:16, :128]
                return c

            jax.lax.fori_loop(0, CHUNKS, body, 0)
            out_blk[...] = acc[...]

        return kernel

    bufc = jnp.asarray(np.random.rand(CH, 16).astype(np.float32))
    bufr = jnp.asarray(np.ascontiguousarray(np.asarray(bufc).T))

    results = {}
    for mode in ("colmajor", "rowmajor", "hoisted"):
        try:
            fn = pl.pallas_call(
                make_kernel(mode),
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
                out_specs=pl.BlockSpec((8, 128), lambda b: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((CH, 16), jnp.float32),
                    pltpu.VMEM((16, CH), jnp.float32),
                    pltpu.VMEM((8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            out = fn(bufc, bufr)
            float(out.sum())  # compile+warm
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(bufc, bufr)
            float(out.sum())
            dt = (time.perf_counter() - t0) / REPS
            per_chunk = dt / CHUNKS * 1e9
            results[mode] = per_chunk
            print(f"{mode:9s}: {dt*1e3:7.3f} ms/iter  {per_chunk:7.1f} ns/chunk")
        except Exception as e:  # noqa: BLE001 - probe, report and continue
            print(f"{mode:9s}: FAILED {type(e).__name__}: {str(e)[:200]}")

    if "colmajor" in results and "rowmajor" in results:
        d = results["colmajor"] - results["rowmajor"]
        print(f"# headline-model saving if transposed: "
              f"{d * 23583 * 2 / 1e6:.2f} ms/step (before transpose/DMA/"
              f"reduce costs)")


if __name__ == "__main__":
    main()
