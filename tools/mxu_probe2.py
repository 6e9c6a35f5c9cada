"""Probe 2: which contraction orientation/precision is fast on the MXU?

All shapes mirror the sweep's per-chunk output contraction:
  LHS = stacked pair blocks [64, 256], contraction over 256 lanes.
Variants:
  ntH    dot_general NT (rhs [8, 256], contract lanes) precision=HIGHEST
  ntHi   same, precision=HIGH (bf16x3)
  ntD    same, default precision (bf16, for timing reference only)
  canH   canonical [64,256] @ [256,128] precision=HIGHEST (candT-DMA plan)
  canHi  canonical precision=HIGH
  canD   canonical default
Prints per-iter time and f64-reference relerr for each.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, W, N, REPS = 64, 256, 128, 1024


def bench(name, kernel, inputs, want, sl):
    try:
        outs = jax.ShapeDtypeStruct((M, W), jnp.float32)
        f = pl.pallas_call(
            kernel,
            grid=(REPS,),
            in_specs=[pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))
                      for a in inputs],
            out_specs=pl.BlockSpec((M, W), lambda i: (0, 0)),
            out_shape=outs,
        )
        f = jax.jit(f)
        got = np.asarray(f(*inputs))[sl]
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
        jax.block_until_ready(f(*inputs))
        t0 = time.perf_counter()
        r = f(*inputs)
        float(jnp.sum(r))
        el = (time.perf_counter() - t0) * 1e6 / REPS
        print(f"{name:8s} {el:8.3f} us/iter  relerr={err:.2e}")
    except Exception as e:
        print(f"{name:8s} FAIL {repr(e)[:160]}")


def main():
    print("backend:", jax.default_backend())
    a = jax.random.normal(jax.random.PRNGKey(0), (M, W), jnp.float32)
    b8 = jax.random.normal(jax.random.PRNGKey(1), (8, W), jnp.float32)
    bT = jax.random.normal(jax.random.PRNGKey(2), (W, N), jnp.float32)

    a64, b64, bT64 = (np.asarray(x, np.float64) for x in (a, b8, bT))

    def pad(m):
        return jnp.concatenate(
            [m, jnp.zeros((M, W - m.shape[1]), jnp.float32)], axis=1)

    for name, prec in (("ntH", jax.lax.Precision.HIGHEST),
                       ("ntHi", jax.lax.Precision.HIGH),
                       ("ntD", None)):
        def k(a_ref, b_ref, o_ref, _p=prec):
            m = jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_p)
            o_ref[...] = pad(m)

        bench(name, k, (a, b8), a64 @ b64.T, np.s_[:, :8])

    for name, prec in (("canH", jax.lax.Precision.HIGHEST),
                       ("canHi", jax.lax.Precision.HIGH),
                       ("canD", None)):
        def k(a_ref, b_ref, o_ref, _p=prec):
            m = jnp.dot(a_ref[...], b_ref[...],
                        preferred_element_type=jnp.float32, precision=_p)
            o_ref[...] = pad(m)

        bench(name, k, (a, bT), a64 @ bT64, np.s_[:, :N])

    # VPU reference: the old accumulator pattern (stack-free proxy):
    # 4 keys x [32, 256] read-add-write emulated as 16 full-tile ops on [M, W]
    def k_vpu(a_ref, b_ref, o_ref):
        x = a_ref[...]
        acc = x
        r0 = b_ref[0:1, :]
        for i in range(8):
            acc = acc * r0 + x
        o_ref[...] = acc

    bench("vpu16", k_vpu, (a, b8), np.zeros((M, 8)), np.s_[:, :8])

    def k_nop(a_ref, b_ref, o_ref):
        o_ref[...] = a_ref[...]

    bench("copy", k_nop, (a, b8), np.asarray(a)[:, :8], np.s_[:, :8])


if __name__ == "__main__":
    main()
