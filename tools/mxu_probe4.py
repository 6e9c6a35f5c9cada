"""Probe 4: isolate the slow factor in the output contraction.

  canN8H   dot [64,256] @ [256,8] HIGHEST, rhs a direct input (narrow N)
  trpadH   basis [8,256] -> .T -> [256,8] -> zero-pad -> [256,128] -> dot HIGHEST
  padonlyH dot [64,256] @ [256,128] HIGHEST where rhs input is wide (ref)
  tr8      [8,256] transpose alone
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, W, REPS = 64, 256, 1024
H = jax.lax.Precision.HIGHEST


def bench(name, kernel, inputs, want, sl):
    try:
        outs = jax.ShapeDtypeStruct((M, W), jnp.float32)
        f = jax.jit(pl.pallas_call(
            kernel,
            grid=(REPS,),
            in_specs=[pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))
                      for a in inputs],
            out_specs=pl.BlockSpec((M, W), lambda i: (0, 0)),
            out_shape=outs,
        ))
        got = np.asarray(f(*inputs))[sl]
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
        jax.block_until_ready(f(*inputs))
        t0 = time.perf_counter()
        r = f(*inputs)
        float(jnp.sum(r))
        el = (time.perf_counter() - t0) * 1e6 / REPS
        print(f"{name:9s} {el:8.3f} us/iter  relerr={err:.2e}")
    except Exception as e:
        print(f"{name:9s} FAIL {repr(e)[:160]}")


def main():
    print("backend:", jax.default_backend())
    a = jax.random.normal(jax.random.PRNGKey(0), (M, W), jnp.float32)
    b8 = jax.random.normal(jax.random.PRNGKey(1), (8, W), jnp.float32)
    bn = jax.random.normal(jax.random.PRNGKey(2), (W, 8), jnp.float32)
    bw = jax.random.normal(jax.random.PRNGKey(3), (W, 128), jnp.float32)
    a64 = np.asarray(a, np.float64)

    def pad(m):
        return jnp.concatenate(
            [m, jnp.zeros((M, W - m.shape[1]), jnp.float32)], axis=1)

    def k1(a_ref, b_ref, o_ref):
        o_ref[...] = pad(jnp.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=jnp.float32,
                                 precision=H))

    bench("canN8H", k1, (a, bn), a64 @ np.asarray(bn, np.float64), np.s_[:, :8])

    def k2(a_ref, b_ref, o_ref):
        bt = b_ref[...].T                           # [W, 8]
        rhs = jnp.concatenate(
            [bt, jnp.zeros((W, 120), jnp.float32)], axis=1)  # [W, 128]
        o_ref[...] = pad(jnp.dot(a_ref[...], rhs,
                                 preferred_element_type=jnp.float32,
                                 precision=H))

    bench("trpadH", k2, (a, b8), a64 @ np.asarray(b8, np.float64).T,
          np.s_[:, :8])

    def k3(a_ref, b_ref, o_ref):
        o_ref[...] = pad(jnp.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=jnp.float32,
                                 precision=H)[:, :8])

    bench("padonlyH", k3, (a, bw), (a64 @ np.asarray(bw, np.float64))[:, :8],
          np.s_[:, :8])

    def k4(a_ref, b_ref, o_ref):
        t = b_ref[...].T                            # [W, 8]
        o_ref[...] = jnp.concatenate(
            [t[0:M, :], jnp.zeros((M, W - 8), jnp.float32)], axis=1)

    bench("tr8", k4, (a, b8), np.asarray(b8).T[:M], np.s_[:, :8])

    def k_nop(a_ref, b_ref, o_ref):
        o_ref[...] = a_ref[...]

    bench("copy", k_nop, (a, b8), np.asarray(a)[:8, :], np.s_[:8, :])


if __name__ == "__main__":
    main()
