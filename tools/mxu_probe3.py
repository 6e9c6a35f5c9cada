"""Probe 3: basis-transpose + canonical dot, and rebase-subtract cost.

  trH   basis [8, W] -> .T -> [W, 8]; dot [M, W] @ [W, 8] HIGHEST
  trHi  same, HIGH
  sub   [W, 128] broadcast subtract (candT rebase cost proxy)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, W, REPS = 64, 256, 1024


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
        print(f"{name:8s} {el:8.3f} us/iter  relerr={err:.2e}")
    except Exception as e:
        print(f"{name:8s} FAIL {repr(e)[:160]}")


def main():
    print("backend:", jax.default_backend())
    a = jax.random.normal(jax.random.PRNGKey(0), (M, W), jnp.float32)
    b8 = jax.random.normal(jax.random.PRNGKey(1), (8, W), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(2), (W, 128), jnp.float32)
    a64, b64 = np.asarray(a, np.float64), np.asarray(b8, np.float64)

    def pad(m):
        return jnp.concatenate(
            [m, jnp.zeros((M, W - m.shape[1]), jnp.float32)], axis=1)

    for name, prec in (("trH", jax.lax.Precision.HIGHEST),
                       ("trHi", jax.lax.Precision.HIGH)):
        def k(a_ref, b_ref, o_ref, _p=prec):
            bt = b_ref[...].T
            m = jnp.dot(a_ref[...], bt,
                        preferred_element_type=jnp.float32, precision=_p)
            o_ref[...] = pad(m)

        bench(name, k, (a, b8), a64 @ b64.T, np.s_[:, :8])

    def k_sub(a_ref, c_ref, o_ref):
        offs = c_ref[0:1, :]
        r = c_ref[...] - offs                       # [W, 128] broadcast sub
        o_ref[...] = a_ref[...] + jnp.sum(r[0:1, 0:1])

    bench("sub", k_sub, (a, c), np.zeros((M, 8)), np.s_[:, :8])

    def k_nop(a_ref, b_ref, o_ref):
        o_ref[...] = a_ref[...]

    bench("copy", k_nop, (a, b8), np.asarray(a)[:, :8], np.s_[:, :8])

    # small-lane out block: can Mosaic write [1, 32, 8] blocks to a
    # [G, 32, 8] HBM out array?  (would remove the final transpose)
    try:
        def k_small(a_ref, o_ref):
            o_ref[...] = a_ref[0:32, 0:8][None]

        f = jax.jit(pl.pallas_call(
            k_small,
            grid=(REPS,),
            in_specs=[pl.BlockSpec((M, W), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1, 32, 8), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((REPS, 32, 8), jnp.float32),
        ))
        got = np.asarray(f(a))
        ok = np.abs(got[5] - np.asarray(a)[:32, :8]).max()
        jax.block_until_ready(f(a))
        t0 = time.perf_counter()
        float(jnp.sum(f(a)))
        el = (time.perf_counter() - t0) * 1e6 / REPS
        print(f"outsmall {el:8.3f} us/iter  abserr={ok:.2e}")
    except Exception as e:
        print(f"outsmall FAIL {repr(e)[:160]}")

    # [32, 8] -> [8, 32] plain transpose
    def k_t32(a_ref, b_ref, o_ref):
        t = a_ref[0:32, 0:8].T                      # [8, 32]
        row = jnp.concatenate(
            [t, jnp.zeros((8, W - 32), jnp.float32)], axis=1)
        o_ref[...] = jnp.concatenate(
            [row, jnp.zeros((M - 8, W), jnp.float32)], axis=0)

    bench("t32", k_t32, (a, b8), np.asarray(a)[:32, :8].T, np.s_[:8, :32])


if __name__ == "__main__":
    main()
