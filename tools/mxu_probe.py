"""Micro-probe: Mosaic MXU matmul shapes needed by the sweep redesign.

Checks, on the real chip:
  1. [M, 8] @ [8, W] f32 matmul (input-side: d2 / v.x cross terms)
  2. dot_general NT: [M, W] x [C, W] contracting lanes (output-side lane
     reduction) - does Mosaic lower a transposed-RHS contraction?
  3. explicit small transpose [8, W] -> [W, 8] + plain matmul fallback
  4. relative timing vs the equivalent VPU elementwise chain

Run: python tools/mxu_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W, REPS = 64, 256, 512


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    el = (time.perf_counter() - t0) * 1e6
    print(f"{name:14s} {el/REPS:8.3f} us/iter  (checksum {s:.6e})")
    return s


def make_call(kernel, n_out=1):
    outs = tuple(jax.ShapeDtypeStruct((R, W), jnp.float32) for _ in range(n_out))
    f = pl.pallas_call(
        kernel,
        grid=(REPS,),
        in_specs=[
            pl.BlockSpec((R, W), lambda i: (0, 0)),
            pl.BlockSpec((8, W), lambda i: (0, 0)),
            pl.BlockSpec((R, 8), lambda i: (0, 0)),
        ],
        out_specs=tuple(pl.BlockSpec((R, W), lambda i: (0, 0)) for _ in range(n_out)),
        out_shape=outs,
    )
    return jax.jit(f)


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (R, W), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (8, W), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(2), (R, 8), jnp.float32)

    # 1. input-side matmul [R, 8] @ [8, W], default vs HIGHEST precision
    for prec in (None, jax.lax.Precision.HIGHEST):
        def k_mm_in(a_ref, b_ref, c_ref, o_ref, _p=prec):
            m = jnp.dot(c_ref[...], b_ref[...],
                        preferred_element_type=jnp.float32, precision=_p)
            o_ref[...] = m

        try:
            f = make_call(k_mm_in)
            got = np.asarray(f(a, b, c))
            want = np.asarray(c, np.float64) @ np.asarray(b, np.float64)
            err = np.abs(got - want).max() / np.abs(want).max()
            print(f"1. [R,8]@[8,W] matmul prec={prec}: OK  relerr={err:.2e}")
            timeit(f"  mm_in/{prec}", f, a, b, c)
        except Exception as e:
            print(f"1. [R,8]@[8,W] matmul prec={prec}: FAIL {repr(e)[:200]}")

    # 2. NT contraction: [R, W] x [8, W] over lanes -> [R, 8]
    for prec in (None, jax.lax.Precision.HIGHEST):
        def k_mm_nt(a_ref, b_ref, c_ref, o_ref, _p=prec):
            m = jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_p,
            )  # [R, 8]
            o_ref[...] = jnp.concatenate(
                [m, jnp.zeros((R, W - 8), jnp.float32)], axis=1)

        try:
            f = make_call(k_mm_nt)
            got = np.asarray(f(a, b, c))[:, :8]
            want = np.asarray(a, np.float64) @ np.asarray(b, np.float64).T
            err = np.abs(got - want).max() / np.abs(want).max()
            print(f"2. NT dot_general prec={prec}: OK  relerr={err:.2e}")
            timeit(f"  mm_nt/{prec}", f, a, b, c)
        except Exception as e:
            print(f"2. NT dot_general prec={prec}: FAIL {repr(e)[:200]}")

    # 3. explicit transpose + plain matmul
    def k_mm_t(a_ref, b_ref, c_ref, o_ref):
        bt = b_ref[...].T  # [W, 8]
        m = jnp.dot(a_ref[...], bt, preferred_element_type=jnp.float32)  # [R, 8]
        o_ref[...] = jnp.concatenate(
            [m, jnp.zeros((R, W - 8), jnp.float32)], axis=1)

    try:
        f = make_call(k_mm_t)
        got = np.asarray(f(a, b, c))[:, :8]
        want = np.asarray(a) @ np.asarray(b).T
        err = np.abs(got - want).max() / np.abs(want).max()
        print(f"3. transpose+matmul: OK  relerr={err:.2e}")
        timeit("  mm_t", f, a, b, c)
    except Exception as e:
        print(f"3. transpose+matmul: FAIL {repr(e)[:200]}")

    # 3b. small output transpose [R, 8] -> [8, R] (the per-program combine)
    def k_tr(a_ref, b_ref, c_ref, o_ref):
        t = c_ref[...].T  # [8, R]
        tp = jnp.concatenate([t, jnp.zeros((R - 8, R), jnp.float32)], axis=0)
        o_ref[...] = jnp.concatenate(
            [tp, jnp.zeros((R, W - R), jnp.float32)], axis=1)

    try:
        f = make_call(k_tr)
        got = np.asarray(f(a, b, c))[:8, :R]
        want = np.asarray(c).T
        err = np.abs(got - want).max()
        print(f"3b. [R,8]->[8,R] transpose: OK  abserr={err:.2e}")
        timeit("  tr_small", f, a, b, c)
    except Exception as e:
        print(f"3b. [R,8]->[8,R] transpose: FAIL {repr(e)[:200]}")

    # 4. VPU chain for comparison: ~16 full-tile elementwise ops
    def k_vpu(a_ref, b_ref, c_ref, o_ref):
        x = a_ref[...]
        r0 = b_ref[0:1, :]
        r1 = b_ref[1:2, :]
        acc = x
        for i in range(8):
            acc = acc * r0 + r1
            acc = acc - x * r1
        o_ref[...] = acc

    f = make_call(k_vpu)
    jax.block_until_ready(f(a, b, c))
    timeit("  vpu16", f, a, b, c)

    # 5. empty kernel floor
    def k_nop(a_ref, b_ref, c_ref, o_ref):
        o_ref[...] = a_ref[...]

    f = make_call(k_nop)
    timeit("  copy", f, a, b, c)


if __name__ == "__main__":
    main()
