"""Measure the cost of elementwise passes over [N,3] vs [3,N] vs [N] arrays.

Hypothesis (round-4): XLA:TPU tiles f32 arrays in (8,128) lane tiles, so a
[N, 3] array pads its minor dim 3 -> 128 and every elementwise op on it moves
~128/3 x the useful bytes.  The step's integrator stages all operate on
[N, 3] position/velocity/acceleration fields - if the hypothesis holds, the
measured 2.3 ms `intonly` cost is layout, not compute, and the fix is a
component-major hot-loop layout.

Usage: python tools/layout_probe.py [--n 159744] [--reps 200]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=159744)
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    n, reps = args.n, args.reps
    rng = np.random.default_rng(0)
    x_nd = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    y_nd = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    x_dn = jnp.asarray(np.asarray(x_nd).T.copy())
    y_dn = jnp.asarray(np.asarray(y_nd).T.copy())
    x_f = x_dn.reshape(-1)
    y_f = y_dn.reshape(-1)

    def sync(out):
        # block_until_ready returns early on the tunneled (axon) backend;
        # a scalar device->host fetch is the reliable completion barrier
        return float(jax.tree.leaves(out)[0].reshape(-1)[0])

    def timeit(name, fn, *a):
        sync(fn(*a))
        sync(fn(*a))
        t0 = time.perf_counter()
        sync(fn(*a))
        dt = time.perf_counter() - t0
        print(f"{name:>28}: {dt*1e6/reps:9.2f} us/iter")
        return dt / reps

    def loop(body):
        @jax.jit
        def run(x, y):
            def b(i, x_):
                return body(x_, y)
            return jax.lax.fori_loop(0, reps, b, x)
        return run

    # one fused axpy pass
    timeit("axpy [N,3]", loop(lambda x, y: x + 1.000001 * y), x_nd, y_nd)
    timeit("axpy [3,N]", loop(lambda x, y: x + 1.000001 * y), x_dn, y_dn)
    timeit("axpy [3N] flat", loop(lambda x, y: x + 1.000001 * y), x_f, y_f)

    # a 10-stage unfuseable-ish chain (sequential dependencies)
    def chain(x, y):
        for _ in range(10):
            x = x + 1.000001 * y
            y = y * 0.999999 + 1e-9
        return x + y

    timeit("10x chain [N,3]", loop(chain), x_nd, y_nd)
    timeit("10x chain [3,N]", loop(chain), x_dn, y_dn)

    # reduction (the dt pattern): max |x| over everything
    def red(x, y):
        return x + jnp.max(jnp.abs(x)) * 1e-12

    timeit("max-reduce [N,3]", loop(red), x_nd, y_nd)
    timeit("max-reduce [3,N]", loop(red), x_dn, y_dn)

    # transpose each way (the conversion cost at a layout boundary)
    @jax.jit
    def tr_nd(x, y):
        def b(i, acc):
            return acc + x.T[:, :1] * 1e-12
        return jax.lax.fori_loop(0, reps, b, jnp.zeros((3, 1), jnp.float32))

    timeit("transpose [N,3]->[3,N]", tr_nd, x_nd, y_nd)

    # norm+max (stage-00 displacement pattern)
    def disp_nd(x, y):
        d = jnp.sqrt(jnp.sum((x - y) ** 2, axis=-1))
        return x + jnp.max(d) * 1e-12

    def disp_dn(x, y):
        d = jnp.sqrt(jnp.sum((x - y) ** 2, axis=0))
        return x + jnp.max(d) * 1e-12

    timeit("disp-max [N,3]", loop(disp_nd), x_nd, y_nd)
    timeit("disp-max [3,N]", loop(disp_dn), x_dn, y_dn)


if __name__ == "__main__":
    main()
