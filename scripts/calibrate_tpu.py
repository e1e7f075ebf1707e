"""Calibrate achievable HBM bandwidth and MXU throughput on the default
accelerator with trivially bound kernels, chained-dispatch timed.

Gives the denominator for roofline claims (bench.py uses public spec-sheet
peaks; this measures what THIS chip + relay actually sustains).

Anti-folding: additive ``+acc*eps`` perturbations DISTRIBUTE through linear
ops (sum, dot, scale), letting XLA hoist the loop-invariant part and time
nothing.  Here every iteration's operand goes through ``maximum(x, acc)``
— nonlinear in the carry — so the full read/compute must re-execute; the
read+write test carries the ARRAY itself through the fori_loop so each
iteration's output is materialized.

Usage: python scripts/calibrate_tpu.py   (env: CAL_MB, CAL_ITERS)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

MB = int(os.environ.get("CAL_MB", 256))
ITERS = int(os.environ.get("CAL_ITERS", 20))


def timeit(jitted, args, n):
    out = jitted(*args, 1)
    out = [o.block_until_ready() for o in out] if isinstance(out, tuple) \
        else out.block_until_ready()
    t0 = time.perf_counter()
    out = jitted(*args, n)
    out = [o.block_until_ready() for o in out] if isinstance(out, tuple) \
        else out.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    n = MB * (1 << 20) // 4
    rows = 512
    a = jnp.asarray(np.abs(np.random.default_rng(0).normal(
        size=(rows, n // rows))).astype(np.float32) + 0.5)
    nbytes = a.size * 4
    print(f"device={dev.platform} kind={getattr(dev, 'device_kind', '?')} "
          f"array={nbytes / 1e6:.0f} MB iters={ITERS}", flush=True)

    # READ: maximum(a, acc) is nonlinear in the carry -> no hoisting.
    # acc stays ~1e-30, far below the data's 0.5 floor: values unchanged.
    def read_loop(a, n):
        def body(_, acc):
            return acc * 0.5 + jnp.sum(jnp.maximum(a, acc)) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.asarray(1e-30, a.dtype))

    t = timeit(jax.jit(read_loop), (a,), ITERS)
    print(f"read (sum of max): {1e3 * t:.3f} ms -> "
          f"{nbytes / t / 1e9:.1f} GB/s", flush=True)

    # READ+WRITE: the array itself is the carry -> each iteration's output
    # is a materialized (rows, n) array.
    def rw_loop(a, n):
        def body(_, x):
            return jnp.maximum(x * 0.9999999, x * 1e-9)
        return jax.lax.fori_loop(0, n, body, a)

    t = timeit(jax.jit(rw_loop), (a,), ITERS)
    print(f"read+write (carried scale): {1e3 * t:.3f} ms -> "
          f"{2 * nbytes / t / 1e9:.1f} GB/s", flush=True)

    # MXU: carried operand; maximum() blocks distribution of the dot.
    m, k, nn = 256, 8192, 256
    x = jnp.asarray(np.abs(np.random.default_rng(1).normal(
        size=(m, k))).astype(np.float32) + 0.5)
    y = jnp.asarray(np.random.default_rng(2).normal(
        size=(k, nn)).astype(np.float32))

    def mm_loop(x, y, n):
        def body(_, carry):
            x1 = jnp.maximum(x, carry[0, 0] * 1e-30)
            return jnp.dot(x1, y, preferred_element_type=jnp.float32)
        return jax.lax.fori_loop(0, n, body,
                                 jnp.zeros((m, nn), jnp.float32))

    reps = ITERS * 16
    t = timeit(jax.jit(mm_loop), (x, y), reps)
    flops = 2.0 * m * k * nn
    print(f"matmul ({m}x{k}x{nn} DEFAULT bf16): {1e3 * t:.3f} ms -> "
          f"{flops / t / 1e12:.2f} TFLOP/s", flush=True)

    # Same shape as the sweep's membership matmuls (N=64 narrow)
    m2, k2, n2 = 152, 8192, 64
    x2 = jnp.asarray(np.abs(np.random.default_rng(3).normal(
        size=(m2, k2))).astype(np.float32) + 0.5)
    y2 = jnp.asarray(np.random.default_rng(4).normal(
        size=(k2, n2)).astype(np.float32))

    def mm2_loop(x, y, n):
        def body(_, carry):
            x1 = jnp.maximum(x, carry[0, 0] * 1e-30)
            return jnp.dot(x1, y, preferred_element_type=jnp.float32)
        return jax.lax.fori_loop(0, n, body,
                                 jnp.zeros((m2, n2), jnp.float32))

    t = timeit(jax.jit(mm2_loop), (x2, y2), reps)
    flops = 2.0 * m2 * k2 * n2
    print(f"matmul ({m2}x{k2}x{n2} DEFAULT bf16): {1e3 * t:.3f} ms -> "
          f"{flops / t / 1e12:.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
