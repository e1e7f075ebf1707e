"""Sanity-check timing through the TPU relay: does wall time scale with
chained work, and does block_until_ready actually synchronize?

Runs the calibration read-loop at several chain lengths and reports both
block_until_ready-timed and value-fetch-timed wall clocks.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    n = 256 * (1 << 20) // 4
    rows = 512
    a = jnp.asarray(np.abs(np.random.default_rng(0).normal(
        size=(rows, n // rows))).astype(np.float32) + 0.5)
    nbytes = a.size * 4
    print(f"device={dev.platform} kind={getattr(dev, 'device_kind', '?')} "
          f"array={nbytes / 1e6:.0f} MB", flush=True)

    def read_loop(a, n):
        def body(_, acc):
            return acc * 0.5 + jnp.sum(jnp.maximum(a, acc)) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.asarray(1e-30, a.dtype))

    jitted = jax.jit(read_loop)
    float(jitted(a, 1))  # compile + full warm round trip

    for iters in (8, 32, 128, 512):
        t0 = time.perf_counter()
        out = jitted(a, iters)
        out.block_until_ready()
        t_bur = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = jitted(a, iters)
        val = float(out)
        t_fetch = time.perf_counter() - t0
        gbps_b = nbytes * iters / t_bur / 1e9
        gbps_f = nbytes * iters / t_fetch / 1e9
        print(f"iters={iters:4d} block_until_ready: {1e3 * t_bur:9.3f} ms "
              f"({gbps_b:8.1f} GB/s)  value-fetch: {1e3 * t_fetch:9.3f} ms "
              f"({gbps_f:8.1f} GB/s)  val={val:.3e}", flush=True)


if __name__ == "__main__":
    main()
