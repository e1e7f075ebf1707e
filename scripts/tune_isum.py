"""Time the fused Pallas interval-sum kernel across pallas_tile sizes.

The isum pass is ~37% of a chained sweep iteration at NWAV=2^21 and sits
~3x above its HBM read bound (152 operand rows x 4 B x nwav at ~819 GB/s
= 1.55 ms), so the tile size is the first knob.  Chained single-dispatch
timing (see bench.py / CLAUDE.md: additive carry perturbation, operands
as jit arguments).

Usage: python scripts/tune_isum.py [tile ...]   (env: TI_NWAV, TI_ITERS)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

NWAV = int(os.environ.get("TI_NWAV", 1 << 21))
ITERS = int(os.environ.get("TI_ITERS", 10))

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("TI_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TI_PLATFORM"])


def main():
    from ecckd_tpu.ops.average import fit_parts_lw
    from ecckd_tpu.ops.segments import interval_sum_fused, part_of

    tiles = [int(t) for t in sys.argv[1:]] or [2048, 4096, 8192]
    data = bench.build_inputs(bench.NLAY, NWAV, bench.NSEG, np.float32)
    dev = jax.devices()[0]
    interpret = dev.platform != "tpu"
    print(f"device={dev.platform} nwav={NWAV} nlay={bench.NLAY} "
          f"nseg={bench.NSEG} iters={ITERS}", flush=True)

    planck = jnp.asarray(data["planck_hl"])
    metric = jnp.asarray(data["metric"])
    hr = jnp.asarray(data["hr"])
    fds = jnp.asarray(data["flux_dn_surf"])
    fut = jnp.asarray(data["flux_up_toa"])
    i1 = jnp.asarray(data["i1"])
    i2 = jnp.asarray(data["i2"])

    def run_tile(tile):
        # Same part stack as CandidateCostLw._kernel (transmission)
        def fn(arrays):
            met, pl, h, a, b = arrays
            parts, rows, finish = fit_parts_lw("transmission", pl, met)
            return interval_sum_fused(
                parts + [part_of(h), part_of(a), part_of(b)],
                NWAV, i1, i2, dtype=met.dtype, use_pallas=True,
                pallas_interpret=interpret, pallas_tile=tile)

        def chained(arrays, n):
            first = arrays[0]

            def body(_, acc):
                a0 = first + acc * jnp.asarray(1e-45, first.dtype)
                out = fn((a0,) + tuple(arrays[1:]))
                return acc + jnp.sum(out) * jnp.asarray(1e-30, out.dtype)

            return jax.lax.fori_loop(0, n, body,
                                     jnp.asarray(0.0, first.dtype))

        jitted = jax.jit(chained)
        arrays = (metric, planck, hr, fds, fut)
        jitted(arrays, 1).block_until_ready()
        t0 = time.perf_counter()
        jitted(arrays, ITERS).block_until_ready()
        return (time.perf_counter() - t0) / ITERS

    for tile in tiles:
        t = run_tile(tile)
        print(f"isum pallas_tile={tile}: {1e3 * t:.3f} ms "
              f"({NWAV * bench.NLAY / t / 1e9:.2f}e9 bins*layers/s)",
              flush=True)


if __name__ == "__main__":
    main()
