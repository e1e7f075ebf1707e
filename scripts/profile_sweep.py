"""Microbenchmark the stages of the candidate-sweep kernel on the default
accelerator: fitted-od interval reductions, the broadband RT scan, truth
interval sums, and the full kernel (XLA and Pallas paths).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python scripts/profile_sweep.py
Env: PS_NWAV (default 2^18), PS_ITERS (default 10).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

NWAV = int(os.environ.get("PS_NWAV", 1 << 18))
ITERS = int(os.environ.get("PS_ITERS", 10))

import bench  # noqa: E402  (repo-root bench provides the input builder)


def timeit(fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    import jax
    import jax.numpy as jnp
    from ecckd_tpu.ops.average import fit_optical_depth_lw
    from ecckd_tpu.ops.rt_lw import rt_lw_bb_intervals
    from ecckd_tpu.ops.segments import interval_sum

    data = bench.build_inputs(bench.NLAY, NWAV, bench.NSEG, np.float32)
    dev = jax.devices()[0]
    print(f"device={dev.platform} nwav={NWAV} nlay={bench.NLAY} "
          f"nseg={bench.NSEG} iters={ITERS}", flush=True)

    with jax.default_device(dev):
        planck = jnp.asarray(data["planck_hl"])
        bg_od = jnp.asarray(data["bg_od"])
        metric = jnp.asarray(data["metric"])
        hr = jnp.asarray(data["hr"])
        emis = jnp.asarray(data["surf_emissivity"])
        surfp = jnp.asarray(data["surf_planck"])
        i1 = jnp.asarray(data["i1"])
        i2 = jnp.asarray(data["i2"])
        seg = jnp.asarray(data["seg_of_wav"])

        fit = jax.jit(lambda p, m, a, b:
                      fit_optical_depth_lw("transmission", p, m, a, b))
        t = timeit(fit, planck, metric, i1, i2)
        print(f"fit_optical_depth_lw (2 interval_sums (nlay,nwav)): "
              f"{1e3 * t:.3f} ms", flush=True)
        od_fit = fit(planck, metric, i1, i2)

        grey_fn = jax.jit(lambda of, s: jnp.take(of, s, axis=1))
        t = timeit(grey_fn, od_fit, seg)
        print(f"grey gather (nlay,nwav): {1e3 * t:.3f} ms", flush=True)
        grey = grey_fn(od_fit, seg)

        rt = jax.jit(lambda p, b, g, e, s, a1, a2:
                     rt_lw_bb_intervals(p, b, g, e, s, a1, a2))
        t = timeit(rt, planck, bg_od, grey, emis, surfp, i1, i2)
        print(f"rt_lw_bb_intervals XLA (scan + per-layer interval_sum): "
              f"{1e3 * t:.3f} ms", flush=True)

        isum = jax.jit(interval_sum)
        t = timeit(isum, hr, i1, i2)
        print(f"interval_sum (nlay,nwav): {1e3 * t:.3f} ms", flush=True)
        t = timeit(isum, surfp, i1, i2)
        print(f"interval_sum (nwav,): {1e3 * t:.3f} ms", flush=True)

        if dev.platform == "tpu":
            from ecckd_tpu.ops.pallas.sweep_lw import rt_lw_bb_intervals_pallas
            rtp = jax.jit(lambda p, b, of, s, e, sp, a1, a2:
                          rt_lw_bb_intervals_pallas(p, b, of, s, e, sp,
                                                    a1, a2))
            t = timeit(rtp, planck, bg_od, od_fit, seg, emis, surfp, i1, i2)
            print(f"rt_lw_bb_intervals PALLAS (fused): {1e3 * t:.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
