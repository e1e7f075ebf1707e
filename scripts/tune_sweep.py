"""Time production sweep-kernel variants (form x tile) on the default
accelerator, plus the fused interval-sum Pallas candidate from
scripts/exp_kernels.py.

Usage: python scripts/tune_sweep.py [jobs...]   (env: TS_NWAV, TS_ITERS)
  jobs: lw-scan-2048 lw-scan-4096 lw-unroll-2048 sw-scan sw-unroll isum
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

NWAV = int(os.environ.get("TS_NWAV", 1 << 20))
ITERS = int(os.environ.get("TS_ITERS", 20))

import bench  # noqa: E402
import jax  # noqa: E402

# TS_PLATFORM=cpu pins the platform for smoke runs (the axon sitecustomize
# force-sets jax_platforms, so env vars alone don't keep runs off the relay)
if os.environ.get("TS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TS_PLATFORM"])

import jax.numpy as jnp  # noqa: E402


def chained_time(fn, arrays, n):
    def chained(arrays, n):
        first = arrays[0]

        def body(_, acc):
            a0 = first + acc * jnp.asarray(1e-45, first.dtype)
            out = fn((a0,) + tuple(arrays[1:]))
            return acc + jnp.sum(out) * jnp.asarray(1e-30, out.dtype)

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, first.dtype))

    jitted = jax.jit(chained)
    jitted(arrays, 1).block_until_ready()
    t0 = time.perf_counter()
    jitted(arrays, n).block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    jobs = sys.argv[1:] or ["lw-scan-2048", "lw-scan-4096", "sw-scan",
                            "sw-unroll", "isum"]
    data = bench.build_inputs(bench.NLAY, NWAV, bench.NSEG, np.float32)
    dev = jax.devices()[0]
    interpret = dev.platform != "tpu"
    print(f"device={dev.platform} nwav={NWAV} nlay={bench.NLAY} "
          f"nseg={bench.NSEG} iters={ITERS} interpret={interpret}",
          flush=True)

    planck = jnp.asarray(data["planck_hl"])
    bg_od = jnp.asarray(data["bg_od"])
    metric = jnp.asarray(data["metric"])
    hr = jnp.asarray(data["hr"])
    emis = jnp.asarray(data["surf_emissivity"])
    surfp = jnp.asarray(data["surf_planck"])
    fds = jnp.asarray(data["flux_dn_surf"])
    fut = jnp.asarray(data["flux_up_toa"])
    i1 = jnp.asarray(data["i1"])
    i2 = jnp.asarray(data["i2"])
    seg = jnp.asarray(data["seg_of_wav"])

    from ecckd_tpu.ops.average import fit_optical_depth_lw
    from ecckd_tpu.ops.pallas import sweep_lw, sweep_sw
    od_fit = jnp.asarray(fit_optical_depth_lw("transmission", planck,
                                              metric, i1, i2))

    for job in jobs:
        if job.startswith("lw-"):
            _, form, tile = job.split("-")
            sweep_lw.TILE = int(tile)
            sweep_lw.rt_lw_bb_intervals_pallas._clear_cache()
            f = lambda a: sweep_lw.rt_lw_bb_intervals_pallas(
                a[1], a[0], od_fit, a[2], a[3], a[4], i1, i2,
                interpret=interpret, form=form)[0]
            t = chained_time(f, (bg_od, planck, seg, emis, surfp), ITERS)
            print(f"{job}: {1e3 * t:.3f} ms", flush=True)
        elif job.startswith("sw-"):
            parts = job.split("-")
            form = parts[1]
            if len(parts) > 2:
                sweep_sw.TILE = int(parts[2])
                sweep_sw.rt_sw_bb_intervals_pallas._clear_cache()
            ssi = jnp.asarray(np.abs(np.random.default_rng(1).normal(
                1.0, 0.1, NWAV)).astype(np.float32))
            f = lambda a: sweep_sw.rt_sw_bb_intervals_pallas(
                a[1], a[0], od_fit, a[2], i1, i2, cos_sza=0.5, albedo=0.15,
                with_upwelling=True, interpret=interpret, form=form)[0]
            t = chained_time(f, (bg_od, ssi, seg), ITERS)
            print(f"{job}: {1e3 * t:.3f} ms", flush=True)
        elif job == "isum":
            from exp_kernels import fused_sums_pallas
            from ecckd_tpu.ops.segments import interval_sum_fused, part_of
            # ALL large operands ride the args tuple: closure arrays become
            # HLO constants, and at 2^20 wavenumbers the serialized program
            # blows past the relay's request-size limit (HTTP 413).
            f = lambda a: fused_sums_pallas(a[0], a[1], a[2], a[3], a[4],
                                            i1, i2, tile=2048,
                                            interpret=interpret)
            t = chained_time(f, (metric, planck, hr, fds, fut), ITERS)
            print(f"isum-pallas: {1e3 * t:.3f} ms", flush=True)
            fx = lambda a: interval_sum_fused(
                [part_of(a[0], a[1][1:]), part_of(a[1][1:]), part_of(a[2]),
                 part_of(a[3]), part_of(a[4])], NWAV, i1, i2,
                dtype=metric.dtype)
            t = chained_time(fx, (metric, planck, hr, fds, fut), ITERS)
            print(f"isum-XLA: {1e3 * t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
