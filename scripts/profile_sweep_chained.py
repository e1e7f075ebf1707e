"""Chained-dispatch stage decomposition of the candidate-sweep kernel.

Like bench.py, every stage is timed with all iterations inside ONE
jitted fori_loop (a data dependency serializes them), so the ~50 ms
relay dispatch latency cannot distort per-stage numbers.

Usage: python scripts/profile_sweep_chained.py   (env: PS_NWAV, PS_ITERS)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

NWAV = int(os.environ.get("PS_NWAV", 1 << 20))
ITERS = int(os.environ.get("PS_ITERS", 10))

import bench  # noqa: E402


def chained_time(fn, arrays, n):
    """Time fn(arrays) with n chained evaluations in one dispatch.
    fn must return an array; arrays is a tuple of jnp arrays, the FIRST of
    which is perturbed ADDITIVELY by the loop-carried accumulator scaled
    so far down that the perturbation underflows to zero at runtime — XLA
    constant-folds/hoists the multiplicative (1 + acc*0) form for pure-XLA
    stages, invalidating per-stage numbers (see CLAUDE.md kernel notes)."""
    import jax
    import jax.numpy as jnp

    def chained(arrays, n):
        first = arrays[0]

        def body(_, acc):
            a0 = first + acc * jnp.asarray(1e-45, first.dtype)
            out = fn((a0,) + tuple(arrays[1:]))
            return acc + jnp.sum(out) * jnp.asarray(1e-30, out.dtype)

        return jax.lax.fori_loop(0, n, body,
                                 jnp.asarray(0.0, first.dtype))

    jitted = jax.jit(chained, static_argnames=())
    out = jitted(arrays, 1)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = jitted(arrays, n)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from ecckd_tpu.ops.average import fit_optical_depth_lw
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
        fds = jnp.asarray(data["flux_dn_surf"])
        fut = jnp.asarray(data["flux_up_toa"])
        i1 = jnp.asarray(data["i1"])
        i2 = jnp.asarray(data["i2"])
        seg = jnp.asarray(data["seg_of_wav"])

        t = chained_time(
            lambda a: fit_optical_depth_lw("transmission", planck, a[0],
                                           i1, i2),
            (metric,), ITERS)
        print(f"fit_optical_depth_lw (stacked interval_sum): "
              f"{1e3 * t:.3f} ms", flush=True)
        od_fit = fit_optical_depth_lw("transmission", planck, metric, i1, i2)

        t = chained_time(
            lambda a: interval_sum(
                jnp.concatenate([a[0], fds[None, :], fut[None, :]], axis=0),
                i1, i2),
            (hr,), ITERS)
        print(f"truth stacked interval_sum (nlay+2, nwav): {1e3 * t:.3f} ms",
              flush=True)

        if dev.platform == "tpu":
            from ecckd_tpu.ops.pallas.sweep_lw import (
                rt_lw_bb_intervals_pallas)

            t = chained_time(
                lambda a: rt_lw_bb_intervals_pallas(
                    planck, a[0], od_fit, seg, emis, surfp, i1, i2)[0],
                (bg_od,), ITERS)
            print(f"rt_lw_bb_intervals PALLAS (fused): {1e3 * t:.3f} ms",
                  flush=True)

        total = NWAV * bench.NLAY
        print(f"(full-kernel bench reference: {total} bins*layers/iter)",
              flush=True)


if __name__ == "__main__":
    main()
