"""Experimental kernel variants for the candidate-sweep hot path, timed on
the default accelerator against the production kernels.

Variants:
  sweep-v0    current ops/pallas/sweep_lw kernel (per-layer unrolled
              recurrence + jnp.stack of 153 per-level vectors)
  sweep-scan  affine-pair doubling scans in 2-D (nlay64, tile) layout —
              no 1-D vector stacking, 6 shift/fma steps per direction
  isum-pallas fused interval sums (fit operands + truth rows) in one
              Pallas pass, replacing the XLA interval_sum_fused stage

Usage: python scripts/exp_kernels.py [variants...]  (env: EX_NWAV, EX_ITERS,
EX_TILE)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

NWAV = int(os.environ.get("EX_NWAV", 1 << 20))
ITERS = int(os.environ.get("EX_ITERS", 20))
TILE = int(os.environ.get("EX_TILE", 2048))

import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ecckd_tpu.constants import LW_DIFFUSIVITY  # noqa: E402
from ecckd_tpu.ops.pallas.sweep_lw import _split_dot  # noqa: E402


# ---------------------------------------------------------------------------
# sweep-scan: doubling affine scans instead of unrolled 1-D recurrences
# ---------------------------------------------------------------------------

def _affine_scan_down(a, b, npad):
    """Inclusive prefix composition of affine maps along axis 0.

    P_i = f_i o f_{i-1} o ... o f_0 with f_i(x) = a[i] x + b[i].
    Returns (A, B) with P_i(x) = A[i] x + B[i].  a, b are (npad, tile).
    """
    s = 1
    while s < npad:
        ash = jnp.concatenate([jnp.ones_like(a[:s]), a[:-s]], axis=0)
        bsh = jnp.concatenate([jnp.zeros_like(b[:s]), b[:-s]], axis=0)
        b = b + a * bsh
        a = a * ash
        s *= 2
    return a, b


def _affine_scan_up(a, b, npad):
    """Suffix composition: R_i = f_i o f_{i+1} o ... o f_{npad-1}."""
    s = 1
    while s < npad:
        ash = jnp.concatenate([a[s:], jnp.ones_like(a[:s])], axis=0)
        bsh = jnp.concatenate([b[s:], jnp.zeros_like(b[:s])], axis=0)
        b = a * bsh + b
        a = a * ash
        s *= 2
    return a, b


def _sweep_scan_kernel(nlay, nseg, tile, npad,
                       i1_ref, i2_ref, seg_ref, od_fit_ref, planck_ref,
                       bgod_ref, emis_ref, surfp_ref, fd_ref, fu_ref):
    from jax.experimental import pallas as pl

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        fd_ref[:, :] = jnp.zeros_like(fd_ref)
        fu_ref[:, :] = jnp.zeros_like(fu_ref)

    base = t * tile
    seg = seg_ref[0, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, nseg), 1)
    part = (seg[:, None] == col).astype(od_fit_ref.dtype)
    idx = jax.lax.broadcasted_iota(jnp.int32, (tile, nseg), 0) + base
    member = ((idx >= i1_ref[0, :][None, :])
              & (idx <= i2_ref[0, :][None, :])).astype(od_fit_ref.dtype)

    od_fit = od_fit_ref[:, :]
    grey = _split_dot(od_fit, part.T)
    od = bgod_ref[:, :] + grey
    te = 1.0e-5
    emissivity = 1.0 - jnp.exp(-LW_DIFFUSIVITY * od)
    factor = jnp.maximum(
        1.0 - (1.0 / LW_DIFFUSIVITY) * jnp.maximum(emissivity, te)
        / jnp.maximum(od, te / LW_DIFFUSIVITY),
        0.5 * te)
    trans = 1.0 - emissivity
    coeff_top = emissivity - factor

    planck = planck_ref[:, :]
    src_dn = planck[:-1] * coeff_top + planck[1:] * factor
    src_up = planck[1:] * coeff_top + planck[:-1] * factor

    pad = npad - nlay
    idrow_a = jnp.ones((pad, tile), od.dtype)
    idrow_b = jnp.zeros((pad, tile), od.dtype)
    a0 = jnp.concatenate([trans, idrow_a], axis=0)

    # Downward: flux_dn[i+1] = P_i(0) = B_dn[i]
    _, b_dn = _affine_scan_down(a0, jnp.concatenate([src_dn, idrow_b], 0),
                                npad)
    dn = jnp.concatenate([jnp.zeros((1, tile), od.dtype), b_dn[:nlay]], 0)

    # Upward: up[lay] = A_up[lay]*boundary + B_up[lay]; up[nlay] = boundary
    a_up, b_up = _affine_scan_up(a0, jnp.concatenate([src_up, idrow_b], 0),
                                 npad)
    emis = emis_ref[0, :]
    boundary = surfp_ref[0, :] * emis + (1.0 - emis) * dn[nlay]
    up = jnp.concatenate(
        [a_up[:nlay] * boundary[None, :] + b_up[:nlay],
         boundary[None, :]], axis=0)

    both = _split_dot(jnp.concatenate([dn, up], axis=0), member)
    fd_ref[:, :] += both[: nlay + 1]
    fu_ref[:, :] += both[nlay + 1:]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def rt_lw_bb_intervals_scan(planck_hl, bg_od, od_fit, seg_of_wav,
                            surf_emissivity, surf_planck, i1, i2,
                            tile=2048, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nlev1, nwav = planck_hl.shape
    nlay = nlev1 - 1
    nseg = i1.shape[0]
    dtype = planck_hl.dtype
    npad = 1 << (nlay - 1).bit_length()

    ntile = -(-nwav // tile)
    pad = ntile * tile - nwav
    if pad:
        planck_hl = jnp.pad(planck_hl, ((0, 0), (0, pad)))
        bg_od = jnp.pad(bg_od, ((0, 0), (0, pad)))
        surf_emissivity = jnp.pad(surf_emissivity, (0, pad))
        surf_planck = jnp.pad(surf_planck, (0, pad))
        seg_of_wav = jnp.pad(seg_of_wav, (0, pad), constant_values=-1)

    kernel = functools.partial(_sweep_scan_kernel, nlay, nseg, tile, npad)
    whole = lambda i: (0, 0)
    fd, fu = pl.pallas_call(
        kernel,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((1, nseg), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nseg), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nlay, nseg), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((nlev1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nlay, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nlev1, nseg), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((nlev1, nseg), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((nlev1, nseg), dtype),
                   jax.ShapeDtypeStruct((nlev1, nseg), dtype)],
        interpret=interpret,
    )(
        jnp.asarray(i1, jnp.int32)[None, :],
        jnp.asarray(i2, jnp.int32)[None, :],
        jnp.asarray(seg_of_wav, jnp.int32)[None, :],
        jnp.asarray(od_fit, dtype),
        planck_hl,
        bg_od,
        surf_emissivity[None, :].astype(dtype),
        surf_planck[None, :].astype(dtype),
    )
    return fd, fu


# ---------------------------------------------------------------------------
# isum-pallas: fused fit+truth interval sums in one Pallas pass
# ---------------------------------------------------------------------------

def _isum_kernel(nlay, nseg, tile, i1_ref, i2_ref, metric_ref, planck_ref,
                 hr_ref, fd_ref, fu_ref, out_ref):
    from jax.experimental import pallas as pl

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    base = t * tile
    idx = jax.lax.broadcasted_iota(jnp.int32, (tile, nseg), 0) + base
    member = ((idx >= i1_ref[0, :][None, :])
              & (idx <= i2_ref[0, :][None, :])).astype(metric_ref.dtype)

    w_num = planck_ref[1:, :]                  # (nlay, tile)
    rows = jnp.concatenate([
        metric_ref[:, :] * w_num,              # fit numerator
        w_num,                                 # fit denominator
        hr_ref[:, :],                          # truth hr
        fd_ref[0, :][None, :],                 # truth dn surf
        fu_ref[0, :][None, :],                 # truth up toa
    ], axis=0)                                 # (3*nlay+2, tile)
    out_ref[:, :] += _split_dot(rows, member)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_sums_pallas(metric, planck_hl, hr, fd_surf, fu_toa, i1, i2,
                      tile=2048, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nlay, nwav = metric.shape
    nseg = i1.shape[0]
    dtype = metric.dtype
    rows = 3 * nlay + 2

    ntile = -(-nwav // tile)
    pad = ntile * tile - nwav
    if pad:
        metric = jnp.pad(metric, ((0, 0), (0, pad)))
        planck_hl = jnp.pad(planck_hl, ((0, 0), (0, pad)))
        hr = jnp.pad(hr, ((0, 0), (0, pad)))
        fd_surf = jnp.pad(fd_surf, (0, pad))
        fu_toa = jnp.pad(fu_toa, (0, pad))

    kernel = functools.partial(_isum_kernel, nlay, nseg, tile)
    whole = lambda i: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((1, nseg), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nseg), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((nlay, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nlay + 1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nlay, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, nseg), whole,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, nseg), dtype),
        interpret=interpret,
    )(
        jnp.asarray(i1, jnp.int32)[None, :],
        jnp.asarray(i2, jnp.int32)[None, :],
        metric, planck_hl, hr,
        fd_surf[None, :].astype(dtype),
        fu_toa[None, :].astype(dtype),
    )
    return out


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

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
    variants = sys.argv[1:] or ["sweep-v0", "sweep-scan", "isum-pallas"]
    data = bench.build_inputs(bench.NLAY, NWAV, bench.NSEG, np.float32)
    dev = jax.devices()[0]
    interpret = dev.platform != "tpu"
    print(f"device={dev.platform} nwav={NWAV} nlay={bench.NLAY} "
          f"nseg={bench.NSEG} tile={TILE} iters={ITERS} "
          f"interpret={interpret}", flush=True)

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
    od_fit = jnp.asarray(fit_optical_depth_lw("transmission", planck,
                                              metric, i1, i2))

    if "sweep-v0" in variants:
        from ecckd_tpu.ops.pallas.sweep_lw import rt_lw_bb_intervals_pallas
        f = lambda a: rt_lw_bb_intervals_pallas(
            planck, a[0], od_fit, seg, emis, surfp, i1, i2,
            interpret=interpret)[0]
        t = chained_time(f, (bg_od,), ITERS)
        print(f"sweep-v0 (unrolled+stack): {1e3 * t:.3f} ms", flush=True)

    if "sweep-scan" in variants:
        f = lambda a: rt_lw_bb_intervals_scan(
            planck, a[0], od_fit, seg, emis, surfp, i1, i2, tile=TILE,
            interpret=interpret)[0]
        # correctness check vs v0 first
        from ecckd_tpu.ops.pallas.sweep_lw import rt_lw_bb_intervals_pallas
        ref_fd, ref_fu = rt_lw_bb_intervals_pallas(
            planck, bg_od, od_fit, seg, emis, surfp, i1, i2,
            interpret=interpret)
        got_fd, got_fu = rt_lw_bb_intervals_scan(
            planck, bg_od, od_fit, seg, emis, surfp, i1, i2, tile=TILE,
            interpret=interpret)
        err = max(float(jnp.max(jnp.abs(got_fd - ref_fd))
                        / (jnp.max(jnp.abs(ref_fd)) + 1e-30)),
                  float(jnp.max(jnp.abs(got_fu - ref_fu))
                        / (jnp.max(jnp.abs(ref_fu)) + 1e-30)))
        print(f"sweep-scan max rel err vs v0: {err:.2e}", flush=True)
        t = chained_time(f, (bg_od,), ITERS)
        print(f"sweep-scan (doubling scans, tile={TILE}): {1e3 * t:.3f} ms",
              flush=True)

    if "isum-pallas" in variants:
        from ecckd_tpu.ops.segments import interval_sum_fused, part_of
        w_num = planck[1:]
        ref = interval_sum_fused(
            [part_of(metric, w_num), part_of(w_num), part_of(hr),
             part_of(fds), part_of(fut)], NWAV, i1, i2, dtype=metric.dtype)
        got = fused_sums_pallas(metric, planck, hr, fds, fut, i1, i2,
                                tile=TILE, interpret=interpret)
        err = float(jnp.max(jnp.abs(got - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-30))
        print(f"isum-pallas max rel err vs XLA: {err:.2e}", flush=True)
        f = lambda a: fused_sums_pallas(a[0], planck, hr, fds, fut, i1, i2,
                                        tile=TILE, interpret=interpret)
        t = chained_time(f, (metric,), ITERS)
        print(f"isum-pallas (fused fit+truth sums, tile={TILE}): "
              f"{1e3 * t:.3f} ms", flush=True)
        fx = lambda a: interval_sum_fused(
            [part_of(a[0], w_num), part_of(w_num), part_of(hr),
             part_of(fds), part_of(fut)], NWAV, i1, i2, dtype=metric.dtype)
        t = chained_time(fx, (metric,), ITERS)
        print(f"isum-XLA same rows: {1e3 * t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
