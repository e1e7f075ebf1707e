"""Fused Pallas TPU kernel for the LW candidate-sweep broadband RT.

The hot loop of find_g_points (SURVEY.md §7 "hard parts"): the broadband
two-stream recurrence evaluated for every wavenumber with per-interval
reductions.  The XLA formulation scans over layers with (nwav,) carries,
paying an HBM round trip of several million-point arrays per layer; this
kernel tiles the wavenumber axis, keeps the ENTIRE down+up recurrence of a
tile in VMEM, and writes only the (nlev+1, nseg) per-interval partial sums —
HBM traffic drops from O(nlay * nwav) array passes to a single read of each
input.

Per tile t of TILE wavenumbers:
  1. od = bg_od + P @ od_fit  (P = partition one-hot from seg_of_wav -> the
     grey fitted od gathered on the fly, never materialized in HBM)
  2. emissivity/factor (broadband clamped form, radiative_transfer_lw.cpp:104)
  3. downward then upward recurrence over layers (fori_loop, VMEM resident)
  4. per-level flux rows reduced to intervals via a (TILE, nseg) membership
     matmul on the MXU; accumulated into the output across the sequential
     TPU grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import LW_DIFFUSIVITY

# Wavenumber tile width. VMEM holds ~2 MB of per-tile state per 1024
# lanes (bg_od/planck blocks + recurrence temporaries); larger tiles
# amortize dependency latency and grow the K dimension of the interval
# reduction matmuls. Measured on a v5e chip (scan form, nlay=50,
# nseg=64): at nwav=2^21 the ISOLATED sweep prefers 8192 (8.75 ms vs
# 9.04), but the FULL chained kernel (isum+sweep+cost, the production
# shape) measures 8192 = 8.07e9 vs 4096 = 8.37e9 bins*layers/s — VMEM
# pressure interacts with the fused interval-sum pass — so 4096 stays
# the default. Override with ECCKD_SWEEP_TILE.
import os as _os
TILE = int(_os.environ.get("ECCKD_SWEEP_TILE", 4096))

# Recurrence form: "scan" composes the per-layer affine flux maps with
# log2(nlay) doubling steps over the full (nlay, tile) block — 2-D
# shift/FMA work with no serial chain and no 1-D row stacking; "unroll"
# is the static per-layer unroll (3 interleaved 1-D chains).  Measured on
# a v5e chip at nwav=2^20/nlay=50/nseg=64 the scan form is 1.20x faster
# (4.40 ms vs 5.26 ms per sweep, scripts/exp_kernels.py); both agree to
# ~7e-7 relative in f32.
FORM = _os.environ.get("ECCKD_SWEEP_FORM", "scan")


# Reduction precision for the 0/1-matrix dots: "split" (default, two
# bf16 MXU passes, ~2^-16 relative) or "fast" (ONE bf16 pass, ~2^-8
# relative — halves the matmul cost of the flux reductions).  Validated
# on the partition rigs (tests/test_split_dot_fast.py): with the r5
# prefix fit path the fit/truth sums are unaffected (double-float
# gathers), only the flux reduction feels the bf16 truncation, and
# refinement bounds moved <=2 ranks on the synthetic rig.  Bound
# movement is still nonzero, so "split" stays the default for
# reference-parity runs; "fast" is a measured speed/fidelity trade.
SPLIT_DOT_MODE = _os.environ.get("ECCKD_SPLIT_DOT", "split")


def _split_dot(a, b01):
    """f32 matmul against an exact-0/1 matrix in TWO bf16 MXU passes.

    Mosaic lowers f32 dots only at DEFAULT (one bf16 pass, ~2^-8 relative
    error) or HIGHEST (six passes); HIGH is unsupported. Because ``b01``
    contains only 0.0/1.0 (exact in bf16), splitting ``a`` into
    hi = bf16(a) and lo = bf16(a - hi) makes every product exact, so the
    only error left is the two-term truncation (~2^-16 relative) and the
    f32 accumulation — 3x cheaper than HIGHEST at equivalent fidelity for
    this kernel's 1e-4-tolerance costs.

    float64 inputs (interpret mode on the determinism-sensitive CPU path)
    bypass the split entirely: a two-term bf16 split would silently drop
    ~40 bits, so use a plain HIGHEST-precision dot instead.
    """
    if a.dtype == jnp.float64:
        return jnp.dot(a, b01.astype(a.dtype),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=a.dtype)
    bf = jnp.bfloat16
    b_bf = b01.astype(bf)
    if SPLIT_DOT_MODE == "fast":
        return jnp.dot(a.astype(bf), b_bf, preferred_element_type=a.dtype)
    a_hi = a.astype(bf)
    a_lo = (a - a_hi.astype(a.dtype)).astype(bf)
    return (jnp.dot(a_hi, b_bf, preferred_element_type=a.dtype)
            + jnp.dot(a_lo, b_bf, preferred_element_type=a.dtype))


def _sweep_kernel(nlay: int, nseg: int, tile: int,
                  i1_ref, i2_ref, seg_ref, od_fit_ref, planck_ref,
                  bgod_ref, emis_ref, surfp_ref, fd_ref, fu_ref):
    from jax.experimental import pallas as pl

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        fd_ref[:, :] = jnp.zeros_like(fd_ref)
        fu_ref[:, :] = jnp.zeros_like(fu_ref)

    base = t * tile
    seg = seg_ref[0, :]                                   # (tile,)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, nseg), 1)
    # Partition one-hot: which interval's fitted od each wavenumber carries
    part = (seg[:, None] == col).astype(od_fit_ref.dtype)  # (tile, nseg)
    # Membership: which intervals each wavenumber's flux contributes to
    # (may overlap at shared boundary indices, matching the reference's
    # ceil/floor index mapping)
    idx = jax.lax.broadcasted_iota(jnp.int32, (tile, nseg), 0) + base
    member = ((idx >= i1_ref[0, :][None, :])
              & (idx <= i2_ref[0, :][None, :])).astype(od_fit_ref.dtype)

    od_fit = od_fit_ref[:, :]                             # (nlay, nseg)
    grey = _split_dot(od_fit, part.T)                     # (nlay, tile)
    od = bgod_ref[:, :] + grey
    te = 1.0e-5
    # expm1 is not lowerable in Pallas TPU; plain exp is fine in f32
    # because emissivity precision matters only near the clamp
    emissivity = 1.0 - jnp.exp(-LW_DIFFUSIVITY * od)
    factor = jnp.maximum(
        1.0 - (1.0 / LW_DIFFUSIVITY) * jnp.maximum(emissivity, te)
        / jnp.maximum(od, te / LW_DIFFUSIVITY),
        0.5 * te)
    trans = 1.0 - emissivity
    coeff_top = emissivity - factor

    planck = planck_ref[:, :]                             # (nlev+1, tile)

    # Per-layer emission source terms hoisted OUT of the serial recurrence:
    # they have no step-to-step dependency, so computing them as (nlay,
    # tile) arrays up front leaves each recurrence step a single FMA on
    # the dependency chain instead of three dependent ops.
    src_dn = planck[:-1] * coeff_top + planck[1:] * factor
    src_up = planck[1:] * coeff_top + planck[:-1] * factor

    # Static unroll over layers (nlay ~ 50): Pallas TPU cannot lower
    # dynamic_slice of computed values.  The recurrences are the kernel's
    # latency bottleneck (2*nlay dependent steps), so the upward sweep is
    # decomposed affinely in its surface boundary value
    #   up[lay] = B[lay] + boundary * A[lay],
    #   B[nlay] = 0, A[nlay] = 1,
    #   B[lay] = B[lay+1]*trans[lay] + src_up[lay], A[lay] = A[lay+1]*trans[lay]
    # which removes the down->up serialization: the down chain, the B
    # chain and the A cumulative product are three INDEPENDENT chains of
    # one FMA/mul each, interleaved by the unroll for ~3x the ILP of the
    # naive dn-then-up form.
    flux_dn = jnp.zeros((tile,), od.dtype)
    b = jnp.zeros((tile,), od.dtype)
    a = jnp.ones((tile,), od.dtype)
    dn_rows = [flux_dn]                  # level 0: no downwelling at TOA
    b_rows = [None] * (nlay + 1)
    a_rows = [None] * (nlay + 1)
    b_rows[nlay] = b
    a_rows[nlay] = a
    for k in range(nlay):
        up_lay = nlay - 1 - k
        flux_dn = flux_dn * trans[k] + src_dn[k]
        b = b * trans[up_lay] + src_up[up_lay]
        a = a * trans[up_lay]
        dn_rows.append(flux_dn)
        b_rows[up_lay] = b
        a_rows[up_lay] = a

    emis = emis_ref[0, :]
    boundary = surfp_ref[0, :] * emis + (1.0 - emis) * flux_dn
    up = jnp.stack(b_rows) + boundary[None, :] * jnp.stack(a_rows)

    # The per-level flux rows of BOTH sweep directions are stacked into
    # ONE (2*(nlev+1), tile) matrix so the interval reduction is a single
    # MXU matmul with M=2*(nlev+1) (~102, nearly a full 128-row MXU tile)
    # — per-level M=1 matmuls waste >100x of the systolic array, and
    # separate per-direction matmuls (M=51) waste half.
    both = _split_dot(jnp.concatenate([jnp.stack(dn_rows), up]),
                      member)                 # (2*(nlev+1), nseg)
    fd_ref[:, :] += both[: nlay + 1]
    fu_ref[:, :] += both[nlay + 1:]


def _affine_scan_down(a, b, npad):
    """Inclusive prefix composition of affine maps along axis 0.

    P_i = f_i o f_{i-1} o ... o f_0 with f_i(x) = a[i] x + b[i]; returns
    (A, B) with P_i(x) = A[i] x + B[i].  log2(npad) doubling steps, each a
    shifted elementwise FMA over the whole (npad, tile) block — no serial
    per-layer chain.
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


def _sweep_kernel_scan(nlay: int, nseg: int, tile: int,
                       i1_ref, i2_ref, seg_ref, od_fit_ref, planck_ref,
                       bgod_ref, emis_ref, surfp_ref, fd_ref, fu_ref):
    """Scan-form sweep kernel: identical physics to :func:`_sweep_kernel`
    up to the source terms, then both directional recurrences evaluated as
    affine-map compositions by doubling (the layer recurrences are affine
    in the running flux: flux' = trans * flux + src).  The upward sweep is
    composed as suffix maps of the surface boundary value, so the down->up
    serialization reduces to one broadcast FMA after both scans."""
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

    # Pad the layer axis to a power of two with identity maps (a=1, b=0):
    # appended AFTER the real layers they change neither the prefix
    # compositions (first nlay entries) nor the suffix compositions
    # (identity suffix).
    npad = 1 << max(nlay - 1, 0).bit_length()
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


def rt_lw_bb_intervals_pallas(planck_hl, bg_od, od_fit, seg_of_wav,
                              surf_emissivity, surf_planck, i1, i2,
                              interpret=False, form=None):
    """Per-interval broadband LW fluxes, fused Pallas kernel (see
    :func:`_rt_lw_bb_intervals_pallas`).  ``form`` (default: module FORM)
    is resolved HERE, outside the jit, so the module default is not baked
    into a ``form=None`` cache entry at first trace."""
    return _rt_lw_bb_intervals_pallas(
        planck_hl, bg_od, od_fit, seg_of_wav, surf_emissivity, surf_planck,
        i1, i2, interpret=interpret, form=FORM if form is None else form)


# Keep a handle for cache clearing in tuning scripts (public jit API)
rt_lw_bb_intervals_pallas._clear_cache = (
    lambda: _rt_lw_bb_intervals_pallas.clear_cache())


@functools.partial(jax.jit, static_argnames=("interpret", "form"))
def _rt_lw_bb_intervals_pallas(planck_hl, bg_od, od_fit, seg_of_wav,
                               surf_emissivity, surf_planck, i1, i2,
                               interpret=False, form="scan"):
    """Per-interval broadband LW fluxes, fused Pallas kernel.

    Args:
      planck_hl: (nlev+1, nwav); bg_od: (nlay, nwav);
      od_fit: (nlay, nseg) fitted od per interval;
      seg_of_wav: (nwav,) int32 partition map (whose fit each wav carries);
      surf_emissivity, surf_planck: (nwav,);
      i1, i2: (nseg,) inclusive interval bounds.

    Returns (flux_dn, flux_up), each (nlev+1, nseg).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nlev1, nwav = planck_hl.shape
    nlay = nlev1 - 1
    nseg = i1.shape[0]
    dtype = planck_hl.dtype

    tile = min(TILE, max(256, 1 << (nwav - 1).bit_length()))
    ntile = -(-nwav // tile)
    pad = ntile * tile - nwav
    if pad:
        planck_hl = jnp.pad(planck_hl, ((0, 0), (0, pad)))
        bg_od = jnp.pad(bg_od, ((0, 0), (0, pad)))
        surf_emissivity = jnp.pad(surf_emissivity, (0, pad))
        surf_planck = jnp.pad(surf_planck, (0, pad))
        # Padded wavenumbers carry segment -1: no fit od, no membership
        seg_of_wav = jnp.pad(seg_of_wav, (0, pad), constant_values=-1)

    grid = (ntile,)
    if form is None:
        # The public wrapper always resolves form OUTSIDE the jit; a None
        # here would bake the import-time FORM into this cache entry.
        raise ValueError("form must be resolved by the public wrapper")
    kernel_fn = _sweep_kernel_scan if form == "scan" else _sweep_kernel
    kernel = functools.partial(kernel_fn, nlay, nseg, tile)
    out_shape = [jax.ShapeDtypeStruct((nlev1, nseg), dtype),
                 jax.ShapeDtypeStruct((nlev1, nseg), dtype)]
    whole = lambda i: (0, 0)
    fd, fu = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nseg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # i1
            pl.BlockSpec((1, nseg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # i2
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # seg_of_wav
            pl.BlockSpec((nlay, nseg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # od_fit
            pl.BlockSpec((nlev1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # planck
            pl.BlockSpec((nlay, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # bg_od
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # emis
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # surf planck
        ],
        out_specs=[
            pl.BlockSpec((nlev1, nseg), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((nlev1, nseg), whole, memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
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
