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

TILE = 1024


def _sweep_kernel(nlay: int, nseg: int,
                  i1_ref, i2_ref, seg_ref, od_fit_ref, planck_ref,
                  bgod_ref, emis_ref, surfp_ref, fd_ref, fu_ref):
    from jax.experimental import pallas as pl

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        fd_ref[:, :] = jnp.zeros_like(fd_ref)
        fu_ref[:, :] = jnp.zeros_like(fu_ref)

    base = t * TILE
    seg = seg_ref[0, :]                                   # (TILE,)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE, nseg), 1)
    # Partition one-hot: which interval's fitted od each wavenumber carries
    part = (seg[:, None] == col).astype(od_fit_ref.dtype)  # (TILE, nseg)
    # Membership: which intervals each wavenumber's flux contributes to
    # (may overlap at shared boundary indices, matching the reference's
    # ceil/floor index mapping)
    idx = jax.lax.broadcasted_iota(jnp.int32, (TILE, nseg), 0) + base
    member = ((idx >= i1_ref[0, :][None, :])
              & (idx <= i2_ref[0, :][None, :])).astype(od_fit_ref.dtype)

    od_fit = od_fit_ref[:, :]                             # (nlay, nseg)
    grey = jnp.dot(od_fit, part.T,
                   preferred_element_type=od_fit.dtype,
                   precision=jax.lax.Precision.HIGHEST)  # (nlay, TILE)
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

    planck = planck_ref[:, :]                             # (nlev+1, TILE)

    # Static unroll over layers (nlay ~ 50): Pallas TPU cannot lower
    # dynamic_slice of computed values.  The per-level flux rows are
    # stacked into ONE (nlev+1, TILE) matrix per sweep direction so the
    # interval reduction is a single well-shaped MXU matmul — per-level
    # M=1 matmuls waste >100x of the systolic array.
    flux = jnp.zeros((TILE,), od.dtype)
    dn_rows = [flux]                     # level 0: no downwelling at TOA
    for lay in range(nlay):
        flux = (flux * trans[lay]
                + planck[lay] * coeff_top[lay]
                + planck[lay + 1] * factor[lay])
        dn_rows.append(flux)
    fd_ref[:, :] += jnp.dot(
        jnp.stack(dn_rows), member, preferred_element_type=flux.dtype,
        precision=jax.lax.Precision.HIGHEST)

    emis = emis_ref[0, :]
    flux = surfp_ref[0, :] * emis + (1.0 - emis) * flux
    up_rows = [None] * (nlay + 1)
    up_rows[nlay] = flux
    for lay in range(nlay - 1, -1, -1):
        flux = (flux * trans[lay]
                + planck[lay + 1] * coeff_top[lay]
                + planck[lay] * factor[lay])
        up_rows[lay] = flux
    fu_ref[:, :] += jnp.dot(
        jnp.stack(up_rows), member, preferred_element_type=flux.dtype,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rt_lw_bb_intervals_pallas(planck_hl, bg_od, od_fit, seg_of_wav,
                              surf_emissivity, surf_planck, i1, i2,
                              interpret=False):
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

    ntile = -(-nwav // TILE)
    pad = ntile * TILE - nwav
    if pad:
        planck_hl = jnp.pad(planck_hl, ((0, 0), (0, pad)))
        bg_od = jnp.pad(bg_od, ((0, 0), (0, pad)))
        surf_emissivity = jnp.pad(surf_emissivity, (0, pad))
        surf_planck = jnp.pad(surf_planck, (0, pad))
        # Padded wavenumbers carry segment -1: no fit od, no membership
        seg_of_wav = jnp.pad(seg_of_wav, (0, pad), constant_values=-1)

    grid = (ntile,)
    kernel = functools.partial(_sweep_kernel, nlay, nseg)
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
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # seg_of_wav
            pl.BlockSpec((nlay, nseg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # od_fit
            pl.BlockSpec((nlev1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # planck
            pl.BlockSpec((nlay, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # bg_od
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),       # emis
            pl.BlockSpec((1, TILE), lambda i: (0, i),
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
