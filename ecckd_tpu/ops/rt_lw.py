"""Longwave no-scattering two-stream radiative transfer.

TPU-native equivalent of src/ecckd/radiative_transfer_lw.cpp:25-142.  The
layer recurrence is a short ``lax.scan`` (nlay ~ 50) vectorized over the
trailing spectral axis; everything is jit/grad/vmap-compatible (the
reference's Adept ``IsActive`` template duality disappears: differentiate
with ``jax.grad`` through these functions).

Three variants:

* :func:`rt_lw` — full spectral fluxes (nlev+1, nwav).
* :func:`rt_lw_bb` — broadband fluxes only, summing over wavenumber inside
  the scan to bound memory (ref ``radiative_transfer_lw_bb``,
  radiative_transfer_lw.cpp:83-142, including its clamped ``factor``).
* :func:`rt_lw_bb_intervals` — the batched-candidate generalization: a
  per-wavenumber grey optical depth (gathered from per-interval fits) and
  prefix-sum interval reductions give the broadband flux profile of *every*
  candidate interval in one pass (replaces the OpenMP loop P1 at
  equipartition.h:100-104).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import LW_DIFFUSIVITY
from .segments import interval_sum

# Below this emissivity the linear-in-planck "factor" is replaced by its
# small-od limit (ref radiative_transfer_lw.cpp:42, :104)
THRESHOLD_EMISSIVITY = 1.0e-5


def _emissivity_factor(od):
    """Emissivity and linear-in-Planck source factor (spectral form).

    factor = 1 - (1/D)*emissivity/od, with the small-od limit 0.5*emissivity
    below THRESHOLD_EMISSIVITY (ref radiative_transfer_lw.cpp:41-43).
    """
    emissivity = -jnp.expm1(-LW_DIFFUSIVITY * od)
    safe_od = jnp.where(od > 0.0, od, 1.0)
    factor = jnp.where(
        emissivity > THRESHOLD_EMISSIVITY,
        1.0 - emissivity * (1.0 / LW_DIFFUSIVITY) / safe_od,
        0.5 * emissivity)
    return emissivity, factor


def _emissivity_factor_bb(od):
    """Clamped emissivity/factor used by the broadband variant
    (ref radiative_transfer_lw.cpp:104-126)."""
    te = THRESHOLD_EMISSIVITY
    emissivity = -jnp.expm1(-LW_DIFFUSIVITY * od)
    factor = jnp.maximum(
        1.0 - (1.0 / LW_DIFFUSIVITY) * jnp.maximum(emissivity, te)
        / jnp.maximum(od, te / LW_DIFFUSIVITY),
        0.5 * te)
    return emissivity, factor


def rt_lw(planck_hl, od, surf_emissivity, surf_planck):
    """Spectral longwave fluxes.

    Args:
      planck_hl: (nlev+1, nwav) Planck function at half levels, W m-2.
      od: (nlay, nwav) layer optical depth.
      surf_emissivity: (nwav,) surface emissivity.
      surf_planck: (nwav,) surface Planck function.

    Returns:
      (flux_dn, flux_up), each (nlev+1, nwav).
    """
    emissivity, factor = _emissivity_factor(od)
    trans = 1.0 - emissivity

    def down_step(flux, xs):
        t, p_top, p_base, f = xs
        new = flux * t + p_top * (1.0 - t - f) + p_base * f
        return new, new

    top = jnp.zeros_like(planck_hl[0])
    _, dn_levels = jax.lax.scan(
        down_step, top,
        (trans, planck_hl[:-1], planck_hl[1:], factor))
    flux_dn = jnp.concatenate([top[None], dn_levels], axis=0)

    surf = surf_planck * surf_emissivity + (1.0 - surf_emissivity) * flux_dn[-1]

    def up_step(flux, xs):
        t, p_top, p_base, f = xs
        new = flux * t + p_base * (1.0 - t - f) + p_top * f
        return new, new

    _, up_levels = jax.lax.scan(
        up_step, surf,
        (trans, planck_hl[:-1], planck_hl[1:], factor),
        reverse=True)
    flux_up = jnp.concatenate([up_levels, surf[None]], axis=0)
    return flux_dn, flux_up


def rt_lw_bb(planck_hl, spectral_od, grey_od, surf_emissivity, surf_planck):
    """Broadband longwave fluxes with a grey od added per layer.

    Ref radiative_transfer_lw_bb (radiative_transfer_lw.cpp:83-142): spectral
    layer od plus a per-layer grey (fitted) od; only the broadband sums are
    returned, with the spectral flux kept as the scan carry to bound memory.

    Args:
      planck_hl: (nlev+1, nwav); spectral_od: (nlay, nwav);
      grey_od: (nlay,); surf_emissivity, surf_planck: (nwav,).

    Returns:
      (flux_dn, flux_up), each (nlev+1,) broadband.
    """
    total_od = spectral_od + grey_od[:, None]
    emissivity, factor = _emissivity_factor_bb(total_od)
    trans = 1.0 - emissivity

    def down_step(flux, xs):
        t, p_top, p_base, f = xs
        new = flux * t + p_top * (1.0 - t - f) + p_base * f
        return new, jnp.sum(new)

    top = jnp.zeros_like(planck_hl[0])
    flux_surf_spec, dn_sums = jax.lax.scan(
        down_step, top, (trans, planck_hl[:-1], planck_hl[1:], factor))
    flux_dn = jnp.concatenate([jnp.zeros((1,), dn_sums.dtype), dn_sums])

    surf = (surf_planck * surf_emissivity
            + (1.0 - surf_emissivity) * flux_surf_spec)

    def up_step(flux, xs):
        t, p_top, p_base, f = xs
        new = flux * t + p_base * (1.0 - t - f) + p_top * f
        return new, jnp.sum(new)

    _, up_sums = jax.lax.scan(
        up_step, surf, (trans, planck_hl[:-1], planck_hl[1:], factor),
        reverse=True)
    flux_up = jnp.concatenate([up_sums, jnp.sum(surf)[None]])
    return flux_dn, flux_up


def rt_lw_bb_intervals(planck_hl, bg_od, grey_od_wav,
                       surf_emissivity, surf_planck, i1, i2,
                       materialize=None):
    """Per-interval broadband longwave fluxes for batched candidates.

    Each wavenumber carries its own grey (fitted) optical depth; the flux
    recurrence runs once over all wavenumbers and prefix-sum interval
    reductions extract the broadband flux profile of each candidate interval
    [i1[k], i2[k]] (inclusive).  This evaluates an entire equipartition sweep
    in one kernel.

    Args:
      planck_hl: (nlev+1, nwav); bg_od: (nlay, nwav) background od;
      grey_od_wav: (nlay, nwav) fitted od gathered per wavenumber;
      surf_emissivity, surf_planck: (nwav,);
      i1, i2: (nseg,) inclusive interval index bounds.

    Returns:
      (flux_dn, flux_up), each (nlev+1, nseg).
    """
    total_od = bg_od + grey_od_wav
    emissivity, factor = _emissivity_factor_bb(total_od)
    trans = 1.0 - emissivity

    # Two execution strategies with identical numerics (the interval
    # reduction is applied row-by-row with the same tiling either way):
    #   materialized — the scan emits the spectral flux rows, then ONE
    #     (nlev+1, nwav)@(nwav, nseg) membership matmul per sweep direction
    #     reduces them on the MXU.  ~nlay fewer small matmuls and membership
    #     rebuilds than the in-scan form; costs (nlev+1, nwav) of HBM.
    #   in-scan — the reference's memory-lean `_bb` shape
    #     (radiative_transfer_lw.cpp:83-104): reduce each level inside the
    #     scan, never holding more than one (nwav,) flux row.
    if materialize is None:
        materialize = 2 * planck_hl.size * planck_hl.dtype.itemsize < (2 << 30)

    if materialize:
        def down_step(flux, xs):
            t, p_top, p_base, f = xs
            new = flux * t + p_top * (1.0 - t - f) + p_base * f
            return new, new

        top = jnp.zeros_like(planck_hl[0])
        flux_surf_spec, dn_rows = jax.lax.scan(
            down_step, top, (trans, planck_hl[:-1], planck_hl[1:], factor))
        surf = (surf_planck * surf_emissivity
                + (1.0 - surf_emissivity) * flux_surf_spec)

        def up_step(flux, xs):
            t, p_top, p_base, f = xs
            new = flux * t + p_base * (1.0 - t - f) + p_top * f
            return new, new

        _, up_rows = jax.lax.scan(
            up_step, surf, (trans, planck_hl[:-1], planck_hl[1:], factor),
            reverse=True)
        flux_dn = interval_sum(
            jnp.concatenate([top[None], dn_rows], axis=0), i1, i2)
        flux_up = interval_sum(
            jnp.concatenate([up_rows, surf[None]], axis=0), i1, i2)
        return flux_dn, flux_up

    def down_step(flux, xs):
        t, p_top, p_base, f = xs
        new = flux * t + p_top * (1.0 - t - f) + p_base * f
        return new, interval_sum(new, i1, i2)

    top = jnp.zeros_like(planck_hl[0])
    flux_surf_spec, dn_sums = jax.lax.scan(
        down_step, top, (trans, planck_hl[:-1], planck_hl[1:], factor))
    flux_dn = jnp.concatenate(
        [jnp.zeros((1, dn_sums.shape[1]), dn_sums.dtype), dn_sums], axis=0)

    surf = (surf_planck * surf_emissivity
            + (1.0 - surf_emissivity) * flux_surf_spec)

    def up_step(flux, xs):
        t, p_top, p_base, f = xs
        new = flux * t + p_base * (1.0 - t - f) + p_top * f
        return new, interval_sum(new, i1, i2)

    _, up_sums = jax.lax.scan(
        up_step, surf, (trans, planck_hl[:-1], planck_hl[1:], factor),
        reverse=True)
    flux_up = jnp.concatenate([up_sums, interval_sum(surf, i1, i2)[None]],
                              axis=0)
    return flux_dn, flux_up
