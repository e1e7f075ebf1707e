"""Shortwave radiative transfer: direct beam + no-Rayleigh two-stream.

TPU-native equivalent of src/ecckd/radiative_transfer_sw.cpp:24-184.
Downwelling is Beer-Lambert attenuation of the direct beam at sec(sza);
upwelling (no-Rayleigh variant) reflects off the surface with albedo and
propagates at the fixed two-stream secant 2.0 (Zdunkowski 1980, ref :70).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import SW_DIFFUSE_SECANT
from .segments import interval_sum


def rt_direct_sw(cos_sza, ssi, od):
    """Spectral direct-beam downwelling flux (nlev+1, nwav).

    Args: cos_sza scalar; ssi (nwav,) solar irradiance; od (nlay, nwav).
    """
    minus_sec = -1.0 / cos_sza
    top = cos_sza * ssi

    def step(flux, od_lay):
        new = flux * jnp.exp(minus_sec * od_lay)
        return new, new

    _, dn = jax.lax.scan(step, top, od)
    return jnp.concatenate([top[None], dn], axis=0)


def rt_norayleigh_sw(cos_sza, ssi, od, albedo):
    """Spectral down+up fluxes with surface reflection, no Rayleigh.

    Args: albedo (nwav,) surface albedo (per g-point/band in CKD use).
    Returns: (flux_dn, flux_up), each (nlev+1, nwav).
    """
    flux_dn = rt_direct_sw(cos_sza, ssi, od)
    surf = flux_dn[-1] * albedo

    def step(flux, od_lay):
        new = flux * jnp.exp(-SW_DIFFUSE_SECANT * od_lay)
        return new, new

    _, up = jax.lax.scan(step, surf, od, reverse=True)
    return flux_dn, jnp.concatenate([up, surf[None]], axis=0)


def rt_direct_sw_bb(cos_sza, ssi, spectral_od, grey_od):
    """Broadband direct flux with grey od per layer (ref :119-146)."""
    minus_sec = -1.0 / cos_sza
    total_od = spectral_od + grey_od[:, None]
    top = cos_sza * ssi

    def step(flux, od_lay):
        new = flux * jnp.exp(minus_sec * od_lay)
        return new, jnp.sum(new)

    _, dn = jax.lax.scan(step, top, total_od)
    return jnp.concatenate([jnp.sum(top)[None], dn])


def rt_norayleigh_sw_bb(cos_sza, ssi, spectral_od, grey_od, albedo):
    """Broadband down+up fluxes with grey od and scalar albedo (ref :148-196)."""
    minus_sec = -1.0 / cos_sza
    total_od = spectral_od + grey_od[:, None]
    top = cos_sza * ssi

    def dn_step(flux, od_lay):
        new = flux * jnp.exp(minus_sec * od_lay)
        return new, jnp.sum(new)

    surf_spec, dn = jax.lax.scan(dn_step, top, total_od)
    flux_dn = jnp.concatenate([jnp.sum(top)[None], dn])

    up_surf = surf_spec * albedo

    def up_step(flux, od_lay):
        new = flux * jnp.exp(-SW_DIFFUSE_SECANT * od_lay)
        return new, jnp.sum(new)

    _, up = jax.lax.scan(up_step, up_surf, total_od, reverse=True)
    flux_up = jnp.concatenate([up, jnp.sum(up_surf)[None]])
    return flux_dn, flux_up


def rt_sw_bb_intervals(cos_sza, ssi, bg_od, grey_od_wav, albedo, i1, i2,
                       with_upwelling=True, materialize=None):
    """Per-interval broadband SW fluxes for batched candidate evaluation.

    Like :func:`rt_lw.rt_lw_bb_intervals`: each wavenumber carries its own
    fitted grey od, and prefix-sum interval reductions extract broadband flux
    profiles for every candidate interval in one pass.

    Returns (flux_dn, flux_up) each (nlev+1, nseg); flux_up is zeros when
    ``with_upwelling`` is False (albedo <= 0 in the reference,
    calc_cost_function_sw.cpp:59-88).
    """
    minus_sec = -1.0 / cos_sza
    total_od = bg_od + grey_od_wav
    top = cos_sza * ssi

    # Same two strategies as rt_lw_bb_intervals: materialize the spectral
    # flux rows and reduce with one big MXU matmul per direction, or reduce
    # in-scan (the reference's memory-lean shape).  Identical numerics.
    if materialize is None:
        nlev1 = total_od.shape[0] + 1
        materialize = (2 * nlev1 * total_od.shape[-1]
                       * total_od.dtype.itemsize) < (2 << 30)

    if materialize:
        def dn_step(flux, od_lay):
            new = flux * jnp.exp(minus_sec * od_lay)
            return new, new

        surf_spec, dn_rows = jax.lax.scan(dn_step, top, total_od)
        flux_dn = interval_sum(
            jnp.concatenate([top[None], dn_rows], axis=0), i1, i2)
        if not with_upwelling:
            return flux_dn, jnp.zeros_like(flux_dn)
        up_surf = surf_spec * albedo

        def up_step(flux, od_lay):
            new = flux * jnp.exp(-SW_DIFFUSE_SECANT * od_lay)
            return new, new

        _, up_rows = jax.lax.scan(up_step, up_surf, total_od, reverse=True)
        flux_up = interval_sum(
            jnp.concatenate([up_rows, up_surf[None]], axis=0), i1, i2)
        return flux_dn, flux_up

    def dn_step(flux, od_lay):
        new = flux * jnp.exp(minus_sec * od_lay)
        return new, interval_sum(new, i1, i2)

    surf_spec, dn = jax.lax.scan(dn_step, top, total_od)
    flux_dn = jnp.concatenate([interval_sum(top, i1, i2)[None], dn], axis=0)

    if not with_upwelling:
        return flux_dn, jnp.zeros_like(flux_dn)

    up_surf = surf_spec * albedo

    def up_step(flux, od_lay):
        new = flux * jnp.exp(-SW_DIFFUSE_SECANT * od_lay)
        return new, interval_sum(new, i1, i2)

    _, up = jax.lax.scan(up_step, up_surf, total_od, reverse=True)
    flux_up = jnp.concatenate([up, interval_sum(up_surf, i1, i2)[None]],
                              axis=0)
    return flux_dn, flux_up
