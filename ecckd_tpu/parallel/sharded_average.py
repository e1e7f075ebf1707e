"""Wavenumber-sharded g-point averaging over a device mesh.

The multi-chip form of ops.average.average_od_to_gpoints (SURVEY.md §5
"long-context" mapping): the wavenumber axis — the reference's analogue of
sequence length, up to ~5.6M points — is sharded over the mesh's spectral
axis; every device reduces its local shard into per-g-point weighted
partial sums with one-hot MXU matmuls, and the partials are combined with
``psum``/``pmin``/``pmax`` collectives over ICI.  The layer axis (~50) and
the tiny (nz, ng) outputs stay replicated.  This is the psum-reduced
integral the single-host streaming path (ops.streaming) notes it is
equivalent to.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LW_DIFFUSIVITY
from ..ops.average import _METHOD_SCALE, _trans_clamp

SUPPORTED_METHODS = ("linear", "transmission", "transmission-2",
                     "transmission-3", "transmission-10", "square-root")


def sharded_average_od_to_gpoints(mesh, ng: int, g_point, optical_depth,
                                  weight, averaging_method: str,
                                  axis: str = "spectral"
                                  ) -> Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
    """Average spectral od into g-points with the wavenumber axis sharded.

    Args:
      mesh: jax.sharding.Mesh with a named spectral axis.
      ng: static number of g-points.
      g_point: (nwav,) int map wavenumber -> g-point (<0 = unassigned).
      optical_depth: (nz, nwav).
      weight: (nwav,) or (nz, nwav) Planck/SSI weights.
      averaging_method: one of SUPPORTED_METHODS.
      axis: mesh axis name to shard wavenumbers over.

    Returns:
      (od_fit, min_od, max_od), each (nz, ng) — same semantics as the
      streaming single-host path (ops.streaming) for these methods.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:   # older jax
        from jax.experimental.shard_map import shard_map

    if averaging_method not in SUPPORTED_METHODS:
        raise ValueError(
            f"sharded averaging does not support {averaging_method!r}; "
            f"choose from {SUPPORTED_METHODS}")

    od = jnp.asarray(optical_depth)
    nz, nwav = od.shape
    w = jnp.broadcast_to(jnp.asarray(weight), od.shape)
    gp = jnp.asarray(g_point, jnp.int32)

    nshard = mesh.shape[axis]
    pad = (-nwav) % nshard
    if pad:
        od = jnp.pad(od, ((0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
        gp = jnp.pad(gp, (0, pad), constant_values=-1)  # unassigned

    big = jnp.asarray(jnp.finfo(od.dtype).max, od.dtype)

    def local(od_l, w_l, gp_l):
        onehot = (gp_l[:, None] == jnp.arange(ng)[None, :]).astype(od.dtype)

        def seg(v):
            return jnp.matmul(v, onehot, preferred_element_type=od.dtype)

        if averaging_method == "linear":
            num = seg(od_l * w_l)
        elif averaging_method in _METHOD_SCALE:
            scale = _METHOD_SCALE[averaging_method]
            num = seg(-jnp.expm1(-od_l * (LW_DIFFUSIVITY * scale)) * w_l)
        else:   # square-root
            num = seg(jnp.sqrt(od_l) * w_l)
        w_sum = seg(w_l)
        count = seg(jnp.ones_like(od_l))
        in_g = gp_l[None, :, None] == jnp.arange(ng)[None, None, :]
        mn = jnp.min(jnp.where(in_g, od_l[:, :, None], big), axis=1)
        mx = jnp.max(jnp.where(in_g, od_l[:, :, None], -big), axis=1)

        # Combine shard partials over the spectral mesh axis (ICI)
        num = jax.lax.psum(num, axis)
        w_sum = jax.lax.psum(w_sum, axis)
        count = jax.lax.psum(count, axis)
        mn = jax.lax.pmin(mn, axis)
        mx = jax.lax.pmax(mx, axis)
        return num, w_sum, count, mn, mx

    num, w_sum, count, mn, mx = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P())))(od, w, gp)

    num, w_sum, count = np.asarray(num), np.asarray(w_sum), np.asarray(count)
    mn, mx = np.asarray(mn), np.asarray(mx)

    safe = np.where(w_sum > 0.0, w_sum, 1.0)
    mean = num / safe
    if averaging_method == "linear":
        fit = mean
    elif averaging_method in _METHOD_SCALE:
        scale = _METHOD_SCALE[averaging_method]
        mean = np.minimum(_trans_clamp(mean.dtype), mean)
        fit = np.abs(-np.log1p(-mean) / (LW_DIFFUSIVITY * scale))
    else:   # square-root
        fit = mean * mean
    empty = count[0] <= 0.0
    min_od = np.where(empty[None, :] | ~np.isfinite(mn), 0.0, mn)
    max_od = np.where(empty[None, :] | ~np.isfinite(mx), 0.0, mx)
    fit = np.where(empty[None, :], 0.0, fit)
    fit = np.maximum(min_od, np.minimum(fit, max_od))
    degenerate = (min_od > 0.0) & (min_od >= max_od)
    min_od = np.where(degenerate, min_od * 0.99, min_od)
    max_od = np.where(degenerate, max_od * 1.01, max_od)
    return fit, min_od, max_od
