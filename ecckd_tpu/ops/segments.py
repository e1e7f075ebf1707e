"""Contiguous-interval reductions via prefix sums.

The framework's core reduction primitive.  In the reference, g-point and
candidate-interval reductions are serial loops or OpenMP loops over ``find()``
index vectors (e.g. average_optical_depth.cpp:37-44,
find_g_points.cpp:54-204).  On TPU, every such reduction is over a
*contiguous* range of rank-ordered wavenumbers, so a sum over interval
[i1, i2] (inclusive) is a difference of prefix sums: O(nwav) total for any
number of intervals, fully parallel, no scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interval_sum(values, i1, i2, tile: int = 8192):
    """Sum ``values`` over inclusive index intervals along the last axis.

    Implemented as tiled membership matmuls: per wavenumber tile a
    (tile, nseg) membership matrix ``i1 <= idx <= i2`` is built on the fly
    and the reduction rides the MXU.  Exact for arbitrary (overlapping)
    intervals, O(n * nseg) MACs, no prefix sums (prefix scans map poorly to
    TPU compared to matmuls).

    Args:
      values: (..., n) data.
      i1, i2: (nseg,) int interval bounds, inclusive, 0 <= i1 <= i2 < n.

    Returns:
      (..., nseg) per-interval sums.
    """
    v = jnp.asarray(values)
    i1 = jnp.asarray(i1, jnp.int32)
    i2 = jnp.asarray(i2, jnp.int32)
    n = v.shape[-1]
    nseg = i1.shape[0]
    if n <= tile:
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, nseg), 0)
        member = ((idx >= i1[None, :]) & (idx <= i2[None, :])).astype(v.dtype)
        return jnp.matmul(v, member, preferred_element_type=v.dtype)

    ntile = -(-n // tile)
    pad = ntile * tile - n
    v_p = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, pad)])
    v_t = jnp.moveaxis(v_p.reshape(v.shape[:-1] + (ntile, tile)), -2, 0)
    bases = jnp.arange(ntile, dtype=jnp.int32) * tile
    tile_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, nseg), 0)

    def body(acc, xs):
        v_tile, base = xs
        idx = tile_iota + base
        member = ((idx >= i1[None, :])
                  & (idx <= i2[None, :])).astype(v.dtype)
        return acc + jnp.matmul(v_tile, member,
                                preferred_element_type=v.dtype), None

    init = jnp.zeros(v.shape[:-1] + (nseg,), v.dtype)
    out, _ = jax.lax.scan(body, init, (v_t, bases))
    return out


def interval_count(mask, i1, i2, dtype=None):
    """Count of True values in each interval of the last axis."""
    m = jnp.asarray(mask)
    if dtype is None:
        dtype = jnp.result_type(float)
    return interval_sum(m.astype(dtype), i1, i2)


def segment_matmul(values, onehot):
    """Segment reduction as an MXU matmul: (..., n) @ (n, nseg).

    For non-contiguous segment maps (e.g. g-point membership after base_split
    dissection), use a one-hot membership matrix and let the MXU do the
    reduction; preferred when nseg is small and values has many rows.
    """
    return jnp.matmul(values, onehot, preferred_element_type=values.dtype)


def gpoint_onehot(g_point, ng, dtype=jnp.float32):
    """One-hot (nwav, ng) membership matrix from a per-wavenumber g-point map.

    Entries with g_point < 0 (unassigned) contribute to no g-point.
    """
    gp = jnp.asarray(g_point)
    return (gp[:, None] == jnp.arange(ng)[None, :]).astype(dtype)
