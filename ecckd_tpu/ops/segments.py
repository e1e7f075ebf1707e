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

import jax.numpy as jnp


def interval_sum(values, i1, i2):
    """Sum ``values`` over inclusive index intervals along the last axis.

    Args:
      values: (..., n) data.
      i1, i2: (nseg,) int32 interval bounds, inclusive, 0 <= i1 <= i2 < n.

    Returns:
      (..., nseg) per-interval sums.
    """
    v = jnp.asarray(values)
    c = jnp.cumsum(v, axis=-1)
    zero = jnp.zeros(c.shape[:-1] + (1,), c.dtype)
    c = jnp.concatenate([zero, c], axis=-1)     # c[..., k] = sum of first k
    return jnp.take(c, i2 + 1, axis=-1) - jnp.take(c, i1, axis=-1)


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
