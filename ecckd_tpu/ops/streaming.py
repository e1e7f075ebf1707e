"""Streaming g-point averaging over spectral shards.

The multi-hundred-GB analogue of ops.average.average_od_to_gpoints: consume
wavenumber blocks from a ShardReader (double-buffered native reads) and
accumulate the per-g-point weighted sums on device, so host I/O overlaps
TPU compute.  Every averaging reduction is expressible as accumulated
weighted sums over wavenumber blocks plus a final transform, and the
per-block partial sums are exactly the quantities that would be
psum-reduced across a wavenumber-sharded mesh in the multi-host setting.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..constants import LW_DIFFUSIVITY
from .average import _METHOD_SCALE, _trans_clamp


def _block_accumulate(ng, g_point_block, od_block, weight_block,
                      averaging_method):
    """Partial sums for one wavenumber block -> dict of (nz, ng) arrays."""
    import jax
    import jax.numpy as jnp

    od = jnp.asarray(od_block)
    w = jnp.broadcast_to(jnp.asarray(weight_block), od.shape)
    gp = jnp.asarray(g_point_block)
    onehot = (gp[:, None] == jnp.arange(ng)[None, :]).astype(od.dtype)

    def seg(v):
        return jnp.matmul(v, onehot, preferred_element_type=od.dtype)

    out = {"w_sum": seg(w), "count": seg(jnp.ones_like(od))}
    if averaging_method == "linear":
        out["num"] = seg(od * w)
    elif averaging_method in _METHOD_SCALE:
        scale = _METHOD_SCALE[averaging_method]
        out["num"] = seg(-jnp.expm1(-od * (LW_DIFFUSIVITY * scale)) * w)
    elif averaging_method == "square-root":
        out["num"] = seg(jnp.sqrt(od) * w)
    else:
        raise ValueError(
            f"streaming averaging does not support {averaging_method!r}")
    big = jnp.asarray(jnp.finfo(od.dtype).max, od.dtype)
    masked_min = jnp.where(gp[None, :, None] == jnp.arange(ng)[None, None, :],
                           od[:, :, None], big)
    out["min"] = jnp.min(masked_min, axis=1)
    masked_max = jnp.where(gp[None, :, None] == jnp.arange(ng)[None, None, :],
                           od[:, :, None], -big)
    out["max"] = jnp.max(masked_max, axis=1)
    return {k: np.asarray(v) for k, v in out.items()}


def streaming_average_od_to_gpoints(reader, ng, g_point, weight_fn,
                                    averaging_method,
                                    block_wav: int = 1 << 16):
    """Average a shard's od into g-points, streaming wavenumber blocks.

    Args:
      reader: io.shards.ShardReader.
      g_point: (nwav,) map in the shard's wavenumber order.
      weight_fn: callable (iwav0, nwav_block) -> (nz, block) or (block,)
        weights (Planck or SSI slice).
      averaging_method: linear / transmission[-N] / square-root.

    Returns (od_fit, min_od, max_od), each (nz, ng) — identical semantics to
    ops.average.average_od_to_gpoints for these methods.
    """
    acc = None
    for iwav0, od_block in reader.iter_blocks(block_wav=block_wav):
        nb = od_block.shape[1]
        gp_block = g_point[iwav0:iwav0 + nb]
        w_block = weight_fn(iwav0, nb)
        part = _block_accumulate(ng, gp_block, od_block, w_block,
                                 averaging_method)
        if acc is None:
            acc = part
        else:
            for key in ("w_sum", "count", "num"):
                acc[key] = acc[key] + part[key]
            acc["min"] = np.minimum(acc["min"], part["min"])
            acc["max"] = np.maximum(acc["max"], part["max"])

    w_sum = acc["w_sum"]
    safe = np.where(w_sum > 0.0, w_sum, 1.0)
    mean = acc["num"] / safe
    if averaging_method == "linear":
        fit = mean
    elif averaging_method in _METHOD_SCALE:
        scale = _METHOD_SCALE[averaging_method]
        mean = np.minimum(_trans_clamp(mean.dtype), mean)
        fit = np.abs(-np.log1p(-mean) / (LW_DIFFUSIVITY * scale))
    else:   # square-root
        fit = mean * mean
    empty = acc["count"][0] <= 0.0
    min_od = np.where(empty[None, :] | ~np.isfinite(acc["min"]), 0.0,
                      acc["min"])
    max_od = np.where(empty[None, :] | ~np.isfinite(acc["max"]), 0.0,
                      acc["max"])
    fit = np.where(empty[None, :], 0.0, fit)
    fit = np.maximum(min_od, np.minimum(fit, max_od))
    degenerate = (min_od > 0.0) & (min_od >= max_od)
    min_od = np.where(degenerate, min_od * 0.99, min_od)
    max_od = np.where(degenerate, max_od * 1.01, max_od)
    return fit, min_od, max_od
