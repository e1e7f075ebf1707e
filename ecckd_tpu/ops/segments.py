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

import functools
import os as _os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

# Wavenumber tile for the fused Pallas interval-sum kernel (see
# ops/pallas/sweep_lw.TILE for the VMEM/latency trade-off; the reduction
# here is matmul-dominated, where 2048 measured best on a v5e chip:
# 3.09 ms vs 6.45 ms for the XLA form at nwav=2^20, ~100 rows, nseg=64 —
# scripts/tune_sweep.py).
PALLAS_TILE = int(_os.environ.get("ECCKD_ISUM_TILE", 2048))


def default_device_is_tpu() -> bool:
    """True when computations with unpinned operands will run on a TPU.

    Honors ``jax.default_device`` overrides: under
    ``with jax.default_device(cpu)`` on a TPU-attached host (bench.py's
    CPU comparison runs) the default *backend* is still "tpu" but the
    computation runs on CPU, where a non-interpret ``pallas_call`` would
    fail to lower (ADVICE r3)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def _member_dot(v, member):
    """``v @ member`` where ``member`` contains only exact 0/1 values.

    On TPU, f32 matmuls at Precision.DEFAULT truncate BOTH operands to
    bfloat16 (one MXU pass, ~2^-8 relative error on the data).  Because the
    membership matrix is exactly representable in bf16, splitting the data
    into hi = bf16(v) and lo = bf16(v - hi) makes every product exact:
    two MXU passes, ~2^-17 truncation error (same trick as
    ops/pallas/sweep_lw._split_dot).  The two passes ride ONE dot over the
    stacked [hi; lo] rows with the halves added afterwards: expressed as
    ``hi@m + lo@m``, XLA's algebraic simplifier is free to merge the dots
    by distributivity into ``(hi+lo)@m`` whose bf16 operand ADD rounds
    ``lo`` away entirely — observed on real TPU inside ``lax.scan``
    bodies, where the "split" silently degraded to a plain bf16 dot
    (~1e-4 on g-point averages, PARITY_TPU r5).  Other dtypes/backends
    use a plain matmul (f32/f64 on CPU are exact to their own
    precision)."""
    if v.dtype == jnp.float32 and default_device_is_tpu():
        bf = jnp.bfloat16
        # reduce_precision, NOT an astype round-trip: XLA's
        # excess-precision optimization elides f32->bf16->f32 convert
        # chains, which silently turns (v - f32(bf16(v))) into zero and
        # the whole "split" into a plain bf16 dot — observed on real TPU
        # (identical digits to the unsplit form, ~1e-4 on g-point
        # averages).  reduce_precision is the documented escape hatch the
        # simplifier must honor.
        v_hi_f32 = jax.lax.reduce_precision(v, 8, 7)     # bf16 rounding
        v_hi = v_hi_f32.astype(bf)                       # exact convert
        v_lo = (v - v_hi_f32).astype(bf)
        m_bf = member.astype(bf)
        rows = v.shape[0]
        both = jnp.matmul(jnp.concatenate([v_hi, v_lo], axis=0), m_bf,
                          preferred_element_type=v.dtype)
        return both[:rows] + both[rows:]
    return jnp.matmul(v, member.astype(v.dtype),
                      preferred_element_type=v.dtype)


def _isum_pallas_kernel(group_meta, nseg, tile, i1_ref, i2_ref, *refs):
    """Fused interval sums, one Pallas pass: per tile, rebuild every
    part's operand rows (elementwise products, (1, tile) rows broadcast),
    stack them, and reduce against ONE membership matmul on the MXU.

    ``group_meta`` entries are ``(operand_indices, rows)``: indices into
    the DEDUPLICATED operand list, so an array appearing in several parts
    (e.g. the Planck weights in both the fit numerator product and the
    fit denominator) is staged HBM->VMEM exactly once per tile.
    """
    from jax.experimental import pallas as pl
    from .pallas.sweep_lw import _split_dot

    in_refs, out_ref = refs[:-1], refs[-1]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    idx = (jax.lax.broadcasted_iota(jnp.int32, (tile, nseg), 0)
           + t * tile)
    member = ((idx >= i1_ref[0, :][None, :])
              & (idx <= i2_ref[0, :][None, :])).astype(out_ref.dtype)

    blocks = []
    for operand_indices, rows in group_meta:
        prod = None
        for k in operand_indices:
            blk = in_refs[k][:, :]
            prod = blk if prod is None else prod * blk
        if prod.shape[0] != rows:   # all-(1, tile) product group
            prod = jnp.broadcast_to(prod, (rows, tile))
        blocks.append(prod)
    stacked = jnp.concatenate(blocks, axis=0) if len(blocks) > 1 \
        else blocks[0]
    out_ref[:, :] += _split_dot(stacked, member)


@functools.partial(jax.jit,
                   static_argnames=("group_meta", "dtype", "tile",
                                    "interpret"))
def _interval_sum_fused_pallas(group_meta, arrays, i1, i2, dtype, tile,
                               interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = arrays[0].shape[-1]
    nseg = i1.shape[0]
    ntile = -(-n // tile)
    pad = ntile * tile - n
    flat = []
    specs = []
    for a in arrays:
        a = a.astype(dtype)
        if pad:
            # Zero padding: padded indices exceed every i2, so membership
            # excludes them regardless of operand values.
            a = jnp.pad(a, ((0, 0), (0, pad)))
        flat.append(a)
        specs.append(pl.BlockSpec((a.shape[0], tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM))
    total_rows = sum(rows for _, rows in group_meta)
    whole = lambda i: (0, 0)
    kernel = functools.partial(_isum_pallas_kernel, group_meta, nseg, tile)
    return pl.pallas_call(
        kernel,
        grid=(ntile,),
        in_specs=[pl.BlockSpec((1, nseg), whole, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nseg), whole,
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=pl.BlockSpec((total_rows, nseg), whole,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total_rows, nseg), dtype),
        interpret=interpret,
    )(jnp.asarray(i1, jnp.int32)[None, :],
      jnp.asarray(i2, jnp.int32)[None, :], *flat)


def _pallas_groups(parts, n):
    """(group_meta, unique_arrays) when every part is a ``part_of`` product
    of bound arrays over the full reduced axis; None otherwise (custom
    callables fall back to the XLA path).

    Identical operand arrays (by object identity — ``part_of`` holds the
    caller's references) are deduplicated: each meta entry carries the
    indices of its operands in the unique list, so the kernel stages each
    distinct array once per tile instead of once per part occurrence
    (e.g. the transmission fit reads its Planck weights in TWO parts —
    dedup cuts that group's HBM->VMEM staging by a third).
    """
    meta = []
    unique = []
    index_of = {}
    for p in parts:
        arrs = getattr(p, "arrays", None)
        if arrs is None:
            return None
        idxs = []
        rows = 1
        for orig in arrs:
            a = jnp.asarray(orig)
            if a.ndim == 1:
                a = a[None, :]
            if a.ndim != 2 or a.shape[-1] != n:
                return None
            key = id(orig)
            if key not in index_of:
                index_of[key] = len(unique)
                unique.append(a)
            idxs.append(index_of[key])
            rows = max(rows, a.shape[0])
        meta.append((tuple(idxs), rows))
    return tuple(meta), tuple(unique)


def interval_sum_fused(parts: Sequence[Callable], n: int, i1, i2,
                       dtype=None, tile: int = 8192,
                       use_pallas=None, pallas_interpret: bool = False,
                       pallas_tile: int = None):
    """Stacked interval sums with per-tile operand construction.

    ``tile`` applies to the XLA fallback path only; the fused Pallas fast
    path uses ``pallas_tile`` (default: module PALLAS_TILE /
    ECCKD_ISUM_TILE) — the two paths have different VMEM/latency
    trade-offs and are tuned independently (ADVICE r3).

    Each element of ``parts`` is a callable ``part(start, size) ->
    (rows, size)`` returning its block of operand rows for the wavenumber
    range [start, start+size) — typically a ``lax.dynamic_slice_in_dim`` of
    a bound array, possibly combined elementwise with others (weights,
    masks, logs).  The blocks of all parts are reduced against ONE
    (size, nseg) membership matrix per tile, so arbitrarily many weighted
    reductions share a single pass over the spectrum and NOTHING of size n
    is ever materialized beyond the inputs themselves: no concatenated
    copies, no padded/transposed relayouts (at nwav ~ 10^6 and ~100 rows
    those copies are multi-GB of HBM traffic per sweep, several times the
    mandatory input reads).

    Args:
      parts: callables producing (rows_k, size) blocks; 1-D producers must
        return (1, size).
      n: length of the reduced axis (static).
      i1, i2: (nseg,) inclusive interval bounds.
      dtype: accumulator dtype (default: dtype of the first part's block).

    Returns:
      (sum(rows_k), nseg) stacked per-interval sums, parts in order.
    """
    i1 = jnp.asarray(i1, jnp.int32)
    i2 = jnp.asarray(i2, jnp.int32)
    nseg = i1.shape[0]

    def block(start, size):
        rows = [p(start, size) for p in parts]
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]

    if dtype is None:
        dtype = jax.eval_shape(lambda: block(0, min(tile, n))).dtype

    # Fused Pallas fast path (TPU f32): every part that is a plain
    # ``part_of`` product can be rebuilt per tile inside ONE kernel whose
    # inputs are read exactly once — ~2x the XLA form, which pays an HBM
    # round trip per fori_loop carry (measured scripts/tune_sweep.py).
    if use_pallas is None:
        # Auto-enable only for genuinely spectral-scale reductions: every
        # distinct shape costs a fresh Pallas compile (minutes through the
        # TPU relay, which does not honor the persistent cache), which
        # only pays for itself when the per-call work is large.
        use_pallas = (default_device_is_tpu()
                      and dtype == jnp.float32 and n >= (1 << 16))
    if use_pallas:
        grouped = _pallas_groups(parts, n)
        if grouped is not None:
            meta, flat = grouped
            return _interval_sum_fused_pallas(
                meta, flat, i1, i2, dtype,
                PALLAS_TILE if pallas_tile is None else int(pallas_tile),
                bool(pallas_interpret))

    def reduce_tile(start, size):
        idx = (jax.lax.broadcasted_iota(jnp.int32, (size, nseg), 0)
               + start)
        member = (idx >= i1[None, :]) & (idx <= i2[None, :])
        return _member_dot(block(start, size).astype(dtype), member)

    nfull = n // tile
    rem = n - nfull * tile
    out_rows = jax.eval_shape(lambda: block(0, min(tile, n))).shape[0]
    acc = jnp.zeros((out_rows, nseg), dtype)
    if nfull == 1 and rem == 0:
        return reduce_tile(0, n)
    if nfull > 0:
        acc = jax.lax.fori_loop(
            0, nfull,
            lambda k, a: a + reduce_tile(k * tile, tile), acc)
    if rem:
        acc = acc + reduce_tile(nfull * tile, rem)
    return acc


def _two_sum(a, b):
    """Error-free f32/f64 addition (Knuth): s + err == a + b exactly."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _df_add(x, y):
    """Double-float addition of (hi, lo) pairs: ~2x-precision accumulate."""
    xh, xl = x
    yh, yl = y
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


@jax.jit
def _df_cumsum(v):
    """Inclusive double-float prefix sums along the last axis.

    Returns (hi, lo) with hi + lo ~= exact prefix sum to ~2x working
    precision: each associative-scan combine is a compensated (two-sum)
    double-float add, so the error after n elements is O(log n * eps^2)
    relative to the prefix magnitude instead of O(n * eps)."""
    return jax.lax.associative_scan(_df_add, (v, jnp.zeros_like(v)),
                                    axis=-1)


def build_prefix_sums(parts: Sequence[Callable], n: int, row_chunk: int = 64):
    """Precompute double-float prefix sums of fused-reduction parts.

    The repeated-sweep complement of :func:`interval_sum_fused`: when the
    SAME operand rows are reduced over many different interval sets (the
    g-point candidate search probes hundreds of bound sets per band), the
    O(rows * n) reduction pass can be paid ONCE — each subsequent interval
    sum is a pair of gathers into the prefix arrays
    (:func:`interval_sum_from_prefix`), O(rows * nseg).

    Precision: plain f32 prefix differences lose up to n*eps relative to
    the interval sum; the double-float (hi, lo) representation keeps the
    difference error at ~(C/S) * 2^-45 for f32 (C = prefix magnitude,
    S = interval sum) — better than the ~2^-16 of the bf16 split-dot
    membership matmuls it replaces.

    Parts are materialized eagerly (device ops, NOT inside jit — their
    closed-over operand arrays must never become XLA constants) and
    scanned in ``row_chunk`` row blocks to bound transient memory.  The
    scanned shape is bucketed (rows padded to a ``row_chunk`` multiple,
    columns to a power of two) so the jitted scan compiles at most once
    per bucket across bands — remote TPU compiles cost minutes and ignore
    the persistent cache (CLAUDE.md).

    Returns (hi, lo), each (total_rows, n + 1) with a leading zero column,
    so the sum over inclusive [i1, i2] is C[i2 + 1] - C[i1].
    """
    npad = max(256, 1 << (n - 1).bit_length()) - n
    his, los = [], []
    for p in parts:
        block = p(0, n)
        rows = block.shape[0]
        rpad = (-rows) % row_chunk
        if npad or rpad:
            # Zero column padding leaves the first n prefixes unchanged;
            # zero rows are sliced back off below.
            block = jnp.pad(block, ((0, rpad), (0, npad)))
        for r0 in range(0, rows, row_chunk):
            hi, lo = _df_cumsum(block[r0:r0 + row_chunk])
            his.append(hi[:min(row_chunk, rows - r0), :n])
            los.append(lo[:min(row_chunk, rows - r0), :n])
    hi = jnp.concatenate(his, axis=0) if len(his) > 1 else his[0]
    lo = jnp.concatenate(los, axis=0) if len(los) > 1 else los[0]
    zero = jnp.zeros((hi.shape[0], 1), hi.dtype)
    return (jnp.concatenate([zero, hi], axis=1),
            jnp.concatenate([zero, lo], axis=1))


def interval_sum_from_prefix(hi, lo, i1, i2):
    """Interval sums over inclusive [i1, i2] from double-float prefix sums.

    ``hi``/``lo`` come from :func:`build_prefix_sums`.  The hi difference
    of nearby prefixes is exact (Sterbenz) or correctly rounded; adding the
    lo difference restores the compensated tail."""
    j1 = jnp.asarray(i1, jnp.int32)
    j2 = jnp.asarray(i2, jnp.int32) + 1
    h = jnp.take(hi, j2, axis=1) - jnp.take(hi, j1, axis=1)
    l = jnp.take(lo, j2, axis=1) - jnp.take(lo, j1, axis=1)
    return h + l


def part_of(*arrays):
    """Fused-reduction part: the elementwise product of ``arrays`` (each
    (rows, n) or (n,); 1-D arrays broadcast across rows), sliced per tile.
    With one array this is a plain row block."""
    def part(start, size):
        out = None
        for a in arrays:
            a = jnp.asarray(a)
            sl = jax.lax.dynamic_slice_in_dim(a, start, size, axis=a.ndim - 1)
            if a.ndim == 1:
                sl = sl[None, :]
            out = sl if out is None else out * sl
        return out
    # Operands exposed for the fused Pallas fast path (which rebuilds the
    # product per tile inside the kernel instead of calling ``part``).
    part.arrays = arrays
    return part


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
    n = v.shape[-1]
    lead = v.shape[:-1]
    v2 = v.reshape((-1, n))
    out = interval_sum_fused([part_of(v2)], n, i1, i2, dtype=v.dtype,
                             tile=tile)
    return out.reshape(lead + (out.shape[-1],))


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
