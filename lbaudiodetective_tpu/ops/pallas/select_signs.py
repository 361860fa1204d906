"""Fused top-k sign selection (Pallas TPU): Haar coefficients -> rank-ordered
sign classes, replacing the XLA blocked-sort path of
``ops.extract.subfingerprints_from_rows``.

Per frame of 4096 coefficients (the ``[128 rows, 32 bands]`` 2-D Haar tile,
row-major), the reference semantics (LBAudioDetectiveFrame.m:165-191) are:
order by |coeff| descending with ties broken toward the lower flat index,
take the first k, emit each element's sign class in rank order.

Exact algorithm (no gather, no full 4096 sort):

  keys     : hi = abs_bits(int32), lo = (4095 - flat_idx) << 1 | (x > 0)
             — (hi, lo) descending is exactly the reference order, with the
             sign recoverable from lo bit 0 and zero-ness from hi.
  phase 1  : bitonic-sort each 128-lane row (28 lane stages), rows 0..15
             descending / 16..31 ascending per frame.
  phase 2  : merge-prune tree: pair row s with s + R/2 (opposite
             directions -> their lane-concat is bitonic), keep the
             elementwise 2-plane max  — the top-128 of the pair — then
             7 lane-stage bitonic cleanup re-sorts survivors (directions
             alternate again for the next level).  5 levels: 32 rows -> 1.
  output   : [frames, 128] int32 class codes (1 pos / 2 neg / 0 zero) in
             rank order; callers slice [:k].

Compare-exchange partners sit at lane distance d: two ``pltpu.roll``s + a
lane-mask select per plane.  The merge pairing uses contiguous sublane
slices only (strided row pairing would need sublane gathers).

k <= 128 is required (the default config uses k = 100).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _partner(x, d, lane):
    """x[l ^ d] along the last axis (lane distance d, power of two)."""
    fwd = pltpu.roll(x, _LANE - d, len(x.shape) - 1)   # x[l + d]
    bwd = pltpu.roll(x, d, len(x.shape) - 1)           # x[l - d]
    return jnp.where((lane & d) != 0, bwd, fwd)


def _cmp_gt(h, l, ph, pl_):
    """(h, l) lexicographically greater than partner (ph, pl)."""
    return (h > ph) | ((h == ph) & (l > pl_))


def _ce(h, l, keep_max, d, lane):
    """One compare-exchange stage at lane distance d."""
    ph = _partner(h, d, lane)
    pl_ = _partner(l, d, lane)
    gt = _cmp_gt(h, l, ph, pl_)
    take_self = gt == keep_max
    return jnp.where(take_self, h, ph), jnp.where(take_self, l, pl_)


def _select_body(x, f_blk: int, band_major: bool = False):
    """Top-128 rank-ordered class codes for ``f_blk`` frames.

    ``x``: [f_blk*32, 128] f32 — each frame a [32, 128] tile.  With
    ``band_major`` the tile layout is (band, row) — the transposed form the
    fused rows kernel produces — and the tie-break flat index is computed as
    row*32+band so the order is IDENTICAL to the row-major path."""
    rows = f_blk * 32
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi = bits & jnp.int32(0x7FFFFFFF)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANE), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANE), 0) % 32
    flat = lane * 32 + sub if band_major else sub * _LANE + lane
    ispos = ((bits >> 31) == 0) & (hi > 0)
    lo = ((jnp.int32(4095) - flat) << 1) | ispos.astype(jnp.int32)

    # Per-row sort direction: descending for the first half of each pairing
    # group.  Initial: rows 0..15 desc, 16..31 asc (within each frame).
    def desc_mask(r_count):
        # [rows, 1] broadcast: desc if (s mod r_count) < r_count/2
        s_mod = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANE), 0) % r_count
        return s_mod < (r_count // 2)

    # ---- phase 1: sort each row's 128 lanes --------------------------------
    desc = desc_mask(32)
    for k in range(1, 8):                       # block size 2^k
        blk_up = (lane & (1 << k)) == 0         # ascending block in asc rows
        if k == 7:
            blk_up = jnp.full_like(blk_up, True)
        up = blk_up ^ desc                      # row direction flips blocks
        for j in range(k - 1, -1, -1):
            d = 1 << j
            keep_max = ((lane & d) != 0) == up
            hi, lo = _ce(hi, lo, keep_max, d, lane)

    # ---- phase 2: merge-prune 32 -> 1 rows per frame -----------------------
    r = 32
    h3 = hi.reshape(f_blk, 32, _LANE)
    l3 = lo.reshape(f_blk, 32, _LANE)
    while r > 1:
        half = r // 2
        a_h, b_h = h3[:, :half, :], h3[:, half:r, :]
        a_l, b_l = l3[:, :half, :], l3[:, half:r, :]
        # Half-cleaner: rows s (desc) and s+half (asc) form a bitonic 256
        # sequence; the elementwise max holds its top-128 (bitonic).
        gt = _cmp_gt(a_h, a_l, b_h, b_l)
        h3 = jnp.where(gt, a_h, b_h)
        l3 = jnp.where(gt, a_l, b_l)
        r = half
        # Bitonic cleanup of each surviving row, sorted toward the direction
        # needed by the NEXT pairing level (desc for s mod r < r/2; final
        # survivor: descending).
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (f_blk, r, _LANE), 2)
        if r > 1:
            s_mod = jax.lax.broadcasted_iota(jnp.int32, (f_blk, r, _LANE), 1) % r
            desc_r = s_mod < (r // 2)
        else:
            desc_r = jnp.full((f_blk, r, _LANE), True)
        for j in range(6, -1, -1):
            d = 1 << j
            keep_max = ((lane_r & d) != 0) == (~desc_r)
            ph = _partner(h3, d, lane_r)
            pl_ = _partner(l3, d, lane_r)
            gt = _cmp_gt(h3, l3, ph, pl_)
            take_self = gt == keep_max
            h3 = jnp.where(take_self, h3, ph)
            l3 = jnp.where(take_self, l3, pl_)

    top_h = h3[:, 0, :]                          # [f_blk, 128] desc-sorted
    top_l = l3[:, 0, :]
    # Class decode matches the XLA path exactly: NaN (abs bits above the inf
    # pattern) classifies as 0 there ((x>0) and (x<0) both false), so exclude
    # it here too; +/-inf keep their sign class in both paths.
    valid = (top_h > 0) & (top_h <= jnp.int32(0x7F800000))
    return jnp.where(valid,
                     jnp.where((top_l & 1) != 0, jnp.int32(1), jnp.int32(2)),
                     jnp.int32(0))


def _select_kernel(x_ref, out_ref, *, f_blk: int):
    out_ref[0] = _select_body(x_ref[:].reshape(f_blk * 32, _LANE), f_blk)


def select_sign_classes_padded(coeffs: jnp.ndarray, f_blk: int = 32,
                               interpret: bool = False) -> jnp.ndarray:
    """``select_sign_classes`` for any frame count: zero-pads the frame axis
    to a multiple of ``f_blk`` and trims the result (zero frames select all
    class 0, so padding never leaks)."""
    n = coeffs.shape[0]
    pad = (-n) % f_blk
    if pad:
        coeffs = jnp.pad(coeffs, ((0, pad), (0, 0)))
    out = select_sign_classes(coeffs, f_blk=f_blk, interpret=interpret)
    return out[:n] if pad else out


@partial(jax.jit, static_argnames=("f_blk", "interpret"))
def select_sign_classes(coeffs: jnp.ndarray, f_blk: int = 32,
                        interpret: bool = False) -> jnp.ndarray:
    """``[N, 4096] f32 -> [N, 128] int32`` rank-ordered sign classes.

    Lane j of the output is the class (1 pos / 2 neg / 0 zero-magnitude) of
    the j-th element in (|x| desc, index asc) order — exactly
    ``topcls`` of the XLA path in ops.extract.  N must divide by f_blk.
    """
    n = coeffs.shape[0]
    if coeffs.shape[1] != 4096:
        raise ValueError("select_sign_classes requires 4096-wide frames")
    if n % f_blk:
        raise ValueError(f"frame count {n} not divisible by f_blk {f_blk}")
    x3 = coeffs.reshape(n // f_blk, f_blk * 32, _LANE)
    kernel = partial(_select_kernel, f_blk=f_blk)
    return pl.pallas_call(
        kernel,
        grid=(n // f_blk,),
        in_specs=[pl.BlockSpec((1, f_blk * 32, _LANE), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, f_blk, _LANE), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n // f_blk, f_blk, _LANE), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x3).reshape(n, _LANE)
