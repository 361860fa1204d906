"""Fused packed-bit one-vs-many matcher (Pallas TPU).

Replaces the XLA word-loop of ops.match_packed (which materialises full
``[L, Sl, Sq]`` hit planes in HBM) with one kernel pass per library tile:

  HBM reads   : packed uint32 planes only (16x smaller than bf16 planes —
                the pod-scale residency format, SURVEY §2.3 / BASELINE 5)
  in VMEM     : unpack tile to {0,1} bf16 via lane select + bit masks
  MXU         : hits = bits_pos @ q_posT + bits_neg @ q_negT
  VPU         : both quirk-Q10 swap orientations from the shared hits —
                row/column scaling, a log-step diagonal shear (6 rolls
                instead of Sq per-column rolls), banded-diagonal sums,
                offset-validity mask, max
  HBM writes  : [L] float32 scores — nothing else leaves the chip.

Mosaic layout notes: per-entry scalars (n_lib, the final scores) travel in
sublane orientation ``[T, 1]`` — lane->sublane reshapes are unsupported —
and row validity is a precomputed ``[T*Sl, 1]`` mask multiplied onto hits.

Score semantics are exactly ops.match.match_one_vs_many_padded
(LBAudioDetectiveFingerprint.m:119-176, quirks Q10/Q11); equality is tested
in tests/test_match_fused.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbaudiodetective_tpu.ops.match import _pair_mask


def _ceil_log2(n: int) -> int:
    k = 0
    while (1 << k) < n:
        k += 1
    return k


@lru_cache(maxsize=16)
def _bit_mask_lanes(pairs: int, comparison_range: int,
                    subfingerprint_length: int) -> np.ndarray:
    """[1, 128] uint32: lane p holds ``1 << (p % 32)`` if pair p is inside
    the quirk-Q11 comparison range (and p < pairs), else 0.  ANDing the
    lane-broadcast word with this both extracts bit p and applies the mask."""
    mask = _pair_mask(pairs, comparison_range, subfingerprint_length)
    out = np.zeros((1, 128), np.uint32)
    for p in range(min(pairs, 128)):
        if mask[p]:
            out[0, p] = np.uint32(1) << np.uint32(p % 32)
    return out


@lru_cache(maxsize=1)
def _sel_mask_lanes_np() -> np.ndarray:
    """[8, 128] uint32: row k is all-ones in lanes [32k, 32k+32) (rows past
    W unused; 8 rows keep the sublane tile full)."""
    out = np.zeros((8, 128), np.uint32)
    for k in range(4):
        out[k, 32 * k: 32 * k + 32] = 0xFFFFFFFF
    return out


def _sel_mask_lanes() -> jnp.ndarray:
    return jnp.asarray(_sel_mask_lanes_np())


def _match_kernel(nlib_ref, rowmask_ref, lp_ref, ln_ref, qp_ref, qn_ref,
                  invq_ref, colmask_ref, selmask_ref, bitmask_ref, out_ref,
                  *, t_tile, s_lib, s_q, w):
    rows = t_tile * s_lib

    def unpack(ref):
        # Lane select via constant masks (iota equality on narrow types
        # trips Mosaic i1 relayouts); (x & 2^(p%32)) != 0 extracts bit p.
        words = ref[:]                                   # [rows, W] uint32
        acc = jnp.zeros((rows, 128), jnp.uint32)
        for k in range(w):
            col = jnp.broadcast_to(words[:, k][:, None], (rows, 128))
            acc = acc | (col & selmask_ref[k:k + 1, :])
        return ((acc & bitmask_ref[:]) != 0).astype(jnp.bfloat16)

    bp = unpack(lp_ref)
    bn = unpack(ln_ref)
    hits = (jnp.dot(bp, qp_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(bn, qn_ref[:], preferred_element_type=jnp.float32))
    hits = hits * rowmask_ref[:]                         # zero rows >= n_lib

    w_row = jnp.sum((bp + bn).astype(jnp.float32), axis=1, keepdims=True)
    inv_row = jnp.where(w_row > 0.0, 1.0 / jnp.maximum(w_row, 1.0), 0.0)

    colmask = colmask_ref[:]                             # [1, Sq] {0,1} f32
    nq = jnp.sum(colmask).astype(jnp.int32)
    nlib = nlib_ref[0]                                   # [T, 1] int32

    # ---- orientation A: library entry = fp1 (slid/longer) ------------------
    sa = (hits * inv_row * colmask).reshape(t_tile, s_lib, s_q)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (t_tile, s_lib, s_q), 2)
    for k in range(_ceil_log2(s_q)):
        sh = (1 << k) % s_lib
        if sh:
            sa = jnp.where((lane3 & (1 << k)) != 0,
                           pltpu.roll(sa, s_lib - sh, axis=1), sa)
    d_a = jnp.sum(sa, axis=2)                            # [T, Sl] offset sums
    means_a = d_a / jnp.maximum(nq, 1).astype(jnp.float32)
    o_iota = jax.lax.broadcasted_iota(jnp.int32, (t_tile, s_lib), 1)
    means_a = jnp.where(o_iota <= (nlib - nq), means_a, 0.0)
    score_a = jnp.max(means_a, axis=1, keepdims=True)    # [T, 1]
    score_a = jnp.where(nq > 0, score_a, 0.0)

    # ---- orientation B: query = fp1 ----------------------------------------
    sb = (hits * invq_ref[:]).reshape(t_tile, s_lib, s_q)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (t_tile, s_lib, s_q), 1)
    for k in range(_ceil_log2(s_lib)):
        sh = (1 << k) % s_q
        if sh:
            sb = jnp.where((row3 & (1 << k)) != 0,
                           pltpu.roll(sb, s_q - sh, axis=2), sb)
    d_b = jnp.sum(sb, axis=1)                            # [T, Sq]
    means_b = d_b / jnp.maximum(nlib, 1).astype(jnp.float32)
    ob_iota = jax.lax.broadcasted_iota(jnp.int32, (t_tile, s_q), 1)
    means_b = jnp.where(ob_iota <= (nq - nlib), means_b, 0.0)
    score_b = jnp.max(means_b, axis=1, keepdims=True)    # [T, 1]
    score_b = jnp.where(nlib > 0, score_b, 0.0)

    out_ref[0] = jnp.where(nlib < nq, score_b, score_a)


@partial(jax.jit, static_argnames=("pairs", "comparison_range",
                                   "subfingerprint_length", "t_tile",
                                   "interpret"))
def match_one_vs_many_fused(q_pos_w, q_neg_w, n_query,
                            lib_pos_w, lib_neg_w, n_lib,
                            pairs: int,
                            comparison_range: int = 0,
                            subfingerprint_length: int = 200,
                            t_tile: int = 64,
                            interpret: bool = False):
    """Packed query vs packed library, fully fused.

    q_*_w: ``[Sq, W]`` uint32; lib_*_w: ``[L, Sl, W]`` uint32 (L divisible by
    ``t_tile``); n_lib: ``[L]`` int32.  Returns ``[L]`` float32 scores equal
    to ops.match_packed.match_one_vs_many_packed.
    """
    l, s_lib, w = lib_pos_w.shape
    s_q = q_pos_w.shape[0]
    if pairs > 128:
        raise ValueError("fused matcher supports up to 128 pair planes")
    if l % t_tile:
        raise ValueError(f"library size {l} not divisible by t_tile {t_tile}")
    grid = l // t_tile

    bitmask = jnp.asarray(_bit_mask_lanes(pairs, comparison_range,
                                          subfingerprint_length))
    mask_f = jnp.asarray(
        _pair_mask(pairs, comparison_range, subfingerprint_length))

    # Query planes: unpack + mask on the host-XLA side (tiny), MXU layout
    # [128, Sq] bf16; reciprocal possible-hits and the valid-column mask.
    def unpack_q(words):
        shifts = jnp.arange(32, dtype=jnp.uint32)
        bits = ((words[:, :, None] >> shifts) & 1).reshape(s_q, w * 32)
        bits = bits[:, :pairs].astype(jnp.float32) * mask_f
        return bits                                       # [Sq, pairs]

    qp_bits = unpack_q(q_pos_w)
    qn_bits = unpack_q(q_neg_w)
    w_q = jnp.sum(qp_bits + qn_bits, axis=1)              # [Sq]
    inv_q = jnp.where(w_q > 0.0, 1.0 / jnp.maximum(w_q, 1.0), 0.0)

    def to_mxu(b):                                        # [Sq, pairs] -> [128, Sq]
        return jnp.pad(b, ((0, 0), (0, 128 - pairs))).T.astype(jnp.bfloat16)

    col_valid = (jnp.arange(s_q) < n_query).astype(jnp.float32)[None, :]
    row_valid = (jnp.arange(s_lib)[None, :] < n_lib[:, None]).astype(
        jnp.float32).reshape(l * s_lib, 1)

    kernel = partial(_match_kernel, t_tile=t_tile, s_lib=s_lib, s_q=s_q, w=w)
    scores = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, t_tile, 1), lambda t: (t, 0, 0)),        # n_lib
            pl.BlockSpec((t_tile * s_lib, 1), lambda t: (t, 0)),      # row mask
            pl.BlockSpec((t_tile * s_lib, w), lambda t: (t, 0)),      # lib pos
            pl.BlockSpec((t_tile * s_lib, w), lambda t: (t, 0)),      # lib neg
            pl.BlockSpec((128, s_q), lambda t: (0, 0)),               # q pos
            pl.BlockSpec((128, s_q), lambda t: (0, 0)),               # q neg
            pl.BlockSpec((1, s_q), lambda t: (0, 0)),                 # inv_q
            pl.BlockSpec((1, s_q), lambda t: (0, 0)),                 # col mask
            pl.BlockSpec((8, 128), lambda t: (0, 0)),                 # sel mask
            pl.BlockSpec((1, 128), lambda t: (0, 0)),                 # bit mask
        ],
        out_specs=pl.BlockSpec((1, t_tile, 1), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid, t_tile, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(n_lib.reshape(grid, t_tile, 1).astype(jnp.int32),
      row_valid,
      lib_pos_w.reshape(l * s_lib, w),
      lib_neg_w.reshape(l * s_lib, w),
      to_mxu(qp_bits), to_mxu(qn_bits),
      inv_q[None, :], col_valid, _sel_mask_lanes(), bitmask)
    return scores.reshape(l)
