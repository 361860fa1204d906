"""Packed-bit (popcount) matching for memory-bound library scales.

The MXU matmul matcher (ops.match) holds each subfingerprint as two bf16-able
{0,1} planes — ~51 KB per 64-subfingerprint library entry once broadcast.  At
pod scale (BASELINE config 5: 1M tracks) the library must live packed: two
uint32 planes of ceil(pairs/32) words (= 3.2 KB per entry, 16x less), with the
quirk-Q10 similarity computed by AND + population count:

    hits(i, j)  = popcount(P1_i & P2_j) + popcount(N1_i & N2_j)
    possible(i) = popcount(P1_i | N1_i)          (fp1 = the longer side)

The offset-sliding reduction is shared with the matmul matcher
(ops.match.offset_scores).  Scores are exactly equal to the unpacked path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from lbaudiodetective_tpu.ops.match import _pair_mask, offset_scores
from lbaudiodetective_tpu.utils.packing import words_per_plane


def pack_bits_device(plane: jnp.ndarray) -> jnp.ndarray:
    """``[..., pairs] {0,1} -> [..., ceil(pairs/32)] uint32`` on device
    (little-endian bit order, same layout as utils.packing.pack_bits)."""
    *lead, pairs = plane.shape
    w = words_per_plane(pairs)
    pad = w * 32 - pairs
    bits = jnp.pad(plane.astype(jnp.uint32), [(0, 0)] * len(lead) + [(0, pad)])
    bits = bits.reshape(*lead, w, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)


def _mask_words(pairs: int, comparison_range: int, subfingerprint_length: int
                ) -> np.ndarray:
    mask = _pair_mask(pairs, comparison_range, subfingerprint_length)
    w = words_per_plane(pairs)
    padded = np.zeros(w * 32, np.uint32)
    padded[:pairs] = mask.astype(np.uint32)
    out = np.zeros(w, np.uint32)
    for i in range(32):
        out |= padded[i::32][:w] << np.uint32(i)
    return out


@partial(jax.jit, static_argnames=("comparison_range", "subfingerprint_length",
                                   "pairs"))
def match_one_vs_many_packed(q_pos_w, q_neg_w, n_query,
                             lib_pos_w, lib_neg_w, n_lib,
                             pairs: int,
                             comparison_range: int = 0,
                             subfingerprint_length: int = 200):
    """Query vs packed library: ``[Sq, W]``/``[L, Sl, W]`` uint32 planes ->
    ``[L]`` float32 scores (identical to ops.match.match_one_vs_many_padded).
    """
    from lbaudiodetective_tpu.ops.match import _both_orientation_scores

    mask_w = jnp.asarray(_mask_words(pairs, comparison_range,
                                     subfingerprint_length))
    lp = lib_pos_w & mask_w
    ln = lib_neg_w & mask_w
    qp = q_pos_w & mask_w
    qn = q_neg_w & mask_w

    # hits[l, i, j] summed over words (python loop keeps peak memory at one
    # [L, Sl, Sq] plane).
    w = lp.shape[-1]
    hits = None
    for k in range(w):
        h = (jax.lax.population_count(lp[..., k][..., None] & qp[:, k][None, None, :])
             + jax.lax.population_count(ln[..., k][..., None] & qn[:, k][None, None, :]))
        hits = h if hits is None else hits + h
    hits = hits.astype(jnp.float32)                               # [L, Sl, Sq]

    w_lib = jnp.sum(jax.lax.population_count(lp | ln), axis=-1).astype(jnp.float32)
    w_q = jnp.sum(jax.lax.population_count(qp | qn), axis=-1).astype(jnp.float32)
    inv_lib = jnp.where(w_lib > 0.0, 1.0 / jnp.maximum(w_lib, 1.0), 0.0)
    inv_q = jnp.where(w_q > 0.0, 1.0 / jnp.maximum(w_q, 1.0), 0.0)

    l = lib_pos_w.shape[0]
    nq = jnp.broadcast_to(n_query, (l,))
    return _both_orientation_scores(hits, inv_lib, inv_q, n_lib, nq)
