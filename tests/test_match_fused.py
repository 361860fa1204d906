"""Fused Pallas packed matcher == XLA packed matcher == matmul matcher.

Runs in interpret mode on CPU (conftest forces the CPU backend); the same
kernel compiles on TPU (scripts/bench-side).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lbaudiodetective_tpu.ops.match import match_one_vs_many_padded
from lbaudiodetective_tpu.ops.match_packed import (
    match_one_vs_many_packed, pack_bits_device)
from lbaudiodetective_tpu.ops.pallas.match_fused import match_one_vs_many_fused

PAIRS = 100
S_MAX = 64


def _planes(rng, shape):
    cls = rng.choice(3, size=shape)
    return (cls == 1).astype(np.uint8), (cls == 2).astype(np.uint8)


@pytest.mark.parametrize("comparison_range", [0, 100, 37])
def test_fused_equals_packed_and_matmul(comparison_range):
    rng = np.random.default_rng(3)
    l = 128
    lib_pos, lib_neg = _planes(rng, (l, S_MAX, PAIRS))
    q_pos, q_neg = _planes(rng, (S_MAX, PAIRS))
    # Ragged counts, including shorter-than-query entries (orientation B),
    # equal-length entries (single offset), and one empty entry.
    n_lib = rng.integers(1, S_MAX + 1, size=l).astype(np.int32)
    n_lib[0] = 0
    n_lib[1] = 5          # << n_query -> orientation B
    n_lib[2] = 32         # == n_query -> single offset
    for i in range(l):
        lib_pos[i, n_lib[i]:] = 0
        lib_neg[i, n_lib[i]:] = 0
    nq = 32
    q_pos[nq:] = 0
    q_neg[nq:] = 0

    lp_w = pack_bits_device(jnp.asarray(lib_pos))
    ln_w = pack_bits_device(jnp.asarray(lib_neg))
    qp_w = pack_bits_device(jnp.asarray(q_pos))
    qn_w = pack_bits_device(jnp.asarray(q_neg))

    ref_matmul = np.asarray(match_one_vs_many_padded(
        jnp.asarray(q_pos), jnp.asarray(q_neg), jnp.int32(nq),
        jnp.asarray(lib_pos), jnp.asarray(lib_neg), jnp.asarray(n_lib),
        comparison_range, 200))
    ref_packed = np.asarray(match_one_vs_many_packed(
        qp_w, qn_w, jnp.int32(nq), lp_w, ln_w, jnp.asarray(n_lib),
        PAIRS, comparison_range, 200))
    fused = np.asarray(match_one_vs_many_fused(
        qp_w, qn_w, jnp.int32(nq), lp_w, ln_w, jnp.asarray(n_lib),
        PAIRS, comparison_range, 200, t_tile=32, interpret=True))

    np.testing.assert_allclose(ref_packed, ref_matmul, atol=1e-5)
    np.testing.assert_allclose(fused, ref_matmul, atol=1e-5)


def test_fused_self_match_is_one():
    rng = np.random.default_rng(9)
    l = 32
    lib_pos, lib_neg = _planes(rng, (l, S_MAX, PAIRS))
    n_lib = np.full(l, S_MAX, np.int32)
    lp_w = pack_bits_device(jnp.asarray(lib_pos))
    ln_w = pack_bits_device(jnp.asarray(lib_neg))
    fused = np.asarray(match_one_vs_many_fused(
        lp_w[7], ln_w[7], jnp.int32(S_MAX), lp_w, ln_w, jnp.asarray(n_lib),
        PAIRS, t_tile=32, interpret=True))
    assert abs(fused[7] - 1.0) < 1e-6
    assert fused.max() == pytest.approx(fused[7])
