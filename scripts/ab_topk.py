"""A/B the top-k + sign-gather stage of extraction on the TPU.

The rows kernel feeds [B, S, 4096] Haar coefficients; the sign-extraction
stage does top_k(|c|, 100) + take_along_axis (ops/extract.py
subfingerprints_from_rows).  ROUND_NOTES lead #1: this is ~25% of extraction.

Usage: python scripts/ab_topk.py <variant> [B] [S]
variants:
  none      -- rows kernel only (stage floor)
  cur       -- top_k(f32 abs) + take_along_axis f32   (current pipeline)
  nogather  -- top_k only, signs faked from values    (isolates gather cost)
  intkey    -- top_k on bitcast-int32 abs + take_along_axis on int8 classes
  twostage  -- exact blocked top-k (4x1024 -> 400 -> 100) + gather
  onehot    -- top_k + one-hot matmul sign gather (MXU instead of gather)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

variant = sys.argv[1] if len(sys.argv) > 1 else "cur"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
S = int(sys.argv[3]) if len(sys.argv) > 3 else 64
K = 100

cfg = FingerprintConfig()
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, t_pad)).astype(np.float32) * 0.1)


def signs_cur(flat):
    _, idx = jax.lax.top_k(jnp.abs(flat), K)
    top = jnp.take_along_axis(flat, idx, axis=-1)
    return (top > 0).astype(jnp.uint8), (top < 0).astype(jnp.uint8)


def signs_nogather(flat):
    vals, _ = jax.lax.top_k(jnp.abs(flat), K)
    return (vals > 0).astype(jnp.uint8), (vals < 0).astype(jnp.uint8)


def signs_intkey(flat):
    bits = jax.lax.bitcast_convert_type(flat, jnp.int32)
    m = bits & jnp.int32(0x7FFFFFFF)
    _, idx = jax.lax.top_k(m, K)
    cls = ((flat > 0).astype(jnp.int8) + 2 * (flat < 0).astype(jnp.int8))
    top = jnp.take_along_axis(cls, idx, axis=-1)
    return (top == 1).astype(jnp.uint8), (top == 2).astype(jnp.uint8)


def signs_twostage(flat):
    *lead, n = flat.shape
    g = 4
    m = n // g
    a = jnp.abs(flat).reshape(*lead, g, m)
    v1, i1 = jax.lax.top_k(a, K)                       # [.., g, K]
    gidx = i1 + (jnp.arange(g, dtype=i1.dtype) * m)[:, None]
    v1 = v1.reshape(*lead, g * K)
    gidx = gidx.reshape(*lead, g * K)
    _, i2 = jax.lax.top_k(v1, K)
    idx = jnp.take_along_axis(gidx, i2, axis=-1)
    top = jnp.take_along_axis(flat, idx, axis=-1)
    return (top > 0).astype(jnp.uint8), (top < 0).astype(jnp.uint8)


def signs_onehot(flat):
    _, idx = jax.lax.top_k(jnp.abs(flat), K)
    oh = jax.nn.one_hot(idx, flat.shape[-1], dtype=jnp.bfloat16)
    top = jnp.einsum("...ki,...i->...k", oh, flat.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return (top > 0).astype(jnp.uint8), (top < 0).astype(jnp.uint8)


def signs_u32key(flat):
    # Sign smuggled into the sort key: key = abs_bits<<1 | signbit.  Monotone
    # in |x|; NO gather needed.  Tie order among equal-|x| differs from the
    # reference (negative-first instead of lowest-index-first).
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    key = ((bits & jnp.uint32(0x7FFFFFFF)) << 1) | (bits >> 31)
    # u32 order == i32 order after flipping the top bit.
    ikey = jax.lax.bitcast_convert_type(key ^ jnp.uint32(0x80000000), jnp.int32)
    top, _ = jax.lax.top_k(ikey, K)
    ukey = jax.lax.bitcast_convert_type(top, jnp.uint32) ^ jnp.uint32(0x80000000)
    isneg = (ukey & 1).astype(jnp.uint8)
    nonzero = (ukey > 1).astype(jnp.uint8)
    return nonzero * (1 - isneg), nonzero * isneg


def signs_u64key(flat):
    # EXACT gather-free selection: 64-bit key = abs_bits(31) << 13
    # | (4095 - idx)(12) << 1 | (x > 0).  Sorting keys desc reproduces the
    # reference order (|x| desc, index asc) with ties broken exactly, and the
    # sign is recoverable from bit 0.
    n = flat.shape[-1]
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    abs32 = bits & jnp.uint32(0x7FFFFFFF)
    ispos32 = ((bits >> 31) ^ jnp.uint32(1)) * (abs32 > 0).astype(jnp.uint32)
    idx = jax.lax.broadcasted_iota(jnp.uint64, flat.shape, flat.ndim - 1)
    key = ((abs32.astype(jnp.uint64) << 13)
           | ((jnp.uint64(n - 1) - idx) << 1) | ispos32.astype(jnp.uint64))
    ikey = jax.lax.bitcast_convert_type(key, jnp.int64)  # keys < 2^44: i64 order ok
    top, _ = jax.lax.top_k(ikey, K)
    topu = jax.lax.bitcast_convert_type(top, jnp.uint64)
    pos = (topu & 1).astype(jnp.uint8)
    neg = ((topu >> 13) > 0).astype(jnp.uint8) * (1 - pos)
    return pos, neg


def signs_sort2(flat):
    # EXACT via stable full sort: lax.sort ascending on ~abs_bits (== abs
    # desc) is stable, so index ties keep reference order; the sign class
    # rides along as a payload.  No gather; costs a full 4096 sort.
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    abs_bits = bits & jnp.uint32(0x7FFFFFFF)
    keys = ~abs_bits
    cls = ((flat > 0).astype(jnp.uint8) + 2 * (flat < 0).astype(jnp.uint8))
    _, topcls = jax.lax.sort((keys, cls), dimension=-1, num_keys=1,
                             is_stable=True)
    topcls = topcls[..., :K]
    return (topcls == 1).astype(jnp.uint8), (topcls == 2).astype(jnp.uint8)


def signs_sortblk(flat):
    # EXACT two-stage blocked stable sort: per-512-block sort (shorter
    # networks), keep top 128 per block (>= K so the global top-K is
    # covered), stable merge of the 8x128 candidates.  Cross-block ties stay
    # in index order because blocks are concatenated block-major and the
    # merge sort is stable.
    *lead, n = flat.shape
    import os
    nb = int(os.environ.get("SORTBLK_NB", "8"))
    bs = n // nb
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    keys = ~(bits & jnp.uint32(0x7FFFFFFF))
    cls = ((flat > 0.0).astype(jnp.uint8) + 2 * (flat < 0.0).astype(jnp.uint8))
    k2, c2 = (a.reshape(*lead, nb, bs) for a in (keys, cls))
    sk, sc = jax.lax.sort((k2, c2), dimension=-1, num_keys=1, is_stable=True)
    sk = sk[..., :128].reshape(*lead, nb * 128)
    sc = sc[..., :128].reshape(*lead, nb * 128)
    _, topcls = jax.lax.sort((sk, sc), dimension=-1, num_keys=1,
                             is_stable=True)
    topcls = topcls[..., :K]
    return (topcls == 1).astype(jnp.uint8), (topcls == 2).astype(jnp.uint8)


def signs_approx(flat):
    # TIMING ONLY (approximate, and still pays the sign gather): measures
    # the TPU PartialReduce top-k speed ceiling.
    a = jnp.abs(flat)
    _, idx = jax.lax.approx_max_k(a, K, recall_target=0.95)
    top = jnp.take_along_axis(flat, idx, axis=-1)
    return (top > 0).astype(jnp.uint8), (top < 0).astype(jnp.uint8)


def signs_approx_nogather(flat):
    # TIMING ONLY: PartialReduce without the gather (sign faked).
    vals, _ = jax.lax.approx_max_k(jnp.abs(flat), K, recall_target=0.95)
    return (vals > 0).astype(jnp.uint8), (vals < 1).astype(jnp.uint8)


SIGNS = {"cur": signs_cur, "nogather": signs_nogather, "intkey": signs_intkey,
         "twostage": signs_twostage, "onehot": signs_onehot,
         "u32key": signs_u32key, "u64key": signs_u64key, "sort2": signs_sort2,
         "sortblk": signs_sortblk, "approx": signs_approx,
         "approxng": signs_approx_nogather}

if variant == "u64key":
    jax.config.update("jax_enable_x64", True)


@jax.jit
def step(c):
    coeffs = fused_band_rows_v3(audio + c * 0.0, cfg, n_rows, fuse_haar=True)
    flat = coeffs.reshape(B, S, 4096)
    if variant == "none":
        pos = (flat[..., :K] > 0).astype(jnp.uint8)
        neg = (flat[..., :K] < 0).astype(jnp.uint8)
    else:
        pos, neg = SIGNS[variant](flat)
    return c + pos[0, 0, 0].astype(jnp.float32) + neg[0, 0, 1].astype(jnp.float32)


t0 = time.perf_counter()
c = step(jnp.float32(0))
float(np.asarray(c))
compile_s = time.perf_counter() - t0
c = jnp.float32(0)
ITERS = 30
t0 = time.perf_counter()
for _ in range(ITERS):
    c = step(c)
float(np.asarray(c))
print(f"{variant} B={B} S={S}: {(time.perf_counter() - t0) / ITERS * 1e3:.2f} ms"
      f"  (compile {compile_s:.0f}s)")
