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


SIGNS = {"cur": signs_cur, "nogather": signs_nogather, "intkey": signs_intkey,
         "twostage": signs_twostage, "onehot": signs_onehot}


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
t0 = time.perf_counter()
for _ in range(5):
    c = step(c)
float(np.asarray(c))
print(f"{variant} B={B} S={S}: {(time.perf_counter() - t0) / 5 * 1e3:.2f} ms"
      f"  (compile {compile_s:.0f}s)")
