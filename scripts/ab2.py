"""A/B the conv-based pipeline stages on TPU.

Usage: python scripts/ab2.py <rows|haar|topk|full>
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops import spectral
from lbaudiodetective_tpu.ops.haar import haar_2d
from lbaudiodetective_tpu.ops.extract import required_padded_length

variant = sys.argv[1]
cfg = FingerprintConfig()
B, S = 8, 64
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))


def pipeline(a):
    rows = spectral.conv_band_rows(a, cfg, n_rows)
    if variant == "rows":
        return rows[..., :1]
    frames = rows.reshape(B, S, 128, 32)
    coeffs = haar_2d(frames)
    if variant == "haar":
        return coeffs[..., :1, :1]
    flat = coeffs.reshape(B, S, 4096)
    _, idx = jax.lax.top_k(jnp.abs(flat), 100)
    if variant == "topk":
        return idx[..., :1].astype(jnp.float32)
    top = jnp.take_along_axis(flat, idx, axis=-1)
    pos = (top > 0).astype(jnp.uint8)
    neg = (top < 0).astype(jnp.uint8)
    return pos.astype(jnp.float32)[..., :1]


@jax.jit
def step(c):
    out = pipeline(audio + c * 0.0)
    return c + jnp.sum(out[:, ::37]) * 1e-6


t0 = time.perf_counter()
c = step(jnp.float32(0))
float(np.asarray(c))
print(f"{variant} compile: {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
c = jnp.float32(0)
for _ in range(5):
    c = step(c)
float(np.asarray(c))
print(f"{variant}: {(time.perf_counter()-t0)/5*1e3:.1f} ms / {B} clips", flush=True)
