"""A/B one extraction-pipeline variant on the TPU (bottleneck hunting).

Usage: python scripts/ab_extract.py <variant>
variants: full, no-topk, no-dft, no-haar, gather-only
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops import spectral
from lbaudiodetective_tpu.ops.haar import haar_2d
from lbaudiodetective_tpu.ops.extract import required_padded_length

variant = sys.argv[1] if len(sys.argv) > 1 else "full"
cfg = FingerprintConfig()
B, S = 8, 64
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, t_pad)).astype(np.float32) * 0.1)
starts = spectral.window_starts(cfg, n_rows)

skip_topk = variant in ("no-topk", "gather-only")
skip_dft = variant in ("no-dft", "gather-only")
skip_haar = variant in ("no-haar", "gather-only")


def pipeline(a):
    wins = spectral.frame_windows(a, starts, 2048)
    rows = wins[..., :32] if skip_dft else spectral.band_energies(wins, cfg)
    frames = rows.reshape(B, S, 128, 32)
    coeffs = frames if skip_haar else haar_2d(frames)
    flat = coeffs.reshape(B, S, 4096)
    if skip_topk:
        top = flat[..., :100]
    else:
        _, idx = jax.lax.top_k(jnp.abs(flat), 100)
        top = jnp.take_along_axis(flat, idx, axis=-1)
    return (top > 0).astype(jnp.uint8), (top < 0).astype(jnp.uint8)


@jax.jit
def step(c):
    pos, neg = pipeline(audio + c * 0.0)
    return c + pos[0, 0, 0].astype(jnp.float32)


t0 = time.perf_counter()
c = step(jnp.float32(0))
float(np.asarray(c))
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
c = jnp.float32(0)
for _ in range(3):
    c = step(c)
float(np.asarray(c))
print(f"{variant}: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms  (compile {compile_s:.0f}s)")
