"""A/B: dense_pairs stage-2 lane packing (1600 lanes) vs the r2 64-granule
pair packing (2048 lanes), on the real TPU at parity shapes.

Measures the rows stage (fuse_haar) both ways and full-pipeline bit parity
vs the golden oracle with dense on.
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.io.decode import decode_audio_file
from lbaudiodetective_tpu.oracle.pipeline import oracle_fingerprint
from lbaudiodetective_tpu.ops.extract import (extract_fingerprint,
                                              required_padded_length)
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

cfg = FingerprintConfig()
B, S = 128, 56
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))


def timed(dense, iters=25):
    @jax.jit
    def step(c):
        r = fused_band_rows_v3(audio + c * 0.0, cfg, n_rows, fuse_haar=True,
                               dense_pairs=dense)
        return c + jnp.sum(r[0, ::997, :1])

    c = step(jnp.float32(0))
    float(np.asarray(c))
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    float(np.asarray(c))
    return (time.perf_counter() - t0) / iters


for dense in (False, True):
    dt = timed(dense)
    print(f"rows fuse_haar dense={dense}: {dt*1e3:.2f} ms / {B} clips "
          f"({B/dt:.0f} clips/s rows-stage)", flush=True)

# Numeric delta between the two packings on the same synthetic batch.
ra = np.asarray(fused_band_rows_v3(audio[:8], cfg, n_rows, fuse_haar=True,
                                   dense_pairs=False))
rb = np.asarray(fused_band_rows_v3(audio[:8], cfg, n_rows, fuse_haar=True,
                                   dense_pairs=True))
rel = np.abs(ra - rb) / np.maximum(np.abs(ra), 1e-12)
print(f"coeff rel delta dense vs granule: median {np.median(rel):.2e} "
      f"p99 {np.quantile(rel, 0.99):.2e} max {rel.max():.2e}", flush=True)

# Full-pipeline bit parity vs oracle with dense_pairs (the measured-negative variant).
clip = decode_audio_file(
    "/root/reference/LBAudioDetectiveTests/Birds/Archive/BlackBird.caf")
jpos, jneg, n = extract_fingerprint(clip, cfg)
opos, oneg = oracle_fingerprint(clip, cfg)
agree = ((jpos[:n] == opos).mean() + (jneg[:n] == oneg).mean()) / 2 * 100
print(f"bit agreement vs oracle (dense): {agree:.3f}%", flush=True)
