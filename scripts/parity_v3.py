"""v3 kernel on TPU: speed + full-pipeline bit parity vs the golden oracle.

Usage: python scripts/parity_v3.py  (run after kernel precision changes)
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
from lbaudiodetective_tpu.ops.extract import extract_fingerprint, required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

cfg = FingerprintConfig()
B, S = 32, 64
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))


@jax.jit
def step(c):
    r = fused_band_rows_v3(audio + c * 0.0, cfg, n_rows, fuse_haar=True)
    return c + jnp.sum(r[0, ::997, :1])


c = step(jnp.float32(0))
float(np.asarray(c))
t0 = time.perf_counter()
c = jnp.float32(0)
for _ in range(5):
    c = step(c)
float(np.asarray(c))
dt = (time.perf_counter() - t0) / 5
print(f"v3 rows step: {dt*1e3:.2f} ms / {B} clips", flush=True)

# Full-pipeline bit parity on a real clip.
clip = decode_audio_file(
    "/root/reference/LBAudioDetectiveTests/Birds/Archive/BlackBird.caf")
jpos, jneg, n = extract_fingerprint(clip, cfg)
opos, oneg = oracle_fingerprint(clip, cfg)
agree = ((jpos[:n] == opos).mean() + (jneg[:n] == oneg).mean()) / 2 * 100
print(f"bit agreement vs oracle: {agree:.3f}%", flush=True)
