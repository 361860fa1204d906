"""Benchmark the v2 fused kernel on TPU + bit parity check."""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.io.decode import DecodedAudio
from lbaudiodetective_tpu.oracle.pipeline import spectrogram_rows
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v2

cfg = FingerprintConfig()  # high precision, integer hop
B, S = 8, 64
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio_np = (rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32)
audio = jnp.asarray(audio_np)


@jax.jit
def step(c):
    r = fused_band_rows_v2(audio + c * 0.0, cfg, n_rows)
    return c + jnp.sum(r[0, ::997, :1])


t0 = time.perf_counter()
c = step(jnp.float32(0))
print("compile+first:", round(time.perf_counter() - t0), "s; probe",
      float(np.asarray(c)), flush=True)

d = DecodedAudio(audio_np[0], 5512.0, file_frames=n_rows * 64 + 2048,
                 file_rate=44100.0)
exp = spectrogram_rows(d, cfg)
rows = fused_band_rows_v2(audio, cfg, n_rows)
got = np.asarray(rows[0])[: exp.shape[0]]
print("v2 tpu vs oracle max rel:",
      (np.abs(got - exp) / np.abs(exp).max()).max(), flush=True)

t0 = time.perf_counter()
c = jnp.float32(0)
iters = 10
for _ in range(iters):
    c = step(c)
float(np.asarray(c))
dt = (time.perf_counter() - t0) / iters
print(f"v2 rows step: {dt*1e3:.1f} ms / {B} clips -> {B/dt:.0f} clips-eq/s "
      f"(rows stage, precision={cfg.matmul_precision})", flush=True)
