"""v2 kernel with bf16x3 stage-2: speed + bit parity on TPU."""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.io.decode import DecodedAudio
from lbaudiodetective_tpu.oracle.pipeline import oracle_fingerprint, spectrogram_rows
from lbaudiodetective_tpu.ops.extract import extract_fingerprint, required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v2

cfg = FingerprintConfig()  # matmul_precision="high" -> bf16x3 in-kernel
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


c = step(jnp.float32(0))
print("probe", float(np.asarray(c)), flush=True)
d = DecodedAudio(audio_np[0], 5512.0, file_frames=n_rows * 64 + 2048, file_rate=44100.0)
exp = spectrogram_rows(d, cfg)
rows = fused_band_rows_v2(audio, cfg, n_rows)
got = np.asarray(rows[0])[: exp.shape[0]]
print("bf16x3 rows vs oracle max rel:",
      (np.abs(got - exp) / np.abs(exp).max()).max(), flush=True)

t0 = time.perf_counter()
c = jnp.float32(0)
for _ in range(10):
    c = step(c)
float(np.asarray(c))
dt = (time.perf_counter() - t0) / 10
print(f"bf16x3 rows step: {dt*1e3:.1f} ms / {B} clips -> {B/dt:.0f} clips-eq/s",
      flush=True)

# Full-pipeline bit parity on a real clip.
z = np.load("/root/repo/tests/_cache/decoded_BlackBird.npz")
clip = DecodedAudio(z["samples"], float(z["processing_rate"]),
                    int(z["file_frames"]), float(z["file_rate"]))
jpos, jneg, n = extract_fingerprint(clip, cfg)
opos, oneg = oracle_fingerprint(clip, cfg)
agree = ((jpos[:n] == opos).mean() + (jneg[:n] == oneg).mean()) / 2 * 100
print(f"bit agreement vs oracle: {agree:.2f}%", flush=True)
