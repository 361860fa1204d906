"""A/B: selective precision (VERDICT r2 'next' item 3) and cat_gk.

aux_two_pass drops ONLY stage-1 and the band projection to 2-pass bf16;
the un-permutation/Haar matmuls deliberately stay at 3-pass (the first,
coarser experiment also two-passed Haar: 22.1 ms / 95.77% bits; this
narrower split measured 22.7 ms / 95.73% bits — the divergence does NOT
come from Haar, and no 2-pass split reaches the 99.9% parity bar).
cat_gk fuses each residue's two stage-2 matmuls into one double-K matmul.

Measures rows-stage speed and full-pipeline bit parity vs the oracle.
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
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

cfg = FingerprintConfig()
B, S = 128, 56
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))


def timed(aux2, cat, iters=25):
    @jax.jit
    def step(c):
        r = fused_band_rows_v3(audio + c * 0.0, cfg, n_rows, fuse_haar=True,
                               aux_two_pass=aux2, cat_gk=cat)
        return c + jnp.sum(r[0, ::997, :1])

    c = step(jnp.float32(0))
    float(np.asarray(c))
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    float(np.asarray(c))
    return (time.perf_counter() - t0) / iters


for aux2, cat in ((False, False), (True, False), (False, True), (True, True)):
    dt = timed(aux2, cat)
    print(f"rows fuse_haar aux_two_pass={aux2} cat_gk={cat}: "
          f"{dt*1e3:.2f} ms / {B} clips", flush=True)

# Bit parity of the aux-2-pass rows against the oracle (coefficients path).
clip = decode_audio_file(
    "/root/reference/LBAudioDetectiveTests/Birds/Archive/BlackBird.caf")
from lbaudiodetective_tpu.ops.extract import (bucket_subfingerprints,
                                              rows_for_subfingerprints,
                                              subfingerprints_from_rows)

n_sub = cfg.num_subfingerprints(clip.file_frames, clip.proc_frames)
nr = rows_for_subfingerprints(cfg, bucket_subfingerprints(n_sub))
tp = required_padded_length(cfg, nr)
x = np.zeros(tp, np.float32)
x[:min(tp, clip.samples.shape[0])] = clip.samples[:tp]
coeffs = fused_band_rows_v3(jnp.asarray(x)[None], cfg, nr, fuse_haar=True,
                            aux_two_pass=True)
jpos, jneg = subfingerprints_from_rows(coeffs, cfg, rows_are_coeffs=True)
jpos = np.asarray(jpos[0])[:n_sub]
jneg = np.asarray(jneg[0])[:n_sub]
opos, oneg = oracle_fingerprint(clip, cfg)
agree = ((jpos == opos).mean() + (jneg == oneg).mean()) / 2 * 100
print(f"bit agreement vs oracle (aux_two_pass): {agree:.3f}%", flush=True)
