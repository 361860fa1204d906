"""Where does proc mode's step time go?  B=1024 full extract measures
~59 ms but rows+select accounting predicts ~37 ms.  Times rows-only, full
extract, and the select stage separately at proc shapes; then re-sweeps
tps for the parity kernel (the r2 sweep predates conj_pairs/proj_concat).
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import (bucket_subfingerprints,
                                              extract_fingerprint_padded,
                                              required_padded_length,
                                              subfingerprints_from_rows)
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3


def timed(fn, iters=15):
    c = fn(jnp.float32(0))
    float(np.asarray(c))
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(c)
    float(np.asarray(c))
    return (time.perf_counter() - t0) / iters


proc = FingerprintConfig(hop_domain="proc")
B = 1024
file_frames = int(10.0 * proc.file_sample_rate)
proc_frames = int(10.0 * proc.processing_sample_rate)
n_sub = proc.num_subfingerprints(file_frames, proc_frames)
n_rows = bucket_subfingerprints(n_sub) * proc.rows_per_frame
t_pad = required_padded_length(proc, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))
n_subs = jnp.full((B,), n_sub, jnp.int32)
print(f"proc: n_sub={n_sub} bucket_rows={n_rows} t_pad={t_pad}", flush=True)


# Audio rides as an argument (not a baked closure constant): the relay
# rejects >~300 MB compile payloads (bench.py does the same).
@jax.jit
def rows_only(a, c):
    r = fused_band_rows_v3(a + c * 0.0, proc, n_rows, fuse_haar=True)
    return c + jnp.sum(r[0, ::997, :1])


@jax.jit
def full(a, c):
    pos, neg = extract_fingerprint_padded(a + c * 0.0, n_subs, proc, n_rows)
    return c + pos[0, 0, 0].astype(jnp.float32)


@jax.jit
def rows_plus_select(a, c):
    r = fused_band_rows_v3(a + c * 0.0, proc, n_rows, fuse_haar=True)
    pos, neg = subfingerprints_from_rows(r, proc, rows_are_coeffs=True)
    return c + pos[0, 0, 0].astype(jnp.float32)


for name, fn2 in (("rows only", rows_only),
                  ("rows+select", rows_plus_select),
                  ("full extract", full)):
    fn = lambda c, fn2=fn2: fn2(audio, c)
    dt = timed(fn)
    print(f"proc {name}: {dt*1e3:.2f} ms / {B} clips ({B/dt:.0f} clips/s)",
          flush=True)

# --- parity tps re-sweep -----------------------------------------------------
par = FingerprintConfig()
Bp, S = 128, 56
n_rows_p = S * 128
t_pad_p = required_padded_length(par, n_rows_p)
audio_p = jnp.asarray((rng.standard_normal((Bp, t_pad_p)) * 0.1
                       ).astype(np.float32))
for tps in (4, 8, 14, 28):
    if (n_rows_p // 128) % tps:
        continue

    @jax.jit
    def step_a(a, c, tps=tps):
        r = fused_band_rows_v3(a + c * 0.0, par, n_rows_p,
                               fuse_haar=True, tps_override=tps)
        return c + jnp.sum(r[0, ::997, :1])

    dt = timed(lambda c, f=step_a: f(audio_p, c))
    print(f"parity rows tps={tps}: {dt*1e3:.2f} ms / {Bp} clips", flush=True)
