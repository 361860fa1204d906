"""A/B: pl.CostEstimate scheduler hint on the v3 rows kernel (round-3
lead 1 last untried candidate).  Times the rows stage (fuse_haar, no
select) and the fused extract step at parity shapes, hint off vs on.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_cost_hint.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import (bucket_subfingerprints,
                                              required_padded_length,
                                              rows_for_subfingerprints)
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

config = FingerprintConfig()
B = 128
file_frames = int(10.0 * config.file_sample_rate)
proc_frames = int(10.0 * config.processing_sample_rate)
n_sub = bucket_subfingerprints(config.num_subfingerprints(file_frames, proc_frames))
n_rows = rows_for_subfingerprints(config, n_sub)
t_pad = required_padded_length(config, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray(np.cumsum(
    rng.standard_normal((B, t_pad)).astype(np.float32) * 0.1, axis=1) * 0.05)


def timed(fn, iters=30):
    @jax.jit
    def step(carry):
        r = fn(audio + carry * 0.0)
        return carry + jnp.sum(r[0, ::997].astype(jnp.float32)[:1])

    c = jnp.float32(0)
    for _ in range(3):
        c = step(c)
    float(np.asarray(c))
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    float(np.asarray(c))
    return (time.perf_counter() - t0) / iters


for hint in (False, True, False, True):
    dt_rows = timed(lambda a, h=hint: fused_band_rows_v3(
        a, config, n_rows, fuse_haar=True, cost_hint=h))
    dt_full = timed(lambda a, h=hint: fused_band_rows_v3(
        a, config, n_rows, fuse_haar=True, fuse_select=True, cost_hint=h))
    print(f"cost_hint={hint}: rows {dt_rows*1e3:7.2f} ms  "
          f"fused+select {dt_full*1e3:7.2f} ms  per {B} clips")
