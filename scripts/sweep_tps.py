"""Sweep v3 kernel tiles-per-step / batched_rolls on the TPU.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_tps.py [B] [S]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
S = int(sys.argv[2]) if len(sys.argv) > 2 else 64

cfg = FingerprintConfig()
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, t_pad)).astype(np.float32) * 0.1)


def timed(fn, iters=10):
    carry = jnp.float32(0.0)
    t0 = time.time()
    _, carry = fn(carry)
    float(np.asarray(carry))
    compile_s = time.time() - t0
    carry = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        _, carry = fn(carry)
    float(np.asarray(carry))
    return (time.perf_counter() - t0) / iters, compile_s


for tps in (8, 16, 32):
    for br in (False, True):
        if S % tps:
            continue

        @jax.jit
        def step(carry, tps=tps, br=br):
            r = fused_band_rows_v3(audio + carry * 0.0, cfg, n_rows,
                                   fuse_haar=True, batched_rolls=br,
                                   tps_override=tps)
            return r, carry + jnp.sum(r[0, ::997, :1])

        try:
            dt, cs = timed(step)
            print(f"tps={tps:2d} batched_rolls={br}: {dt*1e3:7.2f} ms "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as e:
            print(f"tps={tps:2d} batched_rolls={br}: FAILED {str(e)[:120]}",
                  flush=True)
