"""A/B: v-major G assembly (one shared 16-piece concat + exact bf16
permutation matmul) vs the shipped per-residue 128-piece (v, k) concat,
on the real TPU at parity shapes.

Measures the rows stage (fuse_haar) and the fully fused select path both
ways, plus numeric delta and full-pipeline TPU bit parity vs the oracle.
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

cfg = FingerprintConfig()
B, S = 128, 56
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))


def timed(vmaj, fuse_select, iters=25):
    @jax.jit
    def step(c):
        r = fused_band_rows_v3(audio + c * 0.0, cfg, n_rows, fuse_haar=True,
                               fuse_select=fuse_select, vmaj=vmaj)
        if fuse_select:
            return c + jnp.sum(r[0, ::7, :1].astype(jnp.float32))
        return c + jnp.sum(r[0, ::997, :1])

    c = step(jnp.float32(0))
    float(np.asarray(c))
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    float(np.asarray(c))
    return (time.perf_counter() - t0) / iters


for fuse_select in (False, True):
    label = "select" if fuse_select else "rows  "
    for vmaj in (False, True):
        dt = timed(vmaj, fuse_select)
        print(f"{label} vmaj={int(vmaj)}: {dt*1e3:.2f} ms / {B} clips "
              f"({B/dt:.0f} clips/s)", flush=True)

# Numeric deltas on the same synthetic batch.
ra = np.asarray(fused_band_rows_v3(audio[:8], cfg, n_rows, fuse_haar=True))
rb = np.asarray(fused_band_rows_v3(audio[:8], cfg, n_rows, fuse_haar=True,
                                   vmaj=True))
rel = np.abs(ra - rb) / np.maximum(np.abs(ra), 1e-12)
print(f"coeff rel delta vmaj vs shipped: median {np.median(rel):.2e} "
      f"p99 {np.quantile(rel, 0.99):.2e} max {rel.max():.2e}")
ca = np.asarray(fused_band_rows_v3(audio[:8], cfg, n_rows, fuse_haar=True,
                                   fuse_select=True))
cb = np.asarray(fused_band_rows_v3(audio[:8], cfg, n_rows, fuse_haar=True,
                                   fuse_select=True, vmaj=True))
print(f"select class agreement vmaj vs shipped: {(ca == cb).mean():.6f}")
