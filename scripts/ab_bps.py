"""Sweep (bps, tps) for the v3 rows kernel on TPU (parity geometry, B=32)."""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

cfg = FingerprintConfig()
B, S = 32, 56                      # parity bucket for a 10 s clip
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))
ref = None

for bps, tps in [(1, 8), (2, 8), (4, 8), (8, 8), (4, 14), (2, 28), (1, 56)]:
    if B % bps or S % tps:
        continue

    @jax.jit
    def step(c, bps=bps, tps=tps):
        r = fused_band_rows_v3(audio + c * 0.0, cfg, n_rows, fuse_haar=True,
                               bps=bps, tps_override=tps)
        return r, c + jnp.sum(r[0, ::997, :1])

    try:
        r0, c = step(jnp.float32(0))
        float(np.asarray(c))
    except Exception as e:
        print(f"bps={bps} tps={tps}: FAIL {str(e)[:120]}", flush=True)
        continue
    if ref is None:
        ref = np.asarray(r0)
    else:
        d = np.abs(np.asarray(r0) - ref).max()
        assert d < 1e-3, f"mismatch {d} at bps={bps},tps={tps}"
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(5):
        _, c = step(c)
    float(np.asarray(c))
    dt = (time.perf_counter() - t0) / 5
    print(f"bps={bps} tps={tps}: {dt*1e3:7.2f} ms / {B} clips "
          f"({B/dt:7.0f} rows-stage clips/s)", flush=True)
