"""Time the v3 rows kernel with/without batched rolls (v4) on the TPU.

Usage: python scripts/ab_rolls.py <0|1> [B] [S]
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

batched = bool(int(sys.argv[1])) if len(sys.argv) > 1 else True
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
S = int(sys.argv[3]) if len(sys.argv) > 3 else 64
tps = int(sys.argv[4]) if len(sys.argv) > 4 else None

cfg = FingerprintConfig()
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, t_pad)).astype(np.float32) * 0.1)


@jax.jit
def step(c):
    coeffs = fused_band_rows_v3(audio + c * 0.0, cfg, n_rows, fuse_haar=True,
                                batched_rolls=batched, tps_override=tps)
    return c + coeffs[0, 0, 0]


t0 = time.perf_counter()
c = step(jnp.float32(0))
float(np.asarray(c))
compile_s = time.perf_counter() - t0
c = jnp.float32(0)
t0 = time.perf_counter()
for _ in range(5):
    c = step(c)
float(np.asarray(c))
print(f"batched_rolls={batched} tps={tps} B={B} S={S}: "
      f"{(time.perf_counter() - t0) / 5 * 1e3:.2f} ms  (compile {compile_s:.0f}s)")
