"""Re-sweep v3 tiles-per-step with the overlapped (pipe_select) select.

The round-3 tps sweeps (scripts/sweep_tps.py, ROUND_NOTES "tps re-sweep")
timed the rows stage with the select serialised after the matmuls; with
pipe_select the VPU select must fit inside the MXU time of the NEXT grid
step, so the optimal tps may have shifted (smaller tps = finer overlap
granularity but more per-step fixed cost).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_tps_pipe.py [B] [S]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S = int(sys.argv[2]) if len(sys.argv) > 2 else 56   # 10 s parity clip tiles

cfg = FingerprintConfig()
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, t_pad)).astype(np.float32) * 0.1)


def timed(fn, iters=20):
    carry = jnp.float32(0.0)
    t0 = time.time()
    carry2 = fn(carry)
    float(np.asarray(carry2))
    compile_s = time.time() - t0
    carry = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    float(np.asarray(carry))
    return (time.perf_counter() - t0) / iters, compile_s


print("device:", jax.devices()[0], f"B={B} S={S}")
ref_cls = None
for label, kw in [
    ("serial fuse_select        ", dict(fuse_select=True)),
    ("pipe_select tps=8 (default)", dict(pipe_select=True)),
    ("pipe_select tps=4          ", dict(pipe_select=True, tps_override=4)),
    ("pipe_select tps=2          ", dict(pipe_select=True, tps_override=2)),
]:
    if "tps_override" in kw and S % kw["tps_override"]:
        continue  # explicit tps must divide S; auto-tps variants always run

    @jax.jit
    def step(carry, kw=kw):
        cls = fused_band_rows_v3(audio + carry * 0.0, cfg, n_rows,
                                 fuse_haar=True, **kw)
        return carry + jnp.float32(jnp.sum(cls[0, ::7, :1]))

    try:
        dt, comp = timed(step)
    except Exception as e:
        print(f"{label}: FAILED {str(e)[:120]}")
        continue
    cls = np.asarray(fused_band_rows_v3(audio, cfg, n_rows,
                                        fuse_haar=True, **kw))
    if ref_cls is None:
        ref_cls = cls
    agree = float((cls == ref_cls).mean())
    print(f"{label}: {dt*1e3:8.2f} ms/{B} clips  (compile {comp:5.1f}s, "
          f"agree={agree:.6f})")
