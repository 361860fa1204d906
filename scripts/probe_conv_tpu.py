"""Time spectral.conv_band_rows (the XLA strided-conv factorisation) on the
TPU at parity shapes — it was built as the CPU path and never measured
against the v3 Pallas kernel on-chip.  If XLA's conv lowering pipelines
better than the hand-built kernel, it wins for free.
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
from lbaudiodetective_tpu.ops import spectral
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.haar import haar_2d
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

cfg = FingerprintConfig()
B, S = 64, 56
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))


def timed(fn, iters=15):
    c = fn(jnp.float32(0))
    float(np.asarray(c))
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(c)
    float(np.asarray(c))
    return (time.perf_counter() - t0) / iters


@jax.jit
def conv_step(c):
    rows = spectral.conv_band_rows(audio + c * 0.0, cfg, n_rows)
    coeffs = haar_2d(rows.reshape(B, S, 128, 32), precision=cfg.precision)
    return c + jnp.sum(coeffs[0, ::13, 0, 0])


@jax.jit
def v3_step(c):
    coeffs = fused_band_rows_v3(audio + c * 0.0, cfg, n_rows, fuse_haar=True)
    return c + jnp.sum(coeffs[0, ::997, :1])


for name, fn in (("xla conv_band_rows + haar", conv_step),
                 ("v3 pallas fuse_haar", v3_step)):
    dt = timed(fn)
    print(f"{name}: {dt*1e3:.2f} ms / {B} clips ({B/dt:.0f} clips/s)",
          flush=True)
