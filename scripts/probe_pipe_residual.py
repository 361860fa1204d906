"""Break down the pipe_select parity step's non-rows residual (~6 ms/256).

After pipe_select the parity step is ~56 ms/256 clips: the rows kernel with
the overlapped in-kernel select (~50 ms) plus a residual that contains the
tail-stitch select kernel, the dynamic_update_slice, the cls -> pos/neg
compares, and the valid mask.  This script times each superset on the same
device buffers to attribute the residual:

  a) rows kernel + pipe_select alone (kernel output fetched via carry)
  b) a + tail stitch (the full fused_band_rows_v3 pipe_select return)
  c) b + cls->pos/neg + valid mask (= extract_fingerprint_padded)

run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_pipe_residual.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import (bucket_subfingerprints,
                                              extract_fingerprint_padded,
                                              required_padded_length)
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3


def timed(step, iters=20):
    c = jnp.float32(0.0)
    for _ in range(3):
        c = step(c)
    float(np.asarray(c))
    best = 1e9
    for _ in range(3):
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = step(c)
        float(np.asarray(c))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print("device:", jax.devices()[0])
    cfg = FingerprintConfig()
    B = 256
    file_frames = int(10.0 * cfg.file_sample_rate)
    proc_frames = int(10.0 * cfg.processing_sample_rate)
    n_sub = cfg.num_subfingerprints(file_frames, proc_frames)
    n_rows = bucket_subfingerprints(n_sub) * cfg.rows_per_frame
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1
                         ).astype(np.float32))
    n_subs = jnp.full((B,), n_sub, jnp.int32)

    @jax.jit
    def step_full(c):
        pos, neg = extract_fingerprint_padded(audio + c * 0.0, n_subs,
                                              cfg, n_rows)
        return c + pos[0, 0, 0].astype(jnp.float32)

    @jax.jit
    def step_pipe(c):
        cls = fused_band_rows_v3(audio + c * 0.0, cfg, n_rows,
                                 fuse_haar=True, pipe_select=True)
        return c + cls[0, 0, 0].astype(jnp.float32)

    @jax.jit
    def step_rows_only(c):
        # pipe_select minus the tail stitch: time the main kernel's two
        # outputs without the standalone tail select / dynamic_update_slice
        # by reusing the serial fuse_select variant's kernel grid but with
        # the lagged writes.  Closest measurable proxy: fuse_select=True
        # (select serialised in-kernel) and fuse_haar rows (no select).
        rows = fused_band_rows_v3(audio + c * 0.0, cfg, n_rows,
                                  fuse_haar=True)
        return c + rows[0, 0, 0].astype(jnp.float32)

    for label, fn in [("rows only (fuse_haar)", step_rows_only),
                      ("pipe_select + stitch", step_pipe),
                      ("full extract (planes+mask)", step_full)]:
        dt = timed(fn)
        print(f"{label:28s} {dt * 1e3:7.2f} ms / {B} clips "
              f"({B / dt:,.0f} clips/s)")


if __name__ == "__main__":
    main()
