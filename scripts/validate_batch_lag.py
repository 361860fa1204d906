"""On-TPU validation of the batch-axis select lag (proc / single-step grids).

The lag_t (multi-step) pipe_select path is covered by parity_v3 + the corpus
parity run; this script covers the batch-lag variant those never exercise:
proc-hop single-step-per-clip batches.  It checks the TPU batch-lag result
bit-for-bit against the standalone select kernel run on the SAME on-chip
coefficients (isolating the lag/stitch machinery from bf16x3 numerics), and
times the proc extract step before/after.

run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/validate_batch_lag.py
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
from lbaudiodetective_tpu.ops.pallas.select_signs import select_sign_classes


def main():
    print("device:", jax.devices()[0])
    cfg = FingerprintConfig(hop_domain="proc")
    B, S = 64, 8                                   # 1 grid step/clip (tps=8)
    n_rows = S * 128
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(7)
    audio = jnp.asarray((np.cumsum(rng.standard_normal((B, t_pad)), axis=1)
                         * 0.01).astype(np.float32))

    coeffs = np.asarray(fused_band_rows_v3(audio, cfg, n_rows,
                                           fuse_haar=True))
    cls_two = np.asarray(select_sign_classes(
        jnp.asarray(coeffs.reshape(-1, 4096)), f_blk=32)).reshape(B, S, 128)
    cls_pipe = np.asarray(fused_band_rows_v3(audio, cfg, n_rows,
                                             fuse_haar=True,
                                             pipe_select=True))
    same = (cls_pipe == cls_two).mean()
    print(f"batch-lag vs standalone select agreement: {same:.6f}")
    assert same == 1.0, "batch-lag pipe_select diverges on TPU"

    # Speed at the bench's proc shape.
    import bench
    for label, kw in [("serial fuse_select", dict(fuse_select=True)),
                      ("batch-lag pipe", dict(pipe_select=True))]:
        Bp, Sp = 1024, 8
        n_rows_p = Sp * 128
        t_pad_p = required_padded_length(cfg, n_rows_p)
        big = jnp.asarray((rng.standard_normal((Bp, t_pad_p)) * 0.1
                           ).astype(np.float32))

        # NB: `big` must be an ARGUMENT, not a closure constant — a jit
        # closing over a >~250 MB array exceeds the relay's remote_compile
        # payload limit (HTTP 413; see ROUND_NOTES round-3 probes).
        @jax.jit
        def step(a, c, kw=kw):
            out = fused_band_rows_v3(a + c * 0.0, cfg, n_rows_p,
                                     fuse_haar=True, **kw)
            return c + out.reshape(-1)[0].astype(jnp.float32) * 1e-30

        c = jnp.float32(0.0)
        for _ in range(3):
            c = step(big, c)
        float(np.asarray(c))
        best = 1e9
        for _ in range(3):
            c = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(20):
                c = step(big, c)
            float(np.asarray(c))
            best = min(best, (time.perf_counter() - t0) / 20)
        print(f"{label:20s} {best * 1e3:7.2f} ms / {Bp} proc clips")

    cps, dt = bench.bench_extract(cfg, batch=1024)
    print(f"proc extract e2e: {cps:.1f} clips/s  step {dt * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
