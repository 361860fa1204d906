"""On-TPU A/B of the multi-step pipe_select tail handling at the canonical
parity bench shape (B=256, S=56 subfingerprints).

Round-3 measured the t-lag + outside-stitch variant at 4,572 clips/s
(56 ms/256); the lag_t fold that later replaced it measured 69.5 ms/256 in
the round-4 queue (q6/q7) — rows+select fully serialised, i.e. the two
pl.when regions stop Mosaic interleaving the VPU select under the MXU
drains.  This script settles it with all four variants side by side plus
bit-agreement checks against the standalone two-stage select.

run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_pipe_tail.py
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


def time_variant(fn, audio, warmup=3, reps=3, iters=10):
    @jax.jit
    def step(a, c):
        out = fn(a + c * 0.0)
        return c + out.reshape(-1)[0].astype(jnp.float32) * 1e-30

    c = jnp.float32(0.0)
    for _ in range(warmup):
        c = step(audio, c)
    float(np.asarray(c))
    best = 1e9
    for _ in range(reps):
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = step(audio, c)
        float(np.asarray(c))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print("device:", jax.devices()[0])
    cfg = FingerprintConfig()
    B, S = 256, 56
    n_rows = S * 128
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(11)
    audio = jnp.asarray((np.cumsum(rng.standard_normal((B, t_pad)), axis=1)
                         * 0.01).astype(np.float32))

    # Bit agreement on a small slice first (cheap compile at the same tps).
    small = audio[:8]
    coeffs = np.asarray(fused_band_rows_v3(small, cfg, n_rows,
                                           fuse_haar=True))
    cls_two = np.asarray(select_sign_classes(
        jnp.asarray(coeffs.reshape(-1, 4096)), f_blk=32)).reshape(8, S, 128)
    for tail in ("stitch", "fold", "chain"):
        cls = np.asarray(fused_band_rows_v3(
            small, cfg, n_rows, fuse_haar=True, pipe_select=True,
            pipe_tail=tail))
        same = (cls == cls_two).mean()
        print(f"agreement pipe_tail={tail:7s} vs standalone: {same:.6f}")
        assert same == 1.0, f"pipe_tail={tail} diverges on TPU"

    variants = [
        ("rows only (no select)", lambda a: fused_band_rows_v3(
            a, cfg, n_rows, fuse_haar=True)),
        ("serial fuse_select", lambda a: fused_band_rows_v3(
            a, cfg, n_rows, fuse_haar=True, fuse_select=True)),
        ("pipe_select stitch", lambda a: fused_band_rows_v3(
            a, cfg, n_rows, fuse_haar=True, pipe_select=True,
            pipe_tail="stitch")),
        ("pipe_select fold", lambda a: fused_band_rows_v3(
            a, cfg, n_rows, fuse_haar=True, pipe_select=True,
            pipe_tail="fold")),
        ("pipe_select chain", lambda a: fused_band_rows_v3(
            a, cfg, n_rows, fuse_haar=True, pipe_select=True,
            pipe_tail="chain")),
    ]
    for label, fn in variants:
        dt = time_variant(fn, audio, reps=4, iters=20)
        print(f"{label:24s} {dt * 1e3:7.2f} ms / {B} clips "
              f"({B / dt:8.0f} clips/s)")

    # End-to-end extraction (cls -> planes + valid mask) per tail.  NOTE:
    # pipe_tail must ride as the static jit parameter — an earlier version
    # monkeypatched a module global, which extract_fingerprint_padded's own
    # jit wrapper baked into its FIRST trace (both "variants" then timed
    # stitch; scripts/probe_chain_e2e.py caught it via identical HLO).
    from lbaudiodetective_tpu.ops.extract import extract_fingerprint_padded

    n_subs = jnp.full((B,), S, jnp.int32)
    for tail in ("stitch", "chain"):
        def full(a, _tail=tail):
            pos, neg = extract_fingerprint_padded(a, n_subs, cfg, n_rows,
                                                  pipe_tail=_tail)
            return pos
        dt = time_variant(full, audio, reps=4, iters=20)
        print(f"full extract tail={tail:7s} {dt * 1e3:7.2f} ms / {B} clips "
              f"({B / dt:8.0f} clips/s)")


if __name__ == "__main__":
    main()
