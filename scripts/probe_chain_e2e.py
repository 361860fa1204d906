"""Attribute the stitch-vs-chain end-to-end wash (scripts/ab_pipe_tail.py).

Kernel-only timing shows the chain main kernel ~2.3 ms faster per 256
parity clips, yet full extraction times identically for both tails.  Two
hypotheses this probe separates:

  (h1) the A/B harness doesn't actually switch the tail in the e2e trace
       -> compare the compiled HLO of both e2e programs (the stitch tail
       kernel's output is [256, 256, 128]; chain's is [1, 256, 128] — the
       shapes must differ if the switch works);
  (h2) the kernel-only timing is DCE-flattered: it consumes ONE element of
       the stitched cls, and XLA can simplify
       element-of(dynamic_update_slice) with constant offsets to bypass
       the tail kernel entirely -> re-time both tails consuming the FULL
       cls (sum), where nothing is DCE-able.

run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_chain_e2e.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import (extract_fingerprint_padded,
                                              required_padded_length)
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3


def timed(step, audio, warmup=3, reps=4, iters=20):
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
    n_subs = jnp.full((B,), S, jnp.int32)

    # -- h1: do the two e2e programs actually differ? ------------------------
    # (The first run of this probe caught the original A/B harness bug: it
    # monkeypatched a module global that extract_fingerprint_padded's jit
    # wrapper had baked into its first trace — both e2e "variants" were
    # stitch, HLO byte-identical.  pipe_tail is a static jit parameter now.)
    hlos = {}
    for tail in ("stitch", "chain"):
        def full(a, c, _t=tail):
            pos, neg = extract_fingerprint_padded(a + c * 0.0, n_subs,
                                                  cfg, n_rows, pipe_tail=_t)
            return c + pos[0, 0, 0].astype(jnp.float32)

        lowered = jax.jit(full).lower(audio, jnp.float32(0.0))
        txt = lowered.as_text()
        hlos[tail] = txt
        # The per-clip tail select output is [256, 256, 128] f32 for stitch,
        # [1, 256, 128] for chain.
        print(f"e2e[{tail}]: HLO chars={len(txt)}, "
              f"has 256x256x128 tail={'256x256x128' in txt.replace(', ', 'x')}, "
              f"has 1x256x128 tail={'1x256x128' in txt.replace(', ', 'x')}")
    print("e2e HLO identical:", hlos["stitch"] == hlos["chain"])

    # -- h2: kernel timing with the FULL cls consumed (no DCE possible) ------
    for tail in ("stitch", "chain"):
        @jax.jit
        def step_sum(a, c, _t=tail):
            cls = fused_band_rows_v3(a + c * 0.0, cfg, n_rows, fuse_haar=True,
                                     pipe_select=True, pipe_tail=_t)
            return c + jnp.sum(cls).astype(jnp.float32) * 1e-30

        dt = timed(step_sum, audio)
        print(f"kernel+tail, full cls consumed, tail={tail:7s} "
              f"{dt * 1e3:7.2f} ms / {B} clips ({B / dt:8.0f} clips/s)")

    # And one element consumed (the ab_pipe_tail variant timing), for the
    # DCE comparison.
    for tail in ("stitch", "chain"):
        @jax.jit
        def step_one(a, c, _t=tail):
            cls = fused_band_rows_v3(a + c * 0.0, cfg, n_rows, fuse_haar=True,
                                     pipe_select=True, pipe_tail=_t)
            return c + cls.reshape(-1)[0].astype(jnp.float32) * 1e-30

        dt = timed(step_one, audio)
        print(f"kernel+tail, ONE element consumed, tail={tail:7s} "
              f"{dt * 1e3:7.2f} ms / {B} clips ({B / dt:8.0f} clips/s)")


if __name__ == "__main__":
    main()
