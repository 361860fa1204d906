"""Settle VERDICT r3 #7 (proc stage-1/stage-2 sharing) at the kernel's REAL
shapes, plus the proc-mode tps sweep that never ran (parity's picked 8).

q8 (scripts/probe_k_depth.py) kept the half-window split-K candidate alive
from a [128,128]@[128,192] vs [130,64]@[64,192] head-to-head — but that M is
one TILE.  The shipped kernel runs stage-2 at STEP level: per residue
[tps*128, 128] @ [128, 256], and the proc bench batch (bucket 8, tps=8) makes
that [1024, 128] @ [128, 256].  q8's own K-sweep at M=1024 already shows
K=64 matmuls run SLOWER than K=128 there (4.24 vs 3.08 us at N=512): below
K=128 the MXU pipes K into array depth, so halving the MAC count by sharing
half-window contractions between adjacent windows (X_w = H_w + tw64*H_{w+1},
H K=64, each H used twice) cannot win unless M is small.  This probe times
the real alternatives at the real shapes:

  a) shipped:  [1024, 128] @ [128, 256] bf16 (x54 per step: 9 res x 3 passes
               x {re,im})
  b) split-K:  [1032, 64] @ [64, 256] bf16 (same count) + 9 per-residue
               twiddle combines X = H[:M] + rot(H[1:M+1]) on [1024, 256] f32
  c) per-tile split (q8's shape, for reference): 8 x [136, 64] @ [64, 256]

and sweeps the FULL rows kernel on the proc config over tps_override in
(8, 4, 2, 1) — rows-only and with the fused pipe_select — B=256.

Timing chains the carry THROUGH the matmul (memory: an `acc = acc*c + dot`
loop with loop-invariant x times the VPU chain, not the MXU).
"""
import sys
import time
from functools import partial

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

import os
REPS = int(os.environ.get("PROBE_REPS", "200"))
SMOKE = os.environ.get("PROBE_SMOKE") == "1"   # tiny shapes, CPU interpret


def timed(step, iters=24):
    c = jnp.float32(0.0)
    for _ in range(3):
        c = step(c)
    float(np.asarray(c))
    c = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    float(np.asarray(c))
    return (time.perf_counter() - t0) / iters


def chained_mm_kernel(x_ref, w_ref, o_ref, *, reps):
    a = x_ref[:]                                     # [M, K] f32
    w = w_ref[:]                                     # [K, N] bf16
    k = a.shape[1]

    def body(i, a):
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        # 3-pass bf16 shape: three dots accumulated in f32 (matches the
        # kernel's stage2_dot pass structure).
        y = (jnp.dot(ah, w, preferred_element_type=jnp.float32)
             + jnp.dot(ah, w, preferred_element_type=jnp.float32)
             + jnp.dot(al, w, preferred_element_type=jnp.float32))
        return a + y[:, :k] * 1e-30

    o_ref[:] = jax.lax.fori_loop(0, reps, body, a)


def chained_split_kernel(x_ref, w_ref, c_ref, s_ref, o_ref, *, reps, m_out):
    """Split-K stage-2: K=64 half contraction + the twiddle combine the real
    split kernel would pay (per residue: X = H[:M] + rot(H[1:M+1]) where rot
    mixes the re/im lane halves with per-lane cos/sin)."""
    a = x_ref[:]                                     # [M+8, 64] f32
    w = w_ref[:]                                     # [64, 256] bf16
    cc = c_ref[:]                                    # [1, 256] f32
    ss = s_ref[:]

    def body(i, a):
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        h = (jnp.dot(ah, w, preferred_element_type=jnp.float32)
             + jnp.dot(ah, w, preferred_element_type=jnp.float32)
             + jnp.dot(al, w, preferred_element_type=jnp.float32))
        h1 = h[:m_out]                               # [M, 256]
        h2 = h[1:m_out + 1]
        # complex rotate-and-add: 4 mults + 2 adds per element, the real
        # combine's cost shape (lane-half mixing folded into the constants).
        x = h1 + cc * h2 + ss * h2
        return jnp.concatenate([a[:m_out] + x[:, :64] * 1e-30, a[m_out:]],
                               axis=0)

    o_ref[:] = jax.lax.fori_loop(0, reps, body, a)


def time_mm(m, k, n, reps=REPS):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32)
                    .astype(np.dtype("bfloat16")))
    call = pl.pallas_call(
        partial(chained_mm_kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )

    @jax.jit
    def step(c):
        o = call(x + c * 0.0, w)
        return c + o[0, 0]

    return timed(step) / reps


def time_split(m, n, reps=REPS):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m + 8, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, n)).astype(np.float32)
                    .astype(np.dtype("bfloat16")))
    cc = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    ss = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    call = pl.pallas_call(
        partial(chained_split_kernel, reps=reps, m_out=m),
        out_shape=jax.ShapeDtypeStruct((m + 8, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )

    @jax.jit
    def step(c):
        o = call(x + c * 0.0, w, cc, ss)
        return c + o[0, 0]

    return timed(step) / reps


def main():
    print("device:", jax.devices()[0], flush=True)

    print("\n-- stage-2 at REAL proc step shapes (3-pass bf16 per call) --",
          flush=True)
    m_step = 128 if SMOKE else 1024
    t_a = time_mm(m_step, 128, 256)
    t_b = time_split(m_step, 256)
    t_c = time_split(128, 256)
    print(f"a) shipped  [1024,128]@[128,256]x3      : {t_a*1e6:8.2f} us")
    print(f"b) split-K  [1032, 64]@[64,256]x3+comb  : {t_b*1e6:8.2f} us")
    print(f"c) per-tile [136, 64]@[64,256]x3+comb   : {t_c*1e6:8.2f} us "
          f"(x8 tiles = {8*t_c*1e6:8.2f} us)")
    # Per grid step: 9 residues x 2 (re,im G planes), each a 3-pass call.
    step_a, step_b = 18 * t_a, 18 * t_b
    print(f"per-step (x18): shipped {step_a*1e3:7.3f} ms vs split "
          f"{step_b*1e3:7.3f} ms -> split is "
          f"{'a WIN' if step_b < 0.95*step_a else 'NOT a win'} "
          f"({step_b/step_a:.2f}x)", flush=True)

    print("\n-- proc tps sweep, full rows kernel (B=256, bucket 8) --",
          flush=True)
    cfg = FingerprintConfig(hop_domain="proc")
    n_rows = 8 * 128
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(0)
    n_clips = 2 if SMOKE else 256
    audio = jnp.asarray(rng.standard_normal((n_clips, t_pad))
                        .astype(np.float32) * 0.1)
    for tps in ((8,) if SMOKE else (8, 4, 2, 1)):
        for mode in ("rows", "select"):
            @partial(jax.jit, static_argnames=("tps", "mode"))
            def step_a(a, c, tps=tps, mode=mode):
                if mode == "rows":
                    r = fused_band_rows_v3(a + c * 0.0, cfg, n_rows,
                                           fuse_haar=True, tps_override=tps)
                    return c + jnp.sum(r[0, ::997, :1])
                r = fused_band_rows_v3(a + c * 0.0, cfg, n_rows,
                                       fuse_haar=True, pipe_select=True,
                                       tps_override=tps)
                return c + r[0, 0, 0].astype(jnp.float32)

            try:
                dt = timed(lambda c: step_a(audio, c))
                clips = n_clips / dt
                print(f"tps={tps} {mode:6s}: {dt*1e3:8.2f} ms/256 "
                      f"({clips:8.0f} clips/s)", flush=True)
            except Exception as e:
                print(f"tps={tps} {mode:6s}: FAILED {str(e)[:140]}",
                      flush=True)


if __name__ == "__main__":
    main()
