"""MXU contraction-depth cost probe: is a Pallas matmul's time ~linear in K
(MAC-bound) or ~flat below K=128 (array-fill-bound)?

Decides the proc-mode split-K family (ROUND_NOTES round-4 lead "proc
stage-1 sharing"): with hop=64, adjacent windows share half their stage-2
combs, so stage-2 could be refactored as K=64 half-window contractions
(each shared by 2 windows) + a twiddle combine — a 2x MAC cut.  Likewise
stage-1 (K=16) could factor 16 = 4x4 for a 3.2x MAC cut.  BOTH only win if
MXU time actually scales with K at these shapes; if a K<=128 matmul costs
the same as K=128 (the array pipes K into its depth), they are dead and
this probe is the committed measured-negative.

Timing chains the carry THROUGH the matmul (a -> dot(a, w) -> next a): an
`acc = acc*c + dot(x, w)` loop with loop-invariant x times the VPU accum
chain, not the MXU (memory: tpu-matmul-microbench-pitfall).

Second question (stage-1 M-fill): stage-1's dot is [n_res, 16] @ [16, N]
with n_res = 9 — does the tiny M underfill the array, and would merging
re+im (M 9 -> 18) or both+conj (36) amortize it?
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

REPS = 400


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


def chained_mm_kernel(x_ref, w_ref, o_ref, *, reps, bf16):
    """reps matmuls, each consuming the previous result (true MXU chain)."""
    a = x_ref[:]                                     # [M, K]
    w = w_ref[:]                                     # [K, N]
    k = a.shape[1]

    def body(i, a):
        lhs = a.astype(jnp.bfloat16) if bf16 else a
        y = jnp.dot(lhs, w, preferred_element_type=jnp.float32)   # [M, N]
        # Feed the output back into the next operand (scaled so magnitudes
        # stay put) — the dot cannot be hoisted out of the loop.
        return a + y[:, :k] * 1e-30

    o_ref[:] = jax.lax.fori_loop(0, reps, body, a)


def time_mm(m, k, n, bf16=True, reps=REPS):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w0 = rng.standard_normal((k, n)).astype(np.float32)
    w = jnp.asarray(w0.astype(np.dtype("bfloat16")) if bf16 else w0)
    call = pl.pallas_call(
        partial(chained_mm_kernel, reps=reps, bf16=bf16),
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",   # smoke-run path only
    )

    @jax.jit
    def step(c):
        o = call(x + c * 0.0, w)
        return c + o[0, 0]

    dt = timed(step) / reps
    tput = 2 * m * k * n / dt
    return dt, tput


def main():
    print("device:", jax.devices()[0])
    print("\n-- K sweep at stage-2-like shapes (M=1024, N=512, bf16) --")
    base = None
    for k in (8, 16, 32, 64, 128, 256, 512):
        dt, tput = time_mm(1024, k, 512)
        base = base or dt
        print(f"K={k:4d}  {dt * 1e6:9.2f} us/mm  {tput / 1e12:7.2f} TF/s  "
              f"vs K=8: {dt / base:5.2f}x")

    print("\n-- M sweep at stage-1-like shapes (K=16, N=8320, f32) --")
    # proc stage-1 per grid step: [n_res, 16] @ [16, m_tot*128];
    # m_tot ~ 65 -> N ~ 8320.  M = 9 (conj), 18 (re+im merged), 36, 128.
    for m in (8, 16, 32, 64, 128):
        dt, tput = time_mm(m, 16, 8320, bf16=False, reps=100)
        print(f"M={m:4d}  {dt * 1e6:9.2f} us/mm  {tput / 1e12:7.2f} TF/s")

    print("\n-- split-K shape head-to-head (proc stage-2) --")
    # current: per residue [128, 128] @ [128, 192]; split: [130, 64] @ [64, 192]
    dt_full, _ = time_mm(128, 128, 192)
    dt_half, _ = time_mm(130, 64, 192)
    print(f"K=128 full-window : {dt_full * 1e6:9.2f} us")
    print(f"K=64  half-window : {dt_half * 1e6:9.2f} us  "
          f"(win iff < {dt_full * 1e6:.2f} us incl. combine)")
    verdict = ("MAC-bound: split-K candidates live"
               if dt_half < 0.6 * dt_full else
               "fill-bound: split-K measured-negative (combine overhead "
               "would eat the margin)")
    print("verdict:", verdict)


if __name__ == "__main__":
    main()
