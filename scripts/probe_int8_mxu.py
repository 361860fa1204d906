"""Is int8 MXU throughput actually 2x bf16 on this v5e, at stage-2 shapes?

VERDICT r2 lever (b): an int8 split-exact stage-2 (3 s8xs8->s32 products
instead of 3 bf16 passes) would halve stage-2 cost IF s8 matmuls run at
the advertised 2x bf16 rate at our shapes ([M, 128] @ [128, 256], single
K-tile).  This probe measures exactly that before any kernel work.

Timing per the repo gotcha: chain THROUGH the matmul (carry feeds an
operand), >= 20 chained iterations, fetch the scalar.

run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_int8_mxu.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

rng = np.random.default_rng(0)
M, K, N = 1024, 128, 256
REP = 64                                       # matmuls per chained step


def timed(step, c0, iters=25):
    c = step(c0)
    jax.block_until_ready(c)
    float(np.asarray(c).ravel()[0])
    c = c0
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    float(np.asarray(c).ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench_bf16():
    a = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)).astype(jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((K, N)).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(8)]

    @jax.jit
    def step(c):
        x = a + c.astype(jnp.bfloat16)
        for i in range(REP):
            y = jnp.dot(x, ws[i % 8], preferred_element_type=jnp.float32)
            # chain: next operand depends on this product (cheap fold)
            x = a + (y[:1, :1] * 1e-9).astype(jnp.bfloat16)
        return y[0, 0]

    dt = timed(step, jnp.float32(0))
    tf = 2 * M * K * N * REP / dt / 1e12
    print(f"bf16  [{M},{K}]@[{K},{N}] x{REP}: {dt*1e3:.3f} ms  {tf:.1f} TFLOP/s")
    return dt


def bench_int8():
    a = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
    ws = [jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
          for _ in range(8)]

    @jax.jit
    def step(c):
        x = (a + c).astype(jnp.int8)
        for i in range(REP):
            y = jnp.dot(x, ws[i % 8], preferred_element_type=jnp.int32)
            x = (a + (y[:1, :1] & 1).astype(jnp.int8)).astype(jnp.int8)
        return y[0, 0]

    dt = timed(step, jnp.int8(0))
    tf = 2 * M * K * N * REP / dt / 1e12
    print(f"int8  [{M},{K}]@[{K},{N}] x{REP}: {dt*1e3:.3f} ms  {tf:.1f} TOP/s")
    return dt


def bench_int8_deep():
    # Same, fatter shapes (full stage-2-like M with deeper N) to see if the
    # ratio changes when the K-tile fill amortises differently.
    M2, N2 = 4096, 512
    a = jnp.asarray(rng.integers(-127, 127, (M2, K), dtype=np.int8))
    w = jnp.asarray(rng.integers(-127, 127, (K, N2), dtype=np.int8))
    af = jnp.asarray(rng.standard_normal((M2, K)).astype(np.float32)).astype(jnp.bfloat16)
    wf = jnp.asarray(rng.standard_normal((K, N2)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def step_i(c):
        x = (a + c).astype(jnp.int8)
        for _ in range(REP):
            y = jnp.dot(x, w, preferred_element_type=jnp.int32)
            x = (a + (y[:1, :1] & 1).astype(jnp.int8)).astype(jnp.int8)
        return y[0, 0]

    @jax.jit
    def step_f(c):
        x = af + c.astype(jnp.bfloat16)
        for _ in range(REP):
            y = jnp.dot(x, wf, preferred_element_type=jnp.float32)
            x = af + (y[:1, :1] * 1e-9).astype(jnp.bfloat16)
        return y[0, 0]

    di = timed(step_i, jnp.int8(0))
    df = timed(step_f, jnp.float32(0))
    ops = 2 * M2 * K * N2 * REP
    print(f"int8  [{M2},{K}]@[{K},{N2}] x{REP}: {di*1e3:.3f} ms  {ops/di/1e12:.1f} TOP/s")
    print(f"bf16  [{M2},{K}]@[{K},{N2}] x{REP}: {df*1e3:.3f} ms  {ops/df/1e12:.1f} TFLOP/s")


bench_bf16()
bench_int8()
bench_int8_deep()
