"""Isolate the v3 kernel's grid/pipeline floor with standalone pallas_calls.

Variants (all timing-only, trivial kernels):
  out       — grid (B, S/tps), ONLY writes the [1, tps*128, 32] out block
  blocks    — + n_blk audio block inputs (concatenated + summed)
  weights   — + 7 unblocked VMEM weight inputs (touched via tiny reads)
  wide-out  — 'out' but with a [1, tps*128, 128] out block (full lanes)

Usage: python scripts/floor_probe.py [tps]
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

TPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("-") else 32
S = int(sys.argv[3]) if len(sys.argv) > 3 and not sys.argv[3].startswith("-") else 64
RPF, LANE = 128, 128
N_STEPS = S // TPS
ADV = 8                       # rows per tile advance (hop 8 * 128 / 128)
U = ADV * TPS
N_BLK = 2 if TPS * ADV >= 49 else 3

rng = np.random.default_rng(0)
n_rows_audio = N_STEPS * U + N_BLK * U
audio3d = jnp.asarray((rng.standard_normal((B, n_rows_audio // U, U, LANE))
                       * 0.1).astype(np.float32))
weights = [jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in
           [(2, 16, 16), (2, 16, 16), (2, 16, 128, 128), (2, 16, 128, 128),
            (2, 16, 64, 32), (2, 128, 128), (2, 32, 32)]]


def run(variant, bands):
    def kern(*refs):
        out_ref = refs[-1]
        acc = jnp.float32(0)
        if variant in ("blocks", "weights"):
            full = jnp.concatenate([r[0, 0] for r in refs[:N_BLK]], axis=0)
            acc = acc + jnp.sum(full[0, :])
        if variant == "weights":
            for wr in refs[N_BLK:-1]:
                acc = acc + jnp.sum(wr[0, 0, 0])
        out_ref[0] = jnp.zeros((TPS * RPF, bands), jnp.float32) + acc

    n_in_blk = 0 if variant in ("out", "wide-out") else N_BLK
    n_w = len(weights) if variant == "weights" else 0

    def blk_spec(k):
        return pl.BlockSpec((1, 1, U, LANE), lambda b, t, k=k: (b, t + k, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(B, N_STEPS),
        in_specs=[blk_spec(k) for k in range(n_in_blk)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w,
        out_specs=pl.BlockSpec((1, TPS * RPF, bands), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S * RPF, bands), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")))
    args = ([audio3d] * n_in_blk) + (weights if n_w else [])

    @jax.jit
    def step(c):
        r = f(*[a + c * 0.0 if i == 0 and args else a
                for i, a in enumerate(args)]) if args else f()
        return c + r[0, 0, 0]

    c = step(jnp.float32(0)); float(np.asarray(c))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(5):
        c = step(c)
    float(np.asarray(c))
    print(f"{variant} tps={TPS} bands={bands}: "
          f"{(time.perf_counter()-t0)/5*1e3:.2f} ms / {B} clips", flush=True)


if "--packed" in sys.argv:
    # packed-out: same bytes as bands=32 but full 128 lanes
    # ([tps*32, 128] out block instead of [tps*128, 32]).
    def kern_p(*refs):
        refs[-1][0] = jnp.zeros((TPS * 32, LANE), jnp.float32) + 1.0
    gs = pl.GridSpec(
        grid=(B, N_STEPS), in_specs=[],
        out_specs=pl.BlockSpec((1, TPS * 32, LANE), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM))
    fp = pl.pallas_call(
        kern_p, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, S * 32, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")))
    @jax.jit
    def stepp(c):
        return c + fp()[0, 0, 0] * 0.0 + fp()[0, 0, 1]
    c = stepp(jnp.float32(0)); float(np.asarray(c))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(5):
        c = stepp(c)
    float(np.asarray(c))
    print(f"packed-out tps={TPS}: {(time.perf_counter()-t0)/5*1e3:.2f} ms / {B} clips")
else:
    run("out", 32)
    run("blocks", 32)
    run("weights", 32)
    run("wide-out", 128)
