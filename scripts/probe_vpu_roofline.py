"""On-chip primitive-throughput probe for the sliding-DFT decision
(VERDICT r2 'next' item 1).

The prefix/sliding-DFT formulation of the parity-mode spectral stage cuts
real FLOPs ~30x but moves the work from MXU matmuls to VPU elementwise
chains (rank-1 FMA accumulation, lane rolls, box-sum doubling).  Whether
that wins depends entirely on the measured VPU:MXU throughput ratio and the
cost of K=8 matmuls — this script measures those four primitives at the
exact shapes the prefix kernel would use:

  1. VPU FMA chain on [768, 384] f32   (d-build / box-sum unit)
  2. pltpu.roll(+add) on [768, 384]     (prefix doubling step)
  3. [384, 8] @ [8, 1536] matmul        (hop-block projection, K=8)
  4. [1024, 128] @ [128, N] for N in {128, 192, 256}
     (stage-2 pair-packing decision: does N=192 run at 0.75x of 256?)

Run on the TPU:  python scripts/probe_vpu_roofline.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timed(fn, iters=30):
    carry = jnp.float32(0.0)
    for _ in range(3):
        carry = fn(carry)
    float(np.asarray(carry))
    carry = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    float(np.asarray(carry))
    return (time.perf_counter() - t0) / iters


S, L = 768, 384
R_VPU = 4000
R_ROLL = 1000
R_MM = 2000


def vpu_kernel(x_ref, o_ref, *, reps):
    x = x_ref[:]

    def body(i, a):
        return a * 1.0000001 + x          # 1 FMA per element per rep

    o_ref[:] = jax.lax.fori_loop(0, reps, body, x * 0.5)


def roll_kernel(x_ref, o_ref, *, reps):
    x = x_ref[:]

    def body(i, a):
        return pltpu.roll(a, 1, 1) + x    # roll + add per rep

    o_ref[:] = jax.lax.fori_loop(0, reps, body, x * 0.5)


def k8_kernel(x_ref, w_ref, o_ref, *, reps):
    x = x_ref[:]                          # [384, 8]
    w = w_ref[:]                          # [8, 1536]

    def body(i, a):
        return a * 0.999 + jnp.dot(x, w, preferred_element_type=jnp.float32)

    o_ref[:] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros((x.shape[0], w.shape[1]), jnp.float32))


def mm_kernel(x_ref, w_ref, o_ref, *, reps):
    x = x_ref[:]                          # [1024, 128]
    w = w_ref[:]                          # [128, N]

    def body(i, a):
        return a * 0.999 + jnp.dot(x, w, preferred_element_type=jnp.float32)

    o_ref[:] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros((x.shape[0], w.shape[1]), jnp.float32))


def run(kernel, inputs, out_shape, reps, label, flop_per_rep):
    call = pl.pallas_call(
        partial(kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def step(c):
        o = call(*[x + c * 0.0 for x in inputs])
        return c + o[0, 0]

    dt = timed(step)
    tput = flop_per_rep * reps / dt
    print(f"{label:42s} {dt * 1e3:8.3f} ms/call  {tput / 1e12:7.2f} TFLOP/s")
    return tput


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S, L)).astype(np.float32) * 0.01)

    run(vpu_kernel, [x], (S, L), R_VPU,
        f"VPU FMA chain [{S},{L}]", 2 * S * L)
    run(roll_kernel, [x], (S, L), R_ROLL,
        f"lane roll+add [{S},{L}]", 2 * S * L)   # count add only: 2 flop/elem

    x8 = jnp.asarray(rng.standard_normal((384, 8)).astype(np.float32))
    w8 = jnp.asarray(rng.standard_normal((8, 1536)).astype(np.float32))
    run(k8_kernel, [x8, w8], (384, 1536), R_MM,
        "matmul [384,8]@[8,1536] (K=8)", 2 * 384 * 8 * 1536)

    xm = jnp.asarray(rng.standard_normal((1024, 128)).astype(np.float32))
    for n in (128, 192, 256):
        wm = jnp.asarray(rng.standard_normal((128, n)).astype(np.float32))
        run(mm_kernel, [xm, wm], (1024, n), R_MM,
            f"matmul [1024,128]@[128,{n}]", 2 * 1024 * 128 * n)
    # bf16 reference point for the MXU ceiling at stage-2's dtype
    xb = xm.astype(jnp.bfloat16)
    for n in (192, 256):
        wb = jnp.asarray(rng.standard_normal((128, n)).astype(np.float32)
                         ).astype(jnp.bfloat16)

        def bf16_kernel(x_ref, w_ref, o_ref, *, reps):
            xv, wv = x_ref[:], w_ref[:]

            def body(i, a):
                return a * 0.999 + jnp.dot(xv, wv,
                                           preferred_element_type=jnp.float32)

            o_ref[:] = jax.lax.fori_loop(
                0, reps, body, jnp.zeros((xv.shape[0], wv.shape[1]),
                                         jnp.float32))

        run(bf16_kernel, [xb, wb], (1024, n), R_MM,
            f"bf16 matmul [1024,128]@[128,{n}]", 2 * 1024 * 128 * n)


if __name__ == "__main__":
    main()
