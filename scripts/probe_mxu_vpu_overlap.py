"""Can Mosaic/v5e overlap MXU matmuls with independent VPU work?

The parity bench splits ~50 ms rows (MXU matmuls) + ~15 ms select (VPU
bitonic) per 256-clip batch.  If the select of frame-block i-1 can execute
while the matmuls of block i drain through the systolic array, the batch
step drops toward max(rows, select) instead of their sum — worth ~+30%
on the primary metric.  This probe measures, inside ONE Pallas kernel:

  A  pure MXU chain: a = dot(a, w)            (serialised through the MXU)
  B  pure VPU chain: v = roll(v) + where(...) (serialised on the VPU)
  C  combined loop: one A step + one B step per iteration, independent
     accumulators — the overlap question is whether t_C ~= max(t_A, t_B)
     (hardware/compiler overlaps the streams) or t_A + t_B (no overlap).
  D  combined with a one-iteration delay dependency (VPU consumes the
     previous iteration's matmul output) — the realistic software-pipeline
     shape the fused kernel would use.

run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_mxu_vpu_overlap.py
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

M, K, N = 1024, 128, 128        # chained matmul shape (square K=N to chain)
VS, VL = 1024, 256              # VPU chain shape
REPS = 1500


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


def mm_kernel(x_ref, w_ref, o_ref, *, reps):
    w = w_ref[:]

    def body(i, a):
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    o_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])


def vpu_kernel(v_ref, o_ref, *, reps):
    x = v_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (VS, VL), 1)

    def body(i, v):
        r = pltpu.roll(v, 1, 1)
        return jnp.where(lane < 128, r + x, jnp.maximum(r, x))

    o_ref[:] = jax.lax.fori_loop(0, reps, body, x * 0.5)


def both_kernel(x_ref, w_ref, v_ref, om_ref, ov_ref, *, reps):
    w = w_ref[:]
    x = v_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (VS, VL), 1)

    def body(i, c):
        a, v = c
        a2 = jnp.dot(a, w, preferred_element_type=jnp.float32)
        r = pltpu.roll(v, 1, 1)
        v2 = jnp.where(lane < 128, r + x, jnp.maximum(r, x))
        return a2, v2

    a, v = jax.lax.fori_loop(0, reps, body, (x_ref[:], x * 0.5))
    om_ref[:] = a
    ov_ref[:] = v


def delay_kernel(x_ref, w_ref, v_ref, om_ref, ov_ref, *, reps):
    """VPU consumes the PREVIOUS iteration's matmul output (1-step delay)."""
    w = w_ref[:]
    x = v_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (VS, VL), 1)

    def body(i, c):
        a, prev, v = c
        a2 = jnp.dot(a, w, preferred_element_type=jnp.float32)
        pv = jnp.concatenate([prev, prev], 1)        # [M,128] -> [M,256]
        r = pltpu.roll(v, 1, 1) + pv * 1e-6
        v2 = jnp.where(lane < 128, r + x, jnp.maximum(r, x))
        return a2, a2, v2

    a, _, v = jax.lax.fori_loop(0, reps, body, (x_ref[:], x_ref[:], x * 0.5))
    om_ref[:] = a
    ov_ref[:] = v


def run(kernel, inputs, outs, label):
    call = pl.pallas_call(
        partial(kernel, reps=REPS),
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32) for s in outs],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(outs),
    )

    @jax.jit
    def step(c):
        o = call(*[x + c * 0.0 for x in inputs])
        o = o[0] if isinstance(o, (list, tuple)) else o
        return c + o[0, 0] * 1e-30

    dt = timed(step)
    print(f"{label:46s} {dt * 1e3:8.3f} ms/call "
          f"({dt / REPS * 1e9:7.1f} ns/rep)")
    return dt


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    # orthogonal-ish w: chained matmuls stay finite
    q, _ = np.linalg.qr(rng.standard_normal((K, N)))
    w = jnp.asarray(q.astype(np.float32))
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.standard_normal((VS, VL)).astype(np.float32) * 0.1)

    ta = run(mm_kernel, [x, w], [(M, N)], f"A mm chain [{M},{K}]@[{K},{N}]")
    tb = run(vpu_kernel, [v], [(VS, VL)], f"B vpu chain roll+where [{VS},{VL}]")
    tc = run(both_kernel, [x, w, v], [(M, N), (VS, VL)], "C combined (independent)")
    td = run(delay_kernel, [x, w, v], [(M, N), (VS, VL)], "D combined (1-step delay dep)")
    print(f"\nA+B = {1e3 * (ta + tb):.3f} ms   max(A,B) = {1e3 * max(ta, tb):.3f} ms")
    print(f"C = {1e3 * tc:.3f} ms -> overlap fraction "
          f"{(ta + tb - tc) / min(ta, tb):.2f}")
    print(f"D = {1e3 * td:.3f} ms -> overlap fraction "
          f"{(ta + tb - td) / min(ta, tb):.2f}")


if __name__ == "__main__":
    main()
