"""A/B: matmul matcher vs XLA packed vs fused Pallas packed on the TPU.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_match_fused.py [L] [T]
Timing per the relay rules: scalar carry threaded through iterations, one
fetch at the end (bench.py::_timed semantics).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timed(fn, iters=30):
    carry = jnp.float32(0.0)
    _, carry = fn(carry)
    float(np.asarray(carry))
    carry = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        _, carry = fn(carry)
    float(np.asarray(carry))
    return (time.perf_counter() - t0) / iters


def main():
    l = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    t_tile = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    s_max = 64
    print("device:", jax.devices()[0])

    from lbaudiodetective_tpu.config import FingerprintConfig
    from lbaudiodetective_tpu.ops.match import match_one_vs_many_padded
    from lbaudiodetective_tpu.ops.match_packed import (
        match_one_vs_many_packed, pack_bits_device)
    from lbaudiodetective_tpu.ops.pallas.match_fused import match_one_vs_many_fused

    cfg = FingerprintConfig()
    pairs = cfg.num_wavelet_pairs
    rng = np.random.default_rng(1)
    cls = rng.choice(3, size=(l, s_max, pairs))
    lib_pos = jnp.asarray((cls == 1).astype(np.uint8))
    lib_neg = jnp.asarray((cls == 2).astype(np.uint8))
    n_lib = jnp.full((l,), s_max, jnp.int32)
    qcls = rng.choice(3, size=(s_max, pairs))
    q_pos = jnp.asarray((qcls == 1).astype(np.uint8))
    q_neg = jnp.asarray((qcls == 2).astype(np.uint8))
    nq = jnp.int32(s_max // 2)

    lp_w = pack_bits_device(lib_pos)
    ln_w = pack_bits_device(lib_neg)
    qp_w = pack_bits_device(q_pos)
    qn_w = pack_bits_device(q_neg)
    jax.block_until_ready((lp_w, ln_w))

    @jax.jit
    def step_matmul(carry):
        s = match_one_vs_many_padded(
            q_pos + (carry * 0.0).astype(jnp.uint8), q_neg, nq,
            lib_pos, lib_neg, n_lib, 0, 200)
        return s, carry + s[0]

    @jax.jit
    def step_packed(carry):
        s = match_one_vs_many_packed(
            qp_w ^ (carry * 0.0).astype(jnp.uint32), qn_w, nq,
            lp_w, ln_w, n_lib, pairs, 0, 200)
        return s, carry + s[0]

    @jax.jit
    def step_fused(carry):
        s = match_one_vs_many_fused(
            qp_w ^ (carry * 0.0).astype(jnp.uint32), qn_w, nq,
            lp_w, ln_w, n_lib, pairs, 0, 200, t_tile=t_tile)
        return s, carry + s[0]

    # correctness cross-check on-chip first
    a = np.asarray(step_matmul(jnp.float32(0.0))[0])
    c = np.asarray(step_fused(jnp.float32(0.0))[0])
    b = np.asarray(step_packed(jnp.float32(0.0))[0])
    print("max |fused-matmul|:", np.abs(c - a).max(),
          " |packed-matmul|:", np.abs(b - a).max())

    for name, fn in [("matmul", step_matmul), ("packed_xla", step_packed),
                     (f"fused_t{t_tile}", step_fused)]:
        dt = timed(fn)
        print(f"{name:12s} L={l}: {dt*1e3:7.3f} ms/iter  "
              f"{l/dt/1e6:7.3f} M pair-compares/s")


if __name__ == "__main__":
    main()
