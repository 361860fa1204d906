"""Benchmark the one-vs-many matcher on TPU (honest chained timing)."""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from lbaudiodetective_tpu.ops.match import match_one_vs_many_padded

L, S, P = 4096, 64, 100
rng = np.random.default_rng(1)
cls = rng.choice(3, size=(L, S, P))
lib_pos = jnp.asarray((cls == 1).astype(np.uint8))
lib_neg = jnp.asarray((cls == 2).astype(np.uint8))
n_lib = jnp.asarray(rng.integers(8, S + 1, size=L).astype(np.int32))
qcls = rng.choice(3, size=(S, P))
q_pos = jnp.asarray((qcls == 1).astype(np.uint8))
q_neg = jnp.asarray((qcls == 2).astype(np.uint8))


@jax.jit
def step(c):
    scores = match_one_vs_many_padded(
        q_pos + (c * 0.0).astype(jnp.uint8), q_neg, jnp.int32(S // 2),
        lib_pos, lib_neg, n_lib, 0, 200)
    return c + scores[0] + scores[-1] * 1e-3


t0 = time.perf_counter()
c = step(jnp.float32(0))
print("compile:", round(time.perf_counter() - t0), "s; probe", float(np.asarray(c)), flush=True)
t0 = time.perf_counter()
c = jnp.float32(0)
iters = 20
for _ in range(iters):
    c = step(c)
float(np.asarray(c))
dt = (time.perf_counter() - t0) / iters
print(f"one-vs-many: {dt*1e3:.2f} ms for L={L} -> {L/dt/1e6:.2f}M pair-compares/s "
      f"({L*(S//2)*(S//2+1)/dt/1e9:.2f}G subfp compares/s)", flush=True)
