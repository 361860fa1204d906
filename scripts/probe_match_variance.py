"""Diagnose the matmul matcher's run-to-run spread (VERDICT r2 weakness 5:
1.24-1.46M pair-compares/s across pinned runs, source unknown).

Uploads the pinned library ONCE (bench_match re-creates and re-uploads
~210 MB per call — on the tunnelled dev link that's minutes per call and
was the real reason repeated bench_match calls looked wedged), then times
the identical chained-carry loop many times:

  - 12 isolated back-to-back runs (spread under identical conditions)
  - 4 runs interleaved with an extraction dispatch (device/relay load)
  - 1 run at 4x iterations (noise floor of the measurement itself)
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.match import match_one_vs_many_padded

cfg = FingerprintConfig()
lib, s_max = 16384, 64

t0 = time.time()
print("relay:", float(jnp.sum(jnp.ones((8, 128)))),
      f"({time.time()-t0:.1f}s)", flush=True)

rng = np.random.default_rng(1)
pairs = cfg.num_wavelet_pairs
cls = rng.choice(3, size=(lib, s_max, pairs))
t0 = time.time()
lib_pos = jnp.asarray((cls == 1).astype(np.uint8))
lib_neg = jnp.asarray((cls == 2).astype(np.uint8))
n_lib = jnp.full((lib,), s_max, jnp.int32)
qcls = rng.choice(3, size=(s_max, pairs))
q_pos = jnp.asarray((qcls == 1).astype(np.uint8))
q_neg = jnp.asarray((qcls == 2).astype(np.uint8))
nq = jnp.int32(s_max // 2)
float(np.asarray(jnp.sum(lib_pos, dtype=jnp.int32) * 0 + 1))
print(f"library uploaded ({time.time()-t0:.1f}s, "
      f"{(lib_pos.nbytes + lib_neg.nbytes)/1e6:.0f} MB)", flush=True)


@jax.jit
def step(carry):
    scores = match_one_vs_many_padded(
        q_pos + (carry * 0.0).astype(jnp.uint8), q_neg, nq,
        lib_pos, lib_neg, n_lib, 0, cfg.subfingerprint_length)
    return carry + scores[0]


def timed(iters=30):
    carry = jnp.float32(0.0)
    for _ in range(3):
        carry = step(carry)
    float(np.asarray(carry))
    carry = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(carry)
    float(np.asarray(carry))
    return lib / ((time.perf_counter() - t0) / iters)


t0 = time.time()
_ = timed(iters=3)
print(f"compiled + first run ({time.time()-t0:.0f}s)", flush=True)

iso = []
for i in range(12):
    cps = timed()
    iso.append(cps)
    print(f"isolated run {i}: {cps/1e6:.3f}M pair-compares/s", flush=True)
print(f"isolated: min {min(iso)/1e6:.3f}M max {max(iso)/1e6:.3f}M "
      f"spread {(max(iso)-min(iso))/min(iso)*100:.1f}%", flush=True)

# Device/relay-load condition: a big unrelated dispatch right before timing.
blob = jnp.asarray(rng.standard_normal((1024, 2048)).astype(np.float32))


@jax.jit
def load_step(c):
    return c + jnp.sum(jnp.tanh(blob @ blob.T)[0, :4])


inter = []
for i in range(4):
    c = load_step(jnp.float32(0.0))      # fire-and-forget adjacent load
    cps = timed()
    float(np.asarray(c))
    inter.append(cps)
    print(f"interleaved run {i}: {cps/1e6:.3f}M", flush=True)
print(f"interleaved: min {min(inter)/1e6:.3f}M max {max(inter)/1e6:.3f}M",
      flush=True)

print(f"long run (120 iters): {timed(120)/1e6:.3f}M", flush=True)
