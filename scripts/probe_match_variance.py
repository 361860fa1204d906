"""Diagnose the matmul matcher's run-to-run spread (VERDICT r2 weakness 5:
1.24-1.46M pair-compares/s across pinned runs, source unknown).

Hypotheses: (a) device/relay load sensitivity (adjacent work perturbs
timing), (b) XLA layout reshuffles between dispatch chains, (c) plain
measurement noise at the chosen iteration count.

Runs the EXACT pinned bench_match config many times: 10 isolated
back-to-back runs, then 5 runs each interleaved with an extraction workload
(device-load condition), then one run at 4x the iteration count (noise
floor).  Prints all samples.
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from bench import bench_extract, bench_match
from lbaudiodetective_tpu.config import FingerprintConfig

cfg = FingerprintConfig()

iso = []
for i in range(10):
    cps, _, dt = bench_match(cfg, library_size=16384)
    iso.append(cps)
    print(f"isolated run {i}: {cps/1e6:.3f}M pair-compares/s "
          f"({dt*1e3:.2f} ms)", flush=True)
print(f"isolated: min {min(iso)/1e6:.3f}M max {max(iso)/1e6:.3f}M "
      f"spread {(max(iso)-min(iso))/min(iso)*100:.1f}%", flush=True)

inter = []
for i in range(5):
    bench_extract(cfg, batch=64, iters=3)        # adjacent extraction load
    cps, _, dt = bench_match(cfg, library_size=16384)
    inter.append(cps)
    print(f"interleaved run {i}: {cps/1e6:.3f}M", flush=True)
print(f"interleaved: min {min(inter)/1e6:.3f}M max {max(inter)/1e6:.3f}M",
      flush=True)

cps, _, dt = bench_match(cfg, library_size=16384, iters=120)
print(f"long run (120 iters): {cps/1e6:.3f}M", flush=True)
