"""Does a bigger batch close any of the rows-stage MXU-efficiency gap?
(Fixed per-step pipeline overhead amortises over more grid steps; HBM
fits B=512 parity audio easily.)  Times full parity extraction at B=256
(canonical) vs B=384/512.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")
from bench import bench_extract
from lbaudiodetective_tpu.config import FingerprintConfig

cfg = FingerprintConfig()
for b in (256, 384, 512):
    cps, dt = bench_extract(cfg, batch=b, iters=12)
    print(f"parity extract B={b}: {cps:.0f} clips/s ({dt*1e3:.1f} ms/step)",
          flush=True)
