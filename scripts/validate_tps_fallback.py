"""On-chip validation of the odd-tps select fallback in fused_band_rows_v3.

Mosaic rejects the in-kernel select's (1, tps, 128) cls out-spec when tps is
not a multiple of 8 (sublane divisibility), so the wrapper now falls back to
rows-only + the standalone select for tps in {1, 2, 4} on hardware
(select_outside).  This script proves, on the real TPU:

  1. tps_override=4/2/1 with pipe_select=True no longer crashes, and
  2. the cls planes are bit-identical to the tps=8 in-kernel pipe_select
     output (both proc and parity geometries).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/validate_tps_fallback.py
"""
import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3


def check(cfg, label, n_tiles=8, batch=4):
    n_rows = n_tiles * 128
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(7)
    audio = jnp.asarray(rng.standard_normal((batch, t_pad))
                        .astype(np.float32) * 0.1)
    ref = np.asarray(fused_band_rows_v3(audio, cfg, n_rows, fuse_haar=True,
                                        pipe_select=True, tps_override=8))
    ok = True
    for tps in (4, 2, 1):
        got = np.asarray(fused_band_rows_v3(audio, cfg, n_rows,
                                            fuse_haar=True, pipe_select=True,
                                            tps_override=tps))
        same = np.array_equal(ref, got)
        ok &= same
        print(f"{label} tps={tps}: fallback cls == tps=8 in-kernel cls: "
              f"{same}", flush=True)
    return ok


def main():
    print("device:", jax.devices()[0], flush=True)
    ok = check(FingerprintConfig(hop_domain="proc"), "proc")
    ok &= check(FingerprintConfig(), "parity")
    print("RESULT:", "OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
