"""Isolate the cost of the step-level lane rolls in the v3 rows kernel
(TPU, TIMING ONLY — the patched variants compute wrong values).

The vmaj A/B (scripts/ab_vmaj.py) showed the 128-piece G concats are not
the per-step bottleneck; the other non-MXU machinery is the sel_all
roll+select pass (15 `pltpu.roll`s + 15 lane-mask selects per plane over
the [n_res, m_tot, 128] stage-1 output).  This probe times the shipped
kernel against source-patched variants:

  noroll   — `pltpu.roll(p3, ...)` replaced by `p3` (keeps the selects)
  noshuf   — the whole rolled branch replaced by a plain slice (no roll,
             no select)

run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_roll_cost.py
"""
import importlib.util
import sys
import time
import types

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import required_padded_length
import lbaudiodetective_tpu.ops.pallas.fused_rows_v2 as v2mod

SRC_PATH = v2mod.__file__

ROLLED = "                    rolled = pltpu.roll(p3, _LANE - cut, 2)\n"
SELECT = ("                    out.append(jnp.where(sl_lane < _LANE - cut,\n"
          "                                         rolled[:, 0:m1, :],\n"
          "                                         rolled[:, 1:m_tot, :]))\n")


def load_variant(name: str, patch):
    src = open(SRC_PATH).read()
    src = patch(src)
    mod = types.ModuleType(f"fused_rows_v2_{name}")
    mod.__file__ = SRC_PATH
    sys.modules[mod.__name__] = mod
    exec(compile(src, SRC_PATH, "exec"), mod.__dict__)
    return mod


def patch_noroll(src):
    assert ROLLED in src
    return src.replace(ROLLED, "                    rolled = p3\n")


def patch_noshuf(src):
    assert ROLLED in src and SELECT in src
    src = src.replace(ROLLED, "                    rolled = p3\n")
    return src.replace(
        SELECT, "                    out.append(rolled[:, 0:m1, :])\n")


cfg = FingerprintConfig()
B, S = 128, 56
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))


def timed(fn, iters=25):
    @jax.jit
    def step(c):
        r = fn(audio + c * 0.0, cfg, n_rows, fuse_haar=True)
        return c + jnp.sum(r[0, ::997, :1])

    c = step(jnp.float32(0))
    float(np.asarray(c))
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    float(np.asarray(c))
    return (time.perf_counter() - t0) / iters


for name, fn in [
    ("shipped", v2mod.fused_band_rows_v3),
    ("noroll ", load_variant("noroll", patch_noroll).fused_band_rows_v3),
    ("noshuf ", load_variant("noshuf", patch_noshuf).fused_band_rows_v3),
]:
    dt = timed(fn)
    print(f"rows {name}: {dt*1e3:.2f} ms / {B} clips ({B/dt:.0f} clips/s)",
          flush=True)
