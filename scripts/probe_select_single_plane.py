"""Bound the value of a single-plane select (TPU, TIMING ONLY).

The select stage's compare-exchange moves TWO i32 planes (hi = abs bits,
lo = tie-break index + sign payload): 4 rolls + lex compare + 2 selects
per stage.  Any scheme that avoided the lo plane (e.g. threshold
prefilter + payload-free sort) would at best run the patched variant
below: lo dropped everywhere (WRONG results — ties and signs lost).

run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_select_single_plane.py
"""
import sys
import time
import types

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

import lbaudiodetective_tpu.ops.pallas.select_signs as sel_mod

SRC_PATH = sel_mod.__file__


def load_single_plane():
    src = open(SRC_PATH).read()
    # hi-only compare-exchange: lo rides along untouched (it no longer
    # matches its hi lane — results are WRONG, this is a cost bound).
    patched_ce = (
        "def _ce(h, l, keep_max, d, lane):\n"
        '    """One compare-exchange stage at lane distance d."""\n'
        "    ph = _partner(h, d, lane)\n"
        "    gt = h > ph\n"
        "    take_self = gt == keep_max\n"
        "    return jnp.where(take_self, h, ph), l\n")
    start = src.index("def _ce(")
    end = src.index("def _select_body(")
    ce_block = src[start:end]
    src = src.replace(ce_block, patched_ce + "\n\n")
    # phase-2: drop the lo-plane moves.
    src = src.replace(
        "        gt = _cmp_gt(a_h, a_l, b_h, b_l)\n"
        "        h3 = jnp.where(gt, a_h, b_h)\n"
        "        l3 = jnp.where(gt, a_l, b_l)\n",
        "        gt = a_h > b_h\n"
        "        h3 = jnp.where(gt, a_h, b_h)\n"
        "        l3 = a_l\n")
    src = src.replace(
        "            ph = _partner(h3, d, lane_r)\n"
        "            pl_ = _partner(l3, d, lane_r)\n"
        "            gt = _cmp_gt(h3, l3, ph, pl_)\n"
        "            take_self = gt == keep_max\n"
        "            h3 = jnp.where(take_self, h3, ph)\n"
        "            l3 = jnp.where(take_self, l3, pl_)\n",
        "            ph = _partner(h3, d, lane_r)\n"
        "            gt = h3 > ph\n"
        "            take_self = gt == keep_max\n"
        "            h3 = jnp.where(take_self, h3, ph)\n")
    mod = types.ModuleType("select_signs_single")
    mod.__file__ = SRC_PATH
    sys.modules[mod.__name__] = mod
    exec(compile(src, SRC_PATH, "exec"), mod.__dict__)
    return mod


F = 1792                                       # 128 clips x 14... frames/batch
rng = np.random.default_rng(0)
coeffs = jnp.asarray(rng.standard_normal((F, 4096)).astype(np.float32))


def timed(fn, iters=25):
    @jax.jit
    def step(c):
        r = fn(coeffs + c * 0.0, f_blk=32)
        return c + jnp.sum(r[0, :1].astype(jnp.float32))

    c = step(jnp.float32(0))
    float(np.asarray(c))
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c)
    float(np.asarray(c))
    return (time.perf_counter() - t0) / iters


single = load_single_plane()
for name, fn in [("shipped     ", sel_mod.select_sign_classes),
                 ("single-plane", single.select_sign_classes)]:
    dt = timed(fn)
    print(f"select {name}: {dt*1e3:.2f} ms / {F} frames "
          f"({F/dt:.0f} frames/s)", flush=True)
