"""Bisect where the v2 kernel's per-tile time goes (run on TPU).

Variants replace stages with cheap stand-ins (results are WRONG; timing only):
  full      — as shipped
  no-roll   — skip the aligning roll (use raw buf)
  no-build  — skip build_g re-tiling (use p slices repeated)
  no-s2     — skip stage-2 matmuls (use g directly)
  dma-only  — only DMA + trivial output
"""
import sys
import time
from functools import partial

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows import _A, _LANE
from lbaudiodetective_tpu.ops.pallas import fused_rows_v2 as v2

variants = sys.argv[1:] or ["full", "no-roll", "no-build", "no-s2", "dma-only"]
cfg = FingerprintConfig()
B, S = 8, 64
n_rows = S * 128
rpf, window, hop = 128, 2048, 8
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))

for variant in variants:
    def make_kernel(variant=variant):
        base = v2._rows_kernel_v2

        def kern(s0_ref, base_row_ref, audio_ref, c16_re_ref, c16_im_ref,
                 t2a_ref, t2b_ref, proj_ref, perm_ref, hcols_ref, out_ref,
                 buf, sem, *, span_rows, tps, k_max, inv_div, precision):
            tt = pl.program_id(1)
            b = pl.program_id(0)
            dmas = []
            for k in range(tps):
                dmas.append(pltpu.make_async_copy(
                    audio_ref.at[b, pl.ds(base_row_ref[tt * tps + k], span_rows), :],
                    buf.at[k], sem.at[k]))
                dmas[-1].start()
            sr1 = span_rows - 1
            lane = jax.lax.broadcasted_iota(jnp.int32, (sr1, _LANE), 1)
            qu = -(-(hop * (rpf - 1) + _LANE) // _LANE)
            dn = (((0,), (0,)), ((), ()))
            if variant == "dma-only":
                for k in range(tps):
                    dmas[k].wait()
                out_ref[0] = (jnp.zeros((tps * rpf, 32), jnp.float32)
                              + jnp.sum(buf[0, 0, :]))
                return
            p_res, p_ims = [], []
            for k in range(tps):
                dmas[k].wait()
                if variant == "no-roll":
                    bufr = buf[k, :sr1, :]
                else:
                    s0 = s0_ref[tt * tps + k]
                    rolled = pltpu.roll(buf[k], -s0, 1)
                    bufr = jnp.where(lane < _LANE - s0, rolled[0:sr1, :],
                                     rolled[1:span_rows, :])
                stack = jnp.stack([bufr[a:a + qu, :] for a in range(_A)])
                p_res.append(jax.lax.dot_general(
                    c16_re_ref[:], stack, dn, precision=precision,
                    preferred_element_type=jnp.float32))
                p_ims.append(jax.lax.dot_general(
                    c16_im_ref[:], stack, dn, precision=precision,
                    preferred_element_type=jnp.float32))
            vper = _LANE // hop
            wper = rpf // vper
            g_lane = jax.lax.broadcasted_iota(jnp.int32, (wper, _LANE), 1)

            def build_g(p2):
                if variant == "no-build":
                    return jnp.concatenate([p2[0:wper, :]] * vper, axis=0)
                pieces = []
                for vv in range(vper):
                    cut = hop * vv
                    if cut == 0:
                        pieces.append(p2[0:wper, :])
                    else:
                        rolled = pltpu.roll(p2, _LANE - cut, 1)
                        pieces.append(jnp.where(g_lane < _LANE - cut,
                                                rolled[0:wper, :],
                                                rolled[1:wper + 1, :]))
                return jnp.concatenate(pieces, axis=0)

            half = 64
            rows_acc = jnp.zeros((tps * rpf, 32), jnp.float32)
            for r in range(_A):
                g_re = jnp.concatenate([build_g(p_res[k][r]) for k in range(tps)], 0)
                g_im = jnp.concatenate([build_g(p_ims[k][r]) for k in range(tps)], 0)
                if variant == "no-s2":
                    x = g_re + g_im
                else:
                    def d3(g, t_ref):
                        g_hi = g.astype(jnp.bfloat16)
                        g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                        return (jnp.dot(g_hi, t_ref[0, r], preferred_element_type=jnp.float32)
                                + jnp.dot(g_hi, t_ref[1, r], preferred_element_type=jnp.float32)
                                + jnp.dot(g_lo, t_ref[0, r], preferred_element_type=jnp.float32))
                    x = d3(g_re, t2a_ref) + d3(g_im, t2b_ref)
                x = jnp.where(x > 0.0, x * inv_div, x)
                vv = x[:, :half] ** 2 + x[:, half:] ** 2
                vv = jnp.where(jnp.isfinite(vv), vv, 0.0)
                rows_acc = rows_acc + jnp.dot(vv[:, :half], proj_ref[r],
                                              precision=precision,
                                              preferred_element_type=jnp.float32)
            out_ref[0] = jnp.dot(perm_ref[:], rows_acc, precision=precision,
                                 preferred_element_type=jnp.float32)
        return kern

    # Reuse the production launcher's constants/layout via monkeypatch.
    orig = v2._rows_kernel_v2
    try:
        v2._rows_kernel_v2 = (lambda *a, **kw: make_kernel()(
            *a, span_rows=kw["span_rows"], tps=kw["tps"], k_max=kw["k_max"],
            inv_div=kw["inv_div"], precision=kw["precision"]))
        f = partial(v2.fused_band_rows_v2.__wrapped__, config=cfg, n_rows=n_rows)

        @jax.jit
        def step(c):
            r = f(audio + c * 0.0)
            return c + jnp.sum(r[0, ::997, :1])

        x = step(jnp.float32(0)); float(np.asarray(x))
        t0 = time.perf_counter()
        x = jnp.float32(0)
        for _ in range(10):
            x = step(x)
        float(np.asarray(x))
        print(f"{variant}: {(time.perf_counter()-t0)/10*1e3:.2f} ms / {B} clips",
              flush=True)
    finally:
        v2._rows_kernel_v2 = orig
