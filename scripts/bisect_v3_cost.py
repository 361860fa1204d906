"""Bisect where the v3 kernel's time goes (run on TPU; results WRONG, timing only).

Variants:
  full      — as shipped (bf16x3 stage-2)
  no-s1     — skip stage-1 C16 dots (use the window stack directly)
  no-build  — skip build_g re-tiling (repeat one slice)
  s2-1pass  — single-pass bf16 stage-2 instead of 3
  no-s2     — skip stage-2 matmuls entirely
  no-proj   — skip the per-residue projection matmul
  no-perm   — skip the final un-permutation matmul
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

variants = sys.argv[1:] or ["full", "no-s1", "no-build", "s2-1pass", "no-s2",
                            "no-proj", "no-perm"]
cfg = FingerprintConfig()
B, S = 32, 64
n_rows = S * 128
t_pad = required_padded_length(cfg, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))

for variant in variants:
    def make_kernel(variant=variant):
        def kern(*refs, span_rows, window, rows, hop, adv_rows, inv_div,
                 k_max, precision, fuse_haar, bf16x3, tps, n_blk,
                 batched_rolls=False, aux3=False):
            blk_refs = refs[:n_blk]
            (c16_re_ref, c16_im_ref, t2a_ref, t2b_ref, proj_ref,
             perm_ref, hcols_ref, out_ref) = refs[n_blk:]
            hi = precision
            full = jnp.concatenate([b[0, 0] for b in blk_refs], axis=0)
            qu = -(-(hop * (rows - 1) + _LANE) // _LANE)
            dn = (((0,), (0,)), ((), ()))
            if variant == "floor":
                out_ref[0] = (jnp.zeros((tps * rows, out_ref.shape[-1]),
                                        jnp.float32) + jnp.sum(full[0, :]))
                return
            p_res, p_ims = [], []
            for k in range(tps):
                bufr = full[k * adv_rows:k * adv_rows + span_rows, :]
                stack = jnp.stack([bufr[a:a + qu, :] for a in range(_A)])
                if variant == "no-s1":
                    p_res.append(stack)
                    p_ims.append(stack * 0.5)
                else:
                    p_res.append(jax.lax.dot_general(
                        c16_re_ref[:], stack, dn, precision=hi,
                        preferred_element_type=jnp.float32))
                    p_ims.append(jax.lax.dot_general(
                        c16_im_ref[:], stack, dn, precision=hi,
                        preferred_element_type=jnp.float32))
            vper = _LANE // hop
            wper = rows // vper
            half = 64
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

            def d3(g, t_ref, r):
                g_hi = g.astype(jnp.bfloat16)
                if variant == "s2-1pass":
                    return jnp.dot(g_hi, t_ref[0, r],
                                   preferred_element_type=jnp.float32)
                g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                return (jnp.dot(g_hi, t_ref[0, r], preferred_element_type=jnp.float32)
                        + jnp.dot(g_hi, t_ref[1, r], preferred_element_type=jnp.float32)
                        + jnp.dot(g_lo, t_ref[0, r], preferred_element_type=jnp.float32))

            rows_acc = jnp.zeros((tps * rows, out_ref.shape[-1]), jnp.float32)
            for r in range(_A):
                g_re = jnp.concatenate([build_g(p_res[k][r]) for k in range(tps)], 0)
                g_im = jnp.concatenate([build_g(p_ims[k][r]) for k in range(tps)], 0)
                if variant == "no-s2":
                    x = g_re + g_im
                else:
                    x = d3(g_re, t2a_ref, r) + d3(g_im, t2b_ref, r)
                x = jnp.where(x > 0.0, x * inv_div, x)
                vv = x[:, :half] ** 2 + x[:, half:] ** 2
                vv = jnp.where(jnp.isfinite(vv), vv, 0.0)
                if variant == "no-proj":
                    rows_acc = rows_acc + vv[:, :rows_acc.shape[-1]]
                else:
                    rows_acc = rows_acc + jnp.dot(vv, proj_ref[r], precision=hi,
                                                  preferred_element_type=jnp.float32)
            if variant == "no-perm":
                out = rows_acc
            else:
                out = jnp.concatenate(
                    [jnp.dot(perm_ref[:], rows_acc[k * rows:(k + 1) * rows],
                             precision=hi, preferred_element_type=jnp.float32)
                     for k in range(tps)], axis=0)
                if fuse_haar:
                    out = jnp.dot(out, hcols_ref[:], precision=hi,
                                  preferred_element_type=jnp.float32)
            out_ref[0] = out
        return kern

    orig = v2._rows_kernel_v3
    try:
        v2._rows_kernel_v3 = make_kernel()
        f = partial(v2.fused_band_rows_v3.__wrapped__, config=cfg,
                    n_rows=n_rows, fuse_haar=True, aux_bf16x3=False)

        @jax.jit
        def step(c):
            r = f(audio + c * 0.0)
            return c + jnp.sum(r[0, ::997, :1])

        x = step(jnp.float32(0)); float(np.asarray(x))
        t0 = time.perf_counter()
        x = jnp.float32(0)
        for _ in range(5):
            x = step(x)
        float(np.asarray(x))
        print(f"{variant}: {(time.perf_counter()-t0)/5*1e3:.2f} ms / {B} clips",
              flush=True)
    finally:
        v2._rows_kernel_v3 = orig
