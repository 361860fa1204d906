"""Bisect the fused-rows kernel stages on TPU: which stage faults?

Usage: python scripts/bisect_kernel.py <windows|stage1|full> [vmem_mb]
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
from lbaudiodetective_tpu.ops.pallas.fused_rows import _kernel_constants, _A, _LANE

variant = sys.argv[1] if len(sys.argv) > 1 else "windows"
vmem_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 64

cfg = FingerprintConfig()
B, n_tiles = 2, 4
rpf, window = 128, 2048
n_rows = n_tiles * rpf
starts = cfg.row_starts(n_rows).astype(np.int64)
tile_first = starts.reshape(n_tiles, rpf)[:, 0]
tile_last = starts.reshape(n_tiles, rpf)[:, -1]
base_row = (tile_first // _LANE).astype(np.int32)
starts_rel = (starts.reshape(n_tiles, rpf) - (base_row.astype(np.int64) * _LANE)[:, None]).astype(np.int32)
span_rows = int(np.max((tile_last - base_row.astype(np.int64) * _LANE + window) // _LANE)) + 2
t_pad = int((base_row.max() + span_rows) * _LANE)
rng = np.random.default_rng(0)
audio = jnp.asarray((rng.standard_normal((B, t_pad)) * 0.1).astype(np.float32))
audio2d = audio.reshape(B, t_pad // _LANE, _LANE)
c16, s16, t_re, t_im, proj_perm, k_max = _kernel_constants(cfg)
bands = cfg.pitch_step_count


def kern(starts_rel_ref, base_row_ref, audio_ref,
         c16_re_ref, c16_im_ref, t2_re_ref, t2_im_ref, proj_ref,
         out_ref, buf, windows, v_buf, sem):
    b = pl.program_id(0)
    t = pl.program_id(1)
    q_len = window // _LANE
    dma = pltpu.make_async_copy(
        audio_ref.at[b, pl.ds(base_row_ref[t], span_rows), :], buf, sem)
    dma.start()
    dma.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (q_len, _LANE), 1)

    def fill_row(j, _):
        s = starts_rel_ref[t, j]
        r0 = s // _LANE
        c = s - r0 * _LANE
        chunk = buf[pl.ds(r0, q_len + 1), :]
        rolled = pltpu.roll(chunk, -c, 1)
        w = jnp.where(lane < _LANE - c, rolled[0:q_len, :], rolled[1:q_len + 1, :])
        windows[j] = w
        return 0

    jax.lax.fori_loop(0, rpf, fill_row, 0)

    if variant == "windows":
        out_ref[0] = jnp.sum(windows[:], axis=1)[:, :bands]
        return

    hi = jax.lax.Precision.HIGHEST
    y = windows[:]
    dn = (((1,), (0,)), ((), ()))
    g_re = jax.lax.dot_general(y, c16_re_ref[:], dn, precision=hi,
                               preferred_element_type=jnp.float32)
    g_im = jax.lax.dot_general(y, c16_im_ref[:], dn, precision=hi,
                               preferred_element_type=jnp.float32)
    if variant == "stage1":
        out_ref[0] = g_re[:, :bands, 0] + g_im[:, :bands, 1]
        return

    inv_div = 1.0 / cfg.spectrum_scale_divisor
    for r in range(_A):
        gr = g_re[:, :, r]
        gi = g_im[:, :, r]
        t2r = t2_re_ref[r]
        t2i = t2_im_ref[r]
        x_re = (jnp.dot(gr, t2r, precision=hi, preferred_element_type=jnp.float32)
                - jnp.dot(gi, t2i, precision=hi, preferred_element_type=jnp.float32))
        x_im = (jnp.dot(gr, t2i, precision=hi, preferred_element_type=jnp.float32)
                + jnp.dot(gi, t2r, precision=hi, preferred_element_type=jnp.float32))
        x_re = jnp.where(x_re > 0.0, x_re * inv_div, x_re)
        x_im = jnp.where(x_im > 0.0, x_im * inv_div, x_im)
        v = x_re * x_re + x_im * x_im
        v_buf[:, r * k_max:(r + 1) * k_max] = jnp.where(jnp.isfinite(v), v, 0.0)
    out_ref[0] = jnp.dot(v_buf[:], proj_ref[:], precision=hi,
                         preferred_element_type=jnp.float32)


grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2,
    grid=(B, n_tiles),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
    out_specs=pl.BlockSpec((1, rpf, bands), lambda b, t, *_: (b, t, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[
        pltpu.VMEM((span_rows, _LANE), jnp.float32),
        pltpu.VMEM((rpf, _A, window // _A), jnp.float32),
        pltpu.VMEM((rpf, _A * k_max), jnp.float32),
        pltpu.SemaphoreType.DMA,
    ],
)
f = pl.pallas_call(
    kern, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((B, n_rows, bands), jnp.float32),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
)

t0 = time.perf_counter()
out = f(jnp.asarray(starts_rel), jnp.asarray(base_row), audio2d,
        jnp.asarray(c16), jnp.asarray(s16), jnp.asarray(t_re),
        jnp.asarray(t_im), jnp.asarray(proj_perm))
val = float(np.asarray(jnp.sum(out)))
print(f"{variant} (vmem {vmem_mb}MB): OK sum={val} in {time.perf_counter()-t0:.0f}s", flush=True)

# interpret-mode comparison for correctness when full
if variant == "full":
    fi = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_rows, bands), jnp.float32),
        interpret=True)
    exp = fi(jnp.asarray(starts_rel), jnp.asarray(base_row), audio2d,
             jnp.asarray(c16), jnp.asarray(s16), jnp.asarray(t_re),
             jnp.asarray(t_im), jnp.asarray(proj_perm))
    err = np.abs(np.asarray(out) - np.asarray(exp)).max()
    print("max abs err vs interpret:", err)
