"""Fused spectral-rows Pallas kernel: audio -> band-energy rows.

Replaces the XLA path `frame_windows -> rfft/matmul-DFT -> band matmul`
(spectral.py), whose dominant cost on TPU is materialising the overlapped
window tensor in HBM: with the parity hop (~8 samples) every audio sample is
re-read ~256x, so a 2 MB audio batch becomes a 537 MB window tensor.  Here a
frame-tile of 128 windows is built *in VMEM* from a ~13 KB audio slice and
the whole chain to the 32 band energies runs on-chip:

  per grid step (clip b, frame tile t):
    DMA audio2d[b, base_row : base_row + span_rows, 128]   (HBM -> VMEM)
    per window j: dynamic row-slice [17, 128] at s//128, dynamic lane-roll
      by s%128, row/row+1 select  ->  window in [a=16, b=128] layout
      (window sample n = 128 a + b, exactly the stage-1 DFT layout)
    stage-1 DFT over a (K=16 matmul)                        (MXU)
    stage-2 per-residue twiddle matmuls over b (K=128)      (MXU)
    quirk-Q5 scaling, |X|^2, band projection matmul         (MXU)
    write rows[b, t*128 : (t+1)*128, 32]

Numerics match ops.dft.rdft_bins (same factorisation, HIGHEST precision), so
fingerprint bits agree with the golden oracle.  Window starts arrive as
scalar-prefetch data (host-computed, quirk-Q8 hop arithmetic) — arbitrary
fractional-hop start patterns are supported, no alignment assumptions.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.spectral import band_projection_matrix

_A = 16    # stage-1 DFT length (n = a * B + b decomposition)
_LANE = 128


def _pallas_precision(precision):
    """Mosaic dot lowering supports only DEFAULT and HIGHEST; map HIGH up."""
    return (jax.lax.Precision.HIGHEST
            if precision == jax.lax.Precision.HIGH else precision)


@lru_cache(maxsize=8)
def _kernel_constants(config: FingerprintConfig):
    """Stage matrices with the band projection pre-permuted into (residue,
    slot) order so the kernel never reorders bins."""
    from lbaudiodetective_tpu.ops.spectral import bands_in_interior

    if not bands_in_interior(config):
        raise ValueError(
            "fused rows kernels require band bins strictly inside "
            "(0, window/2); use the xla rows path for this config")
    n = config.window_size
    b_len = n // _A
    ranges = config.band_bin_ranges
    lo, hi = int(ranges[:, 0].min()), int(ranges[:, 1].max())
    ks = np.arange(lo, hi)

    a = np.arange(_A)
    theta1 = 2.0 * np.pi * np.outer(a, np.arange(_A)) / _A
    c16 = np.cos(theta1).astype(np.float32)          # [a, r]
    s16 = (-np.sin(theta1)).astype(np.float32)

    classes = [ks[ks % _A == r] for r in range(_A)]
    k_max = max(len(c) for c in classes)
    t_re = np.zeros((_A, b_len, k_max), np.float32)
    t_im = np.zeros((_A, b_len, k_max), np.float32)
    proj = band_projection_matrix(config)            # [n/2, bands]
    proj_perm = np.zeros((_A * k_max, config.pitch_step_count), np.float32)
    bb = np.arange(b_len)
    for r, cls in enumerate(classes):
        for slot, k in enumerate(cls):
            theta = 2.0 * np.pi * k * bb / n
            t_re[r, :, slot] = 2.0 * np.cos(theta)   # vDSP 2x scale folded in
            t_im[r, :, slot] = -2.0 * np.sin(theta)
            proj_perm[r * k_max + slot] = proj[k]
    return c16, s16, t_re, t_im, proj_perm, k_max


def _rows_kernel(starts_rel_ref, base_row_ref,             # scalar prefetch
                 audio_ref,                                # HBM [B, T/128, 128]
                 c16_re_ref, c16_im_ref, t2_re_ref, t2_im_ref, proj_ref,
                 out_ref,                                  # VMEM out
                 buf, windows, v_buf, sem,                 # scratch
                 *, span_rows: int, window: int, rows: int, inv_div: float,
                 k_max: int, precision):
    b = pl.program_id(0)
    t = pl.program_id(1)
    q_len = window // _LANE                                # rows per window

    dma = pltpu.make_async_copy(
        audio_ref.at[b, pl.ds(base_row_ref[t], span_rows), :], buf, sem)
    dma.start()
    dma.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (q_len, _LANE), 1)

    def fill_row(j, _):
        s = starts_rel_ref[t, j]
        r0 = s // _LANE
        c = s - r0 * _LANE
        chunk = buf[pl.ds(r0, q_len + 1), :]               # [q+1, 128]
        rolled = pltpu.roll(chunk, -c, 1)
        # Flat shift by c across rows: lane p takes row q if p < 128-c,
        # else row q+1 (the rolled row boundary wrap).
        w = jnp.where(lane < _LANE - c, rolled[0:q_len, :], rolled[1:q_len + 1, :])
        windows[j] = w                                     # [a=16, b=128]
        return 0

    jax.lax.fori_loop(0, rows, fill_row, 0)

    hi = precision
    y = windows[:]                                         # [row, a, b]
    dn = (((1,), (0,)), ((), ()))
    g_re = jax.lax.dot_general(y, c16_re_ref[:], dn, precision=hi,
                               preferred_element_type=jnp.float32)
    g_im = jax.lax.dot_general(y, c16_im_ref[:], dn, precision=hi,
                               preferred_element_type=jnp.float32)
    # g_*: [row, b, r]

    for r in range(_A):
        gr = g_re[:, :, r]                                 # [row, b]
        gi = g_im[:, :, r]
        t2r = t2_re_ref[r]                                 # [b, k_max]
        t2i = t2_im_ref[r]
        x_re = (jnp.dot(gr, t2r, precision=hi, preferred_element_type=jnp.float32)
                - jnp.dot(gi, t2i, precision=hi, preferred_element_type=jnp.float32))
        x_im = (jnp.dot(gr, t2i, precision=hi, preferred_element_type=jnp.float32)
                + jnp.dot(gi, t2r, precision=hi, preferred_element_type=jnp.float32))
        # Quirk Q5: only positive components are scaled down (x * 1/512 is an
        # exact power-of-two multiply, identical to the reference's divide).
        x_re = jnp.where(x_re > 0.0, x_re * inv_div, x_re)
        x_im = jnp.where(x_im > 0.0, x_im * inv_div, x_im)
        v = x_re * x_re + x_im * x_im                      # [row, k_max]
        v_buf[:, r * k_max:(r + 1) * k_max] = jnp.where(jnp.isfinite(v), v, 0.0)
    out_ref[0] = jnp.dot(v_buf[:], proj_ref[:], precision=hi,
                         preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("config", "n_rows", "interpret"))
def fused_band_rows(audio: jnp.ndarray, config: FingerprintConfig,
                    n_rows: int, interpret: bool = False) -> jnp.ndarray:
    """``[B, T] audio -> [B, n_rows, bands]`` band-energy rows (fused kernel).

    ``n_rows`` must be a multiple of rows_per_frame; ``audio`` must be padded
    so every window fits (see extract.required_padded_length).
    """
    rpf = config.rows_per_frame
    window = config.window_size
    if n_rows % rpf:
        raise ValueError("n_rows must be a multiple of rows_per_frame")
    if window % _LANE:
        raise ValueError("window_size must be a multiple of 128")
    n_tiles = n_rows // rpf
    batch = audio.shape[0]

    starts = config.row_starts(n_rows).astype(np.int64)
    tile_first = starts.reshape(n_tiles, rpf)[:, 0]
    tile_last = starts.reshape(n_tiles, rpf)[:, -1]
    base_row = (tile_first // _LANE).astype(np.int32)
    starts_rel = (starts.reshape(n_tiles, rpf)
                  - (base_row.astype(np.int64) * _LANE)[:, None]).astype(np.int32)
    span_rows = int(np.max((tile_last - base_row.astype(np.int64) * _LANE
                            + window) // _LANE)) + 2
    # DMA destinations must have a multiple-of-8 sublane count: a
    # non-multiple-of-8 span faults the TPU DMA engine (empirically bisected;
    # scripts/bisect_dma.py).
    span_rows = -(-span_rows // 8) * 8
    # Pad audio to cover the last tile's span and to a multiple of 128.
    t_need = int((base_row.max() + span_rows) * _LANE)
    t_pad = max(t_need, audio.shape[1])
    t_pad += (-t_pad) % _LANE
    if t_pad != audio.shape[1]:
        audio = jnp.pad(audio, ((0, 0), (0, t_pad - audio.shape[1])))
    audio2d = audio.reshape(batch, t_pad // _LANE, _LANE)

    c16, s16, t_re, t_im, proj_perm, k_max = _kernel_constants(config)
    bands = config.pitch_step_count

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),         # c16_re
            pl.BlockSpec(memory_space=pltpu.VMEM),         # c16_im
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t2_re
            pl.BlockSpec(memory_space=pltpu.VMEM),         # t2_im
            pl.BlockSpec(memory_space=pltpu.VMEM),         # proj
        ],
        out_specs=pl.BlockSpec((1, rpf, bands), lambda b, t, *_: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((span_rows, _LANE), jnp.float32),
            pltpu.VMEM((rpf, _A, window // _A), jnp.float32),
            pltpu.VMEM((rpf, _A * k_max), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = partial(_rows_kernel, span_rows=span_rows, window=window, rows=rpf,
                     inv_div=1.0 / config.spectrum_scale_divisor, k_max=k_max,
                     precision=config.precision)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, n_rows, bands), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(starts_rel), jnp.asarray(base_row),
      audio2d, jnp.asarray(c16), jnp.asarray(s16), jnp.asarray(t_re),
      jnp.asarray(t_im), jnp.asarray(proj_perm))
