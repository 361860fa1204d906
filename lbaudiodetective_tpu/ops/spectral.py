"""Spectral stage: batched windowing, vDSP-semantics real FFT, and log-spaced
subband energy reduction.

Replaces the reference's per-window vDSP hot loop
(LBAudioDetectiveComputeFrequencies, LBAudioDetective.m:335-408) with one
batched ``rfft`` over all windows of all clips and a single band-reduction
matmul ``v @ B`` on the MXU, where ``B[k, band] = 1/width_band`` over the
quirk-Q6 integer bin ranges precomputed in FingerprintConfig.

vDSP semantics kept (SURVEY Q5): spectrum values carry fft_zrip's 2x scale,
the packed DC/Nyquist slots live at bins 0 (real) and 0 (imag), and only
*positive* components are divided by (window/2)/2.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from lbaudiodetective_tpu.config import FingerprintConfig


def bands_in_interior(config: FingerprintConfig) -> bool:
    """True when every consumed FFT bin lies strictly inside (0, window/2).

    Custom configs with a low ``min_frequency`` can push the Q6 band ranges
    to bin 0 (the vDSP packed DC/Nyquist slot) or even -1 (the ``int(x-1.0)``
    truncation); only the full packed-rfft path handles those correctly, so
    the matmul-DFT / conv / Pallas specialisations must be gated on this.
    """
    ranges = config.band_bin_ranges
    n_over_2 = config.window_size // 2
    return bool(ranges[:, 0].min() >= 1 and ranges[:, 1].max() <= n_over_2)


@lru_cache(maxsize=8)
def band_projection_matrix(config: FingerprintConfig) -> np.ndarray:
    """``[window/2, pitch_step_count]`` float32 band-sum matrix with the
    1/width normalisation folded in (LBAudioDetective.m:379-404).

    Band edges are clamped to [0, window/2): the reference would read out of
    bounds for a -1 edge (undefined behaviour, Q6) — spec-corrected to clamp
    instead of wrapping via Python negative indexing.
    """
    n_over_2 = config.window_size // 2
    mat = np.zeros((n_over_2, config.pitch_step_count), dtype=np.float32)
    ranges = config.band_bin_ranges
    widths = config.band_widths
    for i in range(config.pitch_step_count):
        lo = min(max(int(ranges[i, 0]), 0), n_over_2)
        hi = min(max(int(ranges[i, 1]), 0), n_over_2)
        if hi > lo and widths[i] > 0:   # zero-width band -> energy 0 (0/0 UB)
            mat[lo:hi, i] = np.float32(1.0) / widths[i]
    return mat


def packed_spectrum(windows: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real FFT with vDSP packed-format scaling.

    ``windows``: ``[..., window]`` float32.  Returns ``(re, im)`` each
    ``[..., window/2]``: 2x the mathematical DFT, with re[0] = 2*DC and
    im[0] = 2*Nyquist (the packed slots; see oracle.vdsp_packed_spectrum).
    """
    n = windows.shape[-1]
    spec = jnp.fft.rfft(windows)                    # [..., n/2 + 1] complex64
    re = 2.0 * spec.real
    im = 2.0 * spec.imag
    # Fold the Nyquist real value into the imag DC slot, then drop bin n/2.
    im = im.at[..., 0].set(2.0 * spec[..., n // 2].real)
    return re[..., : n // 2], im[..., : n // 2]


def band_energies(windows: jnp.ndarray, config: FingerprintConfig,
                  use_matmul_dft: bool = True) -> jnp.ndarray:
    """``[..., window] -> [..., pitch_step_count]`` band energies.

    Quirk Q5: positive spectrum components are divided by
    ``config.spectrum_scale_divisor`` (=512 for the default window), negative
    ones keep full magnitude; energy = re^2 + im^2 summed per band / width.

    When every consumed bin lies strictly inside (0, window/2) — true for the
    default config, bins [86, 760) — the spectrum comes from the MXU matmul
    DFT (ops.dft) restricted to those bins; otherwise falls back to the full
    packed rfft.
    """
    from lbaudiodetective_tpu.ops.dft import rdft_bins

    ranges = config.band_bin_ranges
    lo, hi = int(ranges[:, 0].min()), int(ranges[:, 1].max())
    div = jnp.float32(config.spectrum_scale_divisor)
    n = windows.shape[-1]
    if use_matmul_dft and 1 <= lo and hi <= n // 2 and n % 16 == 0:
        re, im = rdft_bins(windows, lo, hi, precision=config.precision)
        proj = jnp.asarray(band_projection_matrix(config)[lo:hi])
    else:
        re, im = packed_spectrum(windows)
        proj = jnp.asarray(band_projection_matrix(config))
    re = jnp.where(re > 0.0, re / div, re)
    im = jnp.where(im > 0.0, im / div, im)
    v = re * re + im * im
    v = jnp.where(jnp.isfinite(v), v, 0.0)
    # Elevated precision: the TPU default would truncate the energies to bf16.
    return jnp.einsum("...k,kb->...b", v, proj, preferred_element_type=jnp.float32,
                      precision=config.precision)


def window_starts(config: FingerprintConfig, n_rows: int) -> np.ndarray:
    """Static per-row window start positions (processing samples)."""
    return config.row_starts(n_rows)


@lru_cache(maxsize=8)
def _conv_constants(config: FingerprintConfig):
    """Convolution filter banks for the strided-conv spectral path.

    Stage 1: 16-tap dilation-128 filters = the a-axis DFT applied at every
    sample position; stage 2: grouped 128-tap filters = per-residue twiddle
    contractions.  Derived from the same factorisation as ops.pallas.fused_rows
    (including the vDSP 2x scale) with the band projection pre-permuted.
    """
    from lbaudiodetective_tpu.ops.pallas.fused_rows import _A, _kernel_constants

    c16, s16, t_re, t_im, proj_perm, k_max = _kernel_constants(config)
    b_len = config.window_size // _A
    w1 = np.zeros((2 * _A, 1, _A), np.float32)              # [out, in, taps]
    for r in range(_A):
        w1[2 * r, 0, :] = c16[:, r]
        w1[2 * r + 1, 0, :] = s16[:, r]
    w2 = np.zeros((_A * 2 * k_max, 2, b_len), np.float32)   # grouped, 16 groups
    for r in range(_A):
        for slot in range(k_max):
            oc_re = r * 2 * k_max + slot
            oc_im = r * 2 * k_max + k_max + slot
            w2[oc_re, 0, :] = t_re[r, :, slot]
            w2[oc_re, 1, :] = -t_im[r, :, slot]
            w2[oc_im, 0, :] = t_im[r, :, slot]
            w2[oc_im, 1, :] = t_re[r, :, slot]
    return w1, w2, proj_perm, k_max


def conv_band_rows(audio: jnp.ndarray, config: FingerprintConfig,
                   n_rows: int) -> jnp.ndarray:
    """``[B, T] audio -> [B, n_rows, bands]`` via two strided convolutions.

    Requires an integer hop (config.integer_hop / hop_domain='proc').  The
    overlapped-window DFT factorises into (1) a dense 16-tap dilated conv
    computing the a-axis partial DFT at every sample position, and (2) a
    grouped 128-tap stride-``hop`` conv applying the per-residue twiddles —
    both MXU-friendly, with no window materialisation in HBM.
    """
    if not config.has_integer_hop:
        raise ValueError("conv_band_rows requires an integer hop")
    if not bands_in_interior(config):
        raise ValueError(
            "conv_band_rows requires band bins strictly inside (0, window/2); "
            "use the xla rows path for this config (bin 0 is the vDSP packed "
            "DC/Nyquist slot)")
    hop = int(config.hop_in_processing_samples)
    w1_np, w2_np, proj_perm, k_max = _conv_constants(config)
    hi = config.precision
    b = audio.shape[0]
    need = (n_rows - 1) * hop + config.window_size
    if audio.shape[1] < need:
        audio = jnp.pad(audio, ((0, 0), (0, need - audio.shape[1])))
    lhs = audio[:, None, :]                                  # [B, 1, T]
    p = jax.lax.conv_general_dilated(
        lhs, jnp.asarray(w1_np), window_strides=(1,), padding="VALID",
        rhs_dilation=(config.window_size // 16,),
        dimension_numbers=("NCH", "OIH", "NCH"), precision=hi)  # [B, 32, T']
    x = jax.lax.conv_general_dilated(
        p, jnp.asarray(w2_np), window_strides=(hop,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=16, precision=hi)                # [B, 1376, R']
    x = x[:, :, :n_rows]
    if x.shape[2] < n_rows:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_rows - x.shape[2])))
    x = x.reshape(b, 16, 2, k_max, x.shape[-1])
    div = jnp.float32(config.spectrum_scale_divisor)
    x = jnp.where(x > 0.0, x / div, x)                       # quirk Q5
    v = x[:, :, 0] ** 2 + x[:, :, 1] ** 2                    # [B, 16, k_max, R]
    v = jnp.where(jnp.isfinite(v), v, 0.0)
    v = v.reshape(b, 16 * k_max, v.shape[-1]).swapaxes(1, 2)  # [B, R, 16*k_max]
    return jnp.einsum("brk,kc->brc", v, jnp.asarray(proj_perm),
                      precision=hi, preferred_element_type=jnp.float32)


def frame_windows(audio: jnp.ndarray, starts: np.ndarray, window: int) -> jnp.ndarray:
    """Gather overlapping windows: ``audio[..., T] -> [..., n_rows, window]``.

    ``starts`` is a compile-time constant (hop arithmetic is config-static);
    callers must pad ``audio`` so ``starts[-1] + window <= T``.
    """
    idx = jnp.asarray(starts[:, None] + np.arange(window)[None, :])
    return audio[..., idx]
