"""Fingerprint extraction: audio -> packed binary subfingerprints, end to end
on device.

The pipeline (one fused jitted graph, batched over clips):

    gather windows -> rfft -> Q5 scaling -> band matmul -> [rows, 32]
    -> reshape to 128-row frames -> 2-D Haar (two MXU matmuls)
    -> |coeff| top-k (rank order, stable tie-break) -> sign classes
    -> (pos, neg) {0,1} planes [n_sub, pairs]

This replaces the reference's per-window scalar hot loop and its NSNumber-boxed
sort (LBAudioDetective.m:262-290, LBAudioDetectiveFrame.m:165-191).  Static
shapes: clips are padded to a bucket length; the number of valid rows /
subfingerprints travels alongside as data (SURVEY §7 padding discipline).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.io.decode import DecodedAudio
from lbaudiodetective_tpu.ops import spectral
from lbaudiodetective_tpu.ops.haar import haar_2d



def subfingerprints_from_rows(rows: jnp.ndarray, config: FingerprintConfig,
                              rows_are_coeffs: bool = False
                              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``[..., n_rows, bands] -> (pos, neg)`` uint8 ``[..., n_sub, pairs]``.

    ``n_rows`` must be a multiple of ``rows_per_frame``.  Rank order is
    preserved: pos/neg column j corresponds to the j-th largest-|coefficient|
    (ties break toward the lower flat index; lax.top_k is stable).
    ``rows_are_coeffs``: input is already per-frame 2-D Haar coefficients
    (the fused kernel's fuse_haar output) — skip the Haar matmuls.
    """
    *lead, n_rows, bands = rows.shape
    rpf = config.rows_per_frame
    n_sub = n_rows // rpf
    frames = rows.reshape(*lead, n_sub, rpf, bands)
    coeffs = frames if rows_are_coeffs else haar_2d(frames, precision=config.precision)
    flat = coeffs.reshape(*lead, n_sub, rpf * bands)
    k = config.num_wavelet_pairs
    # Gather-free exact selection: stable-sort ascending on ~abs_bits (== |x|
    # descending, index ties kept in reference order — the NSNumber sort in
    # LBAudioDetectiveFrame.m:165-191 is index-stable) with the sign class as
    # a payload.  Bit-identical to top_k(|x|) + take_along_axis, but avoids
    # the expensive TPU gather (~20% of extraction time).
    n = flat.shape[-1]
    try:
        on_accel = jax.default_backend() != "cpu"
    except Exception:
        on_accel = False
    if on_accel and n == 4096 and k <= 128:
        # Pallas partial bitonic select: exact same order/ties as the sort
        # path below (verified element-exact in tests), ~3x faster on TPU.
        from lbaudiodetective_tpu.ops.pallas.select_signs import (
            select_sign_classes_padded)

        lead = flat.shape[:-1]
        cls128 = select_sign_classes_padded(flat.reshape(-1, n))
        topcls = cls128.reshape(*lead, 128)[..., :k]
        return ((topcls == 1).astype(jnp.uint8),
                (topcls == 2).astype(jnp.uint8))
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    keys = ~(bits & jnp.uint32(0x7FFFFFFF))
    cls = ((flat > 0.0).astype(jnp.uint8) + 2 * (flat < 0.0).astype(jnp.uint8))
    nb = 8
    keep = min(n // nb if nb else n, ((max(k, 128) + 127) // 128) * 128)
    if nb and n % nb == 0 and n // nb >= keep >= k and n // nb >= 256:
        # Two-stage blocked sort: per-block stable sorts use much shorter
        # networks; keeping `keep` >= k per block still covers the global
        # top-k, and the stable merge keeps cross-block ties in index order
        # (blocks concatenated block-major), so the result is exact.
        bs = n // nb
        k2 = keys.reshape(*keys.shape[:-1], nb, bs)
        c2 = cls.reshape(*cls.shape[:-1], nb, bs)
        sk, sc = jax.lax.sort((k2, c2), dimension=-1, num_keys=1,
                              is_stable=True)
        keys = sk[..., :keep].reshape(*keys.shape[:-1], nb * keep)
        cls = sc[..., :keep].reshape(*cls.shape[:-1], nb * keep)
    _, topcls = jax.lax.sort((keys, cls), dimension=-1, num_keys=1,
                             is_stable=True)
    topcls = topcls[..., :k]
    pos = (topcls == 1).astype(jnp.uint8)
    neg = (topcls == 2).astype(jnp.uint8)
    return pos, neg


def _rows_impl_auto(config: FingerprintConfig) -> str:
    """Pick the spectral-rows implementation.

    - hop == 8 on an accelerator: "fused_v2" Pallas kernel (static window
      re-tiling after one aligning roll — the fastest path).
    - integer hop otherwise / on CPU: "conv" strided-convolution
      factorisation (no window materialisation).
    - fractional hop on an accelerator: "fused" Pallas kernel (v1).
    - fallback: "xla" gather + matmul-DFT.
    """
    try:
        on_accel = jax.default_backend() != "cpu"
    except Exception:
        on_accel = False
    from lbaudiodetective_tpu.ops.spectral import bands_in_interior

    if not bands_in_interior(config):
        return "xla"        # bin 0 / negative band edges: packed-rfft only
    if config.has_integer_hop:
        hop = int(config.hop_in_processing_samples)
        if (on_accel and hop > 0 and 128 % hop == 0
                and config.window_size == 2048
                and config.rows_per_frame % (128 // hop) == 0
                and (config.rows_per_frame * hop) % 128 == 0):
            return "fused_v3"
        return "conv"
    return "fused" if on_accel else "xla"


@partial(jax.jit, static_argnames=("config", "n_rows", "rows_impl",
                                   "pipe_tail"))
def extract_fingerprint_padded(audio: jnp.ndarray, n_valid_sub: jnp.ndarray,
                               config: FingerprintConfig, n_rows: int,
                               rows_impl: str = "auto",
                               pipe_tail: str = "chain"
                               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Core jitted extraction over padded audio.

    audio: ``[..., T]`` float32, padded so the last window fits
           (``T >= floor((n_rows-1)*hop) + window``).
    n_valid_sub: ``[...]`` int32, number of valid subfingerprints per clip;
           trailing subfingerprints (computed from padding) are zeroed so
           downstream code may rely on zero padding.
    n_rows: static row count, a multiple of ``rows_per_frame``.
    rows_impl: "fused" (Pallas), "xla", or "auto".
    pipe_tail: multi-step pipe_select tail handling ("chain" — the shipped
           default, in-kernel select lag crossing clip boundaries —
           "stitch", or "fold"; measured on-chip in scripts/ab_pipe_tail.py
           and scripts/probe_chain_e2e.py: chain 53.0 vs stitch 55.6 ms per
           256 parity clips).

    Returns (pos, neg) uint8 ``[..., n_sub, pairs]``.
    """
    if n_rows % config.rows_per_frame:
        raise ValueError("n_rows must be a multiple of rows_per_frame")
    impl = _rows_impl_auto(config) if rows_impl == "auto" else rows_impl
    rows_are_coeffs = False
    if impl == "conv" and audio.ndim in (1, 2):
        batched = audio if audio.ndim == 2 else audio[None]
        rows = spectral.conv_band_rows(batched, config, n_rows)
        rows = rows if audio.ndim == 2 else rows[0]
    elif impl in ("fused_v2", "fused_v3") and audio.ndim in (1, 2):
        from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import (
            fused_band_rows_v2, fused_band_rows_v3)

        from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import (
            v3_tiles_per_step)

        batched = audio if audio.ndim == 2 else audio[None]
        k = config.num_wavelet_pairs
        n_tiles = n_rows // config.rows_per_frame
        multi_step = (n_tiles // v3_tiles_per_step(n_tiles) > 1
                      or batched.shape[0] > 1)
        if (impl == "fused_v3" and config.rows_per_frame == 128
                and config.pitch_step_count == 32 and k <= 128
                and multi_step):
            # Fully fused: the kernel emits rank-ordered sign classes
            # directly (coefficients never leave VMEM); element-exact vs the
            # two-stage path (tests/test_fused_rows.py).  pipe_select lags
            # the in-kernel select one grid step behind the matmuls so the
            # VPU bitonic overlaps the MXU stage-2 (~88% measured overlap,
            # scripts/probe_mxu_vpu_overlap.py); single-step-per-clip grids
            # (proc hop, short clips) lag along the batch axis instead.
            # The default tail handling is "chain" (the lag crosses clip
            # boundaries so only the global-final step is selected outside
            # the grid): measured 53.0 vs 55.6 ms per 256 parity clips
            # against "stitch" (per-clip tail select), bit-identical
            # (scripts/probe_chain_e2e.py, ab_pipe_tail.py).  The
            # pl.when-gated "fold" variant serialises the select against
            # the matmuls and measured 12-20% slower on-chip
            # (scripts/queue_logs_r04 q6/q7).  Only a 1-clip single-step
            # dispatch has nothing to lag behind — the wrapper falls back
            # to the standalone select there, as does this gate
            # (subfingerprints_from_rows below).
            cls = fused_band_rows_v3(batched, config, n_rows, fuse_haar=True,
                                     pipe_select=True,
                                     pipe_tail=pipe_tail)    # [B, n_tiles, 128]
            topcls = cls[..., :k] if audio.ndim == 2 else cls[0][..., :k]
            pos = (topcls == 1).astype(jnp.uint8)
            neg = (topcls == 2).astype(jnp.uint8)
        else:
            fn = fused_band_rows_v3 if impl == "fused_v3" else fused_band_rows_v2
            rows = fn(batched, config, n_rows, fuse_haar=True)
            rows = rows if audio.ndim == 2 else rows[0]
            pos, neg = subfingerprints_from_rows(rows, config,
                                                rows_are_coeffs=True)
        n_sub = n_rows // config.rows_per_frame
        valid = (jnp.arange(n_sub) < n_valid_sub[..., None]).astype(jnp.uint8)
        return pos * valid[..., None], neg * valid[..., None]
    elif impl == "fused" and audio.ndim in (1, 2):
        from lbaudiodetective_tpu.ops.pallas.fused_rows import fused_band_rows

        if audio.ndim == 1:
            rows = fused_band_rows(audio[None], config, n_rows)[0]
        else:
            rows = fused_band_rows(audio, config, n_rows)
    else:
        starts = spectral.window_starts(config, n_rows)
        windows = spectral.frame_windows(audio, starts, config.window_size)
        rows = spectral.band_energies(windows, config)
    pos, neg = subfingerprints_from_rows(rows, config, rows_are_coeffs)
    n_sub = n_rows // config.rows_per_frame
    valid = (jnp.arange(n_sub) < n_valid_sub[..., None]).astype(jnp.uint8)
    return pos * valid[..., None], neg * valid[..., None]


def required_padded_length(config: FingerprintConfig, n_rows: int) -> int:
    """Minimum audio length (processing samples) for a static row count."""
    if n_rows <= 0:
        return config.window_size
    starts = config.row_starts(n_rows)
    return int(starts[-1]) + config.window_size


def rows_for_subfingerprints(config: FingerprintConfig, n_sub: int) -> int:
    return n_sub * config.rows_per_frame


def bucket_subfingerprints(n_sub: int, granularity: int = 8) -> int:
    """Round a subfingerprint count up to a bucket size so variable-length
    clips share jit compilations (SURVEY §7: pad to bucket sizes).

    Granularity 8 keeps the v3 kernel's preferred 8-tiles-per-step divisor
    while halving the padding waste of short clips (a 10 s 'proc'-mode clip
    is ~7 subfingerprints: bucket 8, not 16)."""
    if n_sub <= 0:
        return 0
    return ((n_sub + granularity - 1) // granularity) * granularity


def extract_fingerprint(audio: DecodedAudio, config: FingerprintConfig | None = None,
                        n_sub_max: int | None = None
                        ) -> tuple[np.ndarray, np.ndarray, int]:
    """Convenience single-clip extraction: decoded audio -> (pos, neg, n_sub).

    Pads to the clip's own subfingerprint count (or ``n_sub_max`` for shape
    bucketing) and returns NumPy uint8 planes trimmed to valid length.
    """
    config = config or FingerprintConfig()
    n_sub = config.num_subfingerprints(audio.file_frames, audio.proc_frames)
    bucket = n_sub_max if n_sub_max is not None else bucket_subfingerprints(n_sub)
    if bucket == 0:
        pairs = config.num_wavelet_pairs
        return (np.zeros((0, pairs), np.uint8), np.zeros((0, pairs), np.uint8), 0)
    n_rows = rows_for_subfingerprints(config, bucket)
    t_pad = required_padded_length(config, n_rows)
    x = audio.samples
    if x.shape[0] < t_pad:
        x = np.concatenate([x, np.zeros(t_pad - x.shape[0], np.float32)])
    else:
        x = x[:t_pad]
    pos, neg = extract_fingerprint_padded(
        jnp.asarray(x), jnp.int32(n_sub), config, n_rows)
    return np.asarray(pos)[:n_sub], np.asarray(neg)[:n_sub], n_sub


def extract_fingerprint_batch(clips: list[DecodedAudio],
                              config: FingerprintConfig | None = None,
                              pad_batch_to: int = 0, n_sub_cap: int = 0
                              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched extraction: pads all clips to one bucket and runs a single
    dispatch.  Returns (pos, neg, n_sub) with shapes ``[B, S_max, pairs]`` /
    ``[B]``; invalid subfingerprints are zeroed.

    ``pad_batch_to``/``n_sub_cap`` pin the dispatch to STATIC shapes for
    serving: the batch axis zero-pads up to ``pad_batch_to`` clips and the
    subfingerprint bucket is fixed at ``bucket(n_sub_cap)`` regardless of
    batch composition, so every serving batch shares ONE jit compilation
    (remote TPU compiles are minutes; shape churn is a production hazard).
    Clips longer than the cap are truncated to it — results for in-cap
    clips are bit-identical to the dynamic-bucket path.
    """
    config = config or FingerprintConfig()
    n_subs = np.array([config.num_subfingerprints(c.file_frames, c.proc_frames)
                       for c in clips], dtype=np.int32)
    if n_sub_cap:
        n_subs = np.minimum(n_subs, n_sub_cap)
        s_max = bucket_subfingerprints(n_sub_cap)
    else:
        s_max = bucket_subfingerprints(int(n_subs.max(initial=0)))
    b_out = len(clips)
    b_pad = max(b_out, pad_batch_to)
    if s_max == 0:
        pairs = config.num_wavelet_pairs
        return (np.zeros((b_out, 0, pairs), np.uint8),
                np.zeros((b_out, 0, pairs), np.uint8), n_subs)
    n_rows = rows_for_subfingerprints(config, s_max)
    t_pad = required_padded_length(config, n_rows)
    batch = np.zeros((b_pad, t_pad), dtype=np.float32)
    for i, c in enumerate(clips):
        t = min(c.samples.shape[0], t_pad)
        batch[i, :t] = c.samples[:t]
    n_subs_pad = np.zeros(b_pad, np.int32)
    n_subs_pad[:b_out] = n_subs
    pos, neg = extract_fingerprint_padded(
        jnp.asarray(batch), jnp.asarray(n_subs_pad), config, n_rows)
    return np.asarray(pos)[:b_out], np.asarray(neg)[:b_out], n_subs
