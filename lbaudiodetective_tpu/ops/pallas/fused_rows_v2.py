"""Fused spectral-rows Pallas kernel, v2 — integer-hop fast path (any hop
dividing 128; 8 in parity mode, 64 in 'proc' mode).

The v1 kernel (fused_rows.py) supports arbitrary window-start patterns but
pays a 128-iteration dynamic-roll loop per tile.  With the integer-hop spec
(CALIBRATION.md) the start grid is uniform (8 samples), which makes every
data movement static after a single aligning roll:

  per grid step (clip b, frame tile t of 128 windows):
    DMA audio2d[b, base_row_t : +32, 128]           (HBM -> VMEM, 16 KB)
    ONE dynamic flat-roll by s0 = tile_start mod 128 -> window grid = 8j
    stage-1 shared transform: P[q,p,r] = sum_a bufr[q+a, p] C16[a,r]
      (16 static slices + one K=16 dot_general; shared by ALL windows --
       the per-window stage-1 work collapses 128-fold)
    static re-tiling P -> G[(v,w), b, r] (16 static slice+concats)
      where window j = 16w + v starts at flat 8j = 128w + 8v
    stage-2: per residue r, [128,128] @ [128, 2*k_max] matmuls (K=128, MXU)
    quirk-Q5 scale, |X|^2, band projection, static row un-permutation matmul

Numerically identical to ops.dft.rdft_bins (same factorisation); bit parity
with the golden oracle at config.matmul_precision >= high.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.pallas.fused_rows import (_A, _LANE, _kernel_constants, _pallas_precision)


@lru_cache(maxsize=8)
def _v2_constants(config: FingerprintConfig, fuse_haar: bool = False):
    hop = int(config.hop_in_processing_samples)
    c16, s16, t_re, t_im, proj_perm, k_max = _kernel_constants(config)
    # Stage-2 stacked matrices padded to a full 128 lanes so every in-kernel
    # slice falls on the 64-lane boundary: X_all = G_re @ A + G_im @ B with
    # A = [T2re | T2im], B = [-T2im | T2re] -> X_all = [X_re pad | X_im pad].
    half = 64
    assert k_max <= half
    b_len = t_re.shape[1]
    t2a = np.zeros((_A, b_len, 2 * half), np.float32)
    t2b = np.zeros((_A, b_len, 2 * half), np.float32)
    t2a[:, :, :k_max] = t_re
    t2a[:, :, half:half + k_max] = t_im
    t2b[:, :, :k_max] = -t_im
    t2b[:, :, half:half + k_max] = t_re
    # Per-residue band projection: [16, 64, bands] (zero rows beyond k_max).
    proj_r = np.zeros((_A, half, config.pitch_step_count), np.float32)
    for r in range(_A):
        proj_r[r, :k_max] = proj_perm[r * k_max:(r + 1) * k_max]
    rpf = config.rows_per_frame
    vper = _LANE // hop                                 # windows per 128 flat
    wper = rpf // vper
    perm = np.zeros((rpf, rpf), np.float32)             # out[j] = rows[(v,w)]
    for j in range(rpf):
        w, v = divmod(j, vper)
        perm[j, v * wper + w] = 1.0
    if fuse_haar:
        # One frame tile == one 128-row Haar frame: fold the row-axis Haar
        # matrix into the un-permutation matmul (H128 @ PERM) and emit 2-D
        # Haar coefficients directly; the column pass uses H32^T.
        from lbaudiodetective_tpu.ops.haar import haar_matrix

        perm = haar_matrix(rpf).astype(np.float32) @ perm
        h_cols_t = haar_matrix(config.pitch_step_count).astype(np.float32).T
    else:
        h_cols_t = np.eye(config.pitch_step_count, dtype=np.float32)
    return c16, s16, t2a, t2b, proj_r, k_max, perm, h_cols_t


def _split_bf16(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """f32 -> (hi, lo) bf16 pair with hi + lo ~ x (for 3-pass matmuls)."""
    import ml_dtypes

    hi = x.astype(ml_dtypes.bfloat16)
    lo = (x - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _rows_kernel_v2(s0_ref, base_row_ref,               # scalar prefetch
                    audio_ref,                          # HBM [B, T/128, 128]
                    c16_re_ref, c16_im_ref, t2a_ref, t2b_ref, proj_ref, perm_ref,
                    hcols_ref,
                    out_ref,                            # VMEM out [1, 128, bands]
                    buf, sem,
                    *, span_rows: int, window: int, rows: int, hop: int,
                    inv_div: float, k_max: int, precision, fuse_haar: bool,
                    bf16x3: bool, tps: int):
    b = pl.program_id(0)
    tt = pl.program_id(1)
    hi = precision

    # Issue every tile's DMA up front so the copies overlap each other and
    # the first tile's compute.
    dmas = []
    for k in range(tps):
        dmas.append(pltpu.make_async_copy(
            audio_ref.at[b, pl.ds(base_row_ref[tt * tps + k], span_rows), :],
            buf.at[k], sem.at[k]))
        dmas[-1].start()

    sr1 = span_rows - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (sr1, _LANE), 1)
    qu = -(-(hop * (rows - 1) + _LANE) // _LANE)
    dn = (((0,), (0,)), ((), ()))

    p_res, p_ims = [], []
    for k in range(tps):
        dmas[k].wait()
        # Align so window j starts at flat position hop*j: one dynamic roll.
        s0 = s0_ref[tt * tps + k]
        rolled = pltpu.roll(buf[k], -s0, 1)
        bufr = jnp.where(lane < _LANE - s0, rolled[0:sr1, :],
                         rolled[1:span_rows, :])
        # Stage 1 shared across windows: P[r, q, p] = sum_a bufr[q+a, p]
        # C16[a, r] (r leads so per-residue slicing is a free major slice).
        # P is needed at flat positions [0, hop*(rows-1) + 128): window j
        # reads P[hop*j + b] for b in [0, 128).
        stack = jnp.stack([bufr[a:a + qu, :] for a in range(_A)])  # [16a,qu,128]
        p_res.append(jax.lax.dot_general(
            c16_re_ref[:], stack, dn, precision=hi,
            preferred_element_type=jnp.float32))                   # [16r,qu,128]
        p_ims.append(jax.lax.dot_general(
            c16_im_ref[:], stack, dn, precision=hi,
            preferred_element_type=jnp.float32))

    # Static re-tiling per residue: G_r[(v,w), b]; window j = vper*w + v
    # reads flat 128w + hop*v + b.
    vper = _LANE // hop
    wper = rows // vper
    half = 64

    g_lane = jax.lax.broadcasted_iota(jnp.int32, (wper, _LANE), 1)

    def build_g(p2):                                               # [qu, 128]
        # Piece v = flat positions [128w + 8v, +128): a static roll by 8v
        # with the row-boundary wrap selected per lane (Mosaic's lane-concat
        # of offset slices is unimplemented, rolls are cheap).
        pieces = []
        for v in range(vper):
            cut = hop * v
            if cut == 0:
                pieces.append(p2[0:wper, :])
            else:
                # Left-rotate by `cut` == roll by 128-cut (static shifts must
                # be non-negative).
                rolled = pltpu.roll(p2, _LANE - cut, 1)
                pieces.append(jnp.where(g_lane < _LANE - cut,
                                        rolled[0:wper, :], rolled[1:wper + 1, :]))
        return jnp.concatenate(pieces, axis=0)                     # [128, 128]

    def stage2_dot(g, t_ref, r):
        if not bf16x3:
            return jnp.dot(g, t_ref[r], precision=hi,
                           preferred_element_type=jnp.float32)
        # Manual 3-pass bf16 (~HIGH precision, half the passes of HIGHEST):
        # t_ref holds (hi, lo) bf16 planes stacked on a leading axis.
        g_hi = g.astype(jnp.bfloat16)
        g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        t_hi = t_ref[0, r]
        t_lo = t_ref[1, r]
        return (jnp.dot(g_hi, t_hi, preferred_element_type=jnp.float32)
                + jnp.dot(g_hi, t_lo, preferred_element_type=jnp.float32)
                + jnp.dot(g_lo, t_hi, preferred_element_type=jnp.float32))

    rows_acc = jnp.zeros((tps * rows, out_ref.shape[-1]), jnp.float32)
    for r in range(_A):
        # Stack all tiles of this step into one tall matmul (M = tps*rows).
        g_re = jnp.concatenate([build_g(p_res[k][r]) for k in range(tps)], axis=0)
        g_im = jnp.concatenate([build_g(p_ims[k][r]) for k in range(tps)], axis=0)
        x = stage2_dot(g_re, t2a_ref, r) + stage2_dot(g_im, t2b_ref, r)
        x = jnp.where(x > 0.0, x * inv_div, x)                     # quirk Q5
        v = x[:, :half] ** 2 + x[:, half:] ** 2                    # [.., 64]
        v = jnp.where(jnp.isfinite(v), v, 0.0)
        rows_acc = rows_acc + jnp.dot(v, proj_ref[r], precision=hi,
                                      preferred_element_type=jnp.float32)

    # perm_ref is the block-diagonal per-tile un-permutation (x Haar row pass).
    out = jnp.dot(perm_ref[:], rows_acc, precision=hi,
                  preferred_element_type=jnp.float32)
    if fuse_haar:  # column-axis Haar pass (row pass is folded into perm_ref)
        out = jnp.dot(out, hcols_ref[:], precision=hi,
                      preferred_element_type=jnp.float32)
    out_ref[0] = out


@partial(jax.jit, static_argnames=("config", "n_rows", "interpret", "fuse_haar"))
def fused_band_rows_v2(audio: jnp.ndarray, config: FingerprintConfig,
                       n_rows: int, interpret: bool = False,
                       fuse_haar: bool = False) -> jnp.ndarray:
    """``[B, T] audio -> [B, n_rows, bands]``; requires hop == 8 and the
    default window/frame geometry (window 2048, 128 rows/frame).

    With ``fuse_haar`` the output is the per-frame 2-D Haar coefficient
    tensor instead of raw band rows (the row-axis Haar matrix rides the
    existing un-permutation matmul; only one extra [128,32]@[32,32] matmul)."""
    rpf = config.rows_per_frame
    window = config.window_size
    if not config.has_integer_hop:
        raise ValueError("v2 kernel requires an integer hop")
    hop = int(config.hop_in_processing_samples)
    if hop <= 0 or _LANE % hop:
        raise ValueError("v2 kernel requires the hop to divide 128")
    if window != _A * _LANE:
        # The static re-tiling assumes window = 16 * 128 exactly (stage-2
        # contraction width == lane width); other windows use conv/xla paths.
        raise ValueError("v2 kernel requires window_size == 2048")
    if n_rows % rpf or rpf % (_LANE // hop):
        raise ValueError("unsupported geometry for the v2 kernel")
    n_tiles = n_rows // rpf
    batch = audio.shape[0]

    starts = config.row_starts(n_rows).astype(np.int64)
    tile_first = starts.reshape(n_tiles, rpf)[:, 0]
    base_row = (tile_first // _LANE).astype(np.int32)
    s0 = (tile_first - base_row.astype(np.int64) * _LANE).astype(np.int32)
    span_need = int(np.max(tile_first - base_row.astype(np.int64) * _LANE)
                    ) + hop * (rpf - 1) + window
    span_rows = -(-(span_need // _LANE + 2) // 8) * 8   # sublane-aligned DMA
    t_need = int((base_row.max() + span_rows) * _LANE)
    t_pad = max(t_need, audio.shape[1])
    t_pad += (-t_pad) % _LANE
    if t_pad != audio.shape[1]:
        audio = jnp.pad(audio, ((0, 0), (0, t_pad - audio.shape[1])))
    audio2d = audio.reshape(batch, t_pad // _LANE, _LANE)

    c16, s16, t2a, t2b, proj_perm, k_max, perm, h_cols_t = _v2_constants(
        config, fuse_haar)
    bands = config.pitch_step_count
    # matmul_precision "high" -> manual 3-pass bf16 stage-2 (Mosaic itself
    # only offers 1-pass DEFAULT or 6-pass HIGHEST).
    bf16x3 = (config.matmul_precision == "high") and not interpret
    if bf16x3:
        t2a = np.stack(_split_bf16(t2a))                    # [2, 16, 128, 128]
        t2b = np.stack(_split_bf16(t2b))
    # Tiles per grid step: amortises DMA latency and grid overhead, and makes
    # the stage-2 matmuls 4x taller (better MXU pipelining).
    tps = 4 if n_tiles % 4 == 0 else (2 if n_tiles % 2 == 0 else 1)
    perm_blk = np.zeros((tps * rpf, tps * rpf), np.float32)
    for k in range(tps):
        perm_blk[k * rpf:(k + 1) * rpf, k * rpf:(k + 1) * rpf] = perm
    perm = perm_blk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, n_tiles // tps),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((1, tps * rpf, bands),
                               lambda b, t, *_: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tps, span_rows, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((tps,)),
        ],
    )
    kernel = partial(_rows_kernel_v2, span_rows=span_rows, window=window,
                     rows=rpf, hop=hop,
                     inv_div=1.0 / config.spectrum_scale_divisor,
                     k_max=k_max, precision=_pallas_precision(config.precision),
                     fuse_haar=fuse_haar, bf16x3=bf16x3, tps=tps)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, n_rows, bands), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(s0), jnp.asarray(base_row), audio2d,
      jnp.asarray(c16), jnp.asarray(s16), jnp.asarray(t2a), jnp.asarray(t2b),
      jnp.asarray(proj_perm), jnp.asarray(perm), jnp.asarray(h_cols_t))


# --------------------------------------------------------------------------- #
# v3: BlockSpec-pipelined variant (no manual DMA)
# --------------------------------------------------------------------------- #
# Empirical bisect (scripts/bisect_v2_cost.py): the manual DMA + grid
# machinery dominated v2 (4.4 of 7.3 ms per 8-clip batch).  With an integer
# hop the tile starts are always 128-aligned (tile t begins at sample
# rpf*hop*t, a multiple of 128), so the audio a grid step needs is a pair of
# REGULAR overlapping blocks — expressible as two BlockSpec inputs with
# shifted index maps, which Mosaic double-buffers automatically behind the
# previous step's compute.


def _rows_kernel_v3(*refs,
                    span_rows: int, window: int, rows: int, hop: int,
                    adv_rows: int, inv_div: float, k_max: int, precision,
                    fuse_haar: bool, bf16x3: bool, tps: int, n_blk: int,
                    batched_rolls: bool = False, aux3: bool = False,
                    proj_concat: bool = False, conj_pairs: bool = False,
                    two_pass: bool = False, fuse_select: bool = False,
                    dense_pairs: bool = False, aux2: bool = False,
                    cat_gk: bool = False, vmaj: bool = False,
                    pipe_select: bool = False, tail_fold: bool = False,
                    n_steps: int = 0):
    blk_refs = refs[:n_blk]
    if pipe_select:
        if tail_fold:
            (c16_re_ref, c16_im_ref, t2a_ref, t2b_ref, proj_ref,
             perm_ref, hcols_ref, out_ref, sel_scr) = refs[n_blk:]
        else:
            (c16_re_ref, c16_im_ref, t2a_ref, t2b_ref, proj_ref,
             perm_ref, hcols_ref, out_ref, tail_ref, sel_scr) = refs[n_blk:]
        # Software-pipelined select (scripts/probe_mxu_vpu_overlap.py: MXU
        # matmuls and independent VPU chains overlap ~88% when traced in the
        # same straight-line body): select the PREVIOUS grid step's Haar
        # frames from scratch while this step's matmuls drain.  The lagged
        # out_specs index map routes this write to block t-1.
        from lbaudiodetective_tpu.ops.pallas.select_signs import _select_body

        if tail_fold:
            # The grid runs n_steps+1 steps per clip: the extra final step
            # is select-only (matmuls pl.when-gated off below), replacing
            # the old standalone tail kernel + stitch.  t=0 has nothing to
            # select yet, so its (would-be garbage) write is gated too.
            @pl.when(pl.program_id(1) > 0)
            def _select_prev():
                out_ref[0] = _select_body(sel_scr[:], tps, band_major=True)
        else:
            # Batch lag: the t=0 garbage write lands in block 0 and is
            # overwritten by its successor before the revolving window
            # flushes (same block index).
            out_ref[0] = _select_body(sel_scr[:], tps, band_major=True)
    else:
        (c16_re_ref, c16_im_ref, t2a_ref, t2b_ref, proj_ref,
         perm_ref, hcols_ref, out_ref) = refs[n_blk:]
    def _main():
        hi = precision
        full = jnp.concatenate([b[0, 0] for b in blk_refs], axis=0)  # [K*u, 128]
        qu = -(-(hop * (rows - 1) + _LANE) // _LANE)
        dn = (((0,), (0,)), ((), ()))

        def split3(x):
            xh = x.astype(jnp.bfloat16)
            return xh, (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)

        def stage1_pair(stack):
            if aux3:
                # 3-pass bf16 with pre-split (hi, lo) weight planes (~HIGH
                # precision at half the passes of Mosaic HIGHEST).
                sh, sl = split3(stack)

                def dg(a, b):
                    return jax.lax.dot_general(
                        a, b, dn, preferred_element_type=jnp.float32)

                if aux2:
                    return (dg(c16_re_ref[0], sh) + dg(c16_re_ref[0], sl),
                            dg(c16_im_ref[0], sh) + dg(c16_im_ref[0], sl))
                return (dg(c16_re_ref[0], sh) + dg(c16_re_ref[1], sh)
                        + dg(c16_re_ref[0], sl),
                        dg(c16_im_ref[0], sh) + dg(c16_im_ref[1], sh)
                        + dg(c16_im_ref[0], sl))
            return (jax.lax.dot_general(c16_re_ref[:], stack, dn, precision=hi,
                                        preferred_element_type=jnp.float32),
                    jax.lax.dot_general(c16_im_ref[:], stack, dn, precision=hi,
                                        preferred_element_type=jnp.float32))

        # Step-level stage-1: consecutive tiles' stage-1 inputs overlap (tile k
        # reads rows [k*adv, k*adv+qu)), so ONE dot over the union span replaces
        # tps shallow per-tile dots (the fill cost of tiny M=16 matmuls dominated)
        # and each tile's P becomes a free major-axis slice.
        m_tot = (tps - 1) * adv_rows + qu
        # batched_rolls selects the legacy per-tile path so the A/B scripts
        # compare real alternatives (step-level is the shipped default).
        step_level = not batched_rolls
        n_res = _A // 2 + 1 if conj_pairs else _A
        if step_level:
            stack_all = jnp.stack([full[a:a + m_tot, :] for a in range(_A)])
            p_re_all, p_im_all = stage1_pair(stack_all)        # [n_res, m_tot, 128]
            p_res = [p_re_all[:, k * adv_rows:k * adv_rows + qu, :]
                     for k in range(tps)]
            p_ims = [p_im_all[:, k * adv_rows:k * adv_rows + qu, :]
                     for k in range(tps)]
        else:
            p_res, p_ims = [], []
            for k in range(tps):
                bufr = full[k * adv_rows:k * adv_rows + span_rows, :]
                stack = jnp.stack([bufr[a:a + qu, :] for a in range(_A)])
                pr, pi = stage1_pair(stack)
                p_res.append(pr)
                p_ims.append(pi)

        vper = _LANE // hop
        wper = rows // vper
        half = 64
        g_lane = jax.lax.broadcasted_iota(jnp.int32, (wper, _LANE), 1)

        def build_g(p2):
            pieces = []
            for v in range(vper):
                cut = hop * v
                if cut == 0:
                    pieces.append(p2[0:wper, :])
                else:
                    rolled = pltpu.roll(p2, _LANE - cut, 1)
                    pieces.append(jnp.where(g_lane < _LANE - cut,
                                            rolled[0:wper, :], rolled[1:wper + 1, :]))
            return jnp.concatenate(pieces, axis=0)

        # Batched variant (v4): roll/select once per v over the WHOLE per-tile
        # [16r, qu, 128] tensor instead of once per (r, v) — 16x fewer shuffle ops
        # for the same bytes; stage-2 then takes free major-axis slices.
        g_lane3 = jax.lax.broadcasted_iota(jnp.int32, (_A, wper, _LANE), 2)

        def build_g_all(p3):                                   # [16r, qu, 128]
            pieces = []
            for v in range(vper):
                cut = hop * v
                if cut == 0:
                    pieces.append(p3[:, 0:wper, :])
                else:
                    rolled = pltpu.roll(p3, _LANE - cut, 2)
                    pieces.append(jnp.where(g_lane3 < _LANE - cut,
                                            rolled[:, 0:wper, :],
                                            rolled[:, 1:wper + 1, :]))
            return jnp.concatenate(pieces, axis=1)             # [16r, rows, 128]

        def stage2_dot(g, t_ref, r, wid=None):
            # wid: slice the weight's lane width (conj-pair singles use only the
            # first 128 of the padded 256 lanes — don't pay the wasted N-tile).
            if not bf16x3:
                t = t_ref[r] if wid is None else t_ref[r, :, :wid]
                return jnp.dot(g, t, precision=hi,
                               preferred_element_type=jnp.float32)
            g_hi = g.astype(jnp.bfloat16)
            g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            t0 = t_ref[0, r] if wid is None else t_ref[0, r, :, :wid]
            if two_pass:
                # "medium": full-precision operand vs bf16 weights — drops the
                # weight low-bits pass (error ~2^-9 relative, from weights only).
                return (jnp.dot(g_hi, t0, preferred_element_type=jnp.float32)
                        + jnp.dot(g_lo, t0, preferred_element_type=jnp.float32))
            t1 = t_ref[1, r] if wid is None else t_ref[1, r, :, :wid]
            return (jnp.dot(g_hi, t0, preferred_element_type=jnp.float32)
                    + jnp.dot(g_hi, t1, preferred_element_type=jnp.float32)
                    + jnp.dot(g_lo, t0, preferred_element_type=jnp.float32))

        def stage2_x(g_re, g_im, gi, wid=None):
            # cat_gk: one double-K matmul [M, 256] @ [[A];[B]] per (gi, pass)
            # instead of two K=128 ones — same MACs, half the matmul ops, and
            # the K-tile accumulation order keeps the association (re taps then
            # im taps) so results match the two-matmul form to ~1 ulp.
            if cat_gk:
                g = jnp.concatenate([g_re, g_im], axis=1)
                return stage2_dot(g, t2a_ref, gi, wid)
            return (stage2_dot(g_re, t2a_ref, gi, wid)
                    + stage2_dot(g_im, t2b_ref, gi, wid))

        if batched_rolls:
            g_all_re = [build_g_all(p_res[k]) for k in range(tps)]
            g_all_im = [build_g_all(p_ims[k]) for k in range(tps)]

        if step_level:
            # Step-level rolls: roll/select ONCE per v over the whole step's
            # stage-1 output (128x fewer shuffle ops for the same bytes); every
            # G piece below is then a pure major-axis slice.
            m1 = m_tot - 1
            sl_lane = jax.lax.broadcasted_iota(jnp.int32, (n_res, m1, _LANE), 2)

            def sel_all(p3):                                   # [n_res, m_tot, 128]
                out = []
                for v in range(vper):
                    cut = hop * v
                    if cut == 0:
                        # v=0 needs no roll/select: keep the FULL m_tot rows.
                        # The m1-row truncation below exists only because rolled
                        # pieces read rows q and q+1; when hop == 128 (vper == 1,
                        # qu == adv) the last tile needs row m_tot-1, which the
                        # truncated form would clamp away.
                        out.append(p3)
                    else:
                        rolled = pltpu.roll(p3, _LANE - cut, 2)
                        out.append(jnp.where(sl_lane < _LANE - cut,
                                             rolled[:, 0:m1, :],
                                             rolled[:, 1:m_tot, :]))
                return out

            sel_re = sel_all(p_re_all)
            sel_im = sel_all(p_im_all)
            if vmaj:
                # v-major M layout: for a fixed roll phase v the G rows of ALL
                # tiles are contiguous in sel[v] (tile k reads rows
                # [k*wper, k*wper + wper) and adv_rows == wper), so ONE
                # 16-piece concat shared by every residue replaces the per-
                # residue 128-piece (v, k) assembly below; each residue's G is
                # then a free major-axis slice.  The M ordering becomes
                # p = v*(tps*wper) + k*wper + w and is restored to per-tile
                # (v, w) order by re-slicing the narrow [M, bands] tensor
                # after the band projection (tile_acc below).
                mrows = tps * wper
                g_cat_re = jnp.concatenate(
                    [sel_re[v][:, 0:mrows, :] for v in range(vper)], axis=1)
                g_cat_im = jnp.concatenate(
                    [sel_im[v][:, 0:mrows, :] for v in range(vper)], axis=1)

        # Width from the projection constants (out_ref may be the fused-select
        # cls output, whose lanes are not the band axis).
        rows_acc = jnp.zeros((tps * rows, proj_ref.shape[-1]), jnp.float32)
        v_by_r = {}

        def emit(r, v):
            nonlocal rows_acc
            v = jnp.where(jnp.isfinite(v), v, 0.0)
            if proj_concat:
                # Defer: one deep [M, 16*64] @ [16*64, bands] matmul after the
                # loop (8 full-depth K-tiles) instead of 16 shallow K=64 ones.
                v_by_r[r] = v
                return
            if aux3:
                vh, vl = split3(v)
                contrib = (jnp.dot(vh, proj_ref[0, r], preferred_element_type=jnp.float32)
                           + jnp.dot(vl, proj_ref[0, r], preferred_element_type=jnp.float32))
                if not aux2:
                    contrib = contrib + jnp.dot(vh, proj_ref[1, r],
                                                preferred_element_type=jnp.float32)
            else:
                contrib = jnp.dot(v, proj_ref[r], precision=hi,
                                  preferred_element_type=jnp.float32)
            rows_acc = rows_acc + contrib

        for gi in range(n_res):
            if vmaj:
                g_re = g_cat_re[gi]
                g_im = g_cat_im[gi]
            elif step_level:
                g_re = jnp.concatenate(
                    [sel_re[v][gi, k * adv_rows:k * adv_rows + wper, :]
                     for k in range(tps) for v in range(vper)], axis=0)
                g_im = jnp.concatenate(
                    [sel_im[v][gi, k * adv_rows:k * adv_rows + wper, :]
                     for k in range(tps) for v in range(vper)], axis=0)
            elif batched_rolls:
                g_re = jnp.concatenate([g_all_re[k][gi] for k in range(tps)], axis=0)
                g_im = jnp.concatenate([g_all_im[k][gi] for k in range(tps)], axis=0)
            else:
                g_re = jnp.concatenate([build_g(p_res[k][gi]) for k in range(tps)], axis=0)
                g_im = jnp.concatenate([build_g(p_ims[k][gi]) for k in range(tps)], axis=0)
            if dense_pairs:
                # Dense lane packing (no per-residue 64-lane granule padding):
                # pair residues carry [re_r | im_r | re_rc | im_rc] at k_max
                # stride in 192 lanes (singles the first 2*k_max of 128).  Q5
                # and the square are position-independent, and the deep
                # projection matmul's precomputed rows pair each bin's re- and
                # im-lane — so the kernel never slices the x lanes at all and
                # stage-2 N drops from 2048 to 1600 lanes per window.
                wid = _LANE if gi in (0, _A // 2) else t2a_ref.shape[-1]
                x = stage2_x(g_re, g_im, gi, wid)
                x = jnp.where(x > 0.0, x * inv_div, x)
                v = x * x
                v_by_r[gi] = jnp.where(jnp.isfinite(v), v, 0.0)
            elif conj_pairs and 0 < gi < _A // 2:
                # Conjugate pair (gi, 16-gi): G_{16-r} = conj(G_r) for real
                # input, so one G feeds both residues' stage-2 through paired
                # weights [A_r | A_rc] / [B_r | -B_rc] (weights built in the
                # wrapper); x lanes [0:128) are residue gi, [128:256) are 16-gi.
                x = stage2_x(g_re, g_im, gi)
                x = jnp.where(x > 0.0, x * inv_div, x)
                emit(gi, x[:, :half] ** 2 + x[:, half:_LANE] ** 2)
                emit(_A - gi, x[:, _LANE:_LANE + half] ** 2 + x[:, _LANE + half:] ** 2)
            else:
                wid = _LANE if conj_pairs else None   # singles: first 128 lanes
                x = stage2_x(g_re, g_im, gi, wid)
                x = jnp.where(x > 0.0, x * inv_div, x)
                emit(gi, x[:, :half] ** 2 + x[:, half:_LANE] ** 2)
        if proj_concat:
            v_cat = jnp.concatenate([v_by_r[r] for r in sorted(v_by_r)], axis=1)
            if aux3:
                vh, vl = split3(v_cat)
                rows_acc = (jnp.dot(vh, proj_ref[0], preferred_element_type=jnp.float32)
                            + jnp.dot(vl, proj_ref[0], preferred_element_type=jnp.float32))
                if not aux2:
                    rows_acc = rows_acc + jnp.dot(vh, proj_ref[1],
                                                  preferred_element_type=jnp.float32)
            else:
                rows_acc = jnp.dot(v_cat, proj_ref[:], precision=hi,
                                   preferred_element_type=jnp.float32)

        if vmaj:
            # Restore per-tile (v, w) row order by re-slicing the NARROW
            # post-projection tensor: tile k's v-piece sits at rows
            # [v*tps*wper + k*wper, +wper).  Same piece count as the shipped
            # G assembly but on [.., bands] f32 once per step instead of on
            # two [.., 128] planes per residue — ~72x less copied bytes.
            # Values are identical to the shipped layout (M-order permutes
            # rows of independent dot products), so everything downstream is
            # bit-exact.
            mrows = tps * wper

            def tile_acc(k):
                return jnp.concatenate(
                    [rows_acc[v * mrows + k * wper:v * mrows + (k + 1) * wper]
                     for v in range(vper)], axis=0)
        else:
            def tile_acc(k):
                return rows_acc[k * rows:(k + 1) * rows]

        # Un-permutation (x Haar row pass) applied per tile: the step-wide matrix
        # is block-diagonal with tps identical [rows, rows] blocks, so per-tile
        # matmuls do tps-x fewer MACs for identical results.
        def unperm(acc_k):
            if aux3:
                ah, al = split3(acc_k)
                out_k = (jnp.dot(perm_ref[0], ah, preferred_element_type=jnp.float32)
                         + jnp.dot(perm_ref[0], al, preferred_element_type=jnp.float32))
                if not two_pass:
                    out_k = out_k + jnp.dot(perm_ref[1], ah,
                                            preferred_element_type=jnp.float32)
                return out_k
            return jnp.dot(perm_ref[:], acc_k, precision=hi,
                           preferred_element_type=jnp.float32)

        out = jnp.concatenate([unperm(tile_acc(k)) for k in range(tps)], axis=0)
        if fuse_haar:
            if aux3:
                oh, ol = split3(out)
                out = (jnp.dot(oh, hcols_ref[0], preferred_element_type=jnp.float32)
                       + jnp.dot(ol, hcols_ref[0], preferred_element_type=jnp.float32))
                if not two_pass:
                    out = out + jnp.dot(oh, hcols_ref[1],
                                        preferred_element_type=jnp.float32)
            else:
                out = jnp.dot(out, hcols_ref[:], precision=hi,
                              preferred_element_type=jnp.float32)
        if pipe_select:
            # Stash this step's frames for the NEXT step's (overlapped) select;
            # the tail output carries each batch item's final step (revolving
            # same-block writes: the last one survives) so the wrapper can select
            # it outside the kernel — the lagged index map never emits it.
            t_frames = jnp.concatenate(
                [jnp.transpose(out[k * rows:(k + 1) * rows, :], (1, 0))
                 for k in range(tps)], axis=0)              # [tps*32, 128]
            sel_scr[:] = t_frames
            if not tail_fold:
                tail_ref[0] = t_frames
            return
        if fuse_select:
            # In-kernel top-k sign selection: transpose each frame's [128, 32]
            # Haar tile to the select layout ([32 bands, 128 rows] = band-major,
            # handled by _select_body's flat-index formula) and emit rank-ordered
            # class codes directly — the coefficient tensor never leaves VMEM.
            from lbaudiodetective_tpu.ops.pallas.select_signs import _select_body

            t_frames = jnp.concatenate(
                [jnp.transpose(out[k * rows:(k + 1) * rows, :], (1, 0))
                 for k in range(tps)], axis=0)              # [tps*32, 128]
            out_ref[0] = _select_body(t_frames, tps, band_major=True)
            return
        out_ref[0] = out

    if pipe_select and tail_fold:
        # Extra final grid step is select-only: skip the matmuls.
        pl.when(pl.program_id(1) < n_steps)(_main)
    else:
        _main()


def v3_tiles_per_step(n_tiles: int) -> int:
    """The tps the v3 wrapper will pick for a given tile count."""
    return next(t for t in (8, 4, 2, 1) if n_tiles % t == 0)


@partial(jax.jit, static_argnames=("config", "n_rows", "interpret", "fuse_haar",
                                   "batched_rolls", "aux_bf16x3", "tps_override",
                                   "proj_concat", "conj_pairs", "fuse_select",
                                   "dense_pairs", "aux_two_pass", "cat_gk",
                                   "vmaj", "cost_hint", "pipe_select",
                                   "pipe_tail"))
def fused_band_rows_v3(audio: jnp.ndarray, config: FingerprintConfig,
                       n_rows: int, interpret: bool = False,
                       fuse_haar: bool = False,
                       batched_rolls: bool = False,
                       aux_bf16x3: bool | None = None,
                       tps_override: int | None = None,
                       proj_concat: bool = True,
                       conj_pairs: bool = True,
                       fuse_select: bool = False,
                       dense_pairs: bool = False,
                       aux_two_pass: bool = False,
                       cat_gk: bool = False,
                       vmaj: bool = False,
                       cost_hint: bool = False,
                       pipe_select: bool = False,
                       pipe_tail: str = "chain") -> jnp.ndarray:
    # dense_pairs is a MEASURED NEGATIVE on v5e (scripts/ab_dense.py): the
    # 22% stage-2 MAC cut (2048 -> 1600 lanes) times out at 26.0 ms vs 24.9
    # ms per 128 parity clips because N=192 matmuls do not run
    # proportionally faster than N=256 (MXU N-tile granularity) and the
    # deeper 1600-K projection adds cost.  Kept as a variant for re-testing
    # on hardware with finer N tiles; numerics validated (99.917% oracle bit
    # agreement, identical to the granule packing).
    """BlockSpec-pipelined fused rows: ``[B, T] -> [B, n_rows, bands]``.

    Same math as v2; audio arrives as two shifted regular block inputs per
    grid step instead of manual DMA (only valid because integer-hop tile
    starts are always 128-aligned)."""
    rpf = config.rows_per_frame
    window = config.window_size
    if not config.has_integer_hop:
        raise ValueError("v3 kernel requires an integer hop")
    hop = int(config.hop_in_processing_samples)
    if hop <= 0 or _LANE % hop:
        raise ValueError("v3 kernel requires the hop to divide 128")
    if window != _A * _LANE:
        raise ValueError("v3 kernel requires window_size == 2048")
    if n_rows % rpf or rpf % (_LANE // hop) or (rpf * hop) % _LANE:
        raise ValueError("unsupported geometry for the v3 kernel")
    n_tiles = n_rows // rpf
    batch = audio.shape[0]

    c16, s16, t2a, t2b, proj_perm, k_max, perm, h_cols_t = _v2_constants(
        config, fuse_haar)
    bands = config.pitch_step_count
    bf16x3 = (config.matmul_precision in ("high", "medium")) and not interpret
    two_pass = config.matmul_precision == "medium" and not interpret
    # Auxiliary matmuls (stage-1, projection, un-permutation, column Haar)
    # also run 3-pass bf16 by default when stage-2 does: same ~HIGH precision
    # at half the passes of the Mosaic HIGHEST fallback.
    aux3 = bf16x3 if aux_bf16x3 is None else (aux_bf16x3 and not interpret)
    conj = conj_pairs and not batched_rolls
    dense = dense_pairs and conj and proj_concat
    if conj:
        # Conjugate-pair symmetry (real input): stage-1 runs residues 0..8
        # only; each pair residue 16-r rides residue r's G through widened
        # stage-2 weights [A_r | A_rc] / [B_r | -B_rc].  Exact up to the
        # <=1-ulp difference between np.cos at theta and at 2*pi*a - theta
        # (we use r's column for both).
        n_res = _A // 2 + 1
        c16 = np.ascontiguousarray(c16[:, :n_res])
        s16 = np.ascontiguousarray(s16[:, :n_res])
        if dense:
            # Dense lane packing: drop the 64-lane-granule padding (k_max=43
            # useful of 64) by laying pair weights as [re_r | im_r | re_rc |
            # im_rc] at k_max stride (172 -> 192 lanes vs 256) and singles as
            # [re | im] in 128.  The re^2+im^2 energy pairing moves into the
            # deep projection matmul, whose rows carry each bin's band
            # weight at BOTH its re- and im-lane — stage-2 N drops 2048 ->
            # 1600 lanes/window and the kernel stops slicing x entirely.
            from lbaudiodetective_tpu.ops.pallas.fused_rows import (
                _kernel_constants)

            _, _, t_re, t_im, proj_flat, k2 = _kernel_constants(config)
            assert k2 == k_max
            b_len = t_re.shape[1]
            npair = -(-4 * k_max // 64) * 64              # 172 -> 192
            t2a_d = np.zeros((n_res, b_len, npair), np.float32)
            t2b_d = np.zeros_like(t2a_d)
            proj_blocks = []
            k = k_max
            for gi in range(n_res):
                rc = _A - gi
                t2a_d[gi, :, 0:k] = t_re[gi]
                t2a_d[gi, :, k:2 * k] = t_im[gi]
                t2b_d[gi, :, 0:k] = -t_im[gi]
                t2b_d[gi, :, k:2 * k] = t_re[gi]
                width = _LANE if gi in (0, _A // 2) else npair
                pb = np.zeros((width, bands), np.float32)
                pb[0:k] = proj_flat[gi * k:(gi + 1) * k]       # re lanes
                pb[k:2 * k] = proj_flat[gi * k:(gi + 1) * k]   # im lanes
                if 0 < gi < _A // 2:
                    t2a_d[gi, :, 2 * k:3 * k] = t_re[rc]
                    t2a_d[gi, :, 3 * k:4 * k] = t_im[rc]
                    t2b_d[gi, :, 2 * k:3 * k] = t_im[rc]
                    t2b_d[gi, :, 3 * k:4 * k] = -t_re[rc]
                    pb[2 * k:3 * k] = proj_flat[rc * k:(rc + 1) * k]
                    pb[3 * k:4 * k] = proj_flat[rc * k:(rc + 1) * k]
                proj_blocks.append(pb)
            t2a, t2b = t2a_d, t2b_d
            proj_perm = np.concatenate(proj_blocks, axis=0)    # [1600, bands]
        else:
            nlan = t2a.shape[2]
            t2a_p = np.zeros((n_res, t2a.shape[1], 2 * nlan), np.float32)
            t2b_p = np.zeros_like(t2a_p)
            for gi in range(n_res):
                t2a_p[gi, :, :nlan] = t2a[gi]
                t2b_p[gi, :, :nlan] = t2b[gi]
                if 0 < gi < _A // 2:
                    t2a_p[gi, :, nlan:] = t2a[_A - gi]
                    t2b_p[gi, :, nlan:] = -t2b[_A - gi]
            t2a, t2b = t2a_p, t2b_p
    vmaj_on = vmaj and not batched_rolls
    if tps_override is not None:
        if n_tiles % tps_override:
            raise ValueError("tps_override must divide the tile count")
        tps = tps_override
    else:
        # Tiles per grid step: the dominant cost is per-step pipeline
        # machinery (see scripts/bisect_v3_cost.py 'floor' variant), so
        # fatter steps win while VMEM allows; 8 beats 4 beats 16 measured.
        tps = v3_tiles_per_step(n_tiles)
    # Mosaic requires a block's sublane dim to divide by 8 (or equal the
    # full array dim): the in-kernel select's cls out-spec is (1, tps, 128),
    # so tps in {1, 2, 4} (odd tile counts) cannot emit the select in-kernel
    # on hardware (measured on-chip: scripts/probe_proc_splitk.py).  The
    # bucket-8 extraction path always lands on tps=8; for direct callers,
    # fall back to the rows-only kernel + the standalone select (same cls
    # contract, element-exact — the standard two-stage path).  Interpret
    # mode keeps the in-kernel paths (no Mosaic constraint) so the lag-axis
    # exactness tests still cover tps=4/2/1.
    select_outside = ((pipe_select or fuse_select) and tps % 8 != 0
                      and not interpret)
    if select_outside:
        pipe_select = False
        fuse_select = False
    cat = cat_gk and conj and not dense
    if cat:
        # Stack A over B on the contraction axis: x = [g_re | g_im] @ [A; B].
        t2a = np.concatenate([t2a, t2b], axis=1)
        t2b = np.zeros((1, 1, 1), np.float32)            # unused placeholder
    if bf16x3:
        t2a = np.stack(_split_bf16(t2a))
        t2b = np.stack(_split_bf16(t2b))
    if proj_concat and not dense:
        proj_perm = proj_perm.reshape(_A * proj_perm.shape[1],
                                      proj_perm.shape[2])
    if aux3:
        c16 = np.stack(_split_bf16(c16))
        s16 = np.stack(_split_bf16(s16))
        proj_perm = np.stack(_split_bf16(proj_perm))
        perm = np.stack(_split_bf16(perm))
        h_cols_t = np.stack(_split_bf16(h_cols_t))

    n_steps = n_tiles // tps

    adv_rows = (rpf * hop) // _LANE                     # rows per tile advance
    span_rows = -(-(hop * (rpf - 1) + window) // _LANE) + 1
    u_rows = adv_rows * tps                             # block height (rows)
    need_span = (tps - 1) * adv_rows + span_rows
    n_blk = -(-need_span // u_rows) + (1 if need_span % u_rows else 0)
    n_blk = max(2, -(-need_span // u_rows))
    # Block k of step tt covers rows [(tt+k)*u, (tt+k+1)*u); together they
    # span >= need_span rows from the step base.
    if n_blk * u_rows < need_span:
        n_blk += 1
    n_blocks_needed = n_steps + n_blk
    t_pad_rows = n_blocks_needed * u_rows
    t_pad = max(t_pad_rows * _LANE, audio.shape[1])
    t_pad += (-t_pad) % (u_rows * _LANE)
    if t_pad != audio.shape[1]:
        audio = jnp.pad(audio, ((0, 0), (0, t_pad - audio.shape[1])))
    audio3d = audio.reshape(batch, t_pad // (u_rows * _LANE), u_rows, _LANE)

    def blk_spec(k):
        return pl.BlockSpec((1, 1, u_rows, _LANE),
                            lambda b, t, k=k: (b, t + k, 0, 0),
                            memory_space=pltpu.VMEM)

    if pipe_select and n_steps < 2 and batch < 2:
        # Nothing to lag behind: a single grid step total degenerates to
        # the serial in-kernel select (measured slower than the standalone
        # select kernel for that shape) — use the plain fused path instead.
        pipe_select = False
        fuse_select = True
    if pipe_tail not in ("stitch", "fold", "chain"):
        raise ValueError("pipe_tail must be 'stitch', 'fold' or 'chain'")
    # Lag axis: the innermost grid axis when clips span several steps;
    # otherwise lag along the batch axis (proc hop / short clips: one step
    # per clip, so consecutive grid steps ARE consecutive clips).  The
    # batch lag needs sequential batch semantics ("arbitrary") so the t=0
    # garbage write is overwritten by its successor before the block
    # flushes.
    #
    # Multi-step tail handling (pipe_tail): "stitch" and "chain" both keep
    # the select and the matmuls in ONE straight-line kernel body (that is
    # what lets Mosaic interleave the VPU bitonic under the MXU drains —
    # the on-chip 4,572 clips/s round-3 measurement); they differ in which
    # steps the lagged map never emits.  "stitch" selects each clip's final
    # step in a standalone kernel outside the grid; "chain" (default, round
    # 5) crosses clip boundaries so only the GLOBAL final step is stitched —
    # measured 53.0 vs 55.6 ms per 256 parity clips, bit-identical
    # (scripts/probe_chain_e2e.py).  "fold" (tail_fold) instead runs one
    # extra select-only grid step per clip with the matmuls pl.when-gated
    # off; the two pl.when regions serialise the VPU select against the MXU
    # matmuls and measured 3,594-3,684 clips/s on-chip
    # (scripts/queue_logs_r04 q6/q7) — kept as a variant for A/B.
    tail_fold = pipe_select and n_steps >= 2 and pipe_tail == "fold"
    # "chain": the lag crosses clip boundaries — step (b, 0) emits the select
    # of clip b-1's FINAL step (the scratch persists across every grid
    # iteration, so the kernel body is identical to "stitch").  Only the
    # global-final step is left for the standalone tail kernel: the stitched
    # select work drops from one step per CLIP (1/n_steps of all select
    # work, ~3 ms/256 parity clips) to one step per DISPATCH.  Requires
    # sequential batch semantics, like the batch lag.
    tail_chain = pipe_select and n_steps >= 2 and pipe_tail == "chain"
    tail_stitch_t = (pipe_select and n_steps >= 2
                     and not tail_fold and not tail_chain)
    scratch_shapes = None
    if pipe_select:
        if not fuse_haar or rpf != 128 or bands != 32:
            raise ValueError("pipe_select requires fuse_haar with the "
                             "128-row / 32-band frame geometry")
        if tail_fold:
            # Folded: step t emits the select of step t-1's frames; the
            # grid runs one EXTRA (select-only) step per clip, so every
            # block 0..n_steps-1 is written and no tail stitch is needed
            # (the t=0 write is pl.when-gated off in the kernel).
            out_specs = pl.BlockSpec((1, tps, _LANE),
                                     lambda b, t: (b, jnp.maximum(t - 1, 0), 0),
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((batch, n_tiles, _LANE),
                                             jnp.int32)
        elif tail_chain:
            def _prev_step(b, t):
                # Global-previous grid step in (batch, t) iteration order,
                # clamped at (0, 0): the very first iteration's garbage
                # select lands in block (0, 0) and is overwritten by its
                # successor before the revolving window flushes.
                bb = jnp.where(t > 0, b, jnp.maximum(b - 1, 0))
                tt = jnp.where(t > 0, t - 1,
                               jnp.where(b > 0, n_steps - 1, 0))
                return (bb, tt, 0)

            out_specs = [
                pl.BlockSpec((1, tps, _LANE), _prev_step,
                             memory_space=pltpu.VMEM),
                # Global-final step's frames (last write wins) — selected by
                # the standalone tail kernel below.
                pl.BlockSpec((1, tps * 32, _LANE), lambda b, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape = [
                jax.ShapeDtypeStruct((batch, n_tiles, _LANE), jnp.int32),
                jax.ShapeDtypeStruct((1, tps * 32, _LANE), jnp.float32),
            ]
        elif tail_stitch_t:
            out_specs = [
                # Lagged along the grid's t axis: step t emits the select of
                # step t-1's frames; the t=0 garbage write lands in block 0
                # and is overwritten by t=1's before the revolving window
                # flushes (same block index).
                pl.BlockSpec((1, tps, _LANE),
                             lambda b, t: (b, jnp.maximum(t - 1, 0), 0),
                             memory_space=pltpu.VMEM),
                # Final-step frames, one block per batch item (last write
                # wins) — selected by the standalone tail kernel below.
                pl.BlockSpec((1, tps * 32, _LANE), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape = [
                jax.ShapeDtypeStruct((batch, n_tiles, _LANE), jnp.int32),
                jax.ShapeDtypeStruct((batch, tps * 32, _LANE), jnp.float32),
            ]
        else:
            cls_spec = pl.BlockSpec((1, tps, _LANE),
                                    lambda b, t: (jnp.maximum(b - 1, 0), t, 0),
                                    memory_space=pltpu.VMEM)
            tail_spec = pl.BlockSpec((1, tps * 32, _LANE),
                                     lambda b, t: (0, 0, 0),
                                     memory_space=pltpu.VMEM)
            tail_shape = (1, tps * 32, _LANE)
            out_specs = [
                # Lagged along the batch axis: clip b's select runs under
                # clip b+1's matmuls; the first write lands in block 0 and
                # is overwritten by its successor before the revolving
                # window flushes (same block index).
                cls_spec,
                # Final-clip frames (last write wins).
                tail_spec,
            ]
            out_shape = [
                jax.ShapeDtypeStruct((batch, n_tiles, _LANE), jnp.int32),
                jax.ShapeDtypeStruct(tail_shape, jnp.float32),
            ]
        scratch_shapes = [pltpu.VMEM((tps * 32, _LANE), jnp.float32)]
    elif fuse_select:
        if not fuse_haar or rpf != 128 or bands != 32:
            raise ValueError("fuse_select requires fuse_haar with the "
                             "128-row / 32-band frame geometry")
        out_specs = pl.BlockSpec((1, tps, _LANE), lambda b, t: (b, t, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((batch, n_tiles, _LANE), jnp.int32)
    else:
        out_specs = pl.BlockSpec((1, tps * rpf, bands), lambda b, t: (b, t, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((batch, n_rows, bands), jnp.float32)
    grid_spec = pl.GridSpec(
        grid=(batch, n_steps + 1 if (pipe_select and tail_fold) else n_steps),
        in_specs=[blk_spec(k) for k in range(n_blk)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes or (),
    )
    kernel = partial(_rows_kernel_v3, span_rows=span_rows, window=window,
                     rows=rpf, hop=hop, adv_rows=adv_rows,
                     inv_div=1.0 / config.spectrum_scale_divisor,
                     k_max=k_max, precision=_pallas_precision(config.precision),
                     fuse_haar=fuse_haar, bf16x3=bf16x3, tps=tps, n_blk=n_blk,
                     batched_rolls=batched_rolls, aux3=aux3,
                     proj_concat=proj_concat, conj_pairs=conj,
                     two_pass=two_pass, fuse_select=fuse_select,
                     dense_pairs=dense,
                     aux2=(two_pass or aux_two_pass) and not interpret,
                     cat_gk=cat, vmaj=vmaj_on, pipe_select=pipe_select,
                     tail_fold=tail_fold, n_steps=n_steps)
    cost = None
    if cost_hint:
        # Scheduler hint (pl.CostEstimate): stage-2 dominates at ~524K MACs
        # per window x 3 bf16 passes; bytes = the double-read audio blocks +
        # the weight tensors once per step + the output.
        passes = 3 if bf16x3 else 1
        shp = out_shape[0].shape if isinstance(out_shape, list) else out_shape.shape
        cost = pl.CostEstimate(
            flops=2 * 524_000 * n_rows * batch * passes,
            bytes_accessed=(audio3d.size * 4 * n_blk
                            + batch * n_steps * (c16.size + s16.size
                                                 + t2a.size + t2b.size) * 4
                            + int(np.prod(shp)) * 4),
            transcendentals=0)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # t-axis lags (fold/stitch) keep the batch axis parallel; the
            # batch lag and the cross-clip chain need sequential batch
            # semantics so the scratch carry crosses clip boundaries.
            dimension_semantics=(("parallel", "arbitrary") if not pipe_select
                                 or tail_fold or tail_stitch_t
                                 else ("arbitrary", "arbitrary"))),
    )(*([audio3d] * n_blk), jnp.asarray(c16), jnp.asarray(s16),
      jnp.asarray(t2a), jnp.asarray(t2b), jnp.asarray(proj_perm),
      jnp.asarray(perm), jnp.asarray(h_cols_t))
    if select_outside:
        # Odd-tps hardware fallback (see above): standalone select over the
        # rows-only output, emitting the same [batch, n_tiles, 128] cls the
        # in-kernel select paths return.
        from lbaudiodetective_tpu.ops.pallas.select_signs import (
            select_sign_classes_padded)

        flat = out.reshape(batch * n_tiles, rpf * bands)
        return select_sign_classes_padded(flat).reshape(batch, n_tiles, _LANE)
    if not pipe_select:
        return out
    if tail_fold:
        # The extra select-only grid step emitted every block: done.
        return out
    # Stitch: select the frames the lagged map never emitted (t-lag: each
    # clip's final step; batch lag: the final clip's single step) in a small
    # standalone kernel — 1/n_steps (resp. 1/batch) of the select work; the
    # rest ran overlapped with the matmuls — and stitch them over the
    # unwritten blocks.
    cls, tail = out
    from lbaudiodetective_tpu.ops.pallas.select_signs import _select_body

    # Batch several clips' final steps per grid step: fewer, fatter steps
    # amortise the per-step pipeline overhead (frames stay in order — the
    # [bpb, tps*32, 128] block reshapes to bpb*tps consecutive frames).
    n_tail = tail.shape[0]
    bpb = next(b for b in (4, 2, 1) if n_tail % b == 0)

    def _tail_kernel(x_ref, o_ref):
        x = x_ref[:].reshape(bpb * tps * 32, _LANE)
        o_ref[:] = _select_body(x, bpb * tps, band_major=True).reshape(
            bpb, tps, _LANE)

    tail_cls = pl.pallas_call(
        _tail_kernel,
        grid=(n_tail // bpb,),
        in_specs=[pl.BlockSpec((bpb, tps * 32, _LANE), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((bpb, tps, _LANE), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tail, tps, _LANE), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tail)
    if tail_stitch_t:
        # The unwritten block of every clip is its LAST step's tiles.
        return jax.lax.dynamic_update_slice(cls, tail_cls,
                                            (0, n_tiles - tps, 0))
    if tail_chain:
        # Cross-clip chain: only the GLOBAL last step is unwritten.
        return jax.lax.dynamic_update_slice(
            cls, tail_cls, (batch - 1, n_tiles - tps, 0))
    # Batch lag: the unwritten block is the LAST batch item's (single) step.
    return jax.lax.dynamic_update_slice(cls, tail_cls, (batch - 1, 0, 0))
