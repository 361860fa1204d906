"""Fused-rows Pallas kernel vs the XLA spectral path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops import spectral
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.pallas.fused_rows import fused_band_rows


@pytest.mark.parametrize("hop_domain,integer_hop", [
    ("file", True), ("file", False), ("proc", True)])
def test_fused_rows_matches_xla(hop_domain, integer_hop):
    cfg = FingerprintConfig(hop_domain=hop_domain, integer_hop=integer_hop)
    n_rows = 256
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(50)
    audio = jnp.asarray((rng.standard_normal((2, t_pad)) * 0.1).astype(np.float32))
    got = np.asarray(fused_band_rows(audio, cfg, n_rows, interpret=True))
    starts = spectral.window_starts(cfg, n_rows)
    wins = np.asarray(audio)[:, starts[:, None] + np.arange(cfg.window_size)[None, :]]
    exp = np.asarray(jax.jit(lambda w: spectral.band_energies(w, cfg))(jnp.asarray(wins)))
    np.testing.assert_allclose(got, exp, rtol=1e-4,
                               atol=1e-6 * float(np.abs(exp).max()))


def _xla_coeffs(cfg, audio, n_rows):
    from lbaudiodetective_tpu.ops.haar import haar_2d

    starts = spectral.window_starts(cfg, n_rows)
    wins = spectral.frame_windows(audio, starts, cfg.window_size)
    rows = spectral.band_energies(wins, cfg)
    b = audio.shape[0]
    return np.asarray(haar_2d(rows.reshape(b, n_rows // 128, 128, 32),
                              precision=cfg.precision)).reshape(b, n_rows, 32)


@pytest.mark.parametrize("stride_cfg,n_rows", [
    (dict(), 256),                                      # parity hop 8
    (dict(hop_domain="proc"), 256),                     # deployment hop 64
    (dict(hop_domain="proc", analysis_stride=128), 256),  # hop 128, vper=1
])
def test_v3_kernel_matches_xla(stride_cfg, n_rows):
    """CI coverage of the SHIPPED v3 path (step-level stage-1, conjugate
    pairs, proj_concat, fused Haar) in interpret mode, including the
    hop == 128 geometry where qu == adv (the v=0 slice must not clamp)."""
    from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

    cfg = FingerprintConfig(**stride_cfg)
    hop = cfg.hop_in_processing_samples
    if not (cfg.has_integer_hop and 128 % int(hop) == 0
            and cfg.rows_per_frame % (128 // int(hop)) == 0):
        pytest.skip("geometry not eligible for v3")
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(51)
    audio = jnp.asarray((np.cumsum(rng.standard_normal((2, t_pad)), axis=1)
                         * 0.01).astype(np.float32))
    got = np.asarray(fused_band_rows_v3(audio, cfg, n_rows, interpret=True,
                                        fuse_haar=True))
    exp = _xla_coeffs(cfg, audio, n_rows)
    scale = float(np.abs(exp).max())
    np.testing.assert_allclose(got, exp, rtol=5e-4, atol=3e-6 * scale)
    # conj_pairs must be exactly the same arithmetic re-association
    no_conj = np.asarray(fused_band_rows_v3(audio, cfg, n_rows, interpret=True,
                                            fuse_haar=True, conj_pairs=False))
    np.testing.assert_allclose(got, no_conj, rtol=1e-6,
                               atol=1e-7 * scale)


def test_fused_rows_span_alignment():
    """The DMA span must be sublane-aligned (multiple of 8 rows) — a
    non-multiple span hard-faults the TPU DMA engine (scripts/bisect_dma.py)."""
    cfg = FingerprintConfig()
    import lbaudiodetective_tpu.ops.pallas.fused_rows as fr

    starts = cfg.row_starts(256).astype(np.int64)
    tile_first = starts.reshape(2, 128)[:, 0]
    tile_last = starts.reshape(2, 128)[:, -1]
    base_row = tile_first // 128
    span = int(np.max((tile_last - base_row * 128 + cfg.window_size) // 128)) + 2
    span = -(-span // 8) * 8
    assert span % 8 == 0


def test_v3_fuse_select_matches_two_stage():
    """The in-kernel select (fuse_select, band-major tie-break index) must be
    element-exact vs the standalone select kernel over the same coefficients
    — this is the default TPU extraction path for multi-step grids."""
    from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3
    from lbaudiodetective_tpu.ops.pallas.select_signs import select_sign_classes

    cfg = FingerprintConfig()
    n_rows = 16 * 128
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(52)
    audio = jnp.asarray((np.cumsum(rng.standard_normal((2, t_pad)), axis=1)
                         * 0.01).astype(np.float32))
    coeffs = fused_band_rows_v3(audio, cfg, n_rows, interpret=True,
                                fuse_haar=True)
    cls_two = np.asarray(select_sign_classes(
        jnp.asarray(np.asarray(coeffs).reshape(-1, 4096)), f_blk=8,
        interpret=True))
    cls_fused = np.asarray(fused_band_rows_v3(
        audio, cfg, n_rows, interpret=True, fuse_haar=True,
        fuse_select=True)).reshape(-1, 128)
    np.testing.assert_array_equal(cls_fused, cls_two)
    # pipe_select (the shipped multi-step TPU path): the one-step-lagged
    # select + revolving-block overwrite + outside tail stitch must be
    # element-exact too.  16 tiles at tps=8 -> 2 grid steps per clip, 2
    # clips: exercises the lag, the t=0 overwrite, the batch boundary, and
    # the stitched final block.
    cls_pipe = np.asarray(fused_band_rows_v3(
        audio, cfg, n_rows, interpret=True, fuse_haar=True,
        pipe_select=True)).reshape(-1, 128)
    np.testing.assert_array_equal(cls_pipe, cls_two)


def test_v3_pipe_select_batch_lag():
    """Single-step-per-clip grids (proc hop) lag the select along the BATCH
    axis: clip b's select runs under clip b+1's matmuls.  Element-exact vs
    the standalone select kernel, including the last clip's tail stitch."""
    from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3
    from lbaudiodetective_tpu.ops.pallas.select_signs import select_sign_classes

    cfg = FingerprintConfig(hop_domain="proc")
    n_rows = 8 * 128                                     # 1 grid step (tps=8)
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(54)
    audio = jnp.asarray((np.cumsum(rng.standard_normal((5, t_pad)), axis=1)
                         * 0.01).astype(np.float32))
    coeffs = fused_band_rows_v3(audio, cfg, n_rows, interpret=True,
                                fuse_haar=True)
    cls_two = np.asarray(select_sign_classes(
        jnp.asarray(np.asarray(coeffs).reshape(-1, 4096)), f_blk=8,
        interpret=True))
    cls_pipe = np.asarray(fused_band_rows_v3(
        audio, cfg, n_rows, interpret=True, fuse_haar=True,
        pipe_select=True)).reshape(-1, 128)
    np.testing.assert_array_equal(cls_pipe, cls_two)


def _pipe_select_tail_variants_body():
    """All multi-step tail handlings are element-exact: "stitch" (straight-
    line select+matmul body, each clip's final step selected outside the
    grid), "fold" (extra pl.when-gated select-only grid step per clip) and
    "chain" (the lag crosses clip boundaries; only the global-final step is
    selected outside)."""
    from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3
    from lbaudiodetective_tpu.ops.pallas.select_signs import select_sign_classes

    cfg = FingerprintConfig()
    n_rows = 24 * 128                                    # 3 grid steps (tps=8)
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(56)
    audio = jnp.asarray((np.cumsum(rng.standard_normal((2, t_pad)), axis=1)
                         * 0.01).astype(np.float32))
    coeffs = fused_band_rows_v3(audio, cfg, n_rows, interpret=True,
                                fuse_haar=True)
    cls_two = np.asarray(select_sign_classes(
        jnp.asarray(np.asarray(coeffs).reshape(-1, 4096)), f_blk=8,
        interpret=True))
    for pipe_tail in ("stitch", "fold", "chain"):
        cls_pipe = np.asarray(fused_band_rows_v3(
            audio, cfg, n_rows, interpret=True, fuse_haar=True,
            pipe_select=True, pipe_tail=pipe_tail)).reshape(-1, 128)
        np.testing.assert_array_equal(cls_pipe, cls_two)


def test_v3_pipe_select_tail_variants():
    _run_pipe_select_body_in_subprocess("_pipe_select_tail_variants_body")


def _pipe_select_small_tps_body():
    """pipe_select at tps<8 geometries (tile counts not divisible by 8):
    both lag axes must stay element-exact.  Odd tile counts force tps=1,
    which real corpus clips hit whenever the subfingerprint bucket is odd."""
    from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import (
        fused_band_rows_v3, v3_tiles_per_step)
    from lbaudiodetective_tpu.ops.pallas.select_signs import select_sign_classes

    cases = [
        (4, 3),     # tps=4, n_steps=1 -> batch lag at tps=4
        (12, 2),    # tps=4, n_steps=3 -> time lag at tps=4
        (2, 3),     # tps=2, n_steps=1 -> batch lag at tps=2
        (3, 2),     # tps=1, n_steps=3 -> time lag at tps=1 (odd tile counts —
                    # the COMMON real-clip case: any odd subfingerprint bucket)
    ]
    for n_tiles, b in cases:
        cfg = FingerprintConfig()
        n_rows = n_tiles * 128
        t_pad = required_padded_length(cfg, n_rows)
        rng = np.random.default_rng(55 + n_tiles)
        audio = jnp.asarray((np.cumsum(rng.standard_normal((b, t_pad)), axis=1)
                             * 0.01).astype(np.float32))
        coeffs = fused_band_rows_v3(audio, cfg, n_rows, interpret=True,
                                    fuse_haar=True)
        cls_two = np.asarray(select_sign_classes(
            jnp.asarray(np.asarray(coeffs).reshape(-1, 4096)),
            f_blk=v3_tiles_per_step(n_tiles), interpret=True))
        cls_pipe = np.asarray(fused_band_rows_v3(
            audio, cfg, n_rows, interpret=True, fuse_haar=True,
            pipe_select=True)).reshape(-1, 128)
        np.testing.assert_array_equal(cls_pipe, cls_two)
        if n_tiles // v3_tiles_per_step(n_tiles) >= 2:
            # Multi-step geometries also have the folded- and chained-tail
            # variants.
            for tail in ("fold", "chain"):
                cls_t = np.asarray(fused_band_rows_v3(
                    audio, cfg, n_rows, interpret=True, fuse_haar=True,
                    pipe_select=True, pipe_tail=tail)).reshape(-1, 128)
                np.testing.assert_array_equal(cls_t, cls_two)


def test_v3_pipe_select_small_tps():
    _run_pipe_select_body_in_subprocess("_pipe_select_small_tps_body")


def _pipe_select_multi_step_body():
    """pipe_select across >2 grid steps and an odd batch: every interior
    block comes from the lagged path, only the last from the tail stitch."""
    from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3
    from lbaudiodetective_tpu.ops.pallas.select_signs import select_sign_classes

    cfg = FingerprintConfig()
    n_rows = 32 * 128                                    # 4 grid steps (tps=8)
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(53)
    audio = jnp.asarray((np.cumsum(rng.standard_normal((3, t_pad)), axis=1)
                         * 0.01).astype(np.float32))
    coeffs = fused_band_rows_v3(audio, cfg, n_rows, interpret=True,
                                fuse_haar=True)
    cls_two = np.asarray(select_sign_classes(
        jnp.asarray(np.asarray(coeffs).reshape(-1, 4096)), f_blk=8,
        interpret=True))
    cls_pipe = np.asarray(fused_band_rows_v3(
        audio, cfg, n_rows, interpret=True, fuse_haar=True,
        pipe_select=True)).reshape(-1, 128)
    np.testing.assert_array_equal(cls_pipe, cls_two)


def _run_pipe_select_body_in_subprocess(body_name: str):
    """Run a pipe_select test body in a FRESH subprocess.

    This round's jaxlib segfaults on the interpret-mode pipe_select program
    family in any process that has already compiled many other programs —
    the fault moved between `backend_compile_and_load`,
    `executable.serialize()` (cache put) and `deserialize_executable`
    (cache get) across runs (memory corruption in the XLA CPU client, not
    repo code; host RAM is free and the same bodies always pass in a fresh
    process).  A subprocess with the persistent cache off is the only
    configuration that has never crashed, at the cost of recompiling the
    programs per run.  First seen on `_pipe_select_multi_step_body`;
    `_pipe_select_small_tps_body` started crashing the same way later in
    the round, so every body in the family runs isolated."""
    import os
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    for p in (str(repo), str(repo / "tests")):
        if p not in parts:
            parts.append(p)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    script = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
              f"import test_fused_rows as t; t.{body_name}(); "
              "print('PIPE_SELECT_BODY_OK')")
    proc = subprocess.run([sys.executable, "-c", script], cwd=str(repo),
                          env=env, capture_output=True, text=True,
                          timeout=1200)
    assert proc.returncode == 0 and "PIPE_SELECT_BODY_OK" in proc.stdout, (
        f"subprocess rc={proc.returncode}\n--- stdout ---\n{proc.stdout[-2000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}")


def test_v3_pipe_select_multi_step():
    _run_pipe_select_body_in_subprocess("_pipe_select_multi_step_body")


@pytest.mark.parametrize("stride_cfg,n_rows", [
    (dict(), 256),                                      # parity hop 8
    (dict(hop_domain="proc"), 256),                     # deployment hop 64
    (dict(hop_domain="proc", analysis_stride=128), 256),  # hop 128, vper=1
])
def test_v3_vmaj_matches_shipped(stride_cfg, n_rows):
    """v-major G assembly (shared 16-piece concat + narrow post-projection
    re-slice) must reproduce the shipped layout: the M reorder only
    permutes rows of independent dot products and the re-slice restores
    them before the unchanged per-tile perm/Haar matmuls.  Without the
    Haar pass this is bit-exact even in interpret mode; with it, CPU XLA
    may pick a different dot reduction strategy for the concat-provenance
    operand (~1 ulp) — on the real TPU the MXU reduction order is fixed
    and scripts/ab_vmaj.py measured 1.000 sign-class agreement."""
    from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3

    cfg = FingerprintConfig(**stride_cfg)
    hop = cfg.hop_in_processing_samples
    if not (cfg.has_integer_hop and 128 % int(hop) == 0
            and cfg.rows_per_frame % (128 // int(hop)) == 0):
        pytest.skip("geometry not eligible for v3")
    t_pad = required_padded_length(cfg, n_rows)
    rng = np.random.default_rng(53)
    audio = jnp.asarray((np.cumsum(rng.standard_normal((2, t_pad)), axis=1)
                         * 0.01).astype(np.float32))
    raw0 = np.asarray(fused_band_rows_v3(audio, cfg, n_rows, interpret=True))
    raw1 = np.asarray(fused_band_rows_v3(audio, cfg, n_rows, interpret=True,
                                         vmaj=True))
    np.testing.assert_array_equal(raw0, raw1)
    h0 = np.asarray(fused_band_rows_v3(audio, cfg, n_rows, interpret=True,
                                       fuse_haar=True))
    h1 = np.asarray(fused_band_rows_v3(audio, cfg, n_rows, interpret=True,
                                       fuse_haar=True, vmaj=True))
    np.testing.assert_allclose(h1, h0, rtol=1e-5,
                               atol=1e-6 * float(np.abs(h0).max()))
