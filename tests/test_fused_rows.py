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
