"""Native C++ decoder/resampler vs the NumPy reference implementations."""

import numpy as np
import pytest

from lbaudiodetective_tpu.io import caf
from lbaudiodetective_tpu.io.native import binding as native
from lbaudiodetective_tpu.io.resample import design_polyphase_bank
from tests.conftest import corpus_path

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native decoder not built")


@pytest.mark.parametrize("name", ["BlackBird", "Crow", "BlackBird_rec"])
def test_native_decode_matches_numpy(name):
    x_np, sr_np = caf.read_caf(corpus_path(name))
    x_c, sr_c = native.read_caf(corpus_path(name))
    assert sr_c == sr_np
    assert x_c.shape == x_np.shape
    np.testing.assert_array_equal(x_c, x_np)  # integer DSP: bit-exact


def test_native_resample_matches_numpy():
    from lbaudiodetective_tpu.io.resample import polyphase_plan

    rng = np.random.default_rng(40)
    x = (rng.standard_normal(44100) * 0.3).astype(np.float32)
    up, down = 1378, 11025
    bank = design_polyphase_bank(up, down)
    # NumPy path (bypassing the native fast path inside resample_rational).
    n_out, base, phase = polyphase_plan(len(x), up, down, bank)
    taps = bank.shape[1]
    xp = np.concatenate([np.zeros(taps, np.float32), x, np.zeros(taps, np.float32)])
    idx = (base + taps)[:, None] + np.arange(taps)[None, :]
    expected = np.einsum("nt,nt->n", xp[idx], bank[phase]).astype(np.float32)
    got = native.resample(x, bank, up, down)
    np.testing.assert_allclose(got, expected, atol=2e-6)


def test_native_decode_error_paths(tmp_path):
    bad = tmp_path / "bad.caf"
    bad.write_bytes(b"RIFFnotacaf")
    with pytest.raises(ValueError):
        native.read_caf(str(bad))
    with pytest.raises(ValueError):
        native.read_caf(str(tmp_path / "missing.caf"))
