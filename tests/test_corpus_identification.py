"""Corpus identification matrices with REAL assertions.

The reference's five XCTest identification tests log results but assert
nothing (XCTAssertFalse(false,...), LBAudioDetectiveTests.m:88); here the
diagonal-wins criterion and the published score structure (essay §4.2,
Figures 24-28) are enforced.  Expected values are goldens of this framework,
cross-checked against the essay:

  suite   ours                      essay (2013 reference)
  _eql    10/10, diag 56.7-99.3     10/10, diag 92.7-98.9
  _dif    2/10,  diag 50.6-54.0     1/10,  diag 49.5-53.9
  _blu1   8/10,  diag 52.7-79.0     diag 52.7-75.5 (Crow max)
  _blu2   6/10,  diag 51.6-75.1     diag 50.5-72.7 (Crow max)
  _rec    5/10,  diag 50.9-56.9     2/10,  diag 49.6-53.4
"""

import pathlib

import numpy as np
import pytest

from tests.conftest import BIRDS, CACHE
from lbaudiodetective_tpu.ops.extract import extract_fingerprint
from lbaudiodetective_tpu.ops.match import match_fingerprints


@pytest.fixture(scope="module")
def jax_fingerprints(decoded_corpus, default_config):
    """name -> (pos, neg) JAX-extracted fingerprints, disk-cached."""
    from tests.conftest import config_cache_key

    key = config_cache_key()
    out = {}
    for name in decoded_corpus.keys():
        cache_file = CACHE / f"jaxfp_{key}_{name}.npz"
        if cache_file.exists():
            z = np.load(cache_file)
            out[name] = (z["pos"], z["neg"])
        else:
            pos, neg, n = extract_fingerprint(decoded_corpus[name], default_config)
            out[name] = (pos[:n], neg[:n])
            np.savez(cache_file, pos=out[name][0], neg=out[name][1])
    return out


def matrix(jax_fingerprints, suffix: str) -> np.ndarray:
    m = np.zeros((10, 10))
    for i, orig in enumerate(BIRDS):
        for j, seq in enumerate(BIRDS):
            m[i, j] = match_fingerprints(jax_fingerprints[orig],
                                         jax_fingerprints[seq + suffix]) * 100.0
    return m


def identified(m: np.ndarray) -> int:
    return int(sum(m[i, i] == m[i].max() for i in range(10)))


def test_equal_birds(jax_fingerprints):
    """Essay Test 1 (Fig. 24): exact crops -> every bird identified, diagonal
    in the 90s (Chaffinch's crop differs materially from its archive clip in
    this corpus and scores ~57; see CALIBRATION.md)."""
    m = matrix(jax_fingerprints, "_eql")
    assert identified(m) == 10
    diag = np.diag(m)
    assert (np.sort(diag)[1:] >= 92.0).all()        # all but Chaffinch
    assert diag.min() >= 55.0
    off = m[~np.eye(10, dtype=bool)]
    assert off.max() < 60.0                         # clean separation


def test_different_birds(jax_fingerprints):
    """Essay Test 2 (Fig. 25): different recordings of the same species land
    in the ~50% chance regime (the essay identified 1/10 — chance level);
    the robust signal is that no pair scores far from 50%."""
    m = matrix(jax_fingerprints, "_dif")
    diag = np.diag(m)
    assert (diag >= 45.0).all() and (diag <= 60.0).all()
    assert m.max() < 60.0 and m.min() > 45.0


def test_blurred1_birds(jax_fingerprints):
    """Essay Test 3.1 (Fig. 26): 1.58% noise — per-bird robustness ordering
    matches the essay (Crow/BlackBird strongest, then Pigeon/Kestrel)."""
    m = matrix(jax_fingerprints, "_blu1")
    assert identified(m) >= 5
    d = {b: m[i, i] for i, b in enumerate(BIRDS)}
    assert d["Crow"] >= 70.0 and d["BlackBird"] >= 70.0
    assert d["Pigeon"] >= 60.0 and d["Kestrel"] >= 60.0
    assert np.diag(m).min() >= 50.0


def test_blurred2_birds(jax_fingerprints):
    """Essay Test 3.2 (Fig. 27): 3.16% noise — degraded but Crow still high."""
    m = matrix(jax_fingerprints, "_blu2")
    assert identified(m) >= 5
    assert m[BIRDS.index("Crow"), BIRDS.index("Crow")] >= 70.0
    assert np.diag(m).min() >= 50.0


def test_recorded_birds(jax_fingerprints):
    """Essay Test 4 (Fig. 28): mic re-capture — scores hover near 50%."""
    m = matrix(jax_fingerprints, "_rec")
    diag = np.diag(m)
    assert (diag >= 48.0).all() and (diag <= 62.0).all()
    assert identified(m) >= 2
