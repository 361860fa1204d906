"""FingerprintLibrary: packed DB construction, matching, identification,
persistence (corpus-backed)."""

import numpy as np
import pytest

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.models.detective import AudioDetective
from lbaudiodetective_tpu.models.library import FingerprintLibrary
from tests.conftest import BIRDS, corpus_path


@pytest.fixture(scope="module")
def corpus_library():
    det = AudioDetective()
    fps = [det.process_audio_file(corpus_path(b)) for b in BIRDS[:5]]
    return det, fps, FingerprintLibrary.from_fingerprints(fps, det.config)


def test_identify_corpus(corpus_library):
    det, fps, lib = corpus_library
    assert len(lib) == 5
    query = det.process_audio_file(corpus_path("Chaffinch_eql"))  # index 2
    best, score = lib.identify(query)
    assert best == 2
    scores = lib.match(query)
    np.testing.assert_allclose(scores[best], score)
    # Consistent with the pairwise matcher.
    direct = det.compare_fingerprints(fps[2], query)
    np.testing.assert_allclose(score, direct, atol=1e-6)


def test_library_roundtrip(tmp_path, corpus_library):
    det, fps, lib = corpus_library
    p = str(tmp_path / "lib.npz")
    lib.save(p)
    loaded = FingerprintLibrary.load(p, det.config)
    query = det.process_audio_file(corpus_path("BlueTit_eql"))
    np.testing.assert_allclose(loaded.match(query), lib.match(query), atol=1e-7)
    with pytest.raises(ValueError):
        FingerprintLibrary.load(p, FingerprintConfig(analysis_stride=32))


def test_library_extend_matches_fresh(corpus_library):
    """extend() must equal a library built from scratch with the same
    fingerprints (packed entries, counts, pairs, scores)."""
    import numpy as np

    from lbaudiodetective_tpu.models.library import FingerprintLibrary

    det, fps, lib = corpus_library
    base = FingerprintLibrary.from_fingerprints(fps[:2], lib.config)
    grown = base.extend(fps[2:])
    fresh = FingerprintLibrary.from_fingerprints(fps, lib.config)
    assert len(grown) == len(fresh)
    q = fps[-1]
    np.testing.assert_allclose(np.asarray(grown.match(q)),
                               np.asarray(fresh.match(q)), atol=1e-6)
    assert grown.extend([]) is grown


def test_match_many_equals_per_query(corpus_library):
    """Batched multi-query matching == stacked single-query matches."""
    import numpy as np

    det, fps, lib = corpus_library
    queries = fps[:3]
    got = lib.match_many(queries)
    assert got.shape == (3, len(lib))
    ref = np.stack([lib.match(q) for q in queries])
    np.testing.assert_allclose(got, ref, atol=1e-6)
    assert lib.match_many([]).shape == (0, len(lib))
