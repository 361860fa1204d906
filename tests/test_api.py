"""Public API + compat-layer parity tests (LBAudioDetective.h surface)."""

import numpy as np
import pytest

from lbaudiodetective_tpu import compat
from lbaudiodetective_tpu.models.detective import AudioDetective
from lbaudiodetective_tpu.models.fingerprint import Fingerprint
from tests.conftest import corpus_path


@pytest.fixture(scope="module")
def detective():
    return AudioDetective()


def test_defaults_match_reference(detective):
    assert detective.processing_sample_rate == 5512.0
    assert detective.window_size == 2048
    assert detective.analysis_stride == 64
    assert detective.number_of_pitch_steps == 32
    assert detective.subfingerprint_length == 200


def test_setters_replace_config(detective):
    d = AudioDetective()
    d.analysis_stride = 32
    assert d.analysis_stride == 32
    d.window_size = 1024
    assert d.window_size == 1024
    with pytest.raises(ValueError):
        d.window_size = 2000  # spec-corrected Q4


def test_process_and_compare(detective):
    fp = detective.process_audio_file(corpus_path("BlackBird"))
    assert fp.num_subfingerprints == 48
    assert fp.pairs == 100
    score = detective.compare_audio_files(corpus_path("BlackBird"),
                                          corpus_path("BlackBird_eql"))
    assert 0.9 < score <= 1.0


def test_fingerprint_copy_equality(detective):
    """Reference testFingerprintComparison (Tests.m:141-155)."""
    fp = detective.process_audio_file(corpus_path("Sparrow"))
    cp = fp.copy()
    assert fp == cp
    assert compat.LBAudioDetectiveFingerprintEqualToFingerprint(fp, cp)
    mutated = Fingerprint(cp.pos.copy(), cp.neg.copy())
    mutated.pos[0, 0] ^= 1
    assert fp != mutated


def test_subfingerprint_boolean_layout(detective):
    """Quirk Q1 interleaving: bool[2j]=pos rank j, bool[2j+1]=neg rank j."""
    fp = detective.process_audio_file(corpus_path("Crow"))
    bools = fp.subfingerprint_booleans(0)
    assert bools.shape == (200,)
    np.testing.assert_array_equal(bools[0::2], fp.pos[0])
    np.testing.assert_array_equal(bools[1::2], fp.neg[0])


def test_match_against_library(detective):
    lib_names = ["BlackBird", "Wren", "Crow"]
    lib = [detective.process_audio_file(corpus_path(n)) for n in lib_names]
    query = detective.process_audio_file(corpus_path("Wren_eql"))
    scores = detective.match_against_library(query, lib)
    assert scores.shape == (3,)
    assert np.argmax(scores) == 1  # Wren wins
    one = detective.compare_fingerprints(lib[1], query)
    np.testing.assert_allclose(scores[1], one, atol=1e-6)


def test_compat_names_roundtrip():
    d = compat.LBAudioDetectiveNew()
    assert compat.LBAudioDetectiveGetWindowSize(d) == 2048
    compat.LBAudioDetectiveSetAnalysisStride(d, 128)
    assert compat.LBAudioDetectiveGetAnalysisStride(d) == 128
    compat.LBAudioDetectiveSetAnalysisStride(d, 64)
    fp = compat.LBAudioDetectiveProcessAudioURL(d, corpus_path("Pigeon"))
    assert compat.LBAudioDetectiveFingerprintGetNumberOfSubfingerprints(fp) > 0
    assert compat.LBAudioDetectiveFingerprintGetSubfingerprintLength(fp) == 200
    fp2 = compat.LBAudioDetectiveFingerprintCopy(fp)
    score = compat.LBAudioDetectiveFingerprintCompareToFingerprint(fp, fp2, 200)
    np.testing.assert_allclose(score, 1.0, atol=1e-6)
    # Raw compare with inRange=0 iterates zero booleans in the reference
    # (Fingerprint.m:155,171-175) -> 0.0; only CompareAudioURLs defaults it.
    assert compat.LBAudioDetectiveFingerprintCompareToFingerprint(fp, fp2, 0) == 0.0
    # Golden string serializer (LBAudioDetectiveTests.m:22-37) round-trips.
    s = compat.stringFromFingerprint(fp)
    assert set(s) <= {"0", "1", "+"}
    assert s.split("+")[0] != "0" * 200          # non-degenerate bits
    from lbaudiodetective_tpu.models.fingerprint import Fingerprint
    assert Fingerprint.from_string(s) == fp
    match = compat.LBAudioDetectiveCompareAudioURLs(
        d, corpus_path("Pigeon"), corpus_path("Pigeon_eql"), 0)
    assert 0.9 < match <= 1.0
    compat.LBAudioDetectiveDispose(d)
    with pytest.raises(ValueError):
        compat.LBAudioDetectiveProcessAudioURL(d, None)
    with pytest.raises(ValueError):
        compat.LBAudioDetectiveDispose(None)


def test_context_manager():
    with AudioDetective() as d:
        assert d.window_size == 2048
