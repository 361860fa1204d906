"""Fault-injection fixtures (SURVEY §5: corrupt-CAF and truncated-stream).

The reference logs OSStatus errors to stderr and continues
(LBAudioDetective.m:53-72); here malformed inputs raise typed errors and
truncated-but-parseable inputs degrade gracefully (shorter fingerprints)."""

import numpy as np
import pytest

from lbaudiodetective_tpu.io import caf
from lbaudiodetective_tpu.io.decode import decode_audio_file
from lbaudiodetective_tpu.models.detective import AudioDetective
from tests.conftest import corpus_path


def _read_reference_bytes(name):
    with open(corpus_path(name), "rb") as f:
        return f.read()


def test_truncated_data_chunk_decodes_prefix(tmp_path):
    """A CAF cut mid-data still decodes the packets that survived."""
    raw = _read_reference_bytes("BlackBird")
    cut = tmp_path / "cut.caf"
    cut.write_bytes(raw[: len(raw) // 2])
    full, sr = caf.read_caf(corpus_path("BlackBird"))
    part, sr2 = caf.read_caf(str(cut))
    assert sr2 == sr
    assert 0 < part.shape[0] < full.shape[0]
    # Decoded prefix must agree (packets are independent).
    n = (part.shape[0] // 64) * 64
    np.testing.assert_array_equal(part[:n], full[:n])


def test_truncated_clip_fingerprints_shorter(tmp_path):
    raw = _read_reference_bytes("Crow")
    cut = tmp_path / "crow_cut.caf"
    cut.write_bytes(raw[: len(raw) // 2])
    det = AudioDetective()
    fp_full = det.process_audio_file(corpus_path("Crow"))
    fp_cut = det.process_audio_file(str(cut))
    assert 0 < fp_cut.num_subfingerprints < fp_full.num_subfingerprints
    # The surviving prefix still matches the full clip strongly.
    assert det.compare_fingerprints(fp_full, fp_cut) > 0.9


def test_garbage_bytes_raise(tmp_path):
    bad = tmp_path / "bad.caf"
    bad.write_bytes(b"\x00" * 256)
    with pytest.raises(ValueError):
        decode_audio_file(str(bad))


def test_empty_audio_produces_empty_fingerprint(tmp_path):
    """A clip shorter than one frame yields an empty fingerprint, and
    comparing against it scores 0 (reference: imageWidth < 128 -> no loop)."""
    from lbaudiodetective_tpu.io.caf import IMA4_PACKET_BYTES
    import struct

    # Minimal valid CAF with one IMA4 packet (64 frames ~ 1.5 ms).
    desc = struct.pack(">dIIIIII", 44100.0, int.from_bytes(b"ima4", "big"),
                       0, 34, 64, 1, 0)
    data = b"\x00" * 4 + b"\x00" * IMA4_PACKET_BYTES
    raw = (b"caff\x00\x01\x00\x00"
           + b"desc" + struct.pack(">q", 32) + desc
           + b"data" + struct.pack(">q", len(data)) + data)
    tiny = tmp_path / "tiny.caf"
    tiny.write_bytes(raw)
    det = AudioDetective()
    fp = det.process_audio_file(str(tiny))
    assert fp.num_subfingerprints == 0
    real = det.process_audio_file(corpus_path("Wren"))
    assert det.compare_fingerprints(real, fp) == 0.0
    assert det.compare_fingerprints(fp, real) == 0.0
