"""G.711 mu-law/A-law and WAV IMA-ADPCM decode tests (container/codec
breadth: the reference accepts any AudioToolbox-openable URL,
LBAudioDetective.h:210-235; Core Audio ships these codecs)."""

import struct

import numpy as np
import pytest

from lbaudiodetective_tpu.errors import UnsupportedFormatError
from lbaudiodetective_tpu.io.g711 import (ALAW_TABLE, MULAW_TABLE,
                                          decode_alaw, decode_mulaw,
                                          encode_alaw, encode_mulaw)
from lbaudiodetective_tpu.io.wav import decode_ima_adpcm_mono, read_wav


def _sine(n=4096, rate=8000.0, f=440.0, amp=0.5):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _snr_db(ref, test):
    noise = ref - test
    return 10 * np.log10(np.sum(ref**2) / max(np.sum(noise**2), 1e-30))


# -- table values (ITU-T G.711 known points) ---------------------------------

def test_mulaw_table_landmarks():
    assert MULAW_TABLE[0xFF] == 0
    assert MULAW_TABLE[0x7F] == 0          # negative zero folds to 0
    assert MULAW_TABLE[0x80] == 32124      # positive full scale
    assert MULAW_TABLE[0x00] == -32124     # negative full scale
    # Odd symmetry: code and code^0x80 decode to negatives of each other.
    np.testing.assert_array_equal(MULAW_TABLE[0x80:].astype(np.int32),
                                  -MULAW_TABLE[:0x80].astype(np.int32))


def test_alaw_table_landmarks():
    assert ALAW_TABLE[0xD5] == 8           # smallest positive
    assert ALAW_TABLE[0x55] == -8          # smallest negative
    assert ALAW_TABLE[0xAA] == 32256       # positive full scale
    assert ALAW_TABLE[0x2A] == -32256      # negative full scale
    np.testing.assert_array_equal(ALAW_TABLE[0x80:].astype(np.int32),
                                  -ALAW_TABLE[:0x80].astype(np.int32))


def test_encode_inverts_decode():
    all_bytes = bytes(range(256))
    for enc, dec in ((encode_mulaw, decode_mulaw), (encode_alaw, decode_alaw)):
        x = dec(all_bytes)
        np.testing.assert_array_equal(dec(enc(x)), x)


def test_companding_snr():
    x = _sine()
    assert _snr_db(x, decode_mulaw(encode_mulaw(x))) > 30.0
    assert _snr_db(x, decode_alaw(encode_alaw(x))) > 30.0


# -- WAV containers ----------------------------------------------------------

def _wav_bytes(fmt_tag, payload, rate=8000, channels=1, bits=8,
               block_align=None, fact_frames=None):
    ba = block_align if block_align is not None else channels * max(bits // 8, 1)
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, fmt_tag, channels, rate,
                                rate * ba, ba, bits)
    fact = b""
    if fact_frames is not None:
        fact = b"fact" + struct.pack("<II", 4, fact_frames)
    data = b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        data += b"\x00"
    body = b"WAVE" + fmt + fact + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_mulaw_alaw(tmp_path):
    x = _sine(2048)
    for tag, enc, dec in ((7, encode_mulaw, decode_mulaw),
                          (6, encode_alaw, decode_alaw)):
        payload = enc(x)
        p = str(tmp_path / f"t{tag}.wav")
        with open(p, "wb") as f:
            f.write(_wav_bytes(tag, payload))
        y, rate = read_wav(p)
        assert rate == 8000.0
        np.testing.assert_array_equal(y, dec(payload))
        assert _snr_db(x, y) > 30.0


# -- WAV IMA ADPCM -----------------------------------------------------------

def _ima_encode_mono(x, block_align=256):
    """Scalar reference IMA/DVI encoder producing standard WAV blocks
    (int16 LE predictor + step index header; header IS the first sample;
    low nibble first).  Independent of the vectorised decoder under test."""
    from lbaudiodetective_tpu.io.caf import IMA_INDEX_TABLE, IMA_STEP_TABLE

    pcm = np.clip(np.round(np.asarray(x, np.float64) * 32768.0),
                  -32768, 32767).astype(np.int32)
    spb = (block_align - 4) * 2 + 1           # samples per block
    pad = (-len(pcm)) % spb
    pcm_p = np.concatenate([pcm, np.zeros(pad, np.int32)])
    out = bytearray()
    index = 0
    for b0 in range(0, len(pcm_p), spb):
        block = pcm_p[b0:b0 + spb]
        predictor = int(block[0])
        out += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for s in block[1:]:
            step = int(IMA_STEP_TABLE[index])
            delta = int(s) - predictor
            nib = 0
            if delta < 0:
                nib = 8
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            # Decoder-mirror update keeps encoder and decoder state in sync.
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            if nib & 8:
                diff = -diff
            predictor = int(np.clip(predictor + diff, -32768, 32767))
            index = int(np.clip(index + IMA_INDEX_TABLE[nib], 0, 88))
            nibbles.append(nib)
        for i in range(0, len(nibbles), 2):
            out.append(nibbles[i] | (nibbles[i + 1] << 4))
    return bytes(out), len(pcm)


def _ima_decode_scalar(data, block_align, total_frames):
    """Scalar reference decoder (independent of the vectorised one)."""
    from lbaudiodetective_tpu.io.caf import IMA_INDEX_TABLE, IMA_STEP_TABLE

    out = []
    for b0 in range(0, (len(data) // block_align) * block_align, block_align):
        blk = data[b0:b0 + block_align]
        predictor, index, _ = struct.unpack("<hBB", blk[:4])
        index = min(max(index, 0), 88)
        out.append(predictor)
        for byte in blk[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = int(IMA_STEP_TABLE[index])
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                if nib & 8:
                    diff = -diff
                predictor = int(np.clip(predictor + diff, -32768, 32767))
                index = int(np.clip(index + IMA_INDEX_TABLE[nib], 0, 88))
                out.append(predictor)
    arr = np.array(out, np.int16)
    if 0 <= total_frames < arr.size:
        arr = arr[:total_frames]
    return arr.astype(np.float32) / 32768.0


def test_ima_adpcm_vectorised_matches_scalar():
    x = _sine(3000, f=523.0, amp=0.8)
    data, frames = _ima_encode_mono(x, block_align=256)
    vec = decode_ima_adpcm_mono(data, 256, frames)
    ref = _ima_decode_scalar(data, 256, frames)
    np.testing.assert_array_equal(vec, ref)
    assert _snr_db(x, vec) > 20.0


def test_wav_ima_adpcm_end_to_end(tmp_path):
    x = _sine(3000)
    data, frames = _ima_encode_mono(x, block_align=128)
    p = str(tmp_path / "ima.wav")
    with open(p, "wb") as f:
        f.write(_wav_bytes(0x11, data, bits=4, block_align=128,
                           fact_frames=frames))
    y, rate = read_wav(p)
    assert rate == 8000.0
    assert y.shape == (frames,)                 # fact chunk trims padding
    assert _snr_db(x, y) > 20.0
    # Stereo IMA is not supported — typed error, not garbage.
    p2 = str(tmp_path / "ima2.wav")
    with open(p2, "wb") as f:
        f.write(_wav_bytes(0x11, data, channels=2, bits=4, block_align=128))
    with pytest.raises(UnsupportedFormatError):
        read_wav(p2)


# -- CAF / AIFF-C containers -------------------------------------------------

def _caf_g711(tmp_path, fmt: str, payload: bytes, rate=8000.0, channels=1,
              frames=None):
    desc = b"desc" + struct.pack(">q", 32) + struct.pack(
        ">dIIIIII", rate, int.from_bytes(fmt.encode(), "big"), 0,
        channels, 1, channels, 8)
    pakt = b""
    if frames is not None:
        pakt = (b"pakt" + struct.pack(">q", 24)
                + struct.pack(">qqii", frames, frames, 0, 0))
    data = b"data" + struct.pack(">q", 4 + len(payload)) + b"\x00" * 4 + payload
    p = str(tmp_path / f"t_{fmt}.caf")
    with open(p, "wb") as f:
        f.write(b"caff" + struct.pack(">HH", 1, 0) + desc + pakt + data)
    return p


def test_caf_ulaw_alaw_numpy_and_native(tmp_path):
    from lbaudiodetective_tpu.io.caf import read_caf
    from lbaudiodetective_tpu.io.native import binding as native

    x = _sine(1500)
    for fmt, enc, dec in (("ulaw", encode_mulaw, decode_mulaw),
                          ("alaw", encode_alaw, decode_alaw)):
        payload = enc(x)
        p = _caf_g711(tmp_path, fmt, payload, frames=1200)
        y, rate = read_caf(p)
        assert rate == 8000.0
        np.testing.assert_array_equal(y, dec(payload)[:1200])
        if native.available():
            yn, rn = native.read_caf(p)
            assert rn == 8000.0
            np.testing.assert_array_equal(yn, y)


def test_aifc_ulaw(tmp_path):
    from tests.test_aiff import _aifc
    from lbaudiodetective_tpu.io.aiff import read_aiff

    x = _sine(800)
    payload = encode_mulaw(x)
    p = _aifc(tmp_path, b"ulaw", payload, 8, 800)
    y, rate = read_aiff(p)
    assert rate == 44100.0
    np.testing.assert_array_equal(y, decode_mulaw(payload))


# -- pipeline-level ----------------------------------------------------------

def test_corpus_clip_via_mulaw_wav_still_identifies(tmp_path):
    """A corpus clip re-encoded as 8-bit mu-law WAV still identifies its
    original.  Companding noise (~36 dB SNR) is the same order as the
    essay's 1.58% "blurred" suite (Figure 26 scores 52-75), so the score
    lands in the blur range — well above any wrong-bird score — rather
    than at the exact-crop ~96."""
    from tests.conftest import corpus_path
    from lbaudiodetective_tpu.io.caf import read_caf
    from lbaudiodetective_tpu.models.detective import AudioDetective

    samples, rate = read_caf(corpus_path("Wren_eql"))
    p = str(tmp_path / "wren_eql_ulaw.wav")
    with open(p, "wb") as f:
        f.write(_wav_bytes(7, encode_mulaw(samples), rate=int(rate)))
    det = AudioDetective()
    s_right = det.compare_audio_files(corpus_path("Wren"), p)
    s_wrong = det.compare_audio_files(corpus_path("Crow"), p)
    assert s_right > 0.5                      # blur-suite range
    # Identification at this noise level is knife-edge (as in the essay's
    # 3.16% blur suite); the pipeline is deterministic on CPU, so a strict
    # win is a stable assertion even though the margin is small (~0.02).
    assert s_right > s_wrong


def test_wav_extensible_mulaw(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE wrapping the mu-law SubFormat decodes like
    plain format-7 WAV."""
    x = _sine(1024)
    payload = encode_mulaw(x)
    ext = struct.pack("<HHI", 22, 8, 0x4) + struct.pack("<H", 7) + b"\x00" * 14
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16 + len(ext), 0xFFFE, 1, 8000,
                                8000, 1, 8) + ext
    data = b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        data += b"\x00"
    body = b"WAVE" + fmt + data
    p = str(tmp_path / "ext.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    y, rate = read_wav(p)
    assert rate == 8000.0
    np.testing.assert_array_equal(y, decode_mulaw(payload))
