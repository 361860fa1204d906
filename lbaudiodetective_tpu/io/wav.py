"""RIFF/WAVE decoding (PCM 16/24/32-bit and float32/64), pure NumPy.

The reference accepts any container AudioToolbox can open
(LBAudioDetective.h documents audio file URLs generally); the bundled corpus
is CAF, but WAV is the common interchange format, so the framework decodes it
natively too.
"""

from __future__ import annotations

import struct

import numpy as np

from lbaudiodetective_tpu.errors import DecodeError, UnsupportedFormatError


def read_wav(path: str) -> tuple[np.ndarray, float]:
    """Read a WAV file -> (mono float32 samples in [-1,1), sample_rate)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise DecodeError("not a RIFF/WAVE file")
    off = 12
    fmt = None
    data = None
    n = len(raw)
    while off + 8 <= n:
        cid = raw[off:off + 4]
        (csize,) = struct.unpack("<I", raw[off + 4:off + 8])
        payload = off + 8
        csize = min(csize, n - payload)  # tolerate truncation
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", raw[payload:payload + 16])
            fmt_payload = raw[payload:payload + csize]
        elif cid == b"data":
            data = raw[payload:payload + csize]
        off = payload + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise DecodeError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # The real format code is the first 2 bytes of the SubFormat GUID at
        # offset 24 of the extended fmt chunk (after cbSize/validBits/mask).
        # Bit depth alone cannot distinguish 32-bit int PCM from float32.
        if len(fmt_payload) >= 26:
            (audio_format,) = struct.unpack("<H", fmt_payload[24:26])
        else:
            raise UnsupportedFormatError(
                "WAVE_FORMAT_EXTENSIBLE fmt chunk too short to carry the "
                "SubFormat GUID")
        if audio_format not in (1, 3):
            raise UnsupportedFormatError(
                f"unsupported WAVE_FORMAT_EXTENSIBLE SubFormat {audio_format}")

    def whole(d: bytes, width: int) -> bytes:
        """Trim to whole samples (truncated files are tolerated above; a
        ragged tail byte must not make np.frombuffer raise)."""
        return d[: (len(d) // width) * width]

    if audio_format == 1:  # integer PCM
        if bits == 16:
            x = np.frombuffer(whole(data, 2), "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3)
            vals = (b[:, 0].astype(np.int32)
                    | (b[:, 1].astype(np.int32) << 8)
                    | (b[:, 2].astype(np.int32) << 16))
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(whole(data, 4), "<i4").astype(np.float32) / 2147483648.0
        else:
            raise UnsupportedFormatError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        dtype = {32: "<f4", 64: "<f8"}.get(bits)
        if dtype is None:
            raise UnsupportedFormatError(f"unsupported float bit depth {bits}")
        x = np.frombuffer(whole(data, bits // 8), dtype).astype(np.float32)
    else:
        raise UnsupportedFormatError(f"unsupported WAV format code {audio_format}")

    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(x, np.float32), float(sample_rate)


def write_wav(path: str, samples: np.ndarray, sample_rate: float) -> None:
    """Write mono float32 samples as 16-bit PCM WAV (test/tooling helper)."""
    pcm = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
    pcm = np.round(pcm * 32767.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, int(sample_rate),
                                int(sample_rate) * 2, 2, 16)
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    with open(path, "wb") as f:
        f.write(hdr + fmt + data)
