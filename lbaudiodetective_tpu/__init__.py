"""LBAudioDetective-TPU: a TPU-native audio fingerprinting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
lbrndnr/LBAudioDetective (reference: /root/reference): Shazam-style binary
audio fingerprints (Haitsma-Kalker / Waveprint family) computed with batched
XLA ops on TPU, plus a vectorized offset-sliding matcher expressed as MXU
matmuls, library-sharded matching over a device mesh, and a streaming
(incremental) extraction runtime.

Public surface (see also `lbaudiodetective_tpu.compat` for 1:1 C-API names):

    FingerprintConfig   -- frozen, hashable pipeline configuration
    Fingerprint         -- value type holding packed subfingerprint bits
    AudioDetective      -- end-to-end convenience object (decode->extract->match)
    extract_fingerprint -- jittable batched extraction kernel
    match_fingerprints  -- jittable offset-sliding matcher

Imports are lazy (PEP 562) so host-only paths (decode, oracle) do not pay the
JAX import cost.
"""

__version__ = "0.3.0"

_EXPORTS = {
    "FingerprintConfig": "lbaudiodetective_tpu.config",
    "Fingerprint": "lbaudiodetective_tpu.models.fingerprint",
    "FingerprintBuilder": "lbaudiodetective_tpu.models.fingerprint",
    "AudioDetective": "lbaudiodetective_tpu.models.detective",
    "FingerprintLibrary": "lbaudiodetective_tpu.models.library",
    "StreamingDetective": "lbaudiodetective_tpu.streaming.runtime",
    "StreamingExtractor": "lbaudiodetective_tpu.streaming.runtime",
    "extract_fingerprint": "lbaudiodetective_tpu.ops.extract",
    "match_fingerprints": "lbaudiodetective_tpu.ops.match",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module = importlib.import_module(_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
