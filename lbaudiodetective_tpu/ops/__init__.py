"""Device-side (JAX/XLA/Pallas) compute ops: spectral analysis, Haar
transform, subfingerprint extraction and fingerprint matching."""
