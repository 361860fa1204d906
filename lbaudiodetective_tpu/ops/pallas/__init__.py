"""Pallas TPU kernels for the hot ops (fused spectral rows, packed matching)."""
