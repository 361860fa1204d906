"""Streaming (incremental) fingerprint extraction runtime."""

from lbaudiodetective_tpu.streaming.runtime import StreamingExtractor, StreamingDetective

__all__ = ["StreamingExtractor", "StreamingDetective"]
