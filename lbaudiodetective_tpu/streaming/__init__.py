"""Streaming (incremental) fingerprint extraction + identification runtime."""

from lbaudiodetective_tpu.streaming.identify import (StreamingIdentifier,
                                                     StreamMatch)
from lbaudiodetective_tpu.streaming.runtime import StreamingExtractor, StreamingDetective

__all__ = ["StreamingExtractor", "StreamingDetective", "StreamingIdentifier",
           "StreamMatch"]
