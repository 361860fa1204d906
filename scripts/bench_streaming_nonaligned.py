"""Measure the GENERAL (non-frame-aligned) streaming path's realtime factor
on the TPU and merge it into bench_details.json (VERDICT r2 item 4's
re-bench: the r2 ring-gather general path was the slow orphan; round 3
replaced it with the linear-buffer + strided-conv step).

chunk=512 with the parity config: integer hop 8, 512 % 8 == 0, not
frame-aligned (1024 would be) -> exercises _stream_step_conv.
"""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import sys
sys.path.insert(0, "/root/repo")
from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.streaming.runtime import StreamingExtractor

cfg = FingerprintConfig()
n_streams, chunk, steps = 256, 512, 40

ext = StreamingExtractor(batch=n_streams, chunk_size=chunk, config=cfg,
                         collect_host=False)
assert not ext.aligned and ext.use_conv, "must exercise the conv path"
rng = np.random.default_rng(2)
chunks = (rng.standard_normal((steps, n_streams, chunk)) * 3276.8
          ).astype(np.int16)
for w in range(min(12, steps)):        # warm past frame emission (compiles)
    ext.feed_pcm16(chunks[w])
ext.harvest()
ext.reset()
t0 = time.perf_counter()
for s in range(steps):
    ext.feed_pcm16(chunks[s])
ext.harvest()
dt = time.perf_counter() - t0
audio_seconds = steps * chunk / cfg.processing_sample_rate * n_streams
rt = audio_seconds / dt
print(f"non-aligned (conv) streaming: {rt:.0f}x realtime "
      f"({n_streams} streams, chunk {chunk})", flush=True)

with open("/root/repo/bench_details.json") as f:
    details = json.load(f)
details["streaming_realtime_factor_nonaligned"] = rt
details["streaming_nonaligned_chunk"] = chunk
with open("/root/repo/bench_details.json", "w") as f:
    json.dump(details, f, indent=2)
print("merged into bench_details.json", flush=True)
