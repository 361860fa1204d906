import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import extract_fingerprint
from lbaudiodetective_tpu.io.decode import decode_audio_file
from lbaudiodetective_tpu.oracle.pipeline import oracle_fingerprint

cfg_m = FingerprintConfig(matmul_precision="medium")
clip = decode_audio_file(
    "/root/reference/LBAudioDetectiveTests/Birds/Archive/BlackBird.caf")
jpos, jneg, n = extract_fingerprint(clip, cfg_m)
opos, oneg = oracle_fingerprint(clip, cfg_m)
agree = ((jpos[:n] == opos).mean() + (jneg[:n] == oneg).mean()) / 2 * 100
print(f"medium bit agreement vs oracle: {agree:.3f}%", flush=True)
