import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import extract_fingerprint
from lbaudiodetective_tpu.io.decode import DecodedAudio
from lbaudiodetective_tpu.oracle.pipeline import oracle_fingerprint

cfg_m = FingerprintConfig(matmul_precision="medium")
z = np.load("/root/repo/tests/_cache/decoded_4297bbef_BlackBird.npz")
clip = DecodedAudio(z["samples"], float(z["processing_rate"]),
                    int(z["file_frames"]), float(z["file_rate"]))
jpos, jneg, n = extract_fingerprint(clip, cfg_m)
opos, oneg = oracle_fingerprint(clip, cfg_m)
agree = ((jpos[:n] == opos).mean() + (jneg[:n] == oneg).mean()) / 2 * 100
print(f"medium bit agreement vs oracle: {agree:.3f}%", flush=True)
