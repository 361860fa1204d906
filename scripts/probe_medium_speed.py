import time, glob
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import (extract_fingerprint,
    required_padded_length)
from lbaudiodetective_tpu.ops.pallas.fused_rows_v2 import fused_band_rows_v3
from lbaudiodetective_tpu.io.decode import decode_audio_file

cfg_m = FingerprintConfig(matmul_precision="medium")
B, S = 128, 56
n_rows = S*128
t_pad = required_padded_length(cfg_m, n_rows)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, t_pad)).astype(np.float32)*0.1)
@jax.jit
def step(a, c):
    r = fused_band_rows_v3(a + c*0.0, cfg_m, n_rows, fuse_haar=True)
    return c + jnp.sum(r[0, ::997, :1])
c = step(audio, jnp.float32(0)); float(np.asarray(c))
c = jnp.float32(0); t0 = time.perf_counter()
for _ in range(30): c = step(audio, c)
float(np.asarray(c))
print(f"rows medium B=128: {(time.perf_counter()-t0)/30*1e3:.2f} ms/step", flush=True)

d = decode_audio_file(
    "/root/reference/LBAudioDetectiveTests/Birds/Archive/BlackBird.caf")
ofiles = sorted(glob.glob("/root/repo/tests/_cache/oracle_*BlackBird.npz"))
oz = np.load(ofiles[-1])
opos, oneg = oz["pos"], oz["neg"]
pos, neg, n = extract_fingerprint(d, cfg_m)
agree = ((pos[:n] == opos).mean() + (neg[:n] == oneg).mean())/2
print(f"medium bit agreement vs oracle: {agree*100:.3f}%", flush=True)
