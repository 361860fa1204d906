"""Bisect the HBM->VMEM DMA addressing mode that faults the TPU worker.

Usage: python scripts/bisect_dma.py <variant>
  v0: static clip index, static row start
  v1: static clip index, dynamic row start (scalar prefetch)
  v2: dynamic clip index (program_id), static row start
  v3: dynamic clip + dynamic row (the fused kernel's pattern)
  v4: 2-D flattened ref, dynamic row start
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

variant = sys.argv[1]
SPAN = int(sys.argv[2]) if len(sys.argv) > 2 else 16

# Wait until the chip is healthy.
for attempt in range(30):
    try:
        v = float(np.asarray(jnp.sum(jnp.arange(8.0))))
        print("chip healthy:", v, flush=True)
        break
    except Exception as e:
        print("waiting for chip...", str(e)[:60], flush=True)
        time.sleep(20)

B, rows, LANE, span = 2, 64, 128, SPAN
rng = np.random.default_rng(0)
x3 = jnp.asarray(rng.standard_normal((B, rows, LANE)).astype(np.float32))
x2 = x3.reshape(B * rows, LANE)
base = np.array([3, 5], np.int32)


def kern(base_ref, x_ref, o_ref, buf, sem):
    t = pl.program_id(0)
    if variant == "v0":
        src = x_ref.at[0, pl.ds(4, span), :]
    elif variant == "v1":
        src = x_ref.at[0, pl.ds(base_ref[t], span), :]
    elif variant == "v2":
        src = x_ref.at[t, pl.ds(4, span), :]
    elif variant == "v3":
        src = x_ref.at[t, pl.ds(base_ref[t], span), :]
    else:  # v4
        src = x_ref.at[pl.ds(base_ref[t], span), :]
    dma = pltpu.make_async_copy(src, buf, sem)
    dma.start()
    dma.wait()
    o_ref[0] = buf[:]


x_in = x2 if variant == "v4" else x3
f = pl.pallas_call(
    kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, span, LANE), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((span, LANE), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    ),
    out_shape=jax.ShapeDtypeStruct((2, span, LANE), jnp.float32),
)
out = f(jnp.asarray(base), x_in)
got = np.asarray(out)
# expected
exp = np.zeros_like(got)
xb = np.asarray(x3)
for t in range(2):
    b = 0 if variant in ("v0", "v1") else t
    r0 = 4 if variant in ("v0", "v2") else base[t]
    if variant == "v4":
        exp[t] = np.asarray(x2)[r0:r0 + span]
    else:
        exp[t] = xb[b, r0:r0 + span]
print(variant, "OK, correct =", np.allclose(got, exp), flush=True)
