"""Fine-grained bisect of the window-construction stage (run stages A..E
sequentially; the first crash identifies the faulting op)."""
import sys
import time
from functools import partial

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/_cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, n_tiles, rpf, window, LANE = 1, 2, 128, 2048, 128
q_len = window // LANE
span_rows = 32  # must be a multiple of 8 (DMA sublane constraint)
t_rows = 64
rng = np.random.default_rng(0)
audio2d = jnp.asarray((rng.standard_normal((B, t_rows, LANE)) * 0.1).astype(np.float32))
starts_rel = np.tile(np.arange(rpf, dtype=np.int32) * 8, (n_tiles, 1))
base_row = np.array([0, 8], np.int32)
bands = 32

stages = sys.argv[1:] or ["A", "B", "C", "D", "E"]


def make(stage):
    def kern(starts_rel_ref, base_row_ref, audio_ref, out_ref, buf, windows, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        dma = pltpu.make_async_copy(
            audio_ref.at[b, pl.ds(base_row_ref[t], span_rows), :], buf, sem)
        dma.start()
        dma.wait()
        if stage == "A":
            out_ref[0] = jnp.zeros((rpf, bands), jnp.float32) + jnp.sum(buf[:])
            return
        lane = jax.lax.broadcasted_iota(jnp.int32, (q_len, LANE), 1)

        def fill_row(j, _):
            if stage == "B":
                windows[j] = buf[pl.ds(j % 8, q_len), :]
            else:
                s = starts_rel_ref[t, j]
                r0 = s // LANE
                c = s - r0 * LANE
                if stage == "C":
                    windows[j] = buf[pl.ds(r0, q_len), :]
                elif stage == "D":
                    chunk = buf[pl.ds(r0, q_len), :]
                    windows[j] = pltpu.roll(chunk, -c, 1)
                else:  # E = full construction
                    chunk = buf[pl.ds(r0, q_len + 1), :]
                    rolled = pltpu.roll(chunk, -c, 1)
                    windows[j] = jnp.where(lane < LANE - c,
                                           rolled[0:q_len, :], rolled[1:q_len + 1, :])
            return 0

        jax.lax.fori_loop(0, rpf, fill_row, 0)
        out_ref[0] = jnp.sum(windows[:], axis=1)[:, :bands]

    return kern


for stage in stages:
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, rpf, bands), lambda b, t, *_: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((span_rows, LANE), jnp.float32),
            pltpu.VMEM((rpf, q_len, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    f = pl.pallas_call(
        make(stage), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * rpf, bands), jnp.float32))
    t0 = time.perf_counter()
    out = f(jnp.asarray(starts_rel), jnp.asarray(base_row), audio2d)
    val = float(np.asarray(jnp.sum(out)))
    print(f"stage {stage}: OK sum={val:.3f} ({time.perf_counter()-t0:.0f}s)", flush=True)
