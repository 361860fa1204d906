"""Parity-extraction batch sweep: does a larger batch amortize the chain
tail's per-DISPATCH costs?

With pipe_tail="chain" (round-5 default) the standalone tail select runs
once per dispatch (not per clip), and the dispatch itself carries fixed
relay/infeed cost — so clips/s could still rise past the canonical batch
256.  Memory bound: parity audio is ~1.75 MB/clip f32 (10 s padded at
5512 Hz x 32-bit... actually the padded T is ~437k samples), so batch 1024
is ~1.8 GB of HBM input — well within v5e's 16 GB next to the outputs.

Prints clips/s at batch 128/256/512/1024 with the SHIPPED extraction path
(min-of-3 timed runs of 10 steps each, dependency-chained).
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

import bench


def main() -> None:
    print("device:", jax.devices()[0])
    from lbaudiodetective_tpu.config import FingerprintConfig

    config = FingerprintConfig()
    batches = (tuple(int(a) for a in sys.argv[1:]) if len(sys.argv) > 1
               else (128, 256, 512, 1024))
    for batch in batches:
        best = 0.0
        for _ in range(3):
            t0 = time.time()
            cps, dt = bench.bench_extract(config, batch=batch, iters=10)
            best = max(best, cps)
            if time.time() - t0 > 300:     # compile-dominated; one run enough
                break
        print(f"batch {batch:5d}: {best:8.1f} clips/s "
              f"({batch / best * 1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
