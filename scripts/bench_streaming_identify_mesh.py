"""Streaming identification against a mesh-sharded library (VERDICT r3 #5,
second half): the same bench section bench.py runs single-chip, but with
the library AND the incremental diagonal state sharded over a device mesh.

On this machine it runs on the 8-virtual-CPU mesh (library 4-way sharded x
data 2-way) — a FUNCTIONAL rate of the full sharded tick path (collective
match_many per tick in full mode; zero-collective sharded state updates in
incremental mode), not TPU performance.  On a multi-chip host the same
script measures the real sharded tick rate.

Writes scripts/streaming_identify_mesh.json.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/.axon_site:/root/repo \
     python scripts/bench_streaming_identify_mesh.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax

if "--cpu" in sys.argv:       # check the flag BEFORE touching the backend —
    # jax.default_backend() would initialise the (possibly unreachable)
    # accelerator plugin first.
    jax.config.update("jax_platforms", "cpu")

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lbaudiodetective_tpu.config import FingerprintConfig  # noqa: E402


def main():
    n_dev = len(jax.devices())
    if n_dev < 2:
        print(json.dumps({"error": "needs a multi-device mesh",
                          "devices": n_dev}))
        return
    import bench

    cfg = FingerprintConfig()
    # CPU-mesh scale: small enough to run in minutes, large enough that the
    # tick is dominated by matching, not dispatch.
    kwargs = dict(n_streams=32, lib_size=4096, steps=12, match_every=4,
                  group=8, shard_devices=min(4, n_dev))
    full, inc = bench.bench_streaming_identify(cfg, **kwargs)
    out = {
        "backend": jax.default_backend(), "devices": n_dev,
        "params": kwargs,
        "full": {"ticks_per_sec": full[0], "median_tick_seconds": full[1],
                 "realtime_factor": full[2], "n_ticks": full[3]},
        "incremental": {"ticks_per_sec": inc[0],
                        "median_tick_seconds": inc[1],
                        "realtime_factor": inc[2], "n_ticks": inc[3]},
    }
    print(json.dumps(out, indent=2))
    with open(REPO / "scripts" / "streaming_identify_mesh.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote scripts/streaming_identify_mesh.json", file=sys.stderr)


if __name__ == "__main__":
    main()
