"""Multihost / multi-slice initialisation and restartable pod jobs.

The reference has no distributed runtime (SURVEY §5: one process, OSStatus
logging that continues on error).  For pod-scale matching the framework uses
jax.distributed: every host calls :func:`initialize` before building meshes;
a failed slice re-joins via the coordinator and reloads its library shard
from the checkpoint format (utils.serialize.save_library/load_library), so
the matching service restarts per-slice without refingerprinting.

CI exercises the REAL multi-process path on one machine
(tests/test_distributed.py::test_two_process_library_sharded_match): two
processes join a coordinator with gloo CPU collectives, mmap-reload their
own checkpoint shards, and the cross-process library-sharded matcher must
reproduce single-process scores exactly.  The collective code paths it
feeds (parallel.sharded / parallel.dedup) are additionally validated on
the virtual CPU mesh.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join (or re-join after failure) the multihost job.

    No-op in a single-process environment; with arguments (or the standard
    cluster env vars) delegates to jax.distributed.initialize, after which
    jax.devices() spans the pod and the (data, library) mesh in
    parallel.mesh.make_mesh shards across slices (collectives ride ICI inside
    a slice, DCN across slices — XLA picks per mesh axis layout).
    """
    if coordinator_address is None and num_processes is None:
        return  # single-process: nothing to join
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def shard_bounds(total: int, process_id: int, num_processes: int) -> tuple[int, int]:
    """Library shard [start, end) owned by a host — the unit of checkpoint
    reload on restart."""
    per = -(-total // num_processes)
    start = min(process_id * per, total)
    return start, min(start + per, total)
