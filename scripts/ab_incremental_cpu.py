"""CPU A/B: full-rematch vs incremental per-tick cost as a stream ages.

The incremental rematch's claim is asymptotic — O(new subfingerprints) per
tick instead of O(stream age) — and the on-chip numbers ride the queued
bench (`bench.py --streaming-identify`).  This measures the SHAPE of the
claim host-side: per-tick wall time of both modes at increasing stream
age, same queries, same library, scores asserted bitwise equal at every
point.  Expect full's tick cost to grow roughly linearly with age and
incremental's to stay flat.

Writes scripts/ab_incremental_cpu.json.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_incremental_cpu.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lbaudiodetective_tpu.config import FingerprintConfig  # noqa: E402
from lbaudiodetective_tpu.models.fingerprint import Fingerprint  # noqa: E402
from lbaudiodetective_tpu.models.library import FingerprintLibrary  # noqa: E402
from lbaudiodetective_tpu.ops.match import match_one_vs_many_padded  # noqa: E402
from lbaudiodetective_tpu.streaming.incremental import (  # noqa: E402
    IncrementalLibraryMatcher)

B, L, S_LIB, PAIRS = 8, 512, 24, 100
K_TICK, AGES = 4, (16, 32, 64, 128, 256)


def full_scores(lib_pos, lib_neg, counts, qp, qn, n):
    batched = jax.vmap(match_one_vs_many_padded,
                       in_axes=(0, 0, 0, None, None, None, None, None))
    nq = np.full((B,), n, np.int32)
    return np.asarray(batched(qp[:, :n], qn[:, :n], nq, lib_pos, lib_neg,
                              counts, 0, 2 * PAIRS))


def main():
    rng = np.random.default_rng(5)
    cfg = FingerprintConfig()
    fps = []
    for _ in range(L):
        pos = (rng.random((S_LIB, PAIRS)) < 0.5).astype(np.uint8)
        neg = ((rng.random((S_LIB, PAIRS)) < 0.5) & (pos == 0)).astype(np.uint8)
        fps.append(Fingerprint(pos, neg))
    lib = FingerprintLibrary.from_fingerprints(fps, cfg)

    from lbaudiodetective_tpu.utils import packing

    lib_pos = np.asarray(packing.unpack_bits(np.asarray(lib.pos_words), PAIRS))
    lib_neg = np.asarray(packing.unpack_bits(np.asarray(lib.neg_words), PAIRS))
    # Pad the library subfingerprint axis to the max age so the full
    # rematch keeps one compiled shape per age (its real serving behaviour:
    # bucketed query, padded library).
    s_pad = max(AGES)
    lib_pos = np.pad(lib_pos, ((0, 0), (0, s_pad - S_LIB), (0, 0)))
    lib_neg = np.pad(lib_neg, ((0, 0), (0, s_pad - S_LIB), (0, 0)))
    lib_pos_j = jax.numpy.asarray(lib_pos)
    lib_neg_j = jax.numpy.asarray(lib_neg)

    n_max = max(AGES)
    qp = np.zeros((B, n_max, PAIRS), np.uint8)
    qn = np.zeros_like(qp)
    for i in range(B):
        sign = rng.random((n_max, PAIRS)) < 0.5
        nz = rng.random((n_max, PAIRS)) > 0.03
        qp[i] = (sign & nz).astype(np.uint8)
        qn[i] = ((~sign) & nz).astype(np.uint8)

    inc = IncrementalLibraryMatcher(lib, batch=B, n_cap=n_max, config=cfg)
    rows = []
    n = 0
    for age in AGES:
        while n < age:
            inc.update(qp[:, n:n + K_TICK], qn[:, n:n + K_TICK])
            n += K_TICK
        # Warm both compiled shapes, then time (median of 5).
        inc_scores = inc.scores()
        f_scores = full_scores(lib_pos_j, lib_neg_j, lib.counts, qp, qn, n)
        np.testing.assert_array_equal(inc_scores, f_scores)

        t_inc = []
        for _ in range(5):
            t0 = time.perf_counter()
            inc.update(np.zeros((B, K_TICK, PAIRS), np.uint8),
                       np.zeros((B, K_TICK, PAIRS), np.uint8), k_valid=0)
            inc.scores()
            t_inc.append(time.perf_counter() - t0)
        t_full = []
        for _ in range(5):
            t0 = time.perf_counter()
            full_scores(lib_pos_j, lib_neg_j, lib.counts, qp, qn, n)
            t_full.append(time.perf_counter() - t0)
        rows.append(dict(age=n, full_ms=1e3 * float(np.median(t_full)),
                         incremental_ms=1e3 * float(np.median(t_inc))))
        print(f"age {n:4d}: full {rows[-1]['full_ms']:7.1f} ms/tick   "
              f"incremental {rows[-1]['incremental_ms']:7.1f} ms/tick",
              flush=True)

    r0, r1 = rows[0], rows[-1]
    print(f"\nage x{r1['age'] // r0['age']}: full tick grew "
          f"x{r1['full_ms'] / r0['full_ms']:.1f}, incremental "
          f"x{r1['incremental_ms'] / r0['incremental_ms']:.1f}")
    with open(REPO / "scripts" / "ab_incremental_cpu.json", "w") as f:
        json.dump({"batch": B, "library": L, "k_tick": K_TICK,
                   "rows": rows}, f, indent=2)
    print("wrote scripts/ab_incremental_cpu.json")


if __name__ == "__main__":
    main()
