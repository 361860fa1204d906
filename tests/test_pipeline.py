"""Pipelined decode->extract->match: results must equal the unpipelined path."""

import numpy as np
import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.ops.extract import required_padded_length
from lbaudiodetective_tpu.ops.match import match_one_vs_many_padded
from lbaudiodetective_tpu.parallel.pipeline import PipelinedIdentifier
from tests.test_match import random_fp


def test_pipeline_matches_direct():
    cfg = FingerprintConfig()
    rng = np.random.default_rng(90)
    # Library of random fingerprints.
    l, s_lib = 6, 16
    lib = [random_fp(rng, int(n)) for n in rng.integers(4, s_lib + 1, size=l)]
    lib_pos = np.zeros((l, s_lib, 100), np.uint8)
    lib_neg = np.zeros((l, s_lib, 100), np.uint8)
    counts = np.zeros(l, np.int32)
    for i, (p, n) in enumerate(lib):
        counts[i] = p.shape[0]
        lib_pos[i, :p.shape[0]] = p
        lib_neg[i, :n.shape[0]] = n

    pipe = PipelinedIdentifier(lib_pos, lib_neg, counts, cfg)

    n_rows = cfg.rows_per_frame  # 1 subfingerprint per clip
    t_pad = required_padded_length(cfg, n_rows)
    batches = []
    for _ in range(3):
        audio = (rng.standard_normal((2, t_pad)) * 0.1).astype(np.float32)
        batches.append((audio, np.ones(2, np.int64)))

    results = list(pipe.run(batches))
    assert len(results) == 3
    for scores in results:
        assert scores.shape == (2, l)

    # Direct (unpipelined) reference for batch 0.
    pos, neg = pipe._extract(batches[0][0], batches[0][1])
    s = max(s_lib, pos.shape[1])
    direct = np.asarray(match_one_vs_many_padded(
        jnp.pad(pos[0], ((0, s - pos.shape[1]), (0, 0))),
        jnp.pad(neg[0], ((0, s - neg.shape[1]), (0, 0))),
        jnp.int32(1),
        jnp.pad(jnp.asarray(lib_pos), ((0, 0), (0, s - s_lib), (0, 0))),
        jnp.pad(jnp.asarray(lib_neg), ((0, 0), (0, s - s_lib), (0, 0))),
        jnp.asarray(counts), 0, cfg.subfingerprint_length))
    np.testing.assert_allclose(results[0][0], direct, atol=1e-6)
