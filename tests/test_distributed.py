"""Multihost init wrapper + restart/re-join flow, in mocked single-process
form (no pod in CI; the collectives it feeds are tested on the CPU mesh)."""

import numpy as np
import pytest

import jax

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.models.fingerprint import Fingerprint
from lbaudiodetective_tpu.parallel import distributed
from lbaudiodetective_tpu.utils.serialize import load_library, save_library


def test_initialize_single_process_is_noop(monkeypatch):
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    distributed.initialize()
    assert calls == []


def test_initialize_joins_cluster(monkeypatch):
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    distributed.initialize("coord:1234", num_processes=4, process_id=2)
    assert calls == [{"coordinator_address": "coord:1234",
                      "num_processes": 4, "process_id": 2}]


def test_shard_bounds_cover_and_partition():
    total = 103
    seen = []
    for pid in range(8):
        lo, hi = distributed.shard_bounds(total, pid, 8)
        assert 0 <= lo <= hi <= total
        seen.extend(range(lo, hi))
    assert seen == list(range(total))          # disjoint + complete
    assert distributed.shard_bounds(3, 7, 8) == (3, 3)   # empty tail shard


def test_rejoin_reloads_shard_and_scores_match(tmp_path, monkeypatch):
    """Failure-recovery flow (SURVEY §5): a host re-joins (mocked), reloads
    its library shard from the checkpoint, and produces identical scores."""
    from lbaudiodetective_tpu.ops.match_packed import match_one_vs_many_packed

    rng = np.random.default_rng(77)
    cfg = FingerprintConfig()
    fps = []
    for _ in range(12):
        cls = rng.choice(3, size=(16, cfg.num_wavelet_pairs))
        fps.append(Fingerprint.from_planes(
            (cls == 1).astype(np.uint8), (cls == 2).astype(np.uint8)))

    lo, hi = distributed.shard_bounds(len(fps), process_id=1, num_processes=3)
    shard_file = str(tmp_path / "shard1.npz")
    save_library(shard_file, fps[lo:hi], cfg)

    q = fps[lo + 1].packed()
    pos_w, neg_w, counts, pairs = load_library(shard_file, cfg)
    before = np.asarray(match_one_vs_many_packed(
        q[0], q[1], np.int32(fps[lo + 1].num_subfingerprints),
        pos_w, neg_w, counts, pairs))

    # "Crash" and re-join: fresh initialize (mocked), reload from checkpoint.
    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: None)
    distributed.initialize("coord:1234", num_processes=3, process_id=1)
    pos_w2, neg_w2, counts2, pairs2 = load_library(shard_file, cfg)
    after = np.asarray(match_one_vs_many_packed(
        q[0], q[1], np.int32(fps[lo + 1].num_subfingerprints),
        pos_w2, neg_w2, counts2, pairs2))

    np.testing.assert_array_equal(before, after)
    assert after[1] == pytest.approx(1.0)       # self-match inside the shard
