"""Pallas partial-bitonic sign selection vs the XLA stable-sort semantics.

The kernel must be element-exact (same top-k membership AND rank order,
including |coeff| ties broken toward the lower flat index — the reference's
NSNumber-sort behaviour, LBAudioDetectiveFrame.m:165-191)."""

import numpy as np
import jax.numpy as jnp

from lbaudiodetective_tpu.ops.pallas.select_signs import (
    select_sign_classes, select_sign_classes_padded)


def _ref_cls(flat, k=128):
    bits = flat.view(np.uint32)
    keys = ~(bits & 0x7FFFFFFF)
    cls = (flat > 0).astype(np.uint8) + 2 * (flat < 0).astype(np.uint8)
    order = np.argsort(keys, axis=-1, kind="stable")
    return np.take_along_axis(cls, order, axis=-1)[:, :k].astype(np.int32)


def _check(x):
    got = np.asarray(select_sign_classes(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, _ref_cls(x))


def test_random():
    rng = np.random.default_rng(0)
    _check(rng.standard_normal((64, 4096)).astype(np.float32))


def test_plus_minus_tie_pairs():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 4096)).astype(np.float32)
    x[:, 1::2] = -x[:, ::2]          # every |value| duplicated with both signs
    _check(x)


def test_k_boundary_ties():
    x = np.zeros((64, 4096), np.float32)
    x[:, :50] = 1.5
    x[:, 100:160] = -1.5             # 110 equal-|x| elements straddling k=100
    _check(x)


def test_all_zero_and_few_values():
    _check(np.zeros((32, 4096), np.float32))
    rng = np.random.default_rng(2)
    x = rng.choice(np.float32([0.5, -0.5, 2.0, -2.0, 0.0]), size=(32, 4096))
    _check(x.astype(np.float32))


def test_padding_path():
    # 36 frames with f_blk=8 forces a 4-frame zero pad; trailing frames must
    # come back untouched and un-truncated.
    rng = np.random.default_rng(3)
    x = rng.standard_normal((36, 4096)).astype(np.float32)
    got = np.asarray(select_sign_classes_padded(jnp.asarray(x), f_blk=8,
                                                interpret=True))
    assert got.shape == (36, 128)
    np.testing.assert_array_equal(got, _ref_cls(x))


def test_nan_and_inf_classes_match_xla_path():
    # NaN classifies as 0 in the XLA path ((x>0) and (x<0) both false) and
    # must here too; +/-inf keep their sign class.
    rng = np.random.default_rng(4)
    x = rng.standard_normal((32, 4096)).astype(np.float32)
    x[:, 7] = np.nan
    x[:, 11] = np.inf
    x[:, 13] = -np.inf
    got = np.asarray(select_sign_classes(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, _ref_cls(x))
