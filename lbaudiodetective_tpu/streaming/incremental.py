"""Incremental streaming library matching: O(new subfingerprints) per tick.

The straightforward streaming identify loop re-matches every stream's FULL
accumulated fingerprint against the library each tick
(streaming/identify.py::_match_now) — per-tick cost grows linearly with
stream age, O(n · S · L) for n accumulated subfingerprints.  But the
quirk-Q10 offset-slide score (LBAudioDetectiveFingerprint.m:119-176) is a
max over banded-diagonal MEANS, and each diagonal's sum is a running sum
over query subfingerprints: a new subfingerprint only APPENDS terms.  This
module maintains those diagonal sums as device state:

  orientation A (entry is fp1, used while n <= n_lib):
      D_A[b, e, d] = sum_{i<n} hits[e, d+i, i] * inv_lib[e, d+i]
      new sub i adds its [S] column, shifted to diagonal origin
  orientation B (query is fp1, used once n > n_lib):
      D_B[b, e, d] = sum_{j<n_lib} hits[e, j, d+j] * inv_q[d+j]
      new sub i adds its reversed [S] row at window [i-S+1, i]

so each tick costs O(k · S · L) for k new subfingerprints — independent of
stream age.  Scores are BITWISE equal to
ops.match.match_one_vs_many_padded on the accumulated planes: hit counts
are exact f32 integers (products are {0,1}, sums < 2^24), and the
accumulation order over query subfingerprints (ascending arrival) is the
same order `_both_orientation_scores` uses in its roll-sum loop.

Mesh scaling: every update/score op is elementwise or batched along the
library axis, so with a :class:`ShardedFingerprintLibrary` the planes AND
the diagonal state shard over the mesh's ``"library"`` axis with ZERO
per-tick collectives (the only cross-device traffic is the [batch, L]
score fetch).  The state is the scaling pressure — batch·L·(S + n_cap)·4
bytes (e.g. 256 streams × 16k entries × (32+256) diags ≈ 4.7 GB) — and
library-axis sharding divides it across the pod.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from lbaudiodetective_tpu.config import FingerprintConfig
from lbaudiodetective_tpu.models.library import FingerprintLibrary
from lbaudiodetective_tpu.ops.match import _pair_mask


@lru_cache(maxsize=None)
def _state_init_fn(g: int, l: int, s: int, d_cap: int, sharding):
    """Cached jitted zero-state initializer (one compile per geometry —
    per-session clones must NOT retrace; shardings are hashable)."""
    fn = lambda: (jnp.zeros((g, l, s), jnp.float32),      # noqa: E731
                  jnp.zeros((g, l, d_cap), jnp.float32))
    if sharding is not None:
        return jax.jit(fn, out_shardings=(sharding, sharding))
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _grow_fn(extra: int, sharding):
    """Cached jitted orientation-B capacity growth: appending zero diagonal
    slots is EXACT — diagonal ``d`` only receives contributions from arrival
    indices ``i`` in ``[d, d+S)``, so every slot at ``d >= n`` is still
    all-zero when the stream age is ``n``."""
    fn = lambda d_b: jnp.pad(d_b, ((0, 0), (0, 0), (0, extra)))  # noqa: E731
    if sharding is not None:
        return jax.jit(fn, out_shardings=sharding)
    return jax.jit(fn)


@partial(jax.jit, static_argnames=("comparison_range", "subfingerprint_length"))
def _update_group(d_a, d_b, lib_pos, lib_neg, n_lib,
                  qp_new, qn_new, k_valid, base,
                  comparison_range: int, subfingerprint_length: int):
    """Fold ``k`` new subfingerprints (per stream of one group) into the
    diagonal accumulators.

    d_a: [G, L, S]; d_b: [G, L, Dcap]; lib planes: [L, S, pairs] uint8;
    qp_new/qn_new: [G, k, pairs] uint8; k_valid: scalar int32 (<= k);
    base: scalar int32 — the arrival index of qp_new[:, 0].
    """
    g, l, s = d_a.shape
    pairs = lib_pos.shape[-1]
    k = qp_new.shape[1]
    mask = jnp.asarray(_pair_mask(pairs, comparison_range,
                                  subfingerprint_length))
    mb = mask.astype(jnp.bfloat16)

    lp = lib_pos.reshape(l * s, pairs).astype(jnp.bfloat16) * mb
    ln = lib_neg.reshape(l * s, pairs).astype(jnp.bfloat16) * mb
    qp = qp_new.astype(jnp.bfloat16)
    qn = qn_new.astype(jnp.bfloat16)
    # hits[gr, e, j, t]: same contraction as match_one_vs_many_padded
    # ([L*S, pairs] @ [pairs, G*k]) — exact integers in f32.
    hits = (jnp.dot(lp, qp.reshape(g * k, pairs).T,
                    preferred_element_type=jnp.float32)
            + jnp.dot(ln, qn.reshape(g * k, pairs).T,
                      preferred_element_type=jnp.float32))
    hits = hits.reshape(l, s, g, k).transpose(2, 0, 1, 3)      # [G, L, S, k]

    w_lib = jnp.sum((lp + ln).astype(jnp.float32), axis=-1).reshape(l, s)
    inv_lib = jnp.where(w_lib > 0.0, 1.0 / jnp.maximum(w_lib, 1.0), 0.0)
    w_q = jnp.sum(((qp + qn) * mb).astype(jnp.float32), axis=-1)   # [G, k]
    inv_q = jnp.where(w_q > 0.0, 1.0 / jnp.maximum(w_q, 1.0), 0.0)

    d_idx = jnp.arange(s)
    lib_row_valid = (d_idx[None, :] < n_lib[:, None]).astype(jnp.float32)

    d_cap = d_b.shape[-1]
    d_b_pad = jnp.pad(d_b, ((0, 0), (0, 0), (s, s)))

    def fold_one(t, carry):
        # Sequential ascending-arrival fold (fori_loop, NOT an unrolled
        # Python loop: k buckets up to 256 and an unrolled body of [G,L,S]
        # ops at that size compiles for minutes; the loop form compiles
        # once and small).  Order — and therefore f32 accumulation — is
        # identical to the unrolled form, keeping the bitwise claim.
        d_a, d_b_pad = carry
        live = (t < k_valid).astype(jnp.float32)
        i = base + t                                  # arrival index
        h_t = jax.lax.dynamic_index_in_dim(hits, t, axis=3, keepdims=False)
        # Orientation A: column i contributes sim_a[e, d+i] to diagonal d
        # (dynamic left-shift with zero fill via pad + dynamic_slice).
        col = h_t * inv_lib[None, :, :] * live                 # [G, L, S]
        shifted = jax.lax.dynamic_slice(
            jnp.pad(col, ((0, 0), (0, 0), (0, s))), (0, 0, i), (g, l, s))
        d_a = d_a + shifted
        # Orientation B: row j of the library contributes at d = i - j;
        # reversed row rev[sidx] = hits[.., s-1-sidx, t] lands at
        # d = i - s + 1 + sidx, i.e. padded index i + 1 + sidx.
        inv_q_t = jax.lax.dynamic_index_in_dim(inv_q, t, axis=1,
                                               keepdims=False)
        row = h_t * lib_row_valid[None, :, :] \
            * inv_q_t[:, None, None] * live
        rev = jnp.flip(row, axis=-1)
        window = jax.lax.dynamic_slice(
            d_b_pad, (0, 0, i + 1), (g, l, s))
        d_b_pad = jax.lax.dynamic_update_slice(
            d_b_pad, window + rev, (0, 0, i + 1))
        return d_a, d_b_pad

    d_a, d_b_pad = jax.lax.fori_loop(0, k, fold_one, (d_a, d_b_pad))
    d_b = jax.lax.dynamic_slice(d_b_pad, (0, 0, s), (g, l, d_cap))
    return d_a, d_b


@lru_cache(maxsize=None)
def _topk_fn(k: int, true_l: int):
    """Cached jitted top-k over a group's scores (padded entries masked to
    -inf so they can never enter the winners)."""

    @jax.jit
    def fn(d_a, d_b, n_lib, n):
        sc = _scores_group(d_a, d_b, n_lib, n)
        l = sc.shape[1]
        live = jnp.arange(l)[None, :] < true_l
        return jax.lax.top_k(jnp.where(live, sc, -jnp.inf), k)

    return fn


@jax.jit
def _scores_group(d_a, d_b, n_lib, n):
    """[G, L] scores from the accumulators (selection + masks exactly as
    ops.match._both_orientation_scores)."""
    g, l, s = d_a.shape
    d_cap = d_b.shape[-1]
    nf = jnp.maximum(n, 1).astype(jnp.float32)
    means_a = d_a / nf
    valid_a = jnp.arange(s)[None, None, :] <= (n_lib[None, :] - n)[..., None]
    score_a = jnp.max(jnp.where(valid_a, means_a, 0.0), axis=-1)
    score_a = jnp.where(n > 0, score_a, 0.0)

    means_b = d_b / jnp.maximum(n_lib, 1).astype(jnp.float32)[None, :, None]
    valid_b = jnp.arange(d_cap)[None, None, :] <= (n - n_lib[None, :])[..., None]
    score_b = jnp.max(jnp.where(valid_b, means_b, 0.0), axis=-1)
    score_b = jnp.where(n_lib[None, :] > 0, score_b, 0.0)
    return jnp.where(n_lib[None, :] < n, score_b, score_a)


class IncrementalLibraryMatcher:
    """Running Q10 scores of ``batch`` growing queries vs a library.

    ``update(new_pos, new_neg, k_valid)`` folds the next ``k_valid``
    subfingerprints of every stream in (arrays may be padded along the
    subfingerprint axis); ``scores()`` returns the ``[batch, L]`` match
    scores of each stream's full accumulated fingerprint — bitwise equal to
    ``match_one_vs_many_padded`` on those planes, at O(k) per update
    instead of O(n).

    ``n_cap`` is the INITIAL orientation-B diagonal capacity; when a stream
    outgrows it the state auto-grows by doubling (zero-padding new diagonal
    slots is exact — see :func:`_grow_fn` — so scores stay bitwise equal;
    memory then scales with stream age, which exact Q10 over a growing
    query inherently requires).  Set ``grow=False`` to keep the old
    hard-cap behaviour (update raises past ``n_cap``).
    ``stream_group`` > 0 processes streams in groups of that size
    (bounds the [G, L, S, k] hit transient); state is held per group.

    A :class:`~..parallel.sharded_library.ShardedFingerprintLibrary` is
    accepted too: planes and diagonal state then shard along the mesh's
    ``"library"`` axis (pure data parallelism — no per-tick collectives).
    """

    def __init__(self, library, batch: int,
                 n_cap: int = 256, config: FingerprintConfig | None = None,
                 comparison_range: int = 0, stream_group: int = 0,
                 grow: bool = True):
        from lbaudiodetective_tpu.utils import packing

        self.config = config or FingerprintConfig()
        self.library = library
        self.batch = batch
        self.n_cap = n_cap
        self.grow = grow
        self.comparison_range = comparison_range
        g = stream_group or batch
        if batch % g:
            raise ValueError("stream_group must divide batch")
        self.group = g
        mesh = getattr(library, "mesh", None)
        inner = library.inner if mesh is not None else library
        self.pairs = inner.pairs
        pos_u8 = packing.unpack_bits(np.asarray(inner.pos_words), inner.pairs)
        neg_u8 = packing.unpack_bits(np.asarray(inner.neg_words), inner.pairs)
        counts = np.asarray(inner.counts)
        self._true_l = len(inner)
        s = int(pos_u8.shape[1])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            pad = (-self._true_l) % mesh.shape["library"]
            if pad:   # padded entries carry count 0 -> always score 0
                pos_u8 = np.pad(pos_u8, ((0, pad), (0, 0), (0, 0)))
                neg_u8 = np.pad(neg_u8, ((0, pad), (0, 0), (0, 0)))
                counts = np.pad(counts, (0, pad))
            lib_sh = NamedSharding(mesh, P("library", None, None))
            self._lib_pos = jax.device_put(pos_u8, lib_sh)
            self._lib_neg = jax.device_put(neg_u8, lib_sh)
            self._n_lib = jax.device_put(counts,
                                         NamedSharding(mesh, P("library")))
            self._sh_a = NamedSharding(mesh, P(None, "library", None))
            l = int(pos_u8.shape[0])
        else:
            self._lib_pos = jnp.asarray(pos_u8)
            self._lib_neg = jnp.asarray(neg_u8)
            self._n_lib = jnp.asarray(counts)
            self._sh_a = None
            l = self._true_l
        self._geom = (g, l, s)
        make_state = _state_init_fn(g, l, s, n_cap, self._sh_a)
        self._state = [make_state() for _ in range(batch // g)]
        self.n = 0

    def clone_empty(self) -> "IncrementalLibraryMatcher":
        """A fresh-state matcher SHARING this one's device-resident library
        planes (the expensive part: unpack + placement).  Serving keeps one
        template per library and mints per-session clones from it."""
        new = object.__new__(IncrementalLibraryMatcher)
        new.__dict__.update(self.__dict__)
        g, l, s = self._geom
        make_state = _state_init_fn(g, l, s, self.n_cap, self._sh_a)
        new._state = [make_state() for _ in range(self.batch // g)]
        new.n = 0
        return new

    def update(self, new_pos: np.ndarray, new_neg: np.ndarray,
               k_valid: int | None = None) -> None:
        """new_pos/new_neg: [batch, k, pairs] uint8 (zero-padded beyond
        ``k_valid``); every stream advances by the same ``k_valid`` (the
        lockstep-extractor contract)."""
        k = int(new_pos.shape[1])
        k_valid = k if k_valid is None else int(k_valid)
        if self.n + k_valid > self.n_cap:
            if not self.grow:
                raise ValueError(
                    f"stream age {self.n + k_valid} exceeds n_cap={self.n_cap}")
            new_cap = max(self.n_cap * 2, self.n + k_valid)
            growf = _grow_fn(new_cap - self.n_cap, self._sh_a)
            self._state = [(d_a, growf(d_b)) for d_a, d_b in self._state]
            self.n_cap = new_cap
        g = self.group
        for gi in range(self.batch // g):
            d_a, d_b = self._state[gi]
            self._state[gi] = _update_group(
                d_a, d_b, self._lib_pos, self._lib_neg, self._n_lib,
                jnp.asarray(new_pos[gi * g:(gi + 1) * g]),
                jnp.asarray(new_neg[gi * g:(gi + 1) * g]),
                jnp.int32(k_valid), jnp.int32(self.n),
                self.comparison_range, self.config.subfingerprint_length)
        self.n += k_valid

    def update_bucketed(self, new_pos: np.ndarray,
                        new_neg: np.ndarray) -> None:
        """:meth:`update` with the ``k`` axis zero-padded to the next power
        of two.  ``k`` is a static shape of the jitted update kernel, so a
        live stream posting uneven increments (the normal recording case)
        would otherwise compile one kernel per distinct increment size;
        bucketing bounds that at O(log max_k) compiles."""
        k = int(new_pos.shape[1])
        if k == 0:
            return
        kb = 1 << (k - 1).bit_length()
        if kb != k:
            padw = ((0, 0), (0, kb - k), (0, 0))
            new_pos = np.pad(np.asarray(new_pos), padw)
            new_neg = np.pad(np.asarray(new_neg), padw)
        self.update(new_pos, new_neg, k_valid=k)

    # -- session persistence ---------------------------------------------
    #
    # A live-recognition server restart would otherwise lose every
    # session's accumulated diagonal state (the audio is gone — the client
    # only ever posted subfingerprint increments).  State is tiny next to
    # the library planes and fully determines the running scores, so it
    # round-trips through one npz per matcher.

    def _state_key(self) -> str:
        """Geometry + library identity a restored state must match
        (the diagonals are meaningless against different planes).
        Memoized — clones share it via ``clone_empty``'s dict copy."""
        import hashlib

        cached = self.__dict__.get("_state_key_cache")
        if cached is not None:
            return cached
        h = hashlib.sha256()
        inner = (self.library.inner
                 if getattr(self.library, "mesh", None) is not None
                 else self.library)
        h.update(np.ascontiguousarray(np.asarray(inner.pos_words)).tobytes())
        h.update(np.ascontiguousarray(np.asarray(inner.neg_words)).tobytes())
        h.update(np.ascontiguousarray(np.asarray(inner.counts)).tobytes())
        g, l, s = self._geom
        h.update(f"{g},{l},{s},{self.batch},{self.pairs},"
                 f"{self.comparison_range},"
                 f"{self.config.subfingerprint_length}".encode())
        self._state_key_cache = h.hexdigest()[:16]
        return self._state_key_cache

    def save_state(self, path: str) -> None:
        """Checkpoint the accumulated diagonal state (all stream groups)
        plus the stream age; the library itself is NOT saved."""
        arrays = {}
        for gi, (d_a, d_b) in enumerate(self._state):
            arrays[f"da_{gi}"] = np.asarray(d_a)
            arrays[f"db_{gi}"] = np.asarray(d_b)
        np.savez(path, n=np.int64(self.n), n_groups=np.int64(len(self._state)),
                 state_key=np.bytes_(self._state_key().encode()), **arrays)

    def restore_state(self, path: str) -> None:
        """Load a checkpoint saved by :meth:`save_state` into this matcher
        (typically a fresh ``clone_empty``).  Raises ``ValueError`` on a
        geometry/library mismatch.  The orientation-B capacity adopts the
        checkpoint's (growth survives the round-trip)."""
        with np.load(path) as z:
            stored = bytes(z["state_key"]).decode()
            if stored != self._state_key():
                raise ValueError(
                    "session state was saved against a different library "
                    "or stream geometry")
            n_groups = int(z["n_groups"])
            if n_groups != len(self._state):
                raise ValueError("stream group count mismatch")
            state = []
            for gi in range(n_groups):
                d_a, d_b = z[f"da_{gi}"], z[f"db_{gi}"]
                if self._sh_a is not None:
                    d_a = jax.device_put(d_a, self._sh_a)
                    d_b = jax.device_put(d_b, self._sh_a)
                else:
                    d_a, d_b = jnp.asarray(d_a), jnp.asarray(d_b)
                state.append((d_a, d_b))
            self._state = state
            self.n_cap = int(state[0][1].shape[-1])
            self.n = int(z["n"])

    def scores(self) -> np.ndarray:
        """[batch, L] running match scores (padded mesh entries trimmed)."""
        parts = [np.asarray(_scores_group(d_a, d_b, self._n_lib,
                                          jnp.int32(self.n)))
                 for d_a, d_b in self._state]
        return np.concatenate(parts, axis=0)[:, :self._true_l]

    def top_k(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Device-side top-k: ``([batch, k] scores, [batch, k] indices)``,
        descending, ties broken by lowest index (``lax.top_k``).  Fetches
        ``k`` values per stream instead of the full ``[batch, L]`` score
        plane — the per-post transfer the serving edge actually needs
        (256 KB -> ~100 B per post at the 64k-track session bound).
        Padded mesh entries are masked out before selection."""
        k = min(k, self._true_l)
        fn = _topk_fn(k, self._true_l)
        sc_parts, ix_parts = [], []
        for d_a, d_b in self._state:
            sc, ix = fn(d_a, d_b, self._n_lib, jnp.int32(self.n))
            sc_parts.append(np.asarray(sc))
            ix_parts.append(np.asarray(ix))
        return (np.concatenate(sc_parts, axis=0),
                np.concatenate(ix_parts, axis=0))
