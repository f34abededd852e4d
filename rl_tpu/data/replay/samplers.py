"""Replay samplers.

Counterparts of the reference samplers
(``/root/reference/torchrl/data/replay_buffers/samplers.py``:
``RandomSampler`` :181, ``SamplerWithoutReplacement`` :580,
``PrioritizedSampler`` :942 (C++/CUDA segment trees, csrc/segment_tree.h),
``SliceSampler`` :1696).

TPU design: a C++ sum-tree is pointless in HBM — prioritized sampling is
``cumsum`` + ``searchsorted`` (log-depth, MXU-free, bandwidth-bound over a
few MB) with scatter updates, fully inside jit.  The inverse-CDF semantics
match the reference's ``ScanLowerBound`` bit-for-bit in expectation.  A
host-side C++ segment tree remains available for host-RAM replay
(rl_tpu/csrc, later milestone).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data.tdict import TDict

__all__ = [
    "RandomSampler",
    "SamplerWithoutReplacement",
    "PrioritizedSampler",
    "SliceSampler",
    "SliceSamplerWithoutReplacement",
    "PrioritizedSliceSampler",
    "HostPrioritizedSampler",
    "ConsumingSampler",
    "StalenessAwareSampler",
    "PromptGroupSampler",
    "SamplerEnsemble",
]


class RandomSampler:
    """Uniform with replacement (reference samplers.py:181)."""

    def __init__(self, capacity: int):
        self.capacity = int(capacity)

    def init(self) -> TDict:
        return TDict()

    def extend(self, sstate: TDict, idx) -> TDict:
        return sstate

    def sample(self, sstate: TDict, size, batch_size: int, key):
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(size, 1))
        return sstate, idx, TDict()

    def update_priority(self, sstate, idx, priority) -> TDict:
        return sstate


class SamplerWithoutReplacement:
    """Epoch-style sampling without replacement (reference samplers.py:580).

    Requires a FULL storage (on-policy minibatching: buffer refilled each
    iteration) so shapes stay static.  State: a permutation and a position;
    reshuffles when exhausted.
    """

    def __init__(self, capacity: int, shuffle: bool = True):
        self.capacity = int(capacity)
        self.shuffle = shuffle

    def init(self) -> TDict:
        return TDict(
            perm=jnp.arange(self.capacity, dtype=jnp.int32),
            pos=jnp.zeros((), jnp.int32),
            seeded=jnp.zeros((), jnp.bool_),
        )

    def extend(self, sstate: TDict, idx) -> TDict:
        # new data invalidates the current epoch
        return sstate.set("pos", jnp.zeros((), jnp.int32)).set(
            "seeded", jnp.zeros((), jnp.bool_)
        )

    def sample(self, sstate: TDict, size, batch_size: int, key):
        def reshuffle(s):
            perm = (
                jax.random.permutation(key, self.capacity).astype(jnp.int32)
                if self.shuffle
                else jnp.arange(self.capacity, dtype=jnp.int32)
            )
            return TDict(perm=perm, pos=jnp.zeros((), jnp.int32),
                         seeded=jnp.ones((), jnp.bool_))

        needs = (~sstate["seeded"]) | (sstate["pos"] + batch_size > self.capacity)
        sstate = jax.lax.cond(needs, reshuffle, lambda s: s, sstate)
        pos = sstate["pos"]
        idx = jax.lax.dynamic_slice(sstate["perm"], (pos,), (batch_size,))
        return sstate.set("pos", pos + batch_size), idx, TDict()

    def update_priority(self, sstate, idx, priority) -> TDict:
        return sstate


class PrioritizedSampler:
    """Proportional prioritized replay (Schaul et al. 2016; reference
    samplers.py:942).

    State: raw priorities ``[capacity]`` + pre-powered ``pa = (p+eps)^α``
    (zero on never-written slots, so no validity mask is needed) + running
    max.  Sampling is a TWO-LEVEL inverse CDF — the XLA-native equivalent
    of the reference's segment tree (csrc/segment_tree.h:289) tuned for
    wide vector units rather than pointer chasing:

    1. block sums ``pa.reshape(nb, B).sum(1)`` (a vector reduce, not the
       serial full-capacity ``cumsum`` the naive design needs — that scan
       was the measured replay bottleneck: 20 ms per draw at 1M slots),
    2. ``searchsorted`` over the ``nb``-long block CDF,
    3. a per-draw gather of ONE block row + a row-wise cumsum/searchsorted.

    IS weights follow the reference: ``w = (p/total)^{-β}`` normalized by
    the batch max.
    """

    BLOCK = 1024

    def __init__(self, capacity: int, alpha: float = 0.6, beta: float = 0.4,
                 eps: float = 1e-8):
        self.capacity = int(capacity)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.eps = float(eps)
        self.n_blocks = -(-self.capacity // self.BLOCK)
        self.padded = self.n_blocks * self.BLOCK

    def init(self) -> TDict:
        return TDict(
            priorities=jnp.zeros((self.capacity,), jnp.float32),
            pa=jnp.zeros((self.padded,), jnp.float32),
            max_priority=jnp.ones((), jnp.float32),
        )

    def extend(self, sstate: TDict, idx) -> TDict:
        """New items get the running max priority (reference default)."""
        idx = jnp.asarray(idx).reshape(-1)
        mx = sstate["max_priority"]
        p = sstate["priorities"].at[idx].set(mx)
        pa = sstate["pa"].at[idx].set((mx + self.eps) ** self.alpha)
        return sstate.set("priorities", p).set("pa", pa)

    def sample(self, sstate: TDict, size, batch_size: int, key, beta=None):
        beta = self.beta if beta is None else beta
        B, nb = self.BLOCK, self.n_blocks
        pa = sstate["pa"].reshape(nb, B)
        blocks = pa.sum(axis=1)                     # [nb] vector reduce
        bcdf = jnp.cumsum(blocks)                   # short scan
        total = bcdf[-1]
        u = jax.random.uniform(key, (batch_size,), minval=0.0, maxval=total)
        b = jnp.clip(jnp.searchsorted(bcdf, u, side="right"), 0, nb - 1)
        u_in = u - (bcdf[b] - blocks[b])
        rows = pa[b]                                # [batch, B] gather
        rcdf = jnp.cumsum(rows, axis=1)
        j = jnp.clip(jnp.sum(rcdf < u_in[:, None], axis=1), 0, B - 1)
        idx = jnp.clip(b * B + j, 0, self.capacity - 1).astype(jnp.int32)
        probs = sstate["pa"][idx] / jnp.maximum(total, 1e-12)
        weights = (jnp.maximum(probs, 1e-12) * jnp.maximum(size, 1)) ** (-beta)
        weights = weights / jnp.maximum(jnp.max(weights), 1e-12)
        return sstate, idx, TDict(_weight=weights, index=idx)

    def update_priority(self, sstate: TDict, idx, priority) -> TDict:
        idx = jnp.asarray(idx).reshape(-1)
        priority = jnp.abs(jnp.asarray(priority, jnp.float32).reshape(-1))
        p = sstate["priorities"].at[idx].set(priority)
        pa = sstate["pa"].at[idx].set((priority + self.eps) ** self.alpha)
        mx = jnp.maximum(sstate["max_priority"], jnp.max(priority))
        return TDict(priorities=p, pa=pa, max_priority=mx)


class HostPrioritizedSampler:
    """Prioritized sampler over host storages using the native C++ segment
    trees (the reference's CPU path: samplers.py:942 + csrc/segment_tree.h).

    Stateful host object (not jittable) — pairs with ``LazyMemmapStorage`` /
    ``ListStorage``; the device path is :class:`PrioritizedSampler`.
    Uses a sum tree for inverse-CDF sampling and a min tree for the max-IS
    -weight normalization, exactly like the reference.
    """

    def __init__(self, capacity: int, alpha: float = 0.6, beta: float = 0.4,
                 eps: float = 1e-8, dtype: str = "float64"):
        from .host_segment_tree import (
            MinSegmentTreeFp32,
            MinSegmentTreeFp64,
            SumSegmentTreeFp32,
            SumSegmentTreeFp64,
        )
        import numpy as np

        self.capacity = int(capacity)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.eps = float(eps)
        if dtype == "float32":
            self._sum_tree = SumSegmentTreeFp32(self.capacity)
            self._min_tree = MinSegmentTreeFp32(self.capacity)
        else:
            self._sum_tree = SumSegmentTreeFp64(self.capacity)
            self._min_tree = MinSegmentTreeFp64(self.capacity)
        self._max_priority = 1.0
        self._np = np

    def init(self):
        return None

    def extend(self, sstate, idx):
        np = self._np
        idx = np.asarray(idx).reshape(-1)
        p = (self._max_priority + self.eps) ** self.alpha
        self._sum_tree[idx] = np.full(len(idx), p)
        self._min_tree[idx] = np.full(len(idx), p)
        return sstate

    def sample(self, sstate, size, batch_size: int, rng=None):
        np = self._np
        rng = rng or np.random
        total = self._sum_tree.query(0, int(size))
        u = rng.rand(batch_size) * total
        idx = self._sum_tree.scan_lower_bound(u.astype(np.float64))
        idx = np.clip(idx, 0, int(size) - 1)
        probs = self._sum_tree[idx] / max(total, 1e-12)
        min_p = self._min_tree.query(0, int(size)) / max(total, 1e-12)
        weights = (probs / max(min_p, 1e-12)) ** (-self.beta)
        return sstate, idx, {"_weight": weights.astype(np.float32), "index": idx}

    def update_priority(self, sstate, idx, priority):
        np = self._np
        idx = np.asarray(idx).reshape(-1)
        priority = np.abs(np.asarray(priority, np.float64)).reshape(-1)
        self._max_priority = max(self._max_priority, float(priority.max()))
        pa = (priority + self.eps) ** self.alpha
        self._sum_tree[idx] = pa
        self._min_tree[idx] = pa
        return sstate

    # -- checkpointing (reference rb.dumps/loads include sampler state) ----
    def state_dict(self) -> dict:
        np = self._np
        idx = np.arange(self.capacity)
        return {"values": np.asarray(self._sum_tree[idx]),
                "max_priority": self._max_priority}

    def load_state_dict(self, sd: dict) -> None:
        np = self._np
        idx = np.arange(self.capacity)
        vals = np.asarray(sd["values"], np.float64)
        self._sum_tree[idx] = vals
        self._min_tree[idx] = vals
        self._max_priority = float(sd["max_priority"])


class SliceSampler:
    """Sample fixed-length sub-trajectory windows from flat storage
    (reference samplers.py:1696).

    The reference discovers episode starts/lengths from the stored
    ``("collector","traj_ids")`` (``_get_stop_and_length``); here the same
    episode table is maintained *at write time* in the sampler state, with
    static shapes so everything stays inside jit:

    * ``traj[capacity]``  — trajectory id per slot (from the written data's
      ``("collector","traj_ids")`` when present, else a pseudo-id derived
      from ``("next","done")`` boundaries, carried across extends);
    * ``age[capacity]``   — steps since that trajectory's first stored step;
    * ``wc[capacity]``    — absolute write counter per slot.

    Validity of a candidate window is then exact: element ``j`` of a window
    ending at ring slot ``e`` is valid iff its write counter is
    ``wc[e]-(L-1-j)`` (time-contiguity: this single check masks the ring
    write-cursor discontinuity AND freshly-overwritten heads) and its traj
    id matches the end's.  ``strict_length=True`` additionally restricts the
    *end draw* to slots with ``age >= L-1`` whose full window survived
    overwrites, so every sampled slice has exactly ``slice_len`` valid steps
    (the reference's strict mode; when no such end exists the mask comes
    back all-False instead of raising — jit cannot raise).

    Requires trajectory-contiguous writes (one stream per ``extend``, e.g.
    per-env flattening or whole episodes) — same layout contract as the
    reference storage.  Returns flattened indices ``[num_slices*slice_len]``
    plus info: ``mask``, ``truncated`` (True on each window's last valid
    element, for bootstrapping), ``slice_shape``.
    """

    needs_extend_data = True

    def __init__(self, capacity: int, num_slices: int | None = None,
                 slice_len: int | None = None, done_key=("next", "done"),
                 traj_key=("collector", "traj_ids"),
                 strict_length: bool = False, span: bool = True):
        self.capacity = int(capacity)
        self.num_slices = num_slices
        self.slice_len = slice_len
        self.done_key = done_key
        self.traj_key = traj_key
        self.strict_length = strict_length
        # span=True (default) lets non-strict windows start before the
        # episode head / storage start and masks the invalid prefix — the
        # reference's span-padding behaviour.  span=False with
        # strict_length=False is equivalent (masking already pads).
        self.span = span

    def _nL(self, batch_size: int):
        L = self.slice_len or (batch_size // (self.num_slices or 1))
        n = self.num_slices or (batch_size // L)
        return n, L

    def init(self) -> TDict:
        cap = self.capacity
        return TDict(
            traj=jnp.full((cap,), -1, jnp.int32),
            age=jnp.full((cap,), -1, jnp.int32),
            wc=jnp.full((cap,), -(2 ** 30), jnp.int32),
            next_wc=jnp.zeros((), jnp.int32),
            last_traj=jnp.zeros((), jnp.int32),
            last_age=jnp.full((), -1, jnp.int32),
            last_done=jnp.ones((), jnp.bool_),
        )

    def _episode_fields(self, sstate: TDict, idx, data):
        """Per-item (traj_id, age, write_counter) for an extend batch."""
        idx = jnp.asarray(idx).reshape(-1)
        N = idx.shape[0]
        i = jnp.arange(N, dtype=jnp.int32)
        wc = sstate["next_wc"] + i
        dones = None
        tids = None
        if data is not None:
            if self.traj_key in data:
                tids = jnp.asarray(data[self.traj_key]).reshape(-1).astype(jnp.int32)
            if self.done_key in data:
                dones = jnp.asarray(data[self.done_key]).reshape(N, -1)[:, 0]
        if tids is not None:
            changed = jnp.concatenate(
                [(tids[:1] != sstate["last_traj"]), tids[1:] != tids[:-1]])
            # also break on stored done even when ids are caller-provided
            prev_done = (jnp.concatenate([sstate["last_done"][None], dones[:-1]])
                         if dones is not None else jnp.zeros((N,), bool))
            starts = changed | prev_done
        else:
            prev_done = (jnp.concatenate([sstate["last_done"][None], dones[:-1]])
                         if dones is not None else
                         jnp.concatenate([sstate["last_done"][None],
                                          jnp.zeros((N - 1,), bool)]))
            starts = prev_done
            tids = sstate["last_traj"] + jnp.cumsum(starts.astype(jnp.int32))
        # age: distance to the most recent start, continuing the carried age
        start_pos = jax.lax.associative_scan(
            jnp.maximum, jnp.where(starts, i, -1))
        age = jnp.where(start_pos >= 0, i - start_pos,
                        i + sstate["last_age"] + 1)
        new_last_done = dones[-1] if dones is not None else jnp.asarray(False)
        return tids, age.astype(jnp.int32), wc, new_last_done

    def extend(self, sstate: TDict, idx, data=None) -> TDict:
        idx = jnp.asarray(idx).reshape(-1)
        tids, age, wc, last_done = self._episode_fields(sstate, idx, data)
        return TDict(
            traj=sstate["traj"].at[idx].set(tids),
            age=sstate["age"].at[idx].set(age),
            wc=sstate["wc"].at[idx].set(wc),
            next_wc=sstate["next_wc"] + idx.shape[0],
            last_traj=tids[-1],
            last_age=age[-1],
            last_done=last_done,
        )

    def _window(self, sstate: TDict, ends, L: int, dones=None):
        """Gather + validate windows ending at ring slots ``ends``."""
        cap = self.capacity
        offsets = jnp.arange(L, dtype=jnp.int32) - (L - 1)
        idx = (ends[:, None] + offsets[None, :]) % cap  # [n, L]
        wc, traj = sstate["wc"], sstate["traj"]
        expect_wc = wc[ends][:, None] + offsets[None, :]
        valid = (wc[idx] == expect_wc) & (traj[idx] == traj[ends][:, None])
        valid = valid & (sstate["age"][idx] >= 0)
        if dones is not None:
            # defensive cut on stored dones (covers done-without-traj-change)
            d = jnp.asarray(dones).reshape(-1)[idx]
            d2 = d.astype(jnp.int32).at[:, -1].set(0)
            suffix = jnp.flip(jnp.cumsum(jnp.flip(d2, axis=1), axis=1), axis=1)
            valid = valid & (suffix == 0)
        # each window's last valid element is a bootstrap cut (reference
        # writes ("next","truncated") there)
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        last_valid = jnp.max(jnp.where(valid, pos, -1), axis=1, keepdims=True)
        truncated = valid & (pos == last_valid)
        return idx, valid, truncated

    def _strict_end_ok(self, sstate: TDict, size, L: int):
        """[capacity] bool: slot can end a FULL length-L window."""
        cap = self.capacity
        e = jnp.arange(cap, dtype=jnp.int32)
        head = (e - (L - 1)) % cap
        ok = (sstate["age"] >= L - 1) & (sstate["wc"][head]
                                         == sstate["wc"] - (L - 1))
        return ok & (e < size)

    def _draw_ends(self, sstate: TDict, size, n: int, key):
        if self.strict_length:
            ok = self._strict_end_ok(sstate, size, self.slice_len or 1)
            logits = jnp.where(ok, 0.0, -jnp.inf)
            any_ok = jnp.any(ok)
            safe = jnp.where(any_ok, logits,
                             jnp.where(jnp.arange(self.capacity) < size,
                                       0.0, -jnp.inf))
            ends = jax.random.categorical(key, safe, shape=(n,)).astype(jnp.int32)
            return ends, any_ok
        ends = jax.random.randint(key, (n,), 0, jnp.maximum(size, 1))
        return ends.astype(jnp.int32), jnp.asarray(True)

    def sample(self, sstate: TDict, size, batch_size: int, key, dones=None):
        n, L = self._nL(batch_size)
        ends, any_ok = self._draw_ends(sstate, size, n, key)
        idx, valid, truncated = self._window(sstate, ends, L, dones)
        valid = valid & any_ok
        return sstate, idx.reshape(-1), TDict(
            mask=valid.reshape(-1), truncated=truncated.reshape(-1),
            slice_shape=jnp.asarray([n, L]), end_index=ends,
        )

    def update_priority(self, sstate, idx, priority) -> TDict:
        return sstate


class SliceSamplerWithoutReplacement(SliceSampler):
    """Epoch-style slice sampling: window end positions are drawn without
    replacement from a shuffled permutation (reference samplers.py:2789).
    Requires a full storage like SamplerWithoutReplacement."""

    def init(self) -> TDict:
        return super().init().update(TDict(
            perm=jnp.arange(self.capacity, dtype=jnp.int32),
            pos=jnp.zeros((), jnp.int32),
            seeded=jnp.zeros((), jnp.bool_),
        ))

    def extend(self, sstate: TDict, idx, data=None) -> TDict:
        out = super().extend(
            sstate.exclude("perm", "pos", "seeded"), idx, data)
        return out.update(TDict(
            perm=sstate["perm"], pos=jnp.zeros((), jnp.int32),
            seeded=jnp.zeros((), jnp.bool_),
        ))

    def sample(self, sstate: TDict, size, batch_size: int, key, dones=None):
        n, L = self._nL(batch_size)

        def reshuffle(s):
            perm = jax.random.permutation(key, self.capacity).astype(jnp.int32)
            return s.set("perm", perm).set("pos", jnp.zeros((), jnp.int32)) \
                    .set("seeded", jnp.ones((), jnp.bool_))

        needs = (~sstate["seeded"]) | (sstate["pos"] + n > self.capacity)
        sstate = jax.lax.cond(needs, reshuffle, lambda s: s, sstate)
        pos = sstate["pos"]
        ends = jax.lax.dynamic_slice(sstate["perm"], (pos,), (n,))
        ends = jnp.clip(ends, L - 1, jnp.maximum(size - 1, L - 1))
        sstate = sstate.set("pos", pos + n)
        idx, valid, truncated = self._window(sstate, ends, L, dones)
        return sstate, idx.reshape(-1), TDict(
            mask=valid.reshape(-1), truncated=truncated.reshape(-1),
            slice_shape=jnp.asarray([n, L]), end_index=ends,
        )


class PrioritizedSliceSampler(SliceSampler):
    """Slice sampling where window ends are drawn from a priority
    distribution (reference samplers.py:3091): combines the prioritized
    inverse-CDF with window gathering.  Priorities live per-transition; the
    window end is the prioritized draw."""

    def __init__(self, capacity: int, num_slices=None, slice_len=None,
                 alpha: float = 0.6, beta: float = 0.4, eps: float = 1e-8,
                 **kwargs):
        super().__init__(capacity, num_slices, slice_len, **kwargs)
        self._prio = PrioritizedSampler(capacity, alpha, beta, eps)

    def init(self) -> TDict:
        return super().init().set("prio", self._prio.init())

    def extend(self, sstate: TDict, idx, data=None) -> TDict:
        out = super().extend(sstate.exclude("prio"), idx, data)
        return out.set("prio", self._prio.extend(sstate["prio"], idx))

    def update_priority(self, sstate, idx, priority) -> TDict:
        return sstate.set(
            "prio", self._prio.update_priority(sstate["prio"], idx, priority)
        )

    def sample(self, sstate: TDict, size, batch_size: int, key, dones=None):
        n, L = self._nL(batch_size)
        pstate, ends, info = self._prio.sample(sstate["prio"], size, n, key)
        # no [L-1, size) clipping: the episode table masks short/invalid
        # windows exactly, and clipping would bias end-density at L-1
        # after a ring wrap (every slot is then a legitimate end)
        sstate = sstate.set("prio", pstate)
        idx, valid, truncated = self._window(sstate, ends, L, dones)
        weights = jnp.repeat(info["_weight"], L)
        return sstate, idx.reshape(-1), TDict(
            mask=valid.reshape(-1), truncated=truncated.reshape(-1),
            _weight=weights, slice_shape=jnp.asarray([n, L]), end_index=ends,
        )


class ConsumingSampler:
    """FIFO queue semantics: every item is sampled at most once, in write
    order (reference samplers.py:228 ``ConsumingSampler`` — used for
    off-policy pipelines where each transition is trained on exactly once).

    Static-shape design: state holds an absolute read cursor and a count of
    total items written; ``sample`` returns the next ``batch_size`` ring
    positions plus a ``mask`` marking which of them actually hold unconsumed
    data (all-False when the queue is drained — the caller can mask the loss
    instead of branching).
    """

    def __init__(self, capacity: int):
        self.capacity = int(capacity)

    def init(self) -> TDict:
        return TDict(read=jnp.zeros((), jnp.int32),
                     written=jnp.zeros((), jnp.int32))

    def extend(self, sstate: TDict, idx) -> TDict:
        n = jnp.asarray(idx).reshape(-1).shape[0]
        written = sstate["written"] + n
        # an overwriting ring push discards unread items that were lapped
        read = jnp.maximum(sstate["read"], written - self.capacity)
        return TDict(read=read, written=written)

    def sample(self, sstate: TDict, size, batch_size: int, key):
        avail = sstate["written"] - sstate["read"]
        offs = jnp.arange(batch_size, dtype=jnp.int32)
        mask = offs < avail
        idx = ((sstate["read"] + offs) % self.capacity).astype(jnp.int32)
        consumed = jnp.minimum(avail, batch_size)
        sstate = sstate.set("read", sstate["read"] + consumed)
        return sstate, idx, TDict(mask=mask)

    def update_priority(self, sstate, idx, priority) -> TDict:
        return sstate


class StalenessAwareSampler:
    """Uniform sampling restricted to items whose policy-version staleness
    is within a bound (reference samplers.py:735 ``StalenessAwareSampler``).

    ``extend`` stamps written items with the current policy version;
    ``bump_version`` advances it (call once per learner update).  ``sample``
    draws uniformly over items with ``version_now - version_item <=
    max_staleness`` via a masked categorical — fully inside jit.
    """

    def __init__(self, capacity: int, max_staleness: int = 2):
        self.capacity = int(capacity)
        self.max_staleness = int(max_staleness)

    def init(self) -> TDict:
        return TDict(
            item_version=jnp.full((self.capacity,), -(2**30), jnp.int32),
            version=jnp.zeros((), jnp.int32),
        )

    def bump_version(self, sstate: TDict, n: int = 1) -> TDict:
        return sstate.set("version", sstate["version"] + n)

    def extend(self, sstate: TDict, idx) -> TDict:
        iv = sstate["item_version"].at[jnp.asarray(idx).reshape(-1)].set(
            sstate["version"]
        )
        return sstate.set("item_version", iv)

    def sample(self, sstate: TDict, size, batch_size: int, key):
        stale = sstate["version"] - sstate["item_version"]
        valid = (jnp.arange(self.capacity) < size) & (stale <= self.max_staleness)
        logits = jnp.where(valid, 0.0, -jnp.inf)
        # degenerate all-stale case: fall back to uniform over [0, size)
        any_valid = jnp.any(valid)
        logits = jnp.where(
            any_valid, logits, jnp.where(jnp.arange(self.capacity) < size, 0.0, -jnp.inf)
        )
        idx = jax.random.categorical(key, logits, shape=(batch_size,)).astype(jnp.int32)
        return sstate, idx, TDict(staleness=stale[idx])

    def update_priority(self, sstate, idx, priority) -> TDict:
        return sstate


class PromptGroupSampler:
    """Sample whole prompt groups of ``group_size`` consecutive items
    (reference samplers.py:3576 ``PromptGroupSampler`` — the GRPO sampler:
    group-relative advantages need every completion of a prompt together).

    Assumes the writer lays groups out contiguously (the GRPO collector
    writes G completions per prompt back-to-back), so group g occupies
    ``[g*G, (g+1)*G)``.  ``batch_size`` must be a multiple of ``group_size``.
    """

    def __init__(self, capacity: int, group_size: int):
        if capacity % group_size:
            raise ValueError("capacity must be a multiple of group_size")
        self.capacity = int(capacity)
        self.group_size = int(group_size)

    def init(self) -> TDict:
        return TDict()

    def extend(self, sstate: TDict, idx) -> TDict:
        return sstate

    def sample(self, sstate: TDict, size, batch_size: int, key):
        G = self.group_size
        n_groups = batch_size // G
        avail_groups = jnp.maximum(size // G, 1)
        g = jax.random.randint(key, (n_groups,), 0, avail_groups)
        idx = (g[:, None] * G + jnp.arange(G, dtype=jnp.int32)[None, :]).reshape(-1)
        return sstate, idx.astype(jnp.int32), TDict(group_ids=jnp.repeat(g, G))

    def update_priority(self, sstate, idx, priority) -> TDict:
        return sstate


class SamplerEnsemble:
    """Dispatch over sub-samplers, one per sub-storage (reference
    samplers.py:3992 ``SamplerEnsemble``).  Host-side composition — pairs
    with :class:`~rl_tpu.data.replay.storages.StorageEnsemble` /
    ``ReplayBufferEnsemble``; ``sample`` picks sub-sampler ``buffer_id`` and
    delegates."""

    def __init__(self, *samplers, p=None):
        self.samplers = list(samplers)
        self.p = p

    def init(self):
        return [s.init() for s in self.samplers]

    def extend(self, sstate, buffer_id: int, idx):
        sstate = list(sstate)
        sstate[buffer_id] = self.samplers[buffer_id].extend(sstate[buffer_id], idx)
        return sstate

    def sample(self, sstate, sizes, batch_size: int, key, buffer_id=None):
        if buffer_id is None:
            kb, key = jax.random.split(key)
            p = self.p
            if p is None:
                p = [1.0 / len(self.samplers)] * len(self.samplers)
            p = jnp.asarray(p) / jnp.sum(jnp.asarray(p))
            buffer_id = int(jax.random.choice(kb, len(self.samplers), p=p))
        sub, idx, info = self.samplers[buffer_id].sample(
            sstate[buffer_id], sizes[buffer_id], batch_size, key
        )
        sstate = list(sstate)
        sstate[buffer_id] = sub
        return sstate, idx, info.set("buffer_ids", jnp.full((batch_size,), buffer_id))

    def update_priority(self, sstate, buffer_id: int, idx, priority):
        sstate = list(sstate)
        sstate[buffer_id] = self.samplers[buffer_id].update_priority(
            sstate[buffer_id], idx, priority
        )
        return sstate
