"""Replay stack tests (port of reference test/rb/ patterns)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.data.replay import (
    ListStorage,
    LazyMemmapStorage,
    MaxValueWriter,
    PrioritizedReplayBuffer,
    PrioritizedSampler,
    RandomSampler,
    ReplayBuffer,
    RoundRobinWriter,
    SamplerWithoutReplacement,
    SliceSampler,
    TensorStorage,
)


def make_items(n, offset=0):
    return TDict(
        obs=jnp.arange(offset, offset + n, dtype=jnp.float32)[:, None],
        act=jnp.arange(offset, offset + n, dtype=jnp.int32),
    )


class TestTensorStorage:
    def test_set_get_roundtrip(self):
        st = TensorStorage(10)
        state = st.init(TDict(obs=jnp.zeros((1,)), act=jnp.zeros((), jnp.int32)))
        items = make_items(4)
        state = st.set(state, jnp.arange(4), items)
        out = st.get(state, jnp.array([2, 0]))
        np.testing.assert_array_equal(np.asarray(out["obs"]).squeeze(-1), [2, 0])
        assert int(st.size(state)) == 4

    def test_jit(self):
        st = TensorStorage(8)
        state = st.init(TDict(obs=jnp.zeros((1,))))

        @jax.jit
        def write_read(state, items, idx):
            state = st.set(state, idx, items)
            return state, st.get(state, idx)

        state, out = write_read(state, TDict(obs=jnp.ones((3, 1))), jnp.arange(3))
        assert np.asarray(out["obs"]).sum() == 3


class TestWriters:
    def test_round_robin_wraps(self):
        w = RoundRobinWriter(5)
        ws = w.init()
        ws, idx1 = w.extend(ws, 3)
        ws, idx2 = w.extend(ws, 4)
        np.testing.assert_array_equal(np.asarray(idx1), [0, 1, 2])
        np.testing.assert_array_equal(np.asarray(idx2), [3, 4, 0, 1])

    def test_max_value_writer_keeps_topk(self):
        w = MaxValueWriter(3)
        ws = w.init()
        ws, slots, accepts = w.extend(ws, jnp.array([1.0, 5.0, 3.0, 0.5, 9.0]))
        # capacity 3: keeps 5, 3, 9 (0.5 rejected after fill, 1.0 evicted)
        kept = sorted(np.asarray(ws["scores"]).tolist())
        assert kept == [3.0, 5.0, 9.0]
        assert not bool(np.asarray(accepts)[3])  # 0.5 rejected


class TestReplayBuffer:
    def test_extend_sample(self, key):
        rb = ReplayBuffer(capacity=100, batch_size=16)
        rb.extend(make_items(50))
        assert len(rb) == 50
        batch = rb.sample()
        assert batch["obs"].shape == (16, 1)
        assert float(batch["obs"].max()) < 50

    def test_ring_overwrite(self, key):
        rb = ReplayBuffer(capacity=10, batch_size=8)
        rb.extend(make_items(10))
        rb.extend(make_items(5, offset=100))  # overwrites slots 0-4
        batch = rb.sample(batch_size=64)
        vals = set(np.asarray(batch["obs"]).squeeze(-1).astype(int).tolist())
        assert not vals & {0, 1, 2, 3, 4}
        assert vals & {100, 101, 102, 103, 104}

    def test_add_single(self, key):
        rb = ReplayBuffer(capacity=4, batch_size=2)
        rb.add(TDict(obs=jnp.ones((1,)), act=jnp.zeros((), jnp.int32)))
        assert len(rb) == 1

    def test_functional_core_jits_into_training_step(self, key):
        rb = ReplayBuffer(capacity=64, batch_size=8)
        state = rb.init_from_batch(make_items(4))

        @jax.jit
        def step(state, data, k):
            state, _ = rb.extend_fn(state, data)
            state, batch, info = rb.sample_fn(state, k, batch_size=8)
            return state, batch["obs"].mean()

        state, m = step(state, make_items(16), key)
        assert np.isfinite(float(m))

    def test_transform_applied(self, key):
        rb = ReplayBuffer(
            capacity=16, batch_size=4, transform=lambda td: td.set("obs", td["obs"] * 2)
        )
        rb.extend(make_items(16))
        batch = rb.sample()
        assert float(batch["obs"].min()) >= 0
        # obs doubled: all even
        assert (np.asarray(batch["obs"]).squeeze(-1) % 2 == 0).all()


class TestSamplerWithoutReplacement:
    def test_epoch_covers_all(self, key):
        cap = 32
        rb = ReplayBuffer(
            capacity=cap, sampler=SamplerWithoutReplacement(cap), batch_size=8
        )
        rb.extend(make_items(cap))
        seen = []
        for _ in range(4):
            batch = rb.sample()
            seen.extend(np.asarray(batch["act"]).tolist())
        assert sorted(seen) == list(range(cap))  # exact cover, no repeats

    def test_reshuffles_next_epoch(self, key):
        cap = 16
        rb = ReplayBuffer(
            capacity=cap, sampler=SamplerWithoutReplacement(cap), batch_size=16
        )
        rb.extend(make_items(cap))
        e1 = np.asarray(rb.sample()["act"]).tolist()
        e2 = np.asarray(rb.sample()["act"]).tolist()
        assert sorted(e1) == sorted(e2) == list(range(cap))
        assert e1 != e2  # different order


class TestPrioritizedSampler:
    def test_sampling_proportional_to_priority(self, key):
        cap = 4
        s = PrioritizedSampler(cap, alpha=1.0, beta=1.0)
        ss = s.init()
        ss = s.extend(ss, jnp.arange(4))
        ss = s.update_priority(ss, jnp.arange(4), jnp.array([1.0, 1.0, 1.0, 97.0]))
        _, idx, info = s.sample(ss, jnp.asarray(4), 10000, key)
        freq3 = float((np.asarray(idx) == 3).mean())
        assert abs(freq3 - 0.97) < 0.01, freq3

    def test_weights_correct(self, key):
        cap = 4
        s = PrioritizedSampler(cap, alpha=1.0, beta=1.0)
        ss = s.init()
        ss = s.extend(ss, jnp.arange(4))
        ss = s.update_priority(ss, jnp.arange(4), jnp.array([1.0, 1.0, 1.0, 7.0]))
        _, idx, info = s.sample(ss, jnp.asarray(4), 2000, key)
        w = np.asarray(info["_weight"])
        i = np.asarray(idx)
        # w ∝ 1/p, normalized by max: rare items get weight 1, common get 1/7
        np.testing.assert_allclose(w[i == 3], w[i == 3].max(), rtol=1e-5)
        if (i < 3).any():
            ratio = w[i < 3].max() / w[i == 3].max()
            np.testing.assert_allclose(ratio, 7.0, rtol=1e-4)

    def test_alpha_zero_uniform(self, key):
        cap = 8
        s = PrioritizedSampler(cap, alpha=0.0)
        ss = s.init()
        ss = s.extend(ss, jnp.arange(8))
        ss = s.update_priority(ss, jnp.arange(8), jnp.linspace(1, 100, 8))
        _, idx, _ = s.sample(ss, jnp.asarray(8), 8000, key)
        counts = np.bincount(np.asarray(idx), minlength=8)
        assert counts.min() > 800  # roughly uniform

    def test_new_items_get_max_priority(self, key):
        s = PrioritizedSampler(8)
        ss = s.init()
        ss = s.extend(ss, jnp.arange(4))
        ss = s.update_priority(ss, jnp.arange(4), jnp.array([0.1, 0.1, 0.1, 50.0]))
        ss = s.extend(ss, jnp.array([4]))
        assert float(ss["priorities"][4]) == 50.0

    def test_prioritized_buffer_end_to_end(self, key):
        rb = PrioritizedReplayBuffer(capacity=32, batch_size=8, alpha=0.7, beta=0.5)
        rb.extend(make_items(32))
        batch, info = rb.sample(return_info=True)
        assert "_weight" in info
        rb.update_priority(info["index"], jnp.abs(np.random.randn(8)))


class TestSliceSampler:
    def test_windows_and_mask(self, key):
        cap = 32
        st = TensorStorage(cap)
        sampler = SliceSampler(cap, num_slices=4, slice_len=4)
        rb = ReplayBuffer(storage=st, sampler=sampler, batch_size=16)
        # episodes of length 8: done at 7, 15, 23, 31
        done = jnp.zeros((cap, 1), bool).at[jnp.array([7, 15, 23, 31])].set(True)
        data = TDict(
            obs=jnp.arange(cap, dtype=jnp.float32)[:, None],
            next={"done": done},
        )
        rb.extend(data)
        batch, info = rb.sample(return_info=True)
        idx = np.asarray(info["index"]).reshape(4, 4)
        mask = np.asarray(info["mask"]).reshape(4, 4)
        # within each slice, consecutive valid indices must be contiguous and
        # not cross an episode boundary (done positions 7,15,23,31)
        for s in range(4):
            valid_idx = idx[s][mask[s]]
            if len(valid_idx) > 1:
                assert (np.diff(valid_idx) == 1).all()
                # no done strictly inside the valid window (except last)
                inner = valid_idx[:-1]
                assert not np.isin(inner, [7, 15, 23, 31]).any()

    def test_slice_mask_cuts_at_done(self, key):
        cap = 16
        sampler = SliceSampler(cap, num_slices=2, slice_len=8)
        ss = sampler.init()
        dones = jnp.zeros((cap,), bool).at[jnp.array([3, 11])].set(True)
        _, idx, info = sampler.sample(ss, jnp.asarray(16), 16, key, dones=dones)
        idx = np.asarray(idx).reshape(2, 8)
        mask = np.asarray(info["mask"]).reshape(2, 8)
        for s in range(2):
            vi = idx[s][mask[s]]
            # valid windows never span across 3->4 or 11->12
            assert not (np.isin(vi[:-1], [3, 11])).any()


class TestHostStorages:
    def test_list_storage(self):
        st = ListStorage()
        st.init()
        st.set(None, np.arange(3), ["a", "b", "c"])
        assert st.get(None, [1]) == ["b"]
        assert st.size() == 3

    def test_memmap_storage(self, tmp_path):
        st = LazyMemmapStorage(16, scratch_dir=str(tmp_path))
        st.init(TDict(obs=jnp.zeros((2,)), nested={"x": jnp.zeros((), jnp.int32)}))
        st.set(None, np.arange(4), TDict(
            obs=jnp.ones((4, 2)), nested={"x": jnp.arange(4, dtype=jnp.int32)}
        ))
        out = st.get(None, np.array([3, 1]))
        np.testing.assert_array_equal(np.asarray(out["nested", "x"]), [3, 1])
        assert st.size() == 4


class TestSliceVariants:
    def make_rb(self, sampler_cls, **kw):
        cap = 32
        sampler = sampler_cls(cap, num_slices=4, slice_len=4, **kw)
        rb = ReplayBuffer(storage=TensorStorage(cap), sampler=sampler, batch_size=16)
        done = jnp.zeros((cap, 1), bool).at[jnp.array([7, 15, 23, 31])].set(True)
        rb.extend(TDict(
            obs=jnp.arange(cap, dtype=jnp.float32)[:, None],
            next={"done": done},
        ))
        return rb

    def test_without_replacement_covers_ends(self, key):
        from rl_tpu.data.replay.samplers import SliceSamplerWithoutReplacement

        rb = self.make_rb(SliceSamplerWithoutReplacement)
        ends = []
        for _ in range(8):
            batch, info = rb.sample(return_info=True)
            idx = np.asarray(info["index"]).reshape(4, 4)
            ends.extend(idx[:, -1].tolist())
        # one epoch covers every valid end exactly once; perm entries below
        # L-1=3 clip up to 3, so uniques = 32 - 3 and nothing below 3
        assert min(ends) == 3
        assert len(set(ends)) == 29
        assert all(e >= 3 for e in ends)

    def test_prioritized_slices_follow_priority(self, key):
        from rl_tpu.data.replay.samplers import PrioritizedSliceSampler

        rb = self.make_rb(PrioritizedSliceSampler, alpha=1.0)
        # make window-end 20 dominate
        rb.update_priority(jnp.arange(32), jnp.ones(32) * 1e-3)
        rb.update_priority(jnp.array([20]), jnp.array([1000.0]))
        batch, info = rb.sample(return_info=True)
        ends = np.asarray(info["end_index"])
        assert (ends == 20).mean() > 0.7
        assert "_weight" in info
        # window mask respects episode boundary at 15 (for end=20, start=17)
        idx = np.asarray(info["index"]).reshape(4, 4)
        mask = np.asarray(info["mask"]).reshape(4, 4)
        for s in range(4):
            vi = idx[s][mask[s]]
            assert not np.isin(vi[:-1], [7, 15, 23, 31]).any()
