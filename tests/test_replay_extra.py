"""Tests for the replay-stack completions: consuming/staleness/group
samplers, ensembles, compressed/stacked storages, query DSL, storage
checkpointing (reference test_rb.py patterns: sampler semantics asserted on
small deterministic buffers)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data.tdict import TDict
from rl_tpu.data.replay import (
    CompressedListStorage,
    ConsumingSampler,
    LazyStackStorage,
    OfflineToOnlineBuffer,
    PromptGroupSampler,
    ReplayBuffer,
    ReplayBufferEnsemble,
    SamplerEnsemble,
    StalenessAwareSampler,
    StorageEnsemble,
    TensorStorage,
    WriterEnsemble,
    RandomSampler,
    RoundRobinWriter,
    save_storage,
    load_storage,
)
from rl_tpu.data import field, trajectory_metadata, query_trajectories


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


class TestConsumingSampler:
    def test_fifo_once(self, key):
        s = ConsumingSampler(capacity=16)
        st = s.init()
        st = s.extend(st, jnp.arange(10))
        st, idx, info = s.sample(st, 10, 6, key)
        assert idx.tolist() == list(range(6))
        assert info["mask"].all()
        st, idx, info = s.sample(st, 10, 6, key)
        assert idx.tolist()[:4] == [6, 7, 8, 9]
        assert info["mask"].tolist() == [True] * 4 + [False] * 2
        # drained
        st, idx, info = s.sample(st, 10, 4, key)
        assert not info["mask"].any()

    def test_ring_lap_discards(self, key):
        s = ConsumingSampler(capacity=4)
        st = s.init()
        st = s.extend(st, jnp.arange(4))
        st = s.extend(st, jnp.arange(4))  # laps: unread items discarded
        st, idx, info = s.sample(st, 4, 6, key)
        assert int(info["mask"].sum()) == 4

    def test_in_buffer(self, key):
        rb = ReplayBuffer(
            storage=TensorStorage(8),
            sampler=ConsumingSampler(8),
            batch_size=4,
        )
        rb.extend(TDict(x=jnp.arange(6.0)))
        b1, i1 = rb.sample(return_info=True)
        b2, i2 = rb.sample(return_info=True)
        got = np.concatenate([
            np.asarray(b1["x"])[np.asarray(i1["mask"])],
            np.asarray(b2["x"])[np.asarray(i2["mask"])],
        ])
        assert sorted(got.tolist()) == [0, 1, 2, 3, 4, 5]


class TestStalenessAwareSampler:
    def test_filters_stale(self, key):
        s = StalenessAwareSampler(capacity=8, max_staleness=0)
        st = s.init()
        st = s.extend(st, jnp.arange(4))          # version 0
        st = s.bump_version(st)
        st = s.extend(st, jnp.arange(4, 8))       # version 1
        st, idx, info = s.sample(st, 8, 64, key)
        assert (idx >= 4).all()                   # only fresh items
        assert (info["staleness"] == 0).all()

    def test_fallback_when_all_stale(self, key):
        s = StalenessAwareSampler(capacity=8, max_staleness=0)
        st = s.init()
        st = s.extend(st, jnp.arange(4))
        st = s.bump_version(st, 5)
        st, idx, info = s.sample(st, 4, 16, key)
        assert (idx < 4).all()                    # uniform fallback over size


class TestPromptGroupSampler:
    def test_whole_groups(self, key):
        s = PromptGroupSampler(capacity=32, group_size=4)
        st = s.init()
        st, idx, info = s.sample(st, 16, 8, key)
        idx = np.asarray(idx).reshape(2, 4)
        # each row is one contiguous group aligned to group boundaries
        assert ((idx % 4) == np.arange(4)).all()
        assert (idx[:, 0] % 4 == 0).all()
        assert (idx < 16).all()


class TestEnsembles:
    def _mk_rb(self, val, cap=8):
        rb = ReplayBuffer(storage=TensorStorage(cap), batch_size=4)
        rb.extend(TDict(x=jnp.full((cap,), float(val))))
        return rb

    def test_rb_ensemble_dispatch(self):
        ens = ReplayBufferEnsemble(self._mk_rb(0.0), self._mk_rb(1.0),
                                   p=[0.0, 1.0], batch_size=4)
        batch, info = ens.sample(return_info=True)
        assert (np.asarray(batch["x"]) == 1.0).all()
        assert (np.asarray(info["buffer_ids"]) == 1).all()

    def test_offline_to_online_ratio(self):
        ens = OfflineToOnlineBuffer(self._mk_rb(0.0), self._mk_rb(1.0),
                                    offline_fraction=0.5, batch_size=8)
        batch, info = ens.sample(return_info=True)
        x = np.asarray(batch["x"])
        assert (x[:4] == 0.0).all() and (x[4:] == 1.0).all()

    def test_sampler_writer_storage_ensembles(self, key):
        storages = StorageEnsemble(TensorStorage(4), TensorStorage(8))
        writers = WriterEnsemble(RoundRobinWriter(4), RoundRobinWriter(8))
        samplers = SamplerEnsemble(RandomSampler(4), RandomSampler(8))
        sstate = storages.init([TDict(x=jnp.zeros(())), TDict(x=jnp.zeros(()))])
        wstate = writers.init()
        pstate = samplers.init()
        wstate, idx = writers.extend(wstate, 1, 8)
        sstate = storages.set(sstate, 1, idx, TDict(x=jnp.arange(8.0)))
        pstate, sidx, info = samplers.sample(
            pstate, storages.size(sstate), 4, key, buffer_id=1
        )
        batch = storages.get(sstate, 1, sidx)
        assert batch["x"].shape == (4,)
        assert (np.asarray(info["buffer_ids"]) == 1).all()


class TestHostStorages:
    def test_compressed_roundtrip(self):
        st = CompressedListStorage(level=3)
        st.init()
        item = TDict(obs=jnp.arange(100.0).reshape(10, 10), r=jnp.ones(()))
        st.set(None, [0], [item])
        out = st.get(None, [0])[0]
        np.testing.assert_allclose(np.asarray(out["obs"]),
                                   np.arange(100.0).reshape(10, 10))
        assert st.bytes() > 0

    def test_lazy_stack_ragged(self):
        st = LazyStackStorage()
        st.init()
        st.set(None, [0, 1], [TDict(x=jnp.ones((3,))), TDict(x=jnp.ones((5,)))])
        out = st.get(None, [0, 1])
        assert out["x"].shape == (2, 5)
        assert out[("masks", "x")].tolist() == [
            [True] * 3 + [False] * 2, [True] * 5
        ]


class TestQueryDSL:
    def test_query(self):
        trajs = TDict(
            mask=jnp.array([[1, 1, 1, 0], [1, 1, 0, 0], [1, 1, 1, 1]], bool),
            next=TDict(
                reward=jnp.array([[1.0, 1, 1, 0], [5, 5, 0, 0], [1, 0, 0, 0]])[..., None],
                terminated=jnp.array([[0, 0, 1, 0], [0, 0, 0, 0], [0, 0, 0, 1]], bool)[..., None],
            ),
        )
        meta = trajectory_metadata(trajs)
        assert meta["length"].tolist() == [3, 2, 4]
        assert meta["episode_return"].tolist() == [3.0, 10.0, 1.0]
        q = (field("episode_return") > 2.0) & (field("length") < 4)
        assert query_trajectories(meta, q).tolist() == [0, 1]
        assert query_trajectories(meta, ~q).tolist() == [2]
        assert meta["terminated"].tolist() == [True, False, True]


class TestStorageCheckpoint:
    def test_save_load(self, tmp_path):
        store = TensorStorage(4)
        state = store.init(TDict(x=jnp.zeros((2,)), n=TDict(y=jnp.zeros(()))))
        state = store.set(state, jnp.arange(2),
                          TDict(x=jnp.ones((2, 2)), n=TDict(y=jnp.arange(2.0))))
        p = str(tmp_path / "store.npz")
        save_storage(state, p)
        loaded = load_storage(p)
        np.testing.assert_allclose(np.asarray(loaded[("data", "x")]),
                                   np.asarray(state[("data", "x")]))
        np.testing.assert_allclose(np.asarray(loaded[("data", "n", "y")]),
                                   np.asarray(state[("data", "n", "y")]))
        assert int(loaded["size"]) == 2


class TestNamedDatasets:
    """Named-dataset surface (reference datasets/common.py:21 wrappers)."""

    def _write_hdf5(self, tmp_path, name, n=64):
        import h5py

        p = str(tmp_path / f"{name}.hdf5")
        rng = np.random.default_rng(0)
        with h5py.File(p, "w") as f:
            f["observations"] = rng.normal(size=(n, 3)).astype(np.float32)
            f["actions"] = rng.normal(size=(n, 1)).astype(np.float32)
            f["rewards"] = rng.normal(size=(n,)).astype(np.float32)
            f["terminals"] = np.zeros(n, bool)
        return p

    def test_hdf5_load_and_sample(self, tmp_path):
        from rl_tpu.data import D4RLExperienceReplay

        self._write_hdf5(tmp_path, "pen-expert-v1")
        rb = D4RLExperienceReplay("pen-expert-v1", root=str(tmp_path),
                                  batch_size=16)
        rb.seed(0)
        b = rb.sample()
        assert b["observation"].shape == (16, 3)
        assert b["next", "done"].shape == (16, 1)
        assert rb.num_transitions == 64

    def test_download_gated(self):
        from rl_tpu.data import MinariExperienceReplay

        with pytest.raises(RuntimeError, match="no network egress"):
            MinariExperienceReplay("D4RL/door-human-v2", download=True)

    def test_root_required(self):
        from rl_tpu.data import OpenXExperienceReplay

        with pytest.raises(ValueError, match="root"):
            OpenXExperienceReplay("bridge")
