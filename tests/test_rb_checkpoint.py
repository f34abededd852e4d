"""Full replay-buffer dumps/loads (VERDICT r2 item #8).

Reference: ``torchrl/data/replay_buffers/checkpointers.py`` +
``ReplayBuffer.dumps/loads`` — storage + sampler (incl. prioritized
priorities / host segment-tree state) + writer cursor as one artifact,
with a resume test that continues sampling identically."""
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.data.replay import (
    HostPrioritizedSampler,
    PrioritizedReplayBuffer,
    ReplayBuffer,
    SliceSampler,
    TensorStorage,
    checkpointer_for,
)


def make_data(n, offset=0):
    return TDict(
        obs=jnp.arange(offset, offset + n, dtype=jnp.float32)[:, None],
        nested={"x": jnp.arange(offset, offset + n, dtype=jnp.int32)},
        next={"done": jnp.zeros((n, 1), bool).at[n - 1].set(True)},
    )


@pytest.mark.parametrize("fmt", ["flat", "nested", "h5"])
class TestFormats:
    def test_roundtrip_identical_state(self, fmt, tmp_path):
        rb = ReplayBuffer(capacity=32, batch_size=8)
        rb.extend(make_data(20))
        rb.sample()  # advance the PRNG so the key checkpoint matters
        rb.dumps(str(tmp_path / "ckpt"), format=fmt)

        rb2 = ReplayBuffer(capacity=32, batch_size=8)
        rb2.loads(str(tmp_path / "ckpt"))
        assert len(rb2) == len(rb)
        for k, v in rb._state.items(include_nested=True, leaves_only=True):
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(rb2._state[k]), err_msg=str(k))
        # identical continuation: same next samples
        b1 = rb.sample()
        b2 = rb2.sample()
        np.testing.assert_array_equal(np.asarray(b1["obs"]),
                                      np.asarray(b2["obs"]))

    def test_checkpointer_direct(self, fmt, tmp_path):
        cp = checkpointer_for(fmt)
        state = TDict(a=jnp.arange(6).reshape(2, 3),
                      b={"c": jnp.ones((4,), jnp.float32)})
        path = str(tmp_path / ("s" + cp.extension))
        cp.save(state, path)
        out = cp.load(path)
        np.testing.assert_array_equal(np.asarray(out["a"]),
                                      np.arange(6).reshape(2, 3))
        np.testing.assert_array_equal(np.asarray(out["b", "c"]), np.ones(4))


class TestPrioritizedResume:
    def test_priorities_survive(self, tmp_path):
        rb = PrioritizedReplayBuffer(capacity=64, batch_size=16)
        rb.extend(make_data(64))
        rb.update_priority(jnp.arange(64), jnp.ones(64) * 1e-3)
        rb.update_priority(jnp.array([7]), jnp.array([100.0]))
        rb.dumps(str(tmp_path / "prb"))

        rb2 = PrioritizedReplayBuffer(capacity=64, batch_size=16)
        rb2.loads(str(tmp_path / "prb"))
        _, info = rb2.sample(return_info=True)
        assert (np.asarray(info["index"]) == 7).mean() > 0.5

    def test_identical_sample_stream(self, tmp_path):
        rb = PrioritizedReplayBuffer(capacity=32, batch_size=8)
        rb.extend(make_data(32))
        rb.sample()
        rb.dumps(str(tmp_path / "prb2"))
        rb2 = PrioritizedReplayBuffer(capacity=32, batch_size=8)
        rb2.loads(str(tmp_path / "prb2"))
        for _ in range(3):
            b1, i1 = rb.sample(return_info=True)
            b2, i2 = rb2.sample(return_info=True)
            np.testing.assert_array_equal(np.asarray(i1["index"]),
                                          np.asarray(i2["index"]))


class TestHostSamplerState:
    def test_segment_tree_state_roundtrip(self, tmp_path):
        # host sampler pairs with host storages (non-jitted path); its
        # C++ segment-tree state round-trips through state_dict
        s = HostPrioritizedSampler(16)
        s.extend(None, np.arange(8))
        s.update_priority(None, np.array([3]), np.array([50.0]))
        np.savez(tmp_path / "host.npz", **s.state_dict())

        s2 = HostPrioritizedSampler(16)
        with np.load(tmp_path / "host.npz") as z:
            s2.load_state_dict({k: z[k] for k in z.files})
        np.testing.assert_allclose(s2.state_dict()["values"],
                                   s.state_dict()["values"])
        assert s2._max_priority == s._max_priority
        # identical behaviour: index 3 dominates in both
        rng = np.random.RandomState(0)
        _, idx, _ = s2.sample(None, 8, 64, rng)
        assert (np.asarray(idx) == 3).mean() > 0.5


class TestSliceSamplerState:
    def test_episode_table_survives(self, tmp_path):
        rb = ReplayBuffer(storage=TensorStorage(32),
                          sampler=SliceSampler(32, num_slices=4, slice_len=4),
                          batch_size=16)
        rb.extend(make_data(20))
        rb.dumps(str(tmp_path / "slice"))
        rb2 = ReplayBuffer(storage=TensorStorage(32),
                           sampler=SliceSampler(32, num_slices=4, slice_len=4),
                           batch_size=16)
        rb2.loads(str(tmp_path / "slice"))
        for k in ("traj", "age", "wc", "next_wc"):
            np.testing.assert_array_equal(
                np.asarray(rb._state["sampler", k]),
                np.asarray(rb2._state["sampler", k]))
        b1, i1 = rb.sample(return_info=True)
        b2, i2 = rb2.sample(return_info=True)
        np.testing.assert_array_equal(np.asarray(i1["index"]),
                                      np.asarray(i2["index"]))
        np.testing.assert_array_equal(np.asarray(i1["mask"]),
                                      np.asarray(i2["mask"]))
