"""PipelinedHostCollector: double-buffered host-bridge collection.

Reference counterpart: the async ParallelEnv/collector pipelines the
reference benchmarks in benchmarks/ecosystem/gym_env_throughput.py."""
import gymnasium
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.collectors.pipelined import PipelinedHostCollector


def make_env():
    return gymnasium.make("Pendulum-v1")


def policy(params, td, key):
    # deterministic linear policy so transitions are independently checkable
    obs = jnp.asarray(td["observation"])
    act = jnp.tanh(obs @ params["w"])
    return td.set("action", act)


@pytest.fixture(scope="module")
def batch():
    params = {"w": jnp.asarray(np.random.RandomState(0).randn(3, 1), jnp.float32)}
    coll = PipelinedHostCollector(make_env, 4, policy, frames_per_batch=4 * 50)
    b = coll.collect(params, jax.random.PRNGKey(0))
    coll.close()
    return b


class TestPipelinedCollector:
    def test_shapes_and_contract(self, batch):
        assert batch["observation"].shape == (50, 4, 3)
        assert batch["action"].shape == (50, 4, 1)
        assert batch["next", "reward"].shape == (50, 4, 1)
        assert batch["collector", "traj_ids"].shape == (50, 4)
        d = np.asarray(batch["next", "done"])
        t = np.asarray(batch["next", "terminated"])
        u = np.asarray(batch["next", "truncated"])
        np.testing.assert_array_equal(d, t | u)

    def test_chain_consistency(self, batch):
        """obs[t+1] == next_obs[t] where not done (no pipeline skew)."""
        obs = np.asarray(batch["observation"])
        nobs = np.asarray(batch["next", "observation"])
        done = np.asarray(batch["next", "done"]).squeeze(-1)
        for t in range(49):
            m = ~done[t]
            if m.any():
                np.testing.assert_allclose(obs[t + 1][m], nobs[t][m],
                                           rtol=1e-5)

    def test_action_matches_policy_on_stored_obs(self, batch):
        """The stored action is the policy of the stored observation —
        the classic pipelining bug is an off-by-one here."""
        params = {"w": jnp.asarray(np.random.RandomState(0).randn(3, 1),
                                   jnp.float32)}
        obs = np.asarray(batch["observation"])
        act = np.asarray(batch["action"])
        expect = np.tanh(obs @ np.asarray(params["w"]))
        np.testing.assert_allclose(act, expect, rtol=1e-4, atol=1e-5)

    def test_traj_ids_renumber_on_done(self, batch):
        traj = np.asarray(batch["collector", "traj_ids"])
        done = np.asarray(batch["next", "done"]).squeeze(-1)
        for b in range(4):
            for t in range(49):
                if done[t, b]:
                    assert traj[t + 1, b] != traj[t, b]
                else:
                    assert traj[t + 1, b] == traj[t, b]

    def test_feeds_replay_buffer(self, batch):
        from rl_tpu.data.replay import ReplayBuffer

        rb = ReplayBuffer(capacity=512, batch_size=32)
        flat = batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))
        rb.extend(flat)
        out = rb.sample()
        assert out["observation"].shape == (32, 3)
