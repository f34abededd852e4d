"""Acrobot env, gSDE, ConsistentDropout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, check_env_specs
from rl_tpu.envs.classic import AcrobotEnv
from rl_tpu.modules.extras import ConsistentDropout, gSDEModule


class TestAcrobot:
    def test_contract(self, key):
        check_env_specs(AcrobotEnv(), key)

    def test_batched_jit(self, key):
        env = BatchedEnv(AcrobotEnv(max_episode_steps=100), 4)
        ys = jax.jit(lambda k: env.rollout(50, key=k)[1])(key)
        r = np.asarray(ys["next", "reward"])
        assert set(np.unique(r)).issubset({-1.0, 0.0})
        assert np.isfinite(np.asarray(ys["next", "observation"])).all()

    def test_energy_conservation_sanity(self, key):
        # with zero torque from rest, velocities stay bounded
        env = AcrobotEnv()
        noop = lambda td, k=None: td.set("action", jnp.asarray(1, jnp.int32))
        _, ys, _ = env.rollout(100, noop, key=key)
        vel = np.asarray(ys["next", "observation"])[:, 4:]
        assert np.abs(vel).max() <= AcrobotEnv.MAX_VEL_2 + 1e-5


class TestGSDE:
    def test_noise_fixed_within_episode(self, key):
        g = gSDEModule(state_dim=3, action_dim=2)
        state = g.init_state(key, (4,))
        td = TDict(
            observation=jnp.ones((4, 3)),
            loc=jnp.zeros((4, 2)),
            is_init=jnp.zeros((4, 1), bool),
        )
        k1, k2 = jax.random.split(key)
        s1, out1 = g(state, td, k1)
        s2, out2 = g(s1, td, k2)
        # same obs + same eps -> identical noise across steps
        np.testing.assert_allclose(np.asarray(out1["action"]), np.asarray(out2["action"]))

    def test_noise_resampled_on_init(self, key):
        g = gSDEModule(state_dim=3, action_dim=2)
        state = g.init_state(key, (4,))
        td = TDict(
            observation=jnp.ones((4, 3)),
            loc=jnp.zeros((4, 2)),
            is_init=jnp.ones((4, 1), bool),
        )
        k1, k2 = jax.random.split(key)
        s1, out1 = g(state, td, k1)
        s2, out2 = g(s1, td, k2)
        assert not np.allclose(np.asarray(out1["action"]), np.asarray(out2["action"]))

    def test_state_dependence(self, key):
        g = gSDEModule(state_dim=3, action_dim=2)
        state = g.init_state(key, ())
        td1 = TDict(observation=jnp.ones(3), loc=jnp.zeros(2),
                    is_init=jnp.zeros((1,), bool))
        td2 = TDict(observation=jnp.full((3,), 2.0), loc=jnp.zeros(2),
                    is_init=jnp.zeros((1,), bool))
        _, o1 = g(state, td1, key)
        _, o2 = g(state, td2, key)
        # noise scales with the state (linear): doubled state -> doubled noise
        np.testing.assert_allclose(
            np.asarray(o2["action"]), 2 * np.asarray(o1["action"]), rtol=1e-5
        )


class TestConsistentDropout:
    def test_mask_consistency(self, key):
        d = ConsistentDropout(p=0.5)
        mask = d.make_mask(key, (8, 16))
        x = jnp.ones((8, 16))
        np.testing.assert_array_equal(np.asarray(d(x, mask)), np.asarray(d(x, mask)))
        # scaling preserves expectation
        assert abs(float(d(x, mask).mean()) - 1.0) < 0.3

    def test_refresh_where(self, key):
        d = ConsistentDropout(p=0.5)
        mask = d.make_mask(key, (4, 8))
        is_init = jnp.array([True, False, False, True]).reshape(4, 1)
        new = d.refresh_where(mask, is_init, jax.random.PRNGKey(9))
        np.testing.assert_array_equal(np.asarray(new[1]), np.asarray(mask[1]))
        assert not np.array_equal(np.asarray(new[0]), np.asarray(mask[0]))
