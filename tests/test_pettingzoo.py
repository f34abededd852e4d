"""PettingZoo bridge (reference libs/pettingzoo.py) + gated lib markers."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pettingzoo = pytest.importorskip("pettingzoo")
warnings.filterwarnings("ignore")

from rl_tpu.envs.libs import PettingZooEnv  # noqa: E402


@pytest.fixture(scope="module")
def env():
    e = PettingZooEnv("sisl/pursuit_v4", num_envs=2, max_cycles=20)
    yield e
    e.close()


class TestPettingZoo:
    def test_specs_and_reset(self, env, key):
        assert env.n_agents == 8
        spec = env.observation_spec["agents", "observation"]
        assert spec.shape == (8, 7, 7, 3)
        state, td = env.reset(key)
        assert td["agents", "observation"].shape == (2, 8, 7, 7, 3)
        assert not bool(jnp.any(td["done"]))

    def test_rollout_grouping_contract(self, env, key):
        state, ys, root = env.rollout(6, key=key)
        # time-first [T, E, ...]; per-agent rewards + shared root reward
        assert ys["agents", "observation"].shape == (6, 2, 8, 7, 7, 3)
        assert ys["next", "agents", "reward"].shape == (6, 2, 8, 1)
        assert ys["next", "reward"].shape == (6, 2, 1)
        np.testing.assert_allclose(
            np.asarray(ys["next", "reward"]),
            np.asarray(ys["next", "agents", "reward"]).sum(2), rtol=1e-5)

    def test_autoreset_on_cycle_limit(self, key):
        e = PettingZooEnv("sisl/pursuit_v4", num_envs=1, max_cycles=3)
        try:
            state, ys, root = e.rollout(8, key=key)
            dones = np.asarray(ys["next", "done"])[:, 0, 0]
            assert dones.any()  # hit the 3-cycle truncation at least once
        finally:
            e.close()


class TestGatedLibs:
    def test_gated_raise_with_alternative(self):
        from rl_tpu.envs.libs import BraxWrapper, VmasWrapper

        with pytest.raises(ImportError, match="brax"):
            BraxWrapper()
        with pytest.raises(ImportError, match="MultiAgentNavEnv"):
            VmasWrapper()
