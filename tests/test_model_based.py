"""Model-based env family + WorldModelLoss.

Mirrors the reference tests for ModelBasedEnvBase/WorldModelEnv/ImaginedEnv/
DreamerEnv (/root/reference/torchrl/envs/model_based/) and
WorldModelLoss (/root/reference/torchrl/objectives/world_model_loss.py).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from rl_tpu.data import Composite, TDict, Unbounded, Bounded
from rl_tpu.envs import WorldModelEnv, ImaginedEnv, DreamerEnv, check_env_specs
from rl_tpu.envs.classic import PendulumEnv
from rl_tpu.modules import TDModule, WorldModel, WorldModelWrapper
from rl_tpu.modules.world_model import RSSM
from rl_tpu.objectives import WorldModelLoss

OBS, LAT, ACT = 6, 4, 2


def _world_model():
    encoder = TDModule(nn.Dense(LAT), in_keys=["observation"],
                       out_keys=["latent"])

    class Dyn(nn.Module):
        @nn.compact
        def __call__(self, lat, act):
            return nn.Dense(LAT)(jnp.concatenate([lat, jnp.asarray(act)], -1))

    dynamics = TDModule(Dyn(), in_keys=["latent", "action"],
                        out_keys=[("next", "latent")])
    reward = TDModule(nn.Dense(1), in_keys=[("next", "latent")],
                      out_keys=[("next", "reward")])
    decoder = TDModule(nn.Dense(OBS), in_keys=[("next", "latent")],
                       out_keys=["reco_observation"])
    return WorldModel(encoder, dynamics, reward, decoder=decoder)


def _example_td(b=3):
    return TDict(
        observation=jnp.ones((b, OBS)),
        action=jnp.ones((b, ACT)),
        next={"reward": jnp.ones((b, 1)),
              "observation": jnp.ones((b, OBS)),
              "done": jnp.zeros((b, 1), jnp.bool_)},
    )


class TestWorldModel:
    def test_full_and_parts(self, key):
        wm = _world_model()
        td = _example_td()
        params = wm.init(key, td)
        out = wm(params, td)
        assert out["latent"].shape == (3, LAT)
        assert out["next", "reward"].shape == (3, 1)
        assert out["reco_observation"].shape == (3, OBS)
        enc = wm.encode(params, td)
        assert "latent" in enc
        stepped = wm.step(params, enc)
        assert stepped["next", "latent"].shape == (3, LAT)

    def test_wrapper(self, key):
        trans = TDModule(nn.Dense(LAT), in_keys=["latent"],
                         out_keys=[("next", "latent")])
        rew = TDModule(nn.Dense(1), in_keys=[("next", "latent")],
                       out_keys=[("next", "reward")])
        w = WorldModelWrapper(trans, rew)
        assert w.get_transition_model_operator() is trans
        assert w.get_reward_operator() is rew
        td = TDict(latent=jnp.ones((2, LAT)))
        p = w.init(key, td)
        out = w(p, td)
        assert out["next", "reward"].shape == (2, 1)


class TestWorldModelEnv:
    def test_rollout(self, key):
        wm = _world_model()
        base = PendulumEnv()
        td = _example_td().set(
            "action", jnp.ones((3,) + PendulumEnv().action_spec.shape))
        params = wm.init(key, td)
        env = WorldModelEnv(wm, base, params=params, latent_dim=LAT,
                            batch_size=(3,))
        k1, k2 = jax.random.split(key)
        state, ys, last = env.rollout(5, key=k1)
        assert ys["next", "latent"].shape == (5, 3, LAT)
        assert ys["next", "reward"].shape == (5, 3, 1)

    def test_seed_from_obs(self, key):
        wm = _world_model()
        params = wm.init(key, _example_td().set(
            "action", jnp.ones((3,) + PendulumEnv().action_spec.shape)))
        base = PendulumEnv()
        env = WorldModelEnv(wm, base, params=params, latent_dim=LAT,
                            batch_size=(3,))
        obs_td = TDict(observation=jnp.ones((3, OBS)))
        env.from_obs(params, obs_td)
        state, td0 = env.reset(key)
        expected = wm.encode(params, obs_td)["latent"]
        assert jnp.allclose(td0["latent"], expected)


class TestImaginedEnv:
    def test_mean_var_obs_and_no_done(self, key):
        base = PendulumEnv()
        obs_dim = base.observation_spec["observation"].shape[-1]

        class MeanVar(nn.Module):
            @nn.compact
            def __call__(self, act, mean):
                m = nn.Dense(obs_dim)(jnp.concatenate(
                    [jnp.asarray(act), mean], -1))
                var = jnp.broadcast_to(jnp.eye(obs_dim),
                                       m.shape[:-1] + (obs_dim, obs_dim))
                return m, var

        wm_mod = TDModule(MeanVar(),
                          in_keys=["action", ("observation", "mean")],
                          out_keys=[("next", "observation", "mean"),
                                    ("next", "observation", "var")])
        env = ImaginedEnv(wm_mod, base, batch_size=(2,))
        td0 = TDict(observation=TDict(
            mean=jnp.zeros((2, obs_dim)),
            var=jnp.tile(jnp.eye(obs_dim), (2, 1, 1))),
            action=jnp.zeros((2,) + base.action_spec.shape))
        params = wm_mod.init(key, td0)
        env.params = params
        state, ys, _ = env.rollout(4, key=key)
        assert ys["next", "observation", "mean"].shape == (4, 2, obs_dim)
        assert ys["next", "observation", "var"].shape == (
            4, 2, obs_dim, obs_dim)
        assert not bool(ys["next", "done"].any())


class TestDreamerEnv:
    def test_latent_rollout(self, key):
        rssm = RSSM(action_dim=ACT, stoch_dim=8, deter_dim=16, hidden=16)
        h = jnp.zeros((2, 16))
        z = jnp.zeros((2, 8))
        params = rssm.init(key, h, z, jnp.zeros((2, ACT)), jnp.zeros((2, 32)),
                           key)["params"]
        env = DreamerEnv(rssm, params,
                         Bounded(-1.0, 1.0, (ACT,), jnp.float32),
                         batch_size=(2,))
        state, ys, _ = env.rollout(6, key=key)
        assert ys["next", "state"].shape == (6, 2, 8)
        assert ys["next", "belief"].shape == (6, 2, 16)
        assert ys["next", "reward"].shape == (6, 2, 1)
        # imagination differs step to step (stochastic prior)
        assert not jnp.allclose(ys["next", "state"][0], ys["next", "state"][1])

    def test_seed_latents(self, key):
        rssm = RSSM(action_dim=ACT, stoch_dim=8, deter_dim=16, hidden=16)
        params = rssm.init(key, jnp.zeros((2, 16)), jnp.zeros((2, 8)),
                           jnp.zeros((2, ACT)), jnp.zeros((2, 32)),
                           key)["params"]
        env = DreamerEnv(rssm, params,
                         Bounded(-1.0, 1.0, (ACT,), jnp.float32),
                         batch_size=(2,))
        h0 = jnp.ones((2, 16))
        z0 = jnp.full((2, 8), 2.0)
        env.set_seed_latents(h0, z0)
        _, td0 = env.reset(key)
        assert jnp.allclose(td0["belief"], h0)
        assert jnp.allclose(td0["state"], z0)


class TestWorldModelLoss:
    @pytest.mark.parametrize("losses", [
        ("reward",),
        ("reward", "done"),
        ("reward", "reconstruction"),
    ])
    def test_loss_terms(self, key, losses):
        wm = _world_model()
        lm = WorldModelLoss(wm, losses=losses)
        td = _example_td()
        params = lm.init(key, td)
        total, metrics = lm(params, td, key)
        names = {k for k in metrics.keys(include_nested=True,
                                         leaves_only=True)}
        for l in losses:
            assert f"loss_{l}" in names
        assert jnp.isfinite(total)

    def test_gradients_flow(self, key):
        wm = _world_model()
        lm = WorldModelLoss(wm, losses=("reward", "reconstruction"))
        td = _example_td()
        params = lm.init(key, td)
        g = jax.grad(lambda p: lm(p, td, key)[0])(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    def test_weights_scale(self, key):
        wm = _world_model()
        td = _example_td()
        l1 = WorldModelLoss(wm, losses=("reward",), reward_weight=1.0)
        l2 = WorldModelLoss(wm, losses=("reward",), reward_weight=3.0)
        params = l1.init(key, td)
        t1, _ = l1(params, td, key)
        t2, _ = l2(params, td, key)
        assert jnp.allclose(t2, 3.0 * t1)

    def test_unknown_loss_raises(self):
        with pytest.raises(ValueError):
            WorldModelLoss(_world_model(), losses=("nope",))
