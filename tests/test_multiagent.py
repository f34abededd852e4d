"""Multi-agent nets, mixers, and losses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.modules import Categorical, ProbabilisticActor, TDModule
from rl_tpu.modules.multiagent import MultiAgentMLP, QMixer, VDNMixer
from rl_tpu.objectives.multiagent import IPPOLoss, MAPPOLoss, QMixerLoss

N_AGENTS, OBS, ACTS = 3, 4, 2


def make_marl_td(key, B=16):
    ks = jax.random.split(key, 5)
    return TDict(
        {
            ("agents", "observation"): jax.random.normal(ks[0], (B, N_AGENTS, OBS)),
            ("agents", "action"): jax.random.randint(ks[1], (B, N_AGENTS), 0, ACTS),
        },
        next={
            ("agents", "observation"): jax.random.normal(ks[2], (B, N_AGENTS, OBS)),
            "reward": jax.random.normal(ks[3], (B, 1)),
            "done": jax.random.bernoulli(ks[4], 0.1, (B, 1)),
            "terminated": jax.random.bernoulli(ks[4], 0.1, (B, 1)),
        },
    )


class TestMultiAgentMLP:
    def test_shared_params_same_mapping(self, key):
        net = MultiAgentMLP(N_AGENTS, out_features=ACTS, share_params=True)
        x = jax.random.normal(key, (8, N_AGENTS, OBS))
        params = net.init(key, x)
        out = net(params, x)
        assert out.shape == (8, N_AGENTS, ACTS)
        # identical agent inputs -> identical outputs (shared params)
        same = jnp.broadcast_to(x[:, :1], x.shape)
        out_same = net(params, same)
        np.testing.assert_allclose(
            np.asarray(out_same[:, 0]), np.asarray(out_same[:, 1]), rtol=1e-5
        )

    def test_independent_params_differ(self, key):
        net = MultiAgentMLP(N_AGENTS, out_features=ACTS, share_params=False)
        x = jax.random.normal(key, (8, N_AGENTS, OBS))
        params = net.init(key, x)
        same = jnp.broadcast_to(x[:, :1], x.shape)
        out = net(params, same)
        assert not np.allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]))

    def test_centralized_sees_all(self, key):
        net = MultiAgentMLP(N_AGENTS, out_features=ACTS, centralized=True)
        x = jax.random.normal(key, (8, N_AGENTS, OBS))
        params = net.init(key, x)
        out1 = net(params, x)
        # perturb ONLY agent 2's obs: agent 0's output must change
        x2 = x.at[:, 2].add(1.0)
        out2 = net(params, x2)
        assert not np.allclose(np.asarray(out1[:, 0]), np.asarray(out2[:, 0]))


class TestMixers:
    def test_vdn_sums(self, key):
        mixer = VDNMixer()
        q = jnp.ones((8, N_AGENTS, 1)) * jnp.arange(1, N_AGENTS + 1)[None, :, None]
        out = mixer(TDict(), q)
        np.testing.assert_allclose(np.asarray(out), 6.0)

    def test_qmixer_monotone(self, key):
        state = jax.random.normal(key, (8, 6))
        q = jax.random.normal(key, (8, N_AGENTS, 1))
        mixer = QMixer(N_AGENTS, 6)
        params = mixer.init(key, q, state)
        out1 = mixer(params, q, state)
        out2 = mixer(params, q + 1.0, state)
        assert out1.shape == (8, 1)
        # monotonic: raising any agent's Q never lowers the mixed Q
        assert (np.asarray(out2) >= np.asarray(out1) - 1e-5).all()


class TestQMixerLoss:
    @pytest.mark.parametrize("mixer_kind", ["vdn", "qmix"])
    def test_loss_and_grads(self, key, mixer_kind):
        class QNet:
            in_keys = [("agents", "observation")]
            out_keys = [("agents", "action_value")]

            def __init__(self):
                self.net = MultiAgentMLP(N_AGENTS, out_features=ACTS)

            def init(self, key, td):
                return self.net.init(key, jnp.asarray(td["agents", "observation"]))

            def __call__(self, params, td, key=None):
                out = self.net(params, jnp.asarray(td["agents", "observation"]))
                return td.set(("agents", "action_value"), out)

        mixer = VDNMixer() if mixer_kind == "vdn" else QMixer(N_AGENTS, N_AGENTS * OBS)
        loss = QMixerLoss(QNet(), mixer, gamma=0.9)
        td = make_marl_td(key)
        params = loss.init(key, td)
        total, m = loss(params, td)
        assert np.isfinite(float(total))
        g = jax.grad(lambda p: loss(p, td)[0])(params)
        gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["qnet"]))
        assert gsum > 0


class TestMAPPO:
    def test_mappo_loss(self, key):
        class MarlActorNet:
            in_keys = [("agents", "observation")]
            out_keys = ["logits"]

            def __init__(self):
                self.net = MultiAgentMLP(N_AGENTS, out_features=ACTS)

            def init(self, key, td):
                return self.net.init(key, jnp.asarray(td["agents", "observation"]))

            def __call__(self, params, td, key=None):
                return td.set("logits", self.net(params, jnp.asarray(td["agents", "observation"])))

        actor = ProbabilisticActor(
            MarlActorNet(), Categorical, dist_keys=["logits"],
            out_key=("agents", "action"),
            log_prob_key=("agents", "sample_log_prob"),
        )

        class CentralCritic:
            in_keys = [("agents", "observation")]
            out_keys = ["state_value"]

            def __init__(self):
                self.net = MultiAgentMLP(1, out_features=1, share_params=True)

            def init(self, key, td):
                obs = jnp.asarray(td["agents", "observation"])
                flat = obs.reshape(obs.shape[:-2] + (1, -1))
                return self.net.init(key, flat)

            def __call__(self, params, td, key=None):
                obs = jnp.asarray(td["agents", "observation"])
                flat = obs.reshape(obs.shape[:-2] + (1, -1))
                v = self.net(params, flat).squeeze(-2)
                return td.set("state_value", v)

        critic = CentralCritic()
        loss = MAPPOLoss(actor, critic)
        td = make_marl_td(key)
        k1, k2 = jax.random.split(key)
        td = actor(actor.init(k1, td), td, key=k1)
        td = td.set("advantage", jax.random.normal(k2, (16, 1)))
        td = td.set("value_target", jnp.zeros((16, 1)))
        params = loss.init(key, td)
        total, m = loss(params, td, key)
        assert np.isfinite(float(total))
        assert float(m["entropy"]) > 0


class TestMultiAgentGAE:
    def test_broadcast_and_per_agent_norm(self):
        from rl_tpu.objectives import MultiAgentGAE

        T, B, N = 6, 2, 3
        key = jax.random.PRNGKey(3)
        vals = jax.random.normal(key, (T, B, N, 1))
        td = TDict({
            ("agents", "state_value"): vals,
            ("next", "agents", "state_value"): vals + 0.1,
            ("next", "reward"): jnp.ones((T, B, 1)),
            ("next", "done"): jnp.zeros((T, B, 1), bool),
            ("next", "terminated"): jnp.zeros((T, B, 1), bool),
        })
        est = MultiAgentGAE(0.9, 0.95, average_gae=True)
        out = est(None, td)
        adv = out["agents", "advantage"]
        assert adv.shape == (T, B, N, 1)
        # per-agent standardization: each agent slice is ~zero-mean/unit-std
        for a in range(N):
            assert abs(float(adv[..., a, :].mean())) < 1e-5
            assert abs(float(adv[..., a, :].std()) - 1.0) < 1e-3

    def test_per_agent_reward_used_when_present(self):
        from rl_tpu.objectives import MultiAgentGAE, GAE

        T, B, N = 5, 2, 2
        vals = jnp.zeros((T, B, N, 1))
        r = jnp.stack([jnp.ones((T, B, 1)), 2 * jnp.ones((T, B, 1))], axis=-2)
        td = TDict({
            ("agents", "state_value"): vals,
            ("next", "agents", "state_value"): vals,
            ("next", "agents", "reward"): r,
            ("next", "agents", "done"): jnp.zeros((T, B, N, 1), bool),
            ("next", "agents", "terminated"): jnp.zeros((T, B, N, 1), bool),
            ("next", "reward"): jnp.zeros((T, B, 1)),
            ("next", "done"): jnp.zeros((T, B, 1), bool),
            ("next", "terminated"): jnp.zeros((T, B, 1), bool),
        })
        est = MultiAgentGAE(0.9, 0.95)
        adv, _ = est.estimate(None, td)
        # agent 1 earns 2x agent 0's reward → strictly larger advantage
        assert float(adv[..., 1, :].sum()) > float(adv[..., 0, :].sum())
