"""TDModule / actor / model plumbing tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import Bounded, TDict
from rl_tpu.modules import (
    MLP,
    Actor,
    ActorValueOperator,
    AdditiveGaussianModule,
    ConvNet,
    DuelingMlpDQNet,
    EGreedyModule,
    ExplorationType,
    NormalParamExtractor,
    OrnsteinUhlenbeckProcessModule,
    ProbabilisticActor,
    QValueActor,
    QValueModule,
    Seq,
    TanhModule,
    TanhNormal,
    TDModule,
    ValueOperator,
    set_exploration_type,
)
from rl_tpu.data import Categorical as CategoricalSpec


def make_td(key, B=5, obs_dim=4):
    return TDict(observation=jax.random.normal(key, (B, obs_dim)))


class TestTDModule:
    def test_flax_module_routing(self, key):
        m = TDModule(MLP(out_features=3), ["observation"], ["logits"])
        td = make_td(key)
        params = m.init(key, td)
        out = m(params, td)
        assert out["logits"].shape == (5, 3)

    def test_plain_fn(self, key):
        m = TDModule(lambda x: x * 2, ["observation"], ["doubled"])
        td = make_td(key)
        out = m(m.init(key, td), td)
        np.testing.assert_allclose(np.asarray(out["doubled"]), np.asarray(td["observation"]) * 2)

    def test_multi_output(self, key):
        seq = Seq(
            TDModule(MLP(out_features=6), ["observation"], ["hidden"]),
            TDModule(NormalParamExtractor(), ["hidden"], ["loc", "scale"]),
        )
        td = make_td(key)
        params = seq.init(key, td)
        out = seq(params, td)
        assert out["loc"].shape == (5, 3)
        assert float(out["scale"].min()) > 0


class TestProbabilisticActor:
    def make_actor(self, key, B=5):
        net = Seq(
            TDModule(MLP(out_features=4), ["observation"], ["hidden"]),
            TDModule(NormalParamExtractor(), ["hidden"], ["loc", "scale"]),
        )
        actor = ProbabilisticActor(net, TanhNormal, dist_keys=["loc", "scale"])
        td = make_td(key, B)
        params = actor.init(key, td)
        return actor, params, td

    def test_sample_and_logprob(self, key):
        actor, params, td = self.make_actor(key)
        out = actor(params, td, key=key)
        assert out["action"].shape == (5, 2)
        assert out["sample_log_prob"].shape == (5,)
        assert float(jnp.abs(out["action"]).max()) <= 1.0

    def test_exploration_modes(self, key):
        actor, params, td = self.make_actor(key)
        with set_exploration_type(ExplorationType.MODE):
            a1 = actor(params, td, key=key)["action"]
            a2 = actor(params, td, key=jax.random.PRNGKey(42))["action"]
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))  # deterministic
        with set_exploration_type(ExplorationType.RANDOM):
            a3 = actor(params, td, key=key)["action"]
            a4 = actor(params, td, key=jax.random.PRNGKey(42))["action"]
        assert not np.array_equal(np.asarray(a3), np.asarray(a4))

    def test_log_prob_recompute_consistent(self, key):
        actor, params, td = self.make_actor(key)
        out = actor(params, td, key=key)
        lp = actor.log_prob(params, out)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(out["sample_log_prob"]), rtol=1e-4)


class TestValueAndQ:
    def test_value_operator(self, key):
        v = ValueOperator(MLP(out_features=1))
        td = make_td(key)
        out = v(v.init(key, td), td)
        assert out["state_value"].shape == (5, 1)

    def test_qvalue_module(self, key):
        td = TDict(action_value=jnp.array([[1.0, 3.0, 2.0], [0.0, -1.0, 5.0]]))
        q = QValueModule()
        out = q(TDict(), td)
        np.testing.assert_array_equal(np.asarray(out["action"]), [1, 2])
        np.testing.assert_array_equal(np.asarray(out["chosen_action_value"]).squeeze(-1), [3, 5])

    def test_qvalue_actor(self, key):
        actor = QValueActor(DuelingMlpDQNet(out_features=3), in_keys=["observation"])
        td = make_td(key)
        params = actor.init(key, td)
        out = actor(params, td)
        assert out["action"].shape == (5,)
        assert out["action_value"].shape == (5, 3)


class TestActorValueOperator:
    def test_shared_trunk(self, key):
        trunk = TDModule(MLP(out_features=8), ["observation"], ["hidden"])
        actor_net = Seq(
            TDModule(MLP(out_features=4), ["hidden"], ["params_out"]),
            TDModule(NormalParamExtractor(), ["params_out"], ["loc", "scale"]),
        )
        actor = ProbabilisticActor(actor_net, TanhNormal)
        value = ValueOperator(MLP(out_features=1), in_keys=["hidden"])
        av = ActorValueOperator(trunk, actor, value)
        td = make_td(key)
        params = av.init(key, td)
        out = av(params, td, key=key)
        assert "action" in out and "state_value" in out
        pol = av.get_policy_operator()
        out_p = pol(params, td, key=key)
        assert "action" in out_p and "state_value" not in out_p


class TestExplorationModules:
    def test_egreedy_all_random_at_eps1(self, key):
        spec = CategoricalSpec(4)
        eg = EGreedyModule(spec, eps_init=1.0, eps_end=0.0, annealing_num_steps=10)
        state = eg.init_state()
        td = TDict(action=jnp.zeros((100,), jnp.int32))
        out = eg(state, td, key)
        acts = np.asarray(out["action"])
        assert (acts > 0).any()  # replaced by random actions

    def test_egreedy_anneals(self):
        spec = CategoricalSpec(4)
        eg = EGreedyModule(spec, eps_init=1.0, eps_end=0.0, annealing_num_steps=10)
        state = eg.init_state()
        for _ in range(20):
            state = eg.step(state)
        assert float(state["eps"]) == 0.0

    def test_egreedy_noop_when_deterministic(self, key):
        spec = CategoricalSpec(4)
        eg = EGreedyModule(spec, eps_init=1.0)
        td = TDict(action=jnp.zeros((50,), jnp.int32))
        with set_exploration_type(ExplorationType.DETERMINISTIC):
            out = eg(eg.init_state(), td, key)
        assert not np.asarray(out["action"]).any()

    def test_additive_gaussian(self, key):
        spec = Bounded(-1, 1, (2,))
        ag = AdditiveGaussianModule(spec, sigma_init=0.5)
        td = TDict(action=jnp.zeros((10, 2)))
        out = ag(ag.init_state(), td, key)
        a = np.asarray(out["action"])
        assert (a != 0).any() and (np.abs(a) <= 1).all()

    def test_ou_correlated_and_resets(self, key):
        spec = Bounded(-1, 1, (2,))
        ou = OrnsteinUhlenbeckProcessModule(spec)
        state = ou.init_state((4,))
        td = TDict(action=jnp.zeros((4, 2)), is_init=jnp.zeros((4, 1), bool))
        keys = jax.random.split(key, 10)
        noises = []
        for k in keys:
            state, out = ou(state, td, k)
            noises.append(np.asarray(state["noise"]))
        # OU noise accumulates correlation; variance grows from 0
        assert np.abs(noises[-1]).mean() > np.abs(noises[0]).mean() * 0.5
        # reset on is_init
        td_init = td.set("is_init", jnp.ones((4, 1), bool))
        state2, _ = ou(state, td_init, key)
        # noise restarted from zero + one increment: should be small
        assert np.abs(np.asarray(state2["noise"])).mean() < np.abs(noises[-1]).mean() + 1.0


class TestConvNet:
    def test_shapes_nhwc(self, key):
        net = ConvNet()
        x = jnp.zeros((2, 84, 84, 4))
        params = net.init(key, x)["params"]
        out = net.apply({"params": params}, x)
        assert out.shape[0] == 2 and out.ndim == 2

    def test_leading_batch_dims(self, key):
        net = ConvNet(channels=(8,), kernel_sizes=(3,), strides=(2,))
        x = jnp.zeros((3, 4, 16, 16, 1))
        params = net.init(key, x)["params"]
        out = net.apply({"params": params}, x)
        assert out.shape[:2] == (3, 4)


class TestTanhModule:
    def test_bounds(self, key):
        t = TanhModule(low=-2.0, high=2.0)
        td = TDict(action=jnp.array([10.0, -10.0, 0.0]))
        out = t(TDict(), td)
        a = np.asarray(out["action"])
        assert a.max() <= 2.0 and a.min() >= -2.0
        np.testing.assert_allclose(a[2], 0.0, atol=1e-6)
