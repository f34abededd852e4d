"""Unit tests for off-policy losses (DQN/SAC/DDPG/TD3) and target updaters."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.modules import (
    MLP,
    Actor,
    NormalParamExtractor,
    ProbabilisticActor,
    QValueActor,
    Seq,
    TanhModule,
    TanhNormal,
    TDModule,
)
from rl_tpu.objectives import (
    DDPGLoss,
    DQNLoss,
    DiscreteSACLoss,
    HardUpdate,
    SACLoss,
    SoftUpdate,
    TD3Loss,
    make_target_params,
)


def fake_transition(key, B=32, obs_dim=4, act_dim=2, discrete_n=None):
    ks = jax.random.split(key, 6)
    if discrete_n is not None:
        action = jax.random.randint(ks[1], (B,), 0, discrete_n)
    else:
        action = jax.random.uniform(ks[1], (B, act_dim), minval=-1, maxval=1)
    return TDict(
        observation=jax.random.normal(ks[0], (B, obs_dim)),
        action=action,
        next={
            "observation": jax.random.normal(ks[2], (B, obs_dim)),
            "reward": jax.random.normal(ks[3], (B, 1)),
            "done": jax.random.bernoulli(ks[4], 0.1, (B, 1)),
            "terminated": jax.random.bernoulli(ks[4], 0.1, (B, 1)),
        },
    )


class TestDQNLoss:
    def make(self, key, double=False):
        qactor = QValueActor(MLP(out_features=3, num_cells=(16,)), in_keys=["observation"])
        loss = DQNLoss(qactor, gamma=0.9, double_dqn=double)
        td = fake_transition(key, discrete_n=3)
        params = loss.init(key, td)
        return loss, params, td

    @pytest.mark.parametrize("double", [False, True])
    def test_finite_and_grads(self, key, double):
        loss, params, td = self.make(key, double)
        total, metrics = loss(params, td)
        assert np.isfinite(float(total))
        assert "td_error" in metrics
        g = jax.grad(lambda pv: loss(params.set("value", pv), td)[0])(params["value"])
        assert any(float(jnp.abs(x).sum()) > 0 for x in jax.tree.leaves(g))

    def test_target_params_get_no_grad(self, key):
        loss, params, td = self.make(key)
        g = jax.grad(lambda p: loss(p, td)[0])(params)
        flat = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["target_value"])]
        assert all(v == 0 for v in flat)

    def test_manual_value(self, key):
        """Exact arithmetic: single transition, known Q table."""
        qnet = TDModule(lambda obs: jnp.array([[1.0, 2.0]]), ["observation"], ["action_value"])

        class FakeActor:
            in_keys = ["observation"]
            out_keys = ["action_value"]

            def init(self, key, td):
                return TDict()

            def __call__(self, params, td, key=None):
                return qnet(TDict(), td)

        loss = DQNLoss(FakeActor(), gamma=0.5)
        td = TDict(
            observation=jnp.zeros((1, 1)),
            action=jnp.array([0]),
            next={
                "observation": jnp.zeros((1, 1)),
                "reward": jnp.array([[1.0]]),
                "done": jnp.array([[False]]),
                "terminated": jnp.array([[False]]),
            },
        )
        params = TDict(value=TDict(), target_value=TDict())
        _, m = loss(params, td)
        # q_taken=1; target = 1 + 0.5*max(1,2)=2 -> l2 = 1
        np.testing.assert_allclose(float(m["loss_qvalue"]), 1.0, rtol=1e-5)

    def test_prioritized_weight_applied(self, key):
        loss, params, td = self.make(key)
        t1, _ = loss(params, td)
        td_w = td.set("_weight", jnp.zeros((32,)))
        t0, _ = loss(params, td_w)
        assert float(t0) == 0.0 and float(t1) != 0.0


class TestSACLoss:
    def make(self, key):
        net = Seq(
            TDModule(MLP(out_features=4, num_cells=(16,)), ["observation"], ["pre"]),
            TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
        )
        actor = ProbabilisticActor(net, TanhNormal)
        qvalue = TDModule(MLP(out_features=1, num_cells=(16,)),
                          ["observation", "action"], ["state_action_value"])
        loss = SACLoss(actor, qvalue, gamma=0.9, action_dim=2)
        td = fake_transition(key)
        params = loss.init(key, td)
        return loss, params, td

    def test_all_losses_present(self, key):
        loss, params, td = self.make(key)
        total, m = loss(params, td, key)
        for k in ("loss_actor", "loss_qvalue", "loss_alpha", "alpha", "entropy", "td_error"):
            assert k in m
        assert np.isfinite(float(total))

    def test_qvalue_ensemble_shape(self, key):
        loss, params, td = self.make(key)
        qs = loss._q_ensemble(params["qvalue"], td)
        assert qs.shape == (2, 32, 1)
        # the two ensemble members differ (independent init)
        assert float(jnp.abs(qs[0] - qs[1]).max()) > 1e-6

    def test_actor_loss_does_not_move_critic(self, key):
        loss, params, td = self.make(key)

        def actor_only(p):
            m = loss.loss(p, td, key)
            return m["loss_actor"]

        g = jax.grad(actor_only)(params)
        crit = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["qvalue"])]
        assert all(v == 0 for v in crit)
        act = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["actor"])]
        assert any(v > 0 for v in act)

    def test_fixed_alpha(self, key):
        net = Seq(
            TDModule(MLP(out_features=4, num_cells=(16,)), ["observation"], ["pre"]),
            TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
        )
        actor = ProbabilisticActor(net, TanhNormal)
        qvalue = TDModule(MLP(out_features=1, num_cells=(16,)),
                          ["observation", "action"], ["state_action_value"])
        loss = SACLoss(actor, qvalue, action_dim=2, fixed_alpha=True)
        td = fake_transition(key)
        params = loss.init(key, td)
        _, m = loss(params, td, key)
        assert float(m["loss_alpha"]) == 0.0


class TestDiscreteSACLoss:
    def test_runs(self, key):
        actor_net = TDModule(MLP(out_features=3, num_cells=(16,)), ["observation"], ["logits"])
        from rl_tpu.modules import Categorical

        actor = ProbabilisticActor(actor_net, Categorical, dist_keys=["logits"])
        qvalue = TDModule(MLP(out_features=3, num_cells=(16,)), ["observation"], ["action_value"])
        loss = DiscreteSACLoss(actor, qvalue, num_actions=3)
        td = fake_transition(key, discrete_n=3)
        params = loss.init(key, td)
        total, m = loss(params, td, key)
        assert np.isfinite(float(total))
        assert float(m["entropy"]) > 0


class TestDDPGAndTD3:
    def make_actor_critic(self):
        actor = Seq(
            TDModule(MLP(out_features=2, num_cells=(16,)), ["observation"], ["pre_tanh"]),
            TanhModule(in_keys=["pre_tanh"], out_keys=["action"]),
            names=["net", "tanh"],
        )
        qvalue = TDModule(MLP(out_features=1, num_cells=(16,)),
                          ["observation", "action"], ["state_action_value"])
        return actor, qvalue

    def test_ddpg(self, key):
        actor, qvalue = self.make_actor_critic()
        loss = DDPGLoss(actor, qvalue, gamma=0.9)
        td = fake_transition(key)
        params = loss.init(key, td)
        total, m = loss(params, td, key)
        assert np.isfinite(float(total))
        assert "loss_actor" in m and "loss_value" in m

    def test_td3_smoothing_needs_key(self, key):
        actor, qvalue = self.make_actor_critic()
        loss = TD3Loss(actor, qvalue, action_low=-1.0, action_high=1.0, gamma=0.9)
        td = fake_transition(key)
        params = loss.init(key, td)
        total, m = loss(params, td, key)
        assert np.isfinite(float(total))
        qs = loss._q_ensemble(params["qvalue"], td)
        assert qs.shape[0] == 2


class TestTargetUpdaters:
    def test_soft_update_math(self):
        target = TDict(w=jnp.zeros(3))
        online = TDict(w=jnp.ones(3))
        upd = SoftUpdate(tau=0.1)
        out = upd(target, online)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)

    def test_soft_update_eps_alias(self):
        upd = SoftUpdate(eps=0.95)
        np.testing.assert_allclose(upd.tau, 0.05, rtol=1e-6)

    def test_hard_update(self):
        target = TDict(w=jnp.zeros(3))
        online = TDict(w=jnp.full((3,), 7.0))
        out = HardUpdate()(target, online)
        np.testing.assert_array_equal(np.asarray(out["w"]), [7, 7, 7])

    def test_make_target_params_detached(self):
        p = TDict(w=jnp.ones(2))
        t = make_target_params(p)
        np.testing.assert_array_equal(np.asarray(t["w"]), [1, 1])
