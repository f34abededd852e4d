"""Unit tests for the breadth losses: A2C/Reinforce/IQL/CQL/TD3BC/REDQ/CrossQ/BC/GAIL."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.modules import (
    MLP,
    BatchRenorm,
    NormalParamExtractor,
    ProbabilisticActor,
    QValueActor,
    Seq,
    TanhModule,
    TanhNormal,
    TDModule,
    ValueOperator,
)
from rl_tpu.objectives import (
    A2CLoss,
    BCLoss,
    CQLLoss,
    CrossQLoss,
    DiscreteCQLLoss,
    DiscreteIQLLoss,
    GAILLoss,
    IQLLoss,
    REDQLoss,
    ReinforceLoss,
    TD3BCLoss,
    expectile_loss,
)
from test_losses import fake_transition


def make_gaussian_actor(hidden=(16,)):
    net = Seq(
        TDModule(MLP(out_features=4, num_cells=hidden), ["observation"], ["pre"]),
        TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
    )
    return ProbabilisticActor(net, TanhNormal)


def make_q():
    return TDModule(MLP(out_features=1, num_cells=(16,)),
                    ["observation", "action"], ["state_action_value"])


class TestA2CReinforce:
    def test_a2c(self, key):
        actor = make_gaussian_actor()
        critic = ValueOperator(MLP(out_features=1, num_cells=(16,)))
        loss = A2CLoss(actor, critic)
        td = fake_transition(key).set("advantage", jnp.ones((32, 1))).set(
            "value_target", jnp.zeros((32, 1))
        )
        params = loss.init(key, td)
        total, m = loss(params, td, key)
        assert np.isfinite(float(total))
        assert "loss_critic" in m and "loss_entropy" in m

    def test_reinforce_no_baseline(self, key):
        actor = make_gaussian_actor()
        loss = ReinforceLoss(actor)
        td = fake_transition(key).set("advantage", jnp.ones((32, 1)))
        params = loss.init(key, td)
        total, m = loss(params, td, key)
        assert np.isfinite(float(total)) and "loss_value" not in m


class TestIQL:
    def test_expectile_loss_asymmetry(self):
        u = jnp.array([1.0, -1.0])
        out = expectile_loss(u, 0.9)
        np.testing.assert_allclose(np.asarray(out), [0.9, 0.1], rtol=1e-6)

    def test_iql_continuous(self, key):
        actor = make_gaussian_actor()
        value = ValueOperator(MLP(out_features=1, num_cells=(16,)))
        loss = IQLLoss(actor, make_q(), value)
        td = fake_transition(key)
        params = loss.init(key, td)
        total, m = loss(params, td, key)
        assert np.isfinite(float(total))
        for k in ("loss_actor", "loss_qvalue", "loss_value"):
            assert k in m

    def test_iql_discrete(self, key):
        from rl_tpu.modules import Categorical

        actor_net = TDModule(MLP(out_features=3, num_cells=(16,)), ["observation"], ["logits"])
        actor = ProbabilisticActor(actor_net, Categorical, dist_keys=["logits"])
        qvalue = TDModule(MLP(out_features=3, num_cells=(16,)), ["observation"], ["action_value"])
        value = ValueOperator(MLP(out_features=1, num_cells=(16,)))
        loss = DiscreteIQLLoss(actor, qvalue, value)
        td = fake_transition(key, discrete_n=3)
        params = loss.init(key, td)
        total, _ = loss(params, td, key)
        assert np.isfinite(float(total))


class TestCQL:
    def test_continuous_penalty_positive_early(self, key):
        actor = make_gaussian_actor()
        loss = CQLLoss(actor, make_q(), action_dim=2, num_random=4)
        td = fake_transition(key)
        params = loss.init(key, td)
        total, m = loss(params, td, key)
        assert np.isfinite(float(total))
        assert "loss_cql" in m and "cql_gap" in m

    def test_discrete_closed_form(self, key):
        qactor = QValueActor(MLP(out_features=3, num_cells=(16,)), in_keys=["observation"])
        loss = DiscreteCQLLoss(qactor, cql_alpha=2.0)
        td = fake_transition(key, discrete_n=3)
        params = loss.init(key, td)
        total, m = loss(params, td)
        # logsumexp >= max >= q_data, so the gap is positive
        assert float(m["cql_gap"]) > 0
        assert "loss_cql" in m

    def test_lagrange_variant(self, key):
        actor = make_gaussian_actor()
        loss = CQLLoss(actor, make_q(), action_dim=2, num_random=2, with_lagrange=True)
        td = fake_transition(key)
        params = loss.init(key, td)
        assert "log_alpha_prime" in params
        total, m = loss(params, td, key)
        assert "loss_alpha_prime" in m


class TestTD3BC:
    def test_bc_term(self, key):
        actor = Seq(
            TDModule(MLP(out_features=2, num_cells=(16,)), ["observation"], ["pre_t"]),
            TanhModule(in_keys=["pre_t"], out_keys=["action"]),
            names=["net", "tanh"],
        )
        loss = TD3BCLoss(actor, make_q(), action_low=-1.0, action_high=1.0)
        td = fake_transition(key)
        params = loss.init(key, td)
        total, m = loss(params, td, key)
        assert "bc_loss" in m
        assert np.isfinite(float(total))


class TestREDQ:
    def test_ensemble_of_ten(self, key):
        actor = make_gaussian_actor()
        loss = REDQLoss(actor, make_q(), action_dim=2, num_qvalue_nets=10,
                        sub_sample_len=2)
        td = fake_transition(key)
        params = loss.init(key, td)
        qs = loss._q_ensemble(params["qvalue"], td)
        assert qs.shape[0] == 10
        total, m = loss(params, td, key)
        assert np.isfinite(float(total))


class TestCrossQ:
    def test_joint_batchnorm_forward(self, key):
        import flax.linen as nn

        class QNet(nn.Module):
            @nn.compact
            def __call__(self, obs, act, use_running_average=False):
                x = jnp.concatenate([obs, act], -1)
                x = BatchRenorm()(x, use_running_average)
                x = nn.Dense(16)(x)
                x = nn.relu(x)
                return nn.Dense(1)(x)

        actor = make_gaussian_actor()
        loss = CrossQLoss(actor, QNet(), action_dim=2)
        td = fake_transition(key)
        params = loss.init(key, td)
        assert "qvalue_stats" in params
        total, m = loss(params, td, key)
        assert np.isfinite(float(total))
        params2 = loss.apply_stats(params, m)
        # batch stats stepped
        s0 = jax.tree.leaves(params["qvalue_stats"])
        s1 = jax.tree.leaves(params2["qvalue_stats"])
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(s0, s1)
        )


class TestBCGail:
    def test_bc_probabilistic(self, key):
        actor = make_gaussian_actor()
        loss = BCLoss(actor)
        td = fake_transition(key)
        params = loss.init(key, td)
        total, _ = loss(params, td, key)
        assert np.isfinite(float(total))

    def test_bc_deterministic(self, key):
        actor = Seq(
            TDModule(MLP(out_features=2, num_cells=(16,)), ["observation"], ["pre_t"]),
            TanhModule(in_keys=["pre_t"], out_keys=["action"]),
            names=["net", "tanh"],
        )
        loss = BCLoss(actor)
        td = fake_transition(key)
        params = loss.init(key, td)
        total, _ = loss(params, td, key)
        assert np.isfinite(float(total))

    def test_gail_discriminator_separates(self, key):
        disc = TDModule(MLP(out_features=1, num_cells=(32,)),
                        ["observation", "action"], ["d_logits"])
        loss = GAILLoss(disc)
        pol = fake_transition(key)
        exp = fake_transition(jax.random.PRNGKey(1))
        params = loss.init(key, pol)
        total, m = loss(params, pol, exp, key)
        assert np.isfinite(float(total))
        r = loss.reward(params, pol)
        assert r.shape == (32, 1)
        assert (np.asarray(r) >= 0).all()  # -log(1-D) >= 0

    def test_gail_grad_penalty(self, key):
        disc = TDModule(MLP(out_features=1, num_cells=(16,)),
                        ["observation", "action"], ["d_logits"])
        loss = GAILLoss(disc, use_grad_penalty=True)
        pol = fake_transition(key)
        exp = fake_transition(jax.random.PRNGKey(1))
        params = loss.init(key, pol)
        total, m = loss(params, pol, exp, key)
        assert "gp" in m
