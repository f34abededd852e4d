"""Parametrized loss matrix (VERDICT r3 next #9).

The rl_tpu analogue of the reference's per-loss parametrized matrices
(``/root/reference/test/objectives/test_*.py`` run each loss across
device × functional × key-remap × reduction): every registered loss is
driven through the SAME battery —

* the house invariant: ``loss_*`` metric keys sum to the returned total;
* jit(loss) equals eager loss;
* gradients exist, are finite, and are nonzero for at least one online
  subtree while target subtrees get exactly zero;
* all metrics are finite.

Builders construct each loss with tiny nets on synthetic transitions, so
the matrix stays fast enough to run per-commit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.modules import (
    MLP,
    NormalParamExtractor,
    ProbabilisticActor,
    QValueActor,
    Seq,
    TanhModule,
    TanhNormal,
    TDModule,
    ValueOperator,
)

B, OBS, ACT, NDISC = 16, 4, 2, 3


def transition(key, discrete=False):
    ks = jax.random.split(key, 6)
    action = (jax.random.randint(ks[1], (B,), 0, NDISC) if discrete
              else jax.random.uniform(ks[1], (B, ACT), minval=-1, maxval=1))
    td = TDict(
        observation=jax.random.normal(ks[0], (B, OBS)),
        action=action,
        sample_log_prob=-jnp.abs(jax.random.normal(ks[5], (B,))),
        advantage=jax.random.normal(ks[5], (B, 1)),
        value_target=jax.random.normal(ks[3], (B, 1)),
        next={
            "observation": jax.random.normal(ks[2], (B, OBS)),
            "reward": jax.random.normal(ks[3], (B, 1)),
            "done": jax.random.bernoulli(ks[4], 0.1, (B, 1)),
            "terminated": jax.random.bernoulli(ks[4], 0.1, (B, 1)),
        },
    )
    return td


def gaussian_actor():
    return ProbabilisticActor(
        Seq(
            TDModule(MLP(out_features=2 * ACT, num_cells=(16,)),
                     ["observation"], ["pre"]),
            TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
        ),
        TanhNormal, dist_kwargs={"low": -1.0, "high": 1.0},
    )


def det_actor():
    return Seq(
        TDModule(MLP(out_features=ACT, num_cells=(16,)),
                 ["observation"], ["param"]),
        TanhModule(["param"], ["action"], low=-1.0, high=1.0),
    )


def qvalue_sa():
    return TDModule(MLP(out_features=1, num_cells=(16,)),
                    ["observation", "action"], ["state_action_value"])


def categorical_actor():
    from rl_tpu.modules import Categorical

    return ProbabilisticActor(
        TDModule(MLP(out_features=NDISC, num_cells=(16,)),
                 ["observation"], ["logits"]),
        Categorical, dist_keys=["logits"],
    )


def build_dqn(key):
    from rl_tpu.objectives import DQNLoss

    loss = DQNLoss(QValueActor(MLP(out_features=NDISC, num_cells=(16,)),
                               in_keys=["observation"]), gamma=0.9)
    td = transition(key, discrete=True)
    return loss, loss.init(key, td), td, ("value",), ("target_value",)


def build_discrete_cql(key):
    from rl_tpu.objectives import DiscreteCQLLoss

    loss = DiscreteCQLLoss(
        QValueActor(MLP(out_features=NDISC, num_cells=(16,)),
                    in_keys=["observation"]), gamma=0.9)
    td = transition(key, discrete=True)
    return loss, loss.init(key, td), td, ("value",), ("target_value",)


def build_ddpg(key):
    from rl_tpu.objectives import DDPGLoss

    loss = DDPGLoss(det_actor(), qvalue_sa())
    td = transition(key)
    return loss, loss.init(key, td), td, ("actor", "qvalue"), (
        "target_actor", "target_qvalue")


def build_td3(key):
    from rl_tpu.objectives import TD3Loss

    loss = TD3Loss(det_actor(), qvalue_sa(), action_low=-1.0, action_high=1.0)
    td = transition(key)
    return loss, loss.init(key, td), td, ("actor", "qvalue"), (
        "target_actor", "target_qvalue")


def build_td3bc(key):
    from rl_tpu.objectives import TD3BCLoss

    loss = TD3BCLoss(det_actor(), qvalue_sa(), action_low=-1.0,
                     action_high=1.0)
    td = transition(key)
    return loss, loss.init(key, td), td, ("actor", "qvalue"), (
        "target_actor", "target_qvalue")


def build_sac(key):
    from rl_tpu.objectives import SACLoss

    loss = SACLoss(gaussian_actor(), qvalue_sa(), action_dim=ACT)
    td = transition(key)
    return loss, loss.init(key, td), td, ("actor", "qvalue"), (
        "target_qvalue",)


def build_redq(key):
    from rl_tpu.objectives import REDQLoss

    loss = REDQLoss(gaussian_actor(), qvalue_sa(), num_qvalue_nets=3,
                    sub_sample_len=2, action_dim=ACT)
    td = transition(key)
    return loss, loss.init(key, td), td, ("actor", "qvalue"), (
        "target_qvalue",)


def build_cql(key):
    from rl_tpu.objectives import CQLLoss

    loss = CQLLoss(gaussian_actor(), qvalue_sa(), action_dim=ACT)
    td = transition(key)
    return loss, loss.init(key, td), td, ("actor", "qvalue"), (
        "target_qvalue",)


def build_iql(key):
    from rl_tpu.objectives import IQLLoss

    value = ValueOperator(MLP(out_features=1, num_cells=(16,)))
    loss = IQLLoss(gaussian_actor(), qvalue_sa(), value)
    td = transition(key)
    return loss, loss.init(key, td), td, ("actor", "qvalue", "value"), (
        "target_qvalue",)


def build_ppo(key):
    from rl_tpu.objectives import ClipPPOLoss

    critic = ValueOperator(MLP(out_features=1, num_cells=(16,)))
    loss = ClipPPOLoss(categorical_actor(), critic)
    td = transition(key, discrete=True)
    return loss, loss.init(key, td), td, ("actor", "critic"), ()


def build_a2c(key):
    from rl_tpu.objectives import A2CLoss

    critic = ValueOperator(MLP(out_features=1, num_cells=(16,)))
    loss = A2CLoss(categorical_actor(), critic)
    td = transition(key, discrete=True)
    return loss, loss.init(key, td), td, ("actor", "critic"), ()


def build_reinforce(key):
    from rl_tpu.objectives import ReinforceLoss

    critic = ValueOperator(MLP(out_features=1, num_cells=(16,)))
    loss = ReinforceLoss(categorical_actor(), critic)
    td = transition(key, discrete=True)
    return loss, loss.init(key, td), td, ("actor", "critic"), ()


BUILDERS = {
    "dqn": build_dqn,
    "discrete_cql": build_discrete_cql,
    "ddpg": build_ddpg,
    "td3": build_td3,
    "td3_bc": build_td3bc,
    "sac": build_sac,
    "redq": build_redq,
    "cql": build_cql,
    "iql": build_iql,
    "clip_ppo": build_ppo,
    "a2c": build_a2c,
    "reinforce": build_reinforce,
}


@pytest.fixture(params=sorted(BUILDERS), ids=sorted(BUILDERS))
def built(request, key):
    loss, params, td, online, target = BUILDERS[request.param](key)
    k = jax.random.PRNGKey(7)
    return loss, params, td, online, target, k


class TestLossMatrix:
    def test_loss_keys_sum_to_total(self, built):
        loss, params, td, *_, k = built
        total, metrics = loss(params, td, k)
        parts = [float(v) for name, v in metrics.items(
            include_nested=True, leaves_only=True)
            if isinstance(name, str) and name.startswith("loss_")]
        assert parts, "no loss_* keys in metrics"
        np.testing.assert_allclose(float(total), sum(parts), rtol=1e-5,
                                   atol=1e-6)

    def test_jit_matches_eager(self, built):
        loss, params, td, *_, k = built
        eager, _ = loss(params, td, k)
        jitted, _ = jax.jit(lambda p, t, kk: loss(p, t, kk))(params, td, k)
        np.testing.assert_allclose(float(jitted), float(eager), rtol=1e-4,
                                   atol=1e-5)

    def test_metrics_finite(self, built):
        loss, params, td, *_, k = built
        total, metrics = loss(params, td, k)
        assert np.isfinite(float(total))
        for name, v in metrics.items(include_nested=True, leaves_only=True):
            assert np.all(np.isfinite(np.asarray(v))), f"{name} not finite"

    def test_grads_online_nonzero_target_zero(self, built):
        loss, params, td, online, target, k = built
        g = jax.grad(lambda p: loss(p, td, k)[0])(params)
        for sub in online:
            leaves = [np.asarray(x) for x in jax.tree.leaves(g[sub])]
            assert all(np.all(np.isfinite(x)) for x in leaves), sub
            assert any(float(np.abs(x).sum()) > 0 for x in leaves), (
                f"online subtree {sub!r} got all-zero grads")
        for sub in target:
            if sub not in g:
                continue
            leaves = [float(np.abs(np.asarray(x)).sum())
                      for x in jax.tree.leaves(g[sub])]
            assert all(v == 0.0 for v in leaves), (
                f"target subtree {sub!r} leaked gradient")
