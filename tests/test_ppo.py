"""PPO loss unit tests + end-to-end learning smoke tests.

The learning tests mirror the reference's sota PPO training shape
(sota-implementations/ppo/ppo_mujoco.py): collect → GAE → epochs ×
minibatches of clipped updates, all inside one jitted update.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rl_tpu.collectors import Collector
from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, CartPoleEnv, PendulumEnv
from rl_tpu.modules import (
    MLP,
    Categorical,
    NormalParamExtractor,
    ProbabilisticActor,
    Seq,
    TanhNormal,
    TDModule,
    ValueOperator,
)
from rl_tpu.objectives import GAE, ClipPPOLoss, KLPENPPOLoss, PPOLoss


def make_continuous_actor_critic(key, obs_dim, act_dim, low=-1.0, high=1.0):
    net = Seq(
        TDModule(MLP(out_features=2 * act_dim, num_cells=(64, 64)), ["observation"], ["pre"]),
        TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
    )
    actor = ProbabilisticActor(
        net, TanhNormal, dist_keys=["loc", "scale"], dist_kwargs={"low": low, "high": high}
    )
    critic = ValueOperator(MLP(out_features=1, num_cells=(64, 64)))
    td = TDict(observation=jnp.zeros((1, obs_dim)))
    k1, k2 = jax.random.split(key)
    params = TDict(actor=actor.init(k1, td), critic=critic.init(k2, td))
    return actor, critic, params


def make_discrete_actor_critic(key, obs_dim, n_actions):
    net = TDModule(MLP(out_features=n_actions, num_cells=(64, 64)), ["observation"], ["logits"])
    actor = ProbabilisticActor(net, Categorical, dist_keys=["logits"])
    critic = ValueOperator(MLP(out_features=1, num_cells=(64, 64)))
    td = TDict(observation=jnp.zeros((1, obs_dim)))
    k1, k2 = jax.random.split(key)
    params = TDict(actor=actor.init(k1, td), critic=critic.init(k2, td))
    return actor, critic, params


class TestPPOLossUnits:
    def make_batch(self, key, actor, critic, params, B=64, obs_dim=3, act_dim=1):
        ks = jax.random.split(key, 4)
        td = TDict(observation=jax.random.normal(ks[0], (B, obs_dim)))
        td = actor(params["actor"], td, key=ks[1])
        td = critic(params["critic"], td)
        td = td.set("advantage", jax.random.normal(ks[2], (B, 1)))
        td = td.set("value_target", jax.random.normal(ks[3], (B, 1)))
        return td

    def test_losses_finite_and_keyed(self, key):
        actor, critic, params = make_continuous_actor_critic(key, 3, 1)
        td = self.make_batch(key, actor, critic, params)
        for loss_cls in (PPOLoss, ClipPPOLoss, KLPENPPOLoss):
            loss_mod = loss_cls(actor, critic)
            total, metrics = loss_mod(params, td)
            assert np.isfinite(float(total))
            assert "loss_objective" in metrics
            assert "loss_critic" in metrics
            assert "loss_entropy" in metrics

    def test_zero_advantage_zero_objective_grad(self, key):
        actor, critic, params = make_continuous_actor_critic(key, 3, 1)
        td = self.make_batch(key, actor, critic, params).set(
            "advantage", jnp.zeros((64, 1))
        )
        loss_mod = ClipPPOLoss(actor, critic, entropy_coeff=0.0, critic_coeff=0.0)
        grads = jax.grad(lambda p: loss_mod(p, td)[0])(params)
        flat = jnp.concatenate([jnp.ravel(g) for g in jax.tree.leaves(grads["actor"])])
        np.testing.assert_allclose(np.asarray(flat), 0.0, atol=1e-5)

    def test_clip_fraction_increases_off_policy(self, key):
        actor, critic, params = make_continuous_actor_critic(key, 3, 1)
        td = self.make_batch(key, actor, critic, params)
        loss_mod = ClipPPOLoss(actor, critic)
        _, m_on = loss_mod(params, td)
        td_off = td.set("sample_log_prob", td["sample_log_prob"] - 2.0)
        _, m_off = loss_mod(params, td_off)
        assert float(m_off["clip_fraction"]) > float(m_on["clip_fraction"])

    def test_discrete_loss(self, key):
        actor, critic, params = make_discrete_actor_critic(key, 4, 2)
        ks = jax.random.split(key, 3)
        td = TDict(observation=jax.random.normal(ks[0], (32, 4)))
        td = actor(params["actor"], td, key=ks[1])
        td = td.set("advantage", jax.random.normal(ks[2], (32, 1)))
        td = td.set("value_target", jnp.zeros((32, 1)))
        total, metrics = ClipPPOLoss(actor, critic)(params, td)
        assert np.isfinite(float(total))
        # discrete entropy is closed-form
        assert float(metrics["entropy"]) > 0


def ppo_train(env, actor, critic, params, key, *, iters, frames_per_batch,
              epochs=4, minibatches=4, lr_actor=3e-4, lr_critic=1e-3,
              gamma=0.99, lmbda=0.95):
    """One-jit PPO training step (collect outside, update inside).

    Gradients are clipped per sub-network: a shared global-norm clip lets the
    large-scale critic gradient starve the actor (observed on Pendulum).
    """
    collector = Collector(env, lambda p, td, k: actor(p["actor"], td, key=k),
                          frames_per_batch=frames_per_batch)
    gae = GAE(gamma, lmbda, critic, average_gae=True)
    loss_mod = ClipPPOLoss(actor, critic, entropy_coeff=0.01, critic_coeff=1.0,
                           normalize_advantage=False)
    param_labels = TDict(
        actor=jax.tree.map(lambda _: "a", params["actor"]),
        critic=jax.tree.map(lambda _: "c", params["critic"]),
    )
    tx = optax.multi_transform(
        {
            "a": optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr_actor)),
            "c": optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr_critic)),
        },
        param_labels,
    )
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, batch, k):
        batch = gae(params["critic"], batch)
        flat = batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))
        N = flat["advantage"].shape[0]
        mb_size = N // minibatches

        def epoch_body(carry, k_epoch):
            params, opt_state = carry
            perm = jax.random.permutation(k_epoch, N)

            def mb_body(carry, idx):
                params, opt_state = carry
                mb = flat[idx]
                (total, metrics), grads = jax.value_and_grad(
                    lambda p: loss_mod(p, mb), has_aux=True
                )(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), total

            idxs = perm[: mb_size * minibatches].reshape(minibatches, mb_size)
            (params, opt_state), losses = jax.lax.scan(mb_body, (params, opt_state), idxs)
            return (params, opt_state), losses.mean()

        ks = jax.random.split(k, epochs)
        (params, opt_state), _ = jax.lax.scan(epoch_body, (params, opt_state), ks)
        return params, opt_state

    cstate = collector.init(key)
    rewards = []
    for i in range(iters):
        cstate, batch = collector.collect(params, cstate)
        rewards.append(float(jnp.asarray(batch["next", "reward"]).mean()))
        key, k = jax.random.split(key)
        params, opt_state = update(params, opt_state, batch, k)
    return params, rewards


@pytest.mark.slow
class TestPPOLearning:
    def test_pendulum_improves(self, key):
        from rl_tpu.envs import TransformedEnv
        from rl_tpu.envs.transforms import RewardScaling

        env = TransformedEnv(BatchedEnv(PendulumEnv(), 16), RewardScaling(scale=0.1))
        actor, critic, params = make_continuous_actor_critic(
            key, 3, 1, low=-2.0, high=2.0
        )
        params, rewards = ppo_train(
            env, actor, critic, params, key, iters=35, frames_per_batch=2048,
            gamma=0.9, epochs=6,
        )
        early = np.mean(rewards[:3])
        late = np.mean(rewards[-3:])
        # scaled per-step cost drops ≈ -0.65 → ≥ -0.40
        assert late > early + 0.2, f"no learning: early={early:.3f} late={late:.3f}"

    def test_cartpole_improves(self, key):
        env = BatchedEnv(CartPoleEnv(), 16)
        actor, critic, params = make_discrete_actor_critic(key, 4, 2)

        # episode-length proxy: mean done rate should drop as poles balance
        collector_env = env
        params, rewards = ppo_train(
            collector_env, actor, critic, params, key, iters=25,
            frames_per_batch=1024, lr_actor=1e-3, gamma=0.98,
        )
        # measure avg episode length via rollout dones
        _, ys, _ = env.rollout(
            300,
            lambda td, k: actor(params["actor"], td, k),
            key=jax.random.PRNGKey(123),
        )
        done_rate = float(jnp.asarray(ys["next", "done"]).mean())
        avg_len = 1.0 / max(done_rate, 1e-3)
        assert avg_len > 60, f"cartpole avg episode length {avg_len:.1f} <= 60"
