"""DreamerV3 stack: symlog/twohot utilities, categorical RSSM, v3 losses."""
import jax
import jax.numpy as jnp
import pytest

from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, TransformedEnv
from rl_tpu.envs.classic import PendulumEnv
from rl_tpu.envs.transforms import InitTracker
from rl_tpu.modules.world_model import (
    ObsEncoder,
    RSSMv3,
    rssm_imagine_v3,
)
from rl_tpu.objectives.dreamer_v3 import (
    DreamerV3ActorLoss,
    DreamerV3ModelLoss,
    DreamerV3ValueLoss,
    categorical_kl_balanced,
    default_bins,
    symexp,
    symlog,
    two_hot_decode,
    two_hot_encode,
)

import flax.linen as nn

OBS, ACT = 3, 1
T, B = 6, 3


class SymlogDecoder(nn.Module):
    obs_dim: int

    @nn.compact
    def __call__(self, h, z):
        x = nn.silu(nn.Dense(32)(jnp.concatenate([h, z], -1)))
        return nn.Dense(self.obs_dim)(x)


def collect_batch(key):
    env = TransformedEnv(BatchedEnv(PendulumEnv(), B), InitTracker())
    _, ys, _ = env.rollout(T, key=key)
    return ys


@pytest.fixture(scope="module")
def pieces():
    key = jax.random.PRNGKey(0)
    encoder = ObsEncoder(embed_dim=24, hidden=24)
    decoder = SymlogDecoder(obs_dim=OBS)
    rssm = RSSMv3(action_dim=ACT, n_cats=4, n_classes=6, deter_dim=16,
                  hidden=24, num_reward_bins=17)
    loss_mod = DreamerV3ModelLoss(encoder, decoder, rssm, free_bits=0.5)
    td = collect_batch(key)
    params = loss_mod.init(key, td)
    return encoder, decoder, rssm, loss_mod, td, params


class TestScalarCodecs:
    def test_symlog_roundtrip(self):
        x = jnp.array([-100.0, -1.5, 0.0, 0.3, 42.0])
        assert jnp.allclose(symexp(symlog(x)), x, atol=1e-4)

    def test_symlog_compresses(self):
        assert symlog(jnp.array(1000.0)) < 8.0

    def test_two_hot_roundtrip(self):
        bins = default_bins(41)
        x = jnp.array([-5.0, -0.7, 0.0, 1.3, 18.0])
        weights = two_hot_encode(x, bins)
        assert jnp.allclose(weights.sum(-1), 1.0, atol=1e-6)
        # decode(log(weights)) inverts encode up to interpolation error
        decoded = two_hot_decode(jnp.log(weights + 1e-12), bins)
        assert jnp.allclose(symlog(decoded), x, atol=1e-2)

    def test_two_hot_at_most_two_nonzero(self):
        bins = default_bins(17)
        w = two_hot_encode(jnp.array([0.37]), bins)
        assert int((w > 1e-9).sum()) <= 2

    def test_kl_balanced_zero_when_equal(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (5, 4, 6))
        kl = categorical_kl_balanced(logits, logits, free_bits=0.0)
        assert jnp.allclose(kl, 0.0, atol=1e-5)

    def test_kl_free_bits_floor(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (5, 4, 6))
        kl = categorical_kl_balanced(logits, logits, free_bits=1.0)
        assert jnp.allclose(kl, 1.0, atol=1e-5)


class TestRSSMv3:
    def test_observe_shapes(self, pieces, key):
        _, _, rssm, loss_mod, td, params = pieces
        post = loss_mod.observe(params, td, key)
        assert post["h"].shape == (T, B, rssm.deter_dim)
        assert post["z"].shape == (T, B, rssm.stoch_dim)
        assert post["post_logits"].shape == (T, B, rssm.n_cats, rssm.n_classes)
        assert post["reward_logits"].shape == (T, B, rssm.num_reward_bins)
        assert post["continue_logits"].shape == (T, B, 1)

    def test_z_is_straight_through_onehot(self, pieces, key):
        _, _, rssm, loss_mod, td, params = pieces
        post = loss_mod.observe(params, td, key)
        z = post["z"].reshape(T, B, rssm.n_cats, rssm.n_classes)
        # forward value = one-hot + probs - probs → each categorical sums to 1
        assert jnp.allclose(z.sum(-1), 1.0, atol=1e-5)

    def test_imagine_shapes(self, pieces, key):
        _, _, rssm, loss_mod, td, params = pieces
        h0 = jnp.zeros((B, rssm.deter_dim))
        z0 = jnp.zeros((B, rssm.stoch_dim))

        def policy(h, z, k):
            return jnp.zeros(h.shape[:-1] + (ACT,))

        imag = rssm_imagine_v3(rssm, params["rssm"].to_dict(), policy,
                               h0, z0, 5, key)
        assert imag["h"].shape == (5, B, rssm.deter_dim)
        assert imag["reward_logits"].shape == (5, B, rssm.num_reward_bins)


class TestV3Losses:
    def test_model_loss_finite_and_grads(self, pieces, key):
        _, _, _, loss_mod, td, params = pieces

        def total(p):
            total_loss, _ = loss_mod(p, td, key)
            return total_loss

        val, grads = jax.value_and_grad(total)(params)
        assert jnp.isfinite(val)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
        assert any(jnp.any(g != 0) for g in leaves)

    def test_actor_value_losses(self, pieces, key):
        _, _, rssm, loss_mod, td, params = pieces
        post = loss_mod.observe(params, td, key)

        actor = nn.Dense(ACT)
        value = nn.Dense(1)
        hz = jnp.concatenate([post["h"], post["z"]], -1)
        p_actor = actor.init(key, hz)["params"]
        p_value = value.init(key, hz)["params"]

        def _plain(p):
            return p.to_dict() if hasattr(p, "to_dict") else p

        def actor_fn(p, h, z, k):
            return actor.apply({"params": _plain(p)},
                               jnp.concatenate([h, z], -1))

        def value_fn(p, h, z):
            return value.apply(
                {"params": _plain(p)}, jnp.concatenate([h, z], -1)
            )[..., 0]

        aloss = DreamerV3ActorLoss(rssm, actor_fn, value_fn,
                                   imagination_horizon=4)
        all_params = TDict(rssm=params["rssm"], actor=p_actor, value=p_value)
        start = TDict(h=post["h"], z=post["z"])

        def actor_total(p):
            out = aloss.loss(p, start, key)
            return out["loss_actor"], out

        (val, out), grads = jax.value_and_grad(actor_total, has_aux=True)(
            all_params
        )
        assert jnp.isfinite(val)
        assert jnp.isfinite(out["return_scale"])
        a_leaves = jax.tree_util.tree_leaves(grads["actor"])
        assert any(jnp.any(g != 0) for g in a_leaves)

        # EMA state advances when threaded back in
        out2 = aloss.loss(all_params, start, key,
                          scale_state=out["scale_state"])
        assert jnp.isfinite(out2["loss_actor"])

        # value loss: symlog mse on imagined targets
        vloss = DreamerV3ValueLoss(value_fn)
        lam = TDict(h=post["h"], z=post["z"],
                    lambda_target=jnp.ones((T, B)))
        vout = vloss.loss(TDict(value=p_value), lam)
        assert jnp.isfinite(vout["loss_value"])

    def test_value_two_hot(self, pieces, key):
        _, _, rssm, loss_mod, td, params = pieces
        post = loss_mod.observe(params, td, key)
        head = nn.Dense(17)
        hz = jnp.concatenate([post["h"], post["z"]], -1)
        p = head.init(key, hz)["params"]

        def logits_fn(pv, h, z):
            pv = pv.to_dict() if hasattr(pv, "to_dict") else pv
            return head.apply({"params": pv}, jnp.concatenate([h, z], -1))

        def value_fn(pv, h, z):
            return two_hot_decode(logits_fn(pv, h, z), default_bins(17))

        vloss = DreamerV3ValueLoss(value_fn, value_loss="two_hot",
                                   value_logits_fn=logits_fn, num_bins=17)
        lam = TDict(h=post["h"], z=post["z"],
                    lambda_target=jnp.full((T, B), 2.0))
        out = vloss.loss(TDict(value=p), lam)
        assert jnp.isfinite(out["loss_value"])
