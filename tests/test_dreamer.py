"""Dreamer world-model stack: RSSM filtering/imagination, ELBO training."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, PendulumEnv, TransformedEnv
from rl_tpu.envs.transforms import InitTracker
from rl_tpu.modules.world_model import ObsDecoder, ObsEncoder, RSSM, rssm_imagine, rssm_observe
from rl_tpu.objectives.dreamer import DreamerActorLoss, DreamerModelLoss, DreamerValueLoss

OBS, ACT = 3, 1
T, B = 8, 4


def collect_pendulum_batch(key, T=T, B=B):
    env = TransformedEnv(BatchedEnv(PendulumEnv(), B), InitTracker())
    _, ys, _ = env.rollout(T, key=key)
    return ys  # [T, B, ...]


@pytest.fixture(scope="module")
def pieces():
    key = jax.random.PRNGKey(0)
    encoder = ObsEncoder(embed_dim=32, hidden=32)
    decoder = ObsDecoder(obs_dim=OBS, hidden=32)
    rssm = RSSM(action_dim=ACT, stoch_dim=8, deter_dim=16, hidden=32)
    loss_mod = DreamerModelLoss(encoder, decoder, rssm, free_nats=1.0)
    td = collect_pendulum_batch(key)
    params = loss_mod.init(key, td)
    return encoder, decoder, rssm, loss_mod, td, params


class TestRSSM:
    def test_observe_shapes(self, pieces, key):
        encoder, decoder, rssm, loss_mod, td, params = pieces
        post = loss_mod.observe(params, td, key)
        assert post["h"].shape == (T, B, 16)
        assert post["z"].shape == (T, B, 8)
        assert post["pred_reward"].shape == (T, B, 1)

    def test_is_first_resets_latent(self, pieces, key):
        encoder, decoder, rssm, loss_mod, td, params = pieces
        # all-first: every step filtered from zero state
        td_first = td.set("is_init", jnp.ones((T, B, 1), bool))
        post_a = loss_mod.observe(params, td_first, key)
        # single-step observe of step 3 alone must match step 3 of all-first
        td3 = jax.tree.map(lambda x: x[3:4], td).set(
            "is_init", jnp.ones((1, B, 1), bool)
        )
        post_b = loss_mod.observe(params, td3, key)
        # same key-split offset: recompute with identical subkey by slicing
        # instead compare statistics via the deterministic parts
        np.testing.assert_allclose(
            np.asarray(post_a["prior_mean"][3]),
            np.asarray(
                loss_mod.observe(params, td3, jax.random.split(key, T)[3]) ["prior_mean"][0]
            ),
            rtol=1e-4, atol=1e-5,
        )

    def test_imagine_shapes(self, pieces, key):
        encoder, decoder, rssm, loss_mod, td, params = pieces
        h0 = jnp.zeros((B, 16))
        z0 = jnp.zeros((B, 8))

        def policy(h, z, k):
            return jnp.zeros((h.shape[0], ACT))

        imag = rssm_imagine(rssm, loss_mod._plain(params["rssm"]), policy, h0, z0, 5, key)
        assert imag["h"].shape == (5, B, 16)
        assert imag["pred_reward"].shape == (5, B, 1)


class TestDreamerModelLoss:
    def test_loss_finite_with_parts(self, pieces, key):
        encoder, decoder, rssm, loss_mod, td, params = pieces
        total, m = loss_mod(params, td, key)
        for k in ("loss_model_reco", "loss_model_reward", "loss_model_kl"):
            assert k in m
        assert np.isfinite(float(total))

    def test_elbo_improves_with_training(self, key):
        encoder = ObsEncoder(embed_dim=32, hidden=64)
        decoder = ObsDecoder(obs_dim=OBS, hidden=64)
        rssm = RSSM(action_dim=ACT, stoch_dim=8, deter_dim=32, hidden=64)
        loss_mod = DreamerModelLoss(encoder, decoder, rssm, free_nats=0.5)
        td = collect_pendulum_batch(key, T=16, B=8)
        params = loss_mod.init(key, td)
        tx = optax.adam(3e-4)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, k):
            (total, m), g = jax.value_and_grad(
                lambda p: loss_mod(p, td, k), has_aux=True
            )(params)
            u, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, u), opt, m["loss_model_reco"]

        losses = []
        k = key
        for i in range(60):
            k, kk = jax.random.split(k)
            params, opt, reco = step(params, opt, kk)
            losses.append(float(reco))
        assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10]), (
            f"reco loss did not halve: {np.mean(losses[:10]):.4f} -> "
            f"{np.mean(losses[-10:]):.4f}"
        )


class TestDreamerActorValue:
    def test_actor_and_value_losses(self, pieces, key):
        encoder, decoder, rssm, loss_mod, td, params = pieces
        actor_net = nn.Dense(ACT)
        value_net = nn.Dense(1)
        h0 = jnp.zeros((B, 16))
        z0 = jnp.zeros((B, 8))
        p_actor = actor_net.init(key, jnp.concatenate([h0, z0], -1))["params"]
        p_value = value_net.init(key, jnp.concatenate([h0, z0], -1))["params"]

        def actor_fn(p, h, z, k):
            p = p.to_dict() if hasattr(p, "to_dict") else p
            return jnp.tanh(actor_net.apply({"params": p}, jnp.concatenate([h, z], -1)))

        def value_fn(p, h, z):
            p = p.to_dict() if hasattr(p, "to_dict") else p
            return value_net.apply({"params": p}, jnp.concatenate([h, z], -1))

        aloss = DreamerActorLoss(rssm, actor_fn, value_fn, imagination_horizon=5)
        post = loss_mod.observe(params, td, key)
        full = TDict(rssm=params["rssm"], actor=p_actor, value=p_value,
                     h=post["h"], z=post["z"])
        total, m = aloss(full, full, key)
        assert np.isfinite(float(total))
        # gradient reaches the actor through the imagined dynamics
        g = jax.grad(lambda pa: aloss(full.set("actor", pa), full, key)[0])(p_actor)
        assert any(float(jnp.abs(x).sum()) > 0 for x in jax.tree.leaves(g))

        # value loss on imagined targets
        returns, imag, values = aloss.imagined_lambda_returns(
            full, post["h"].reshape(-1, 16), post["z"].reshape(-1, 8), key
        )
        vloss = DreamerValueLoss(value_fn)
        vtd = TDict(h=imag["h"], z=imag["z"], lambda_target=returns)
        tot_v, _ = vloss(TDict(value=p_value), vtd)
        assert np.isfinite(float(tot_v))
