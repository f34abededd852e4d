"""RSSM world-model components (Dreamer).

Counterparts of the reference Dreamer model zoo
(``/root/reference/torchrl/modules/models/model_based.py``: ``ObsEncoder``/
``ObsDecoder`` :83+, ``RSSMPrior`` :..., ``RSSMPosterior``, ``RSSMRollout``
:533; V3 variants model_based_v3.py:17-257).

Recurrent State-Space Model (Hafner et al. 2019): deterministic path
``h_t = GRU(h_{t-1}, [z_{t-1}, a_{t-1}])`` plus stochastic latent ``z_t``
with a prior ``p(z_t | h_t)`` and posterior ``q(z_t | h_t, o_t)``.  The
sequence rollout is a single ``lax.scan`` — the reference's RSSMRollout
module loop collapses into one fused program.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from rl_tpu.modules.td_module import Seq

__all__ = [
    "ObsEncoder", "ObsDecoder", "RSSM", "rssm_observe", "rssm_imagine",
    "RSSMv3", "rssm_observe_v3", "rssm_imagine_v3",
    "WorldModel", "WorldModelWrapper",
]


class ObsEncoder(nn.Module):
    """Observation → embedding. MLP for vectors, conv for pixel inputs.

    Pixels are detected as trailing [H, W, C] dims with at least one batch
    dim (``pixels=True`` forces it; vector obs like [T, B, D] must never
    match).
    """

    embed_dim: int = 256
    hidden: int = 256
    pixels: bool = False

    @nn.compact
    def __call__(self, obs):
        obs = jnp.asarray(obs, jnp.float32)
        if self.pixels or (
            obs.ndim >= 4 and obs.shape[-1] in (1, 3, 4) and obs.shape[-2] >= 16
        ):
            lead = obs.shape[:-3]
            x = obs.reshape((-1,) + obs.shape[-3:])
            for ch in (32, 64, 128):
                x = nn.Conv(ch, (4, 4), strides=(2, 2))(x)
                x = nn.elu(x)
            x = x.reshape(lead + (-1,))
        else:
            x = obs
        x = nn.Dense(self.hidden)(x)
        x = nn.elu(x)
        return nn.Dense(self.embed_dim)(x)


class ObsDecoder(nn.Module):
    """(h, z) → observation reconstruction (vector head)."""

    obs_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, h, z):
        x = jnp.concatenate([h, z], -1)
        x = nn.Dense(self.hidden)(x)
        x = nn.elu(x)
        x = nn.Dense(self.hidden)(x)
        x = nn.elu(x)
        return nn.Dense(self.obs_dim)(x)


class RSSM(nn.Module):
    """Prior/posterior/reward heads + the deterministic GRU core."""

    action_dim: int
    stoch_dim: int = 30
    deter_dim: int = 200
    hidden: int = 200
    min_std: float = 0.1

    def setup(self):
        self.gru = nn.GRUCell(features=self.deter_dim)
        self.pre_gru = nn.Dense(self.hidden)
        self.prior_net = nn.Sequential([nn.Dense(self.hidden), nn.elu,
                                        nn.Dense(2 * self.stoch_dim)])
        self.post_net = nn.Sequential([nn.Dense(self.hidden), nn.elu,
                                       nn.Dense(2 * self.stoch_dim)])
        self.reward_net = nn.Sequential([nn.Dense(self.hidden), nn.elu,
                                         nn.Dense(self.hidden), nn.elu,
                                         nn.Dense(1)])

    def _stats(self, raw):
        mean, raw_std = jnp.split(raw, 2, -1)
        std = jax.nn.softplus(raw_std) + self.min_std
        return mean, std

    def step_prior(self, h, z, action, key):
        """One deterministic+prior step: returns (h', z', prior_stats)."""
        x = nn.elu(self.pre_gru(jnp.concatenate([z, jnp.asarray(action)], -1)))
        h, _ = self.gru(h, x)
        mean, std = self._stats(self.prior_net(h))
        z = mean + std * jax.random.normal(key, mean.shape)
        return h, z, (mean, std)

    def posterior(self, h, embed, key):
        mean, std = self._stats(self.post_net(jnp.concatenate([h, embed], -1)))
        z = mean + std * jax.random.normal(key, mean.shape)
        return z, (mean, std)

    def reward(self, h, z):
        return self.reward_net(jnp.concatenate([h, z], -1))

    def __call__(self, h, z, action, embed, key):
        """Used for init: one observe step."""
        k1, k2 = jax.random.split(key)
        h, z_prior, prior_stats = self.step_prior(h, z, action, k1)
        z_post, post_stats = self.posterior(h, embed, k2)
        r = self.reward(h, z_post)
        return h, z_post, prior_stats, post_stats, r


def rssm_observe(rssm: RSSM, params, embeds, actions, is_first, key,
                 h0=None, z0=None):
    """Filter a [T, B] sequence of embeddings/actions through the RSSM.

    Returns TDict with h, z (posterior samples), prior/posterior stats and
    predicted rewards, all [T, B, ...].  ``is_first`` zeroes the carried
    state (episode boundaries — the reference's is_init handling).
    """
    T, B = embeds.shape[0], embeds.shape[1]
    h = h0 if h0 is not None else jnp.zeros((B, rssm.deter_dim))
    z = z0 if z0 is not None else jnp.zeros((B, rssm.stoch_dim))

    def body(carry, xs):
        h, z = carry
        embed_t, act_t, first_t, k = xs
        mask = jnp.asarray(first_t, jnp.float32).reshape(B, 1)
        h = h * (1 - mask)
        z = z * (1 - mask)
        act_t = jnp.asarray(act_t) * (1 - mask)
        k1, k2 = jax.random.split(k)
        h, _, (pm, ps) = rssm.apply(
            {"params": params}, h, z, act_t, k1, method=RSSM.step_prior
        )
        z, (qm, qs) = rssm.apply(
            {"params": params}, h, embed_t, k2, method=RSSM.posterior
        )
        r = rssm.apply({"params": params}, h, z, method=RSSM.reward)
        return (h, z), (h, z, pm, ps, qm, qs, r)

    ks = jax.random.split(key, T)
    (h, z), (hs, zs, pm, ps, qm, qs, r) = jax.lax.scan(
        body, (h, z), (embeds, actions, is_first, ks)
    )
    return TDict(h=hs, z=zs, prior_mean=pm, prior_std=ps,
                 post_mean=qm, post_std=qs, pred_reward=r,
                 final={"h": h, "z": z})


def rssm_imagine(rssm: RSSM, params, policy_fn, h0, z0, horizon: int, key):
    """Imagination rollout from starting states using the prior only.

    ``policy_fn(h, z, key) -> action``.  Returns [H, N, ...] latents,
    actions, predicted rewards (the Dreamer actor's training data).
    """

    def body(carry, k):
        h, z = carry
        k1, k2 = jax.random.split(k)
        action = policy_fn(h, z, k1)
        h, z, _ = rssm.apply(
            {"params": params}, h, z, action, k2, method=RSSM.step_prior
        )
        r = rssm.apply({"params": params}, h, z, method=RSSM.reward)
        return (h, z), (h, z, action, r)

    ks = jax.random.split(key, horizon)
    _, (hs, zs, acts, rs) = jax.lax.scan(body, (h0, z0), ks)
    return TDict(h=hs, z=zs, action=acts, pred_reward=rs)


# ---------------------------------------------------------------------------
# DreamerV3: discrete (categorical) latent RSSM
# (reference /root/reference/torchrl/modules/models/model_based_v3.py:
#  RSSMPriorV3 :17, RSSMPosteriorV3 :161, RSSMRolloutV3 :257).
# ---------------------------------------------------------------------------


class RSSMv3(nn.Module):
    """DreamerV3 RSSM: ``n_cats`` categorical latents with ``n_classes``
    classes each, straight-through sampling and 1% uniform mixing (unimix)
    on the latent distributions.

    The stochastic state ``z`` is the flattened one-hot stack
    ``[n_cats * n_classes]``.  Heads: reward as two-hot logits over
    ``num_reward_bins`` symlog-spaced bins, and a continue (non-terminal)
    logit — both the DreamerV3 scalar-prediction recipe.
    """

    action_dim: int
    n_cats: int = 32
    n_classes: int = 32
    deter_dim: int = 256
    hidden: int = 256
    unimix: float = 0.01
    num_reward_bins: int = 41

    @property
    def stoch_dim(self) -> int:
        return self.n_cats * self.n_classes

    def setup(self):
        self.gru = nn.GRUCell(features=self.deter_dim)
        self.pre_gru = nn.Sequential([nn.Dense(self.hidden), nn.LayerNorm(),
                                      nn.silu])
        self.prior_net = nn.Sequential([nn.Dense(self.hidden), nn.silu,
                                        nn.Dense(self.stoch_dim)])
        self.post_net = nn.Sequential([nn.Dense(self.hidden), nn.silu,
                                       nn.Dense(self.stoch_dim)])
        self.reward_net = nn.Sequential([nn.Dense(self.hidden), nn.silu,
                                         nn.Dense(self.num_reward_bins)])
        self.continue_net = nn.Sequential([nn.Dense(self.hidden), nn.silu,
                                           nn.Dense(1)])

    def _logits(self, raw):
        """Apply unimix: mix 1% uniform into the categorical probs, return
        the equivalent logits (DreamerV3 §"robustness")."""
        raw = raw.reshape(raw.shape[:-1] + (self.n_cats, self.n_classes))
        probs = jax.nn.softmax(raw, -1)
        probs = (1 - self.unimix) * probs + self.unimix / self.n_classes
        return jnp.log(probs)

    def _sample(self, logits, key):
        """Straight-through one-hot sample, flattened to [.., stoch_dim]."""
        idx = jax.random.categorical(key, logits, -1)
        one_hot = jax.nn.one_hot(idx, self.n_classes, dtype=logits.dtype)
        probs = jax.nn.softmax(logits, -1)
        st = one_hot + probs - jax.lax.stop_gradient(probs)
        return st.reshape(st.shape[:-2] + (self.stoch_dim,))

    def step_prior(self, h, z, action, key):
        x = self.pre_gru(jnp.concatenate([z, jnp.asarray(action)], -1))
        h, _ = self.gru(h, x)
        logits = self._logits(self.prior_net(h))
        z = self._sample(logits, key)
        return h, z, logits

    def posterior(self, h, embed, key):
        logits = self._logits(self.post_net(jnp.concatenate([h, embed], -1)))
        return self._sample(logits, key), logits

    def reward_logits(self, h, z):
        return self.reward_net(jnp.concatenate([h, z], -1))

    def continue_logit(self, h, z):
        return self.continue_net(jnp.concatenate([h, z], -1))

    def __call__(self, h, z, action, embed, key):
        """Used for init: one observe step touching every head."""
        k1, k2 = jax.random.split(key)
        h, _, prior_logits = self.step_prior(h, z, action, k1)
        z_post, post_logits = self.posterior(h, embed, k2)
        r = self.reward_logits(h, z_post)
        c = self.continue_logit(h, z_post)
        return h, z_post, prior_logits, post_logits, r, c


def rssm_observe_v3(rssm: RSSMv3, params, embeds, actions, is_first, key,
                    h0=None, z0=None):
    """Filter a [T, B] sequence through the v3 RSSM (lax.scan).

    Returns h, z, prior/posterior logits, reward logits and continue
    logits, all [T, B, ...]; ``is_first`` zeroes the carried state.
    """
    T, B = embeds.shape[0], embeds.shape[1]
    h = h0 if h0 is not None else jnp.zeros((B, rssm.deter_dim))
    z = z0 if z0 is not None else jnp.zeros((B, rssm.stoch_dim))

    def body(carry, xs):
        h, z = carry
        embed_t, act_t, first_t, k = xs
        mask = jnp.asarray(first_t, jnp.float32).reshape(B, 1)
        h = h * (1 - mask)
        z = z * (1 - mask)
        act_t = jnp.asarray(act_t) * (1 - mask)
        k1, k2 = jax.random.split(k)
        h, _, prior_l = rssm.apply(
            {"params": params}, h, z, act_t, k1, method=RSSMv3.step_prior
        )
        z, post_l = rssm.apply(
            {"params": params}, h, embed_t, k2, method=RSSMv3.posterior
        )
        r = rssm.apply({"params": params}, h, z, method=RSSMv3.reward_logits)
        c = rssm.apply({"params": params}, h, z, method=RSSMv3.continue_logit)
        return (h, z), (h, z, prior_l, post_l, r, c)

    ks = jax.random.split(key, T)
    (h, z), (hs, zs, pl, ql, r, c) = jax.lax.scan(
        body, (h, z), (embeds, actions, is_first, ks)
    )
    return TDict(h=hs, z=zs, prior_logits=pl, post_logits=ql,
                 reward_logits=r, continue_logits=c,
                 final={"h": h, "z": z})


def rssm_imagine_v3(rssm: RSSMv3, params, policy_fn, h0, z0, horizon: int,
                    key):
    """Prior-only imagination rollout: [H, N, ...] latents, actions,
    reward logits and continue logits (the v3 actor's training data)."""

    def body(carry, k):
        h, z = carry
        k1, k2 = jax.random.split(k)
        action = policy_fn(h, z, k1)
        h, z, _ = rssm.apply(
            {"params": params}, h, z, action, k2, method=RSSMv3.step_prior
        )
        r = rssm.apply({"params": params}, h, z, method=RSSMv3.reward_logits)
        c = rssm.apply({"params": params}, h, z, method=RSSMv3.continue_logit)
        return (h, z), (h, z, action, r, c)

    ks = jax.random.split(key, horizon)
    _, (hs, zs, acts, rs, cs) = jax.lax.scan(body, (h0, z0), ks)
    return TDict(h=hs, z=zs, action=acts, reward_logits=rs,
                 continue_logits=cs)


# ---------------------------------------------------------------------------
# Generic composable world model
# ---------------------------------------------------------------------------

class WorldModel:
    """Composable world model: encoder + dynamics + reward head (+ done head,
    + decoder), all TDModules communicating through named TDict keys.

    Counterpart of the reference ``WorldModel``
    (``/root/reference/torchrl/modules/tensordict_module/world_models.py:11``):
    it owns prediction and composition (``encode`` / ``step`` / ``decode``);
    rollout semantics live in :class:`rl_tpu.envs.WorldModelEnv`.

    Params are a TDict with one sub-tree per component
    (``encoder`` / ``dynamics`` / ``reward_head`` / ``done_head`` /
    ``decoder``) so each can be trained or frozen independently.
    """

    def __init__(self, encoder, dynamics, reward_head, *, done_head=None,
                 decoder=None):
        self.encoder = encoder
        self.dynamics = dynamics
        self.reward_head = reward_head
        self.done_head = done_head
        self.decoder = decoder
        self._parts = {"encoder": encoder, "dynamics": dynamics,
                       "reward_head": reward_head}
        if done_head is not None:
            self._parts["done_head"] = done_head
        if decoder is not None:
            self._parts["decoder"] = decoder
        self.in_keys = list(dict.fromkeys(
            k for m in self._parts.values() for k in m.in_keys))
        self.out_keys = list(dict.fromkeys(
            k for m in self._parts.values() for k in m.out_keys))

    # -- param plumbing -----------------------------------------------------
    def init(self, key, td: TDict) -> TDict:
        params = TDict()
        ks = jax.random.split(key, len(self._parts))
        for (name, mod), k in zip(self._parts.items(), ks):
            p = mod.init(k, td)
            td = mod(p, td, key=k)
            params = params.set(name, p)
        return params

    def _run(self, names, params, td: TDict, key=None) -> TDict:
        mods = [self._parts[n] for n in names if n in self._parts]
        ks = (jax.random.split(key, len(mods)) if key is not None
              else [None] * len(mods))
        for n, m, k in zip([n for n in names if n in self._parts], mods, ks):
            td = m(params[n], td, key=k)
        return td

    # -- reference API ------------------------------------------------------
    def __call__(self, params, td: TDict, key=None) -> TDict:
        """Full pipeline: encode -> dynamics -> heads (-> decode)."""
        return self._run(
            ["encoder", "dynamics", "reward_head", "done_head", "decoder"],
            params, td, key)

    def encode(self, params, td: TDict, key=None) -> TDict:
        """Observation -> latent (reference world_models.py:118)."""
        return self._run(["encoder"], params, td, key)

    def step(self, params, td: TDict, key=None) -> TDict:
        """Latent step: dynamics + heads, no encoder (reference :122)."""
        return self._run(
            ["dynamics", "reward_head", "done_head", "decoder"],
            params, td, key)

    def decode(self, params, td: TDict, key=None) -> TDict:
        if self.decoder is None:
            raise RuntimeError("WorldModel has no decoder")
        return self._run(["decoder"], params, td, key)

    @property
    def step_module(self):
        """The step-only callable ``(params, td, key) -> td``
        (reference ``step_module`` :144)."""
        return self.step


class WorldModelWrapper(Seq):
    """Transition model + reward model pair (reference world_models.py:154)."""

    def __init__(self, transition_model, reward_model):
        super().__init__(transition_model, reward_model,
                         names=["transition", "reward"])

    def get_transition_model_operator(self):
        return self.modules[0]

    def get_reward_operator(self):
        return self.modules[1]
