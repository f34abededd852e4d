"""DreamerV3 objectives (Hafner et al. 2023).

Counterparts of ``/root/reference/torchrl/objectives/dreamer_v3.py``
(``symlog``/``symexp`` :43/:67, ``two_hot_encode``/``two_hot_decode``
:105/:152, ``categorical_kl_balanced`` :182, ``DreamerV3ModelLoss`` :263,
``DreamerV3ActorLoss`` :496, ``DreamerV3ValueLoss`` :778).

Differences from Dreamer v1 (``dreamer.py``): categorical latents with
balanced KL + free bits; symlog squashing of all scalar regression targets;
two-hot classification heads for reward/value; a continue head replacing
done-free imagination; percentile-normalized returns in the actor loss.

All pieces are pure functions of (params, batch, key); the return-scale
EMA of the actor loss is explicit carried state (functional convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from .common import LossModule
from .value.functional import td_lambda_return_estimate
from rl_tpu.modules.world_model import RSSMv3, rssm_imagine_v3, rssm_observe_v3

__all__ = [
    "symlog", "symexp", "two_hot_encode", "two_hot_decode",
    "default_bins", "categorical_kl_balanced",
    "DreamerV3ModelLoss", "DreamerV3ActorLoss", "DreamerV3ValueLoss",
]


def symlog(x):
    """``sign(x) * log(1 + |x|)`` (reference dreamer_v3.py:43)."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x):
    """Inverse of :func:`symlog` (reference dreamer_v3.py:67)."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def default_bins(num_bins: int = 41, low: float = -20.0, high: float = 20.0):
    """Bin centers in symlog space covering roughly ±symexp(20) raw scale
    (reference dreamer_v3.py:94-99 uses 255 bins; the loss classes default
    to a smaller head for speed — the bin *placement* rule is identical)."""
    return jnp.linspace(low, high, num_bins)


def two_hot_encode(x, bins):
    """Encode scalars as a two-hot distribution over ``bins``
    (reference dreamer_v3.py:105).

    ``x`` must already be in bin space (i.e. symlog-transformed when the
    bins are symlog-spaced).  Returns [..., num_bins] weights summing to 1,
    linear interpolation between the two enclosing bins.
    """
    x = jnp.asarray(x, jnp.float32)
    n = bins.shape[0]
    x = jnp.clip(x, bins[0], bins[-1])
    hi = jnp.clip(jnp.searchsorted(bins, x, side="left"), 1, n - 1)
    lo = hi - 1
    w_hi = (x - bins[lo]) / (bins[hi] - bins[lo])
    w_lo = 1.0 - w_hi
    out = jnp.zeros(x.shape + (n,))
    idx = jnp.arange(n)
    out = w_lo[..., None] * (idx == lo[..., None]) + \
        w_hi[..., None] * (idx == hi[..., None])
    return out


def two_hot_decode(logits, bins):
    """Expected raw-scale value of a two-hot head: ``symexp(softmax·bins)``
    (reference dreamer_v3.py:152)."""
    probs = jax.nn.softmax(jnp.asarray(logits, jnp.float32), -1)
    return symexp(jnp.sum(probs * bins, -1))


def categorical_kl_balanced(post_logits, prior_logits, *,
                            balance: float = 0.85, free_bits: float = 1.0):
    """Balanced KL with free bits (reference dreamer_v3.py:182; DreamerV3
    eq. 5): ``balance·KL(sg(q)‖p) + (1-balance)·KL(q‖sg(p))``, each term
    clipped below at ``free_bits`` nats per categorical, then averaged.

    Logits are [..., n_cats, n_classes].
    """
    sg = jax.lax.stop_gradient

    def _kl(q, p):
        q_logp = jax.nn.log_softmax(q, -1)
        p_logp = jax.nn.log_softmax(p, -1)
        return jnp.sum(jnp.exp(q_logp) * (q_logp - p_logp), -1)

    dyn = jnp.maximum(_kl(sg(post_logits), prior_logits), free_bits).mean()
    rep = jnp.maximum(_kl(post_logits, sg(prior_logits)), free_bits).mean()
    return balance * dyn + (1 - balance) * rep


class DreamerV3ModelLoss(LossModule):
    """World-model loss (reference dreamer_v3.py:263): symlog
    reconstruction + two-hot reward CE + continue BCE + balanced KL.

    Batch: time-first [T, B] with observation/action/("next","reward")/
    ("next","terminated")/is_init keys.
    """

    def __init__(self, encoder, decoder, rssm: RSSMv3, *,
                 free_bits: float = 1.0, kl_balance: float = 0.85,
                 kl_coeff: float = 1.0, reco_coeff: float = 1.0,
                 reward_coeff: float = 1.0, continue_coeff: float = 1.0,
                 obs_key: str = "observation"):
        self.encoder = encoder
        self.decoder = decoder
        self.rssm = rssm
        self.free_bits = free_bits
        self.kl_balance = kl_balance
        self.kl_coeff = kl_coeff
        self.reco_coeff = reco_coeff
        self.reward_coeff = reward_coeff
        self.continue_coeff = continue_coeff
        self.obs_key = obs_key
        self.bins = default_bins(rssm.num_reward_bins)

    def init(self, key, td: TDict) -> TDict:
        k1, k2, k3 = jax.random.split(key, 3)
        obs = jnp.asarray(td[self.obs_key])
        p_enc = self.encoder.init(k1, obs)["params"]
        embed = self.encoder.apply({"params": p_enc}, obs)
        B = obs.shape[1]
        h = jnp.zeros((B, self.rssm.deter_dim))
        z = jnp.zeros((B, self.rssm.stoch_dim))
        p_rssm = self.rssm.init(
            k2, h, z, jnp.asarray(td["action"])[0], embed[0], k2
        )["params"]
        p_dec = self.decoder.init(k3, h, z)["params"]
        return TDict(encoder=p_enc, decoder=p_dec, rssm=p_rssm)

    def _plain(self, p):
        return p.to_dict() if isinstance(p, TDict) else p

    def observe(self, params, td: TDict, key):
        obs = jnp.asarray(td[self.obs_key])
        embed = self.encoder.apply({"params": self._plain(params["encoder"])}, obs)
        is_first = jnp.asarray(td["is_init"]) if "is_init" in td else jnp.zeros(
            obs.shape[:2] + (1,), bool
        )
        return rssm_observe_v3(
            self.rssm, self._plain(params["rssm"]), embed,
            jnp.asarray(td["action"]), is_first, key,
        )

    def loss(self, params, td: TDict, key=None) -> TDict:
        post = self.observe(params, td, key)
        reco = self.decoder.apply(
            {"params": self._plain(params["decoder"])}, post["h"], post["z"]
        )
        obs = jnp.asarray(td[self.obs_key], jnp.float32)
        loss_reco = ((symlog(obs) - reco) ** 2).sum(-1).mean()
        reward = jnp.asarray(td["next", "reward"], jnp.float32)
        reward = reward.reshape(post["reward_logits"].shape[:-1])
        tgt = two_hot_encode(symlog(reward), self.bins)
        logp = jax.nn.log_softmax(post["reward_logits"], -1)
        loss_reward = -(tgt * logp).sum(-1).mean()
        cont_logit = post["continue_logits"][..., 0]
        term = jnp.asarray(td["next", "terminated"], jnp.float32)
        term = term.reshape(cont_logit.shape)
        cont_tgt = 1.0 - term
        loss_continue = jnp.mean(
            jnp.maximum(cont_logit, 0) - cont_logit * cont_tgt
            + jnp.log1p(jnp.exp(-jnp.abs(cont_logit)))
        )
        kl = categorical_kl_balanced(
            post["post_logits"], post["prior_logits"],
            balance=self.kl_balance, free_bits=self.free_bits,
        )
        return TDict(
            loss_model_reco=self.reco_coeff * loss_reco,
            loss_model_reward=self.reward_coeff * loss_reward,
            loss_model_continue=self.continue_coeff * loss_continue,
            loss_model_kl=self.kl_coeff * kl,
        )


class DreamerV3ActorLoss(LossModule):
    """Imagination actor loss with percentile return normalization
    (reference dreamer_v3.py:496).

    ``actor_fn(params_actor, h, z, key) -> action`` (reparameterized);
    ``value_fn(params_value, h, z) -> raw value`` (already decoded).
    Returns are scaled by ``max(1, EMA(P95 - P5))``; the EMA state is
    passed in/out explicitly via ``scale_state``.
    """

    def __init__(self, rssm: RSSMv3, actor_fn, value_fn, *,
                 imagination_horizon: int = 15, gamma: float = 0.997,
                 lmbda: float = 0.95, entropy_coeff: float = 3e-4,
                 entropy_fn=None, scale_decay: float = 0.99):
        self.rssm = rssm
        self.actor_fn = actor_fn
        self.value_fn = value_fn
        self.imagination_horizon = imagination_horizon
        self.gamma = gamma
        self.lmbda = lmbda
        self.entropy_coeff = entropy_coeff
        self.entropy_fn = entropy_fn
        self.scale_decay = scale_decay

    def init_scale_state(self) -> TDict:
        return TDict(lo=jnp.zeros(()), hi=jnp.zeros(()))

    def _plain(self, p):
        return p.to_dict() if isinstance(p, TDict) else p

    def loss(self, params, td: TDict, key=None, *, scale_state=None) -> TDict:
        sg = jax.lax.stop_gradient
        model_params = sg(self._plain(params["rssm"]))
        start_h = jnp.asarray(td["h"]).reshape(-1, self.rssm.deter_dim)
        start_z = jnp.asarray(td["z"]).reshape(-1, self.rssm.stoch_dim)

        def policy(h, z, k):
            return self.actor_fn(params["actor"], h, z, k)

        imag = rssm_imagine_v3(
            self.rssm, model_params, policy, sg(start_h), sg(start_z),
            self.imagination_horizon, key,
        )
        bins = default_bins(self.rssm.num_reward_bins)
        rewards = two_hot_decode(imag["reward_logits"], bins)
        cont = jax.nn.sigmoid(imag["continue_logits"][..., 0])
        values = self.value_fn(sg(params["value"]), imag["h"], imag["z"])
        # Continue probabilities act as soft termination: discounting and
        # return accumulation both scale by cont (DreamerV3 §actor-critic).
        done = jnp.zeros_like(rewards, bool)
        returns = td_lambda_return_estimate(
            self.gamma, self.lmbda, values * cont, rewards, done, done
        )
        lo = jnp.percentile(sg(returns), 5.0)
        hi = jnp.percentile(sg(returns), 95.0)
        if scale_state is None:
            scale_state = self.init_scale_state()
        d = self.scale_decay
        new_state = TDict(
            lo=d * jnp.asarray(scale_state["lo"]) + (1 - d) * lo,
            hi=d * jnp.asarray(scale_state["hi"]) + (1 - d) * hi,
        )
        scale = jnp.maximum(1.0, new_state["hi"] - new_state["lo"])
        norm_ret = returns / scale
        loss_actor = -norm_ret.mean()
        metrics = TDict(
            loss_actor=loss_actor,
            imagined_return=sg(returns.mean()),
            return_scale=sg(scale),
            scale_state=jax.tree_util.tree_map(sg, new_state),
        )
        if self.entropy_fn is not None:
            ent = self.entropy_fn(params["actor"], imag["h"], imag["z"]).mean()
            metrics["loss_actor_entropy"] = -self.entropy_coeff * ent
        return metrics


class DreamerV3ValueLoss(LossModule):
    """Value regression on imagined λ-returns (reference dreamer_v3.py:778).

    ``value_loss``: "symlog_mse" — ``(symlog(v) − symlog(target))²`` on the
    decoded value; or "two_hot" — CE against the two-hot encoding of the
    symlog target (requires ``value_logits_fn`` producing bin logits).
    An optional slow-critic regularizer pulls predictions toward
    ``target_params`` outputs (v3's EMA critic).
    """

    def __init__(self, value_fn, *, value_loss: str = "symlog_mse",
                 value_logits_fn=None, num_bins: int = 41,
                 slow_critic_coeff: float = 0.0):
        if value_loss not in ("symlog_mse", "two_hot"):
            raise ValueError(
                f"value_loss must be 'symlog_mse' or 'two_hot', got {value_loss!r}"
            )
        if value_loss == "two_hot" and value_logits_fn is None:
            raise ValueError("two_hot value loss needs value_logits_fn")
        self.value_fn = value_fn
        self.value_logits_fn = value_logits_fn
        self.value_loss = value_loss
        self.bins = default_bins(num_bins)
        self.slow_critic_coeff = slow_critic_coeff

    def loss(self, params, td: TDict, key=None, *, target_params=None) -> TDict:
        target = jax.lax.stop_gradient(
            jnp.asarray(td["lambda_target"], jnp.float32)
        )
        if self.value_loss == "two_hot":
            logits = self.value_logits_fn(params["value"], td["h"], td["z"])
            tgt = two_hot_encode(symlog(target), self.bins)
            logp = jax.nn.log_softmax(logits, -1)
            loss = -(tgt * logp).sum(-1).mean()
        else:
            values = self.value_fn(params["value"], td["h"], td["z"])
            loss = ((symlog(values) - symlog(target)) ** 2).mean()
        out = TDict(loss_value=loss)
        if self.slow_critic_coeff and target_params is not None:
            slow = jax.lax.stop_gradient(
                self.value_fn(target_params["value"], td["h"], td["z"])
            )
            values = self.value_fn(params["value"], td["h"], td["z"])
            out["loss_value_slow"] = self.slow_critic_coeff * (
                (symlog(values) - symlog(slow)) ** 2
            ).mean()
        return out
