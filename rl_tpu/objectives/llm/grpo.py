"""LLM RLHF objectives: GRPO family + SFT.

Counterparts of ``/root/reference/torchrl/objectives/llm/grpo.py``:
``GRPOLoss`` :354 (token-level clipped importance ratios with group-relative
advantages and KL penalties), ``DAPO`` :948 (asymmetric clipping),
``CISPOLoss`` :999 (clipped-IS-weight REINFORCE), ``MCAdvantage`` :1023
(group-mean return baseline over prompt groups); and ``llm/sft.py:104``
(``SFTLoss``).

Pure token-level kernels over padded [B, L] tensors with response masks —
model-agnostic: the caller supplies per-token log-probs from any backbone
(the flax TransformerLM, a HF model, or an inference engine).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data.tdict import TDict

__all__ = ["grpo_loss", "GRPOLoss", "DAPO", "CISPOLoss", "mc_advantage",
           "MCAdvantage", "sft_loss", "SFTLoss"]


def _masked_mean(x, mask):
    m = jnp.asarray(mask, jnp.float32)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def grpo_loss(
    log_probs: jax.Array,        # [B, L] new per-token log-probs
    old_log_probs: jax.Array,    # [B, L] behaviour log-probs
    advantage: jax.Array,        # [B] or [B, 1] sequence-level advantages
    response_mask: jax.Array,    # [B, L] True on response tokens
    *,
    clip_low: float = 0.2,
    clip_high: float = 0.2,
    ref_log_probs: jax.Array | None = None,
    kl_coeff: float = 0.0,
    entropy_coeff: float = 0.0,
):
    """Token-level clipped surrogate (reference grpo.py:354).

    Returns ``(loss, metrics_dict)``.  ``clip_low``/``clip_high`` allow the
    DAPO asymmetric clipping (reference :948).
    """
    adv = jnp.asarray(advantage, jnp.float32).reshape(-1, 1)
    log_ratio = log_probs - jax.lax.stop_gradient(old_log_probs)
    ratio = jnp.exp(log_ratio)
    clipped = jnp.clip(ratio, 1.0 - clip_low, 1.0 + clip_high)
    surrogate = jnp.minimum(ratio * adv, clipped * adv)
    loss = -_masked_mean(surrogate, response_mask)
    metrics = {
        "kl_approx": jax.lax.stop_gradient(_masked_mean(-log_ratio, response_mask)),
        "clip_fraction": jax.lax.stop_gradient(
            _masked_mean((jnp.abs(ratio - 1.0) > clip_high).astype(jnp.float32),
                         response_mask)
        ),
        "ESS": jax.lax.stop_gradient(
            _masked_mean(ratio, response_mask) ** 2
            / jnp.maximum(_masked_mean(ratio**2, response_mask), 1e-8)
        ),
    }
    if ref_log_probs is not None and kl_coeff:
        # k3 estimator (Schulman): e^(ref-log) - (ref-log) - 1  >= 0
        d = jax.lax.stop_gradient(ref_log_probs) - log_probs
        kl = jnp.exp(d) - d - 1.0
        kl_term = _masked_mean(kl, response_mask)
        loss = loss + kl_coeff * kl_term
        metrics["kl_to_ref"] = jax.lax.stop_gradient(kl_term)
    if entropy_coeff:
        ent = -_masked_mean(log_probs, response_mask)
        loss = loss - entropy_coeff * ent
        metrics["entropy"] = jax.lax.stop_gradient(ent)
    return loss, metrics


class GRPOLoss:
    """Module wrapper: reads [B, L] keys from a TDict batch.

    Expected keys: ``log_probs`` (policy fn output), ``sample_log_prob``
    (behaviour), ``advantage``, ``response_mask``, optional
    ``ref_log_prob``.
    """

    def __init__(self, policy_log_prob_fn=None, *, clip_epsilon: float = 0.2,
                 kl_to_ref_coeff: float = 0.0, entropy_coeff: float = 0.0):
        self.policy_log_prob_fn = policy_log_prob_fn
        self.clip_low = self.clip_high = float(clip_epsilon)
        self.kl_to_ref_coeff = float(kl_to_ref_coeff)
        self.entropy_coeff = float(entropy_coeff)

    def __call__(self, params, td: TDict, key=None):
        if self.policy_log_prob_fn is not None:
            log_probs = self.policy_log_prob_fn(params, td)
        else:
            log_probs = td["log_probs"]
        loss, metrics = grpo_loss(
            log_probs,
            td["sample_log_prob"],
            td["advantage"],
            td["response_mask"],
            clip_low=self.clip_low,
            clip_high=self.clip_high,
            ref_log_probs=td.get("ref_log_prob", None),
            kl_coeff=self.kl_to_ref_coeff,
            entropy_coeff=self.entropy_coeff,
        )
        return loss, TDict(loss_objective=loss, **metrics)


class DAPO(GRPOLoss):
    """Asymmetric clipping variant (reference grpo.py:948)."""

    def __init__(self, policy_log_prob_fn=None, *, clip_low: float = 0.2,
                 clip_high: float = 0.28, **kwargs):
        super().__init__(policy_log_prob_fn, **kwargs)
        self.clip_low = float(clip_low)
        self.clip_high = float(clip_high)


class CISPOLoss(GRPOLoss):
    """Clipped-IS-weight REINFORCE (reference grpo.py:999): the (stopped)
    clipped ratio scales the log-prob gradient instead of the surrogate
    min."""

    def __call__(self, params, td: TDict, key=None):
        if self.policy_log_prob_fn is not None:
            log_probs = self.policy_log_prob_fn(params, td)
        else:
            log_probs = td["log_probs"]
        old = jax.lax.stop_gradient(jnp.asarray(td["sample_log_prob"]))
        adv = jnp.asarray(td["advantage"], jnp.float32).reshape(-1, 1)
        mask = td["response_mask"]
        ratio = jnp.exp(jax.lax.stop_gradient(log_probs) - old)
        w = jax.lax.stop_gradient(
            jnp.clip(ratio, 1 - self.clip_low, 1 + self.clip_high)
        )
        loss = -_masked_mean(w * adv * log_probs, mask)
        return loss, TDict(loss_objective=loss)


def mc_advantage(rewards: jax.Array, group_ids: jax.Array, num_groups: int,
                 *, std_normalize: bool = True, eps: float = 1e-4):
    """Group-relative Monte-Carlo advantage (reference MCAdvantage :1023):
    ``A_i = (r_i − mean_group)/std_group`` over completions of the same
    prompt."""
    r = jnp.asarray(rewards, jnp.float32).reshape(-1)
    gid = jnp.asarray(group_ids, jnp.int32).reshape(-1)
    sums = jnp.zeros(num_groups).at[gid].add(r)
    counts = jnp.zeros(num_groups).at[gid].add(1.0)
    means = sums / jnp.maximum(counts, 1.0)
    sq = jnp.zeros(num_groups).at[gid].add((r - means[gid]) ** 2)
    stds = jnp.sqrt(sq / jnp.maximum(counts, 1.0))
    adv = r - means[gid]
    if std_normalize:
        adv = adv / (stds[gid] + eps)
    return adv


class MCAdvantage:
    """Batch transform computing group-relative advantages from
    ``("next", "reward")`` and prompt group ids."""

    def __init__(self, group_size: int, *, reward_key=("next", "reward"),
                 group_key="group_id", std_normalize: bool = True):
        self.group_size = group_size
        self.reward_key = reward_key
        self.group_key = group_key
        self.std_normalize = std_normalize

    def __call__(self, td: TDict) -> TDict:
        rewards = jnp.asarray(td[self.reward_key], jnp.float32).reshape(-1)
        n = rewards.shape[0]
        if self.group_key in td:
            gid = jnp.asarray(td[self.group_key], jnp.int32).reshape(-1)
            num_groups = n  # upper bound
        else:
            gid = jnp.arange(n, dtype=jnp.int32) // self.group_size
            num_groups = (n + self.group_size - 1) // self.group_size
        adv = mc_advantage(rewards, gid, num_groups, std_normalize=self.std_normalize)
        return td.set("advantage", adv)


def sft_loss(log_probs: jax.Array, response_mask: jax.Array):
    """Masked NLL (reference sft.py:104)."""
    return -_masked_mean(log_probs, response_mask)


class SFTLoss:
    def __init__(self, policy_log_prob_fn=None):
        self.policy_log_prob_fn = policy_log_prob_fn

    def __call__(self, params, td: TDict, key=None):
        log_probs = (
            self.policy_log_prob_fn(params, td)
            if self.policy_log_prob_fn is not None
            else td["log_probs"]
        )
        loss = sft_loss(log_probs, td["response_mask"])
        return loss, TDict(loss_sft=loss)


def preference_loss(chosen_scores: jax.Array, rejected_scores: jax.Array):
    """Bradley-Terry reward-model objective over preference pairs:
    ``-log sigmoid(r_chosen - r_rejected)`` (the RLHF reward-model loss the
    reference trains on ``PairwiseDataset`` batches — reference
    data/llm/reward.py:29).  Returns ``(loss, accuracy)``; accuracy is the
    fraction of pairs the model ranks correctly."""
    diff = chosen_scores - rejected_scores
    loss = -jax.nn.log_sigmoid(diff).mean()
    acc = (diff > 0).mean()
    return loss, acc


def dpo_loss(policy_chosen_lp: jax.Array, policy_rejected_lp: jax.Array,
             ref_chosen_lp: jax.Array, ref_rejected_lp: jax.Array,
             *, beta: float = 0.1, label_smoothing: float = 0.0):
    """Direct Preference Optimization (Rafailov et al. 2023): the implicit
    reward-margin ``beta * ((pi_c - ref_c) - (pi_r - ref_r))`` pushed through
    a (optionally smoothed) logistic loss.  Inputs are sequence-summed
    response log-probs.  Returns ``(loss, metrics_dict)`` with the mean
    implicit rewards and accuracy."""
    chosen_rel = policy_chosen_lp - ref_chosen_lp
    rejected_rel = policy_rejected_lp - ref_rejected_lp
    margin = beta * (chosen_rel - rejected_rel)
    loss = (-(1.0 - label_smoothing) * jax.nn.log_sigmoid(margin)
            - label_smoothing * jax.nn.log_sigmoid(-margin)).mean()
    metrics = dict(
        reward_chosen=(beta * chosen_rel).mean(),
        reward_rejected=(beta * rejected_rel).mean(),
        accuracy=(margin > 0).mean(),
    )
    return loss, metrics
