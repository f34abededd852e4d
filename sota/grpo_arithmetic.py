"""GRPO on a synthetic arithmetic task (counterpart of
``/root/reference/sota-implementations/grpo/grpo-sync.py``).

The reference fine-tunes an HF model on GSM8K with vLLM rollouts; this
image has no model weights or egress, so the same sync-GRPO loop runs
fully on-device with the native ``TransformerLM``: char-tokenized
"aa+bb=" prompts, G sampled completions per prompt, per-digit reward,
group-normalized Monte-Carlo advantages (``mc_advantage``), token-level
clipped surrogate (``grpo_loss``) with k3 KL to the frozen reference
policy.  Run::

    python sota/grpo_arithmetic.py [iters=300]

Pass ``loss=dapo`` or ``loss=cispo`` for the asymmetric-clip / IS-clip
variants (reference grpo.py:948, :1069).
"""
import sys

import jax
import jax.numpy as jnp
import optax

from rl_tpu.config import apply_overrides
from rl_tpu.modules.transformer import TransformerLM
from rl_tpu.objectives.llm import grpo_loss, mc_advantage
from rl_tpu.record import CSVLogger, generate_exp_name

DEFAULTS = dict(
    iters=300, num_prompts=32, group_size=8, epochs=2, lr=3e-4,
    clip_low=0.2, clip_high=0.2, kl_coeff=0.01, temperature=1.0,
    loss="grpo", seed=0,
)

# vocab: 0-9 digits, 10='+', 11='=', 12=EOS, 13=PAD
PLUS, EQ, EOS, PAD = 10, 11, 12, 13
VOCAB = 14
P_LEN, R_LEN = 6, 3  # "dd+dd=" → "dd<eos>"


def make_prompts(key, n):
    ka, kb = jax.random.split(key)
    a = jax.random.randint(ka, (n,), 0, 50)
    b = jax.random.randint(kb, (n,), 0, 50)
    prompt = jnp.stack([a // 10, a % 10,
                        jnp.full((n,), PLUS), b // 10, b % 10,
                        jnp.full((n,), EQ)], axis=1)
    s = a + b
    gold = jnp.stack([s // 10, s % 10, jnp.full((n,), EOS)], axis=1)
    return prompt, gold


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    lm = TransformerLM(vocab_size=VOCAB, n_layers=2, d_model=64)
    toks0 = jnp.zeros((1, P_LEN + R_LEN), jnp.int32)
    params = lm.init(key, toks0)["params"]
    ref_params = jax.tree.map(lambda x: x, params)  # frozen reference copy
    tx = optax.adam(cfg["lr"])
    opt_state = tx.init(params)
    logger = CSVLogger(generate_exp_name("grpo", "arithmetic"))
    G, NP = cfg["group_size"], cfg["num_prompts"]
    B = NP * G
    clip_low, clip_high = cfg["clip_low"], cfg["clip_high"]
    if cfg["loss"] == "dapo":
        clip_high = 0.28  # DAPO clip-higher recipe

    def response_log_probs(p, tokens):
        """Per-token log-probs of the response slots under params ``p``."""
        logits = lm.apply({"params": p}, tokens)  # [B, P+R, V]
        lp = jax.nn.log_softmax(logits, -1)
        pos = jnp.arange(R_LEN) + P_LEN - 1  # predictors of response slots
        tgt = jax.lax.dynamic_slice_in_dim(tokens, P_LEN, R_LEN, 1)
        sel = lp[:, pos, :]
        return jnp.take_along_axis(sel, tgt[..., None], -1)[..., 0]

    @jax.jit
    def rollout(p, k):
        kp, ks = jax.random.split(k)
        prompt, gold = make_prompts(kp, NP)
        prompt = jnp.repeat(prompt, G, 0)     # [B, P]
        gold = jnp.repeat(gold, G, 0)         # [B, R]
        tokens = jnp.concatenate(
            [prompt, jnp.full((B, R_LEN), PAD, jnp.int32)], 1)
        for t in range(R_LEN):  # static unroll: autoregressive sampling
            logits = lm.apply({"params": p}, tokens)[:, P_LEN + t - 1]
            ks, kk = jax.random.split(ks)
            nxt = jax.random.categorical(kk, logits / cfg["temperature"], -1)
            tokens = tokens.at[:, P_LEN + t].set(nxt)
        resp = tokens[:, P_LEN:]
        reward = (resp == gold).mean(-1)      # per-digit partial credit
        exact = (resp == gold).all(-1).astype(jnp.float32)
        old_lp = response_log_probs(p, tokens)
        ref_lp = response_log_probs(ref_params, tokens)
        group_ids = jnp.repeat(jnp.arange(NP), G)
        adv = mc_advantage(reward, group_ids, NP)
        return tokens, adv, old_lp, ref_lp, reward.mean(), exact.mean()

    mask = jnp.ones((B, R_LEN), bool)

    @jax.jit
    def update(p, opt_state, tokens, adv, old_lp, ref_lp):
        def total(q):
            lp = response_log_probs(q, tokens)
            if cfg["loss"] == "cispo":
                # CISPO: clipped-IS REINFORCE (no min), reference :1069
                ratio = jnp.exp(lp - jax.lax.stop_gradient(old_lp))
                w = jax.lax.stop_gradient(
                    jnp.clip(ratio, 1 - clip_low, 1 + clip_high))
                l = -(w * adv.reshape(-1, 1) * lp)[mask].mean()
                return l, {}
            return grpo_loss(lp, old_lp, adv, mask,
                             clip_low=clip_low, clip_high=clip_high,
                             ref_log_probs=ref_lp, kl_coeff=cfg["kl_coeff"])

        (l, m), grads = jax.value_and_grad(total, has_aux=True)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, l

    for it in range(cfg["iters"]):
        key, k = jax.random.split(key)
        tokens, adv, old_lp, ref_lp, rew, acc = rollout(params, k)
        for _ in range(cfg["epochs"]):
            params, opt_state, loss = update(
                params, opt_state, tokens, adv, old_lp, ref_lp)
        if it % 20 == 0:
            logger.log_scalar("train/reward", float(rew), step=it)
            logger.log_scalar("train/exact_match", float(acc), step=it)
            print(f"iter {it}: reward={float(rew):.3f} "
                  f"exact={float(acc):.3f} loss={float(loss):.4f}")
    return params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
