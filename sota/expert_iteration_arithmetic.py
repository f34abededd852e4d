"""Expert iteration on the synthetic arithmetic task (counterpart of
``/root/reference/sota-implementations/expert-iteration/expert-iteration.py``):
sample G completions per prompt at raised temperature, keep the top-k by
reward (the ``TopKRewardSelector`` recipe), and SFT on the winners
(``sft_loss``) — iterate.  Run::

    python sota/expert_iteration_arithmetic.py [iters=200]
"""
import sys

import jax
import jax.numpy as jnp
import optax

from rl_tpu.config import apply_overrides
from rl_tpu.modules.transformer import TransformerLM
from rl_tpu.objectives.llm import sft_loss
from rl_tpu.record import CSVLogger, generate_exp_name

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from grpo_arithmetic import EOS, PAD, P_LEN, R_LEN, VOCAB, make_prompts

DEFAULTS = dict(
    iters=200, num_prompts=32, group_size=8, topk=2, lr=3e-4,
    temperature=1.3, seed=0,
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    lm = TransformerLM(vocab_size=VOCAB, n_layers=2, d_model=64)
    params = lm.init(key, jnp.zeros((1, P_LEN + R_LEN), jnp.int32))["params"]
    tx = optax.adam(cfg["lr"])
    opt_state = tx.init(params)
    logger = CSVLogger(generate_exp_name("expert_iter", "arithmetic"))
    G, NP, K = cfg["group_size"], cfg["num_prompts"], cfg["topk"]
    B = NP * G

    def response_log_probs(p, tokens):
        logits = lm.apply({"params": p}, tokens)
        lp = jax.nn.log_softmax(logits, -1)
        pos = jnp.arange(R_LEN) + P_LEN - 1
        tgt = jax.lax.dynamic_slice_in_dim(tokens, P_LEN, R_LEN, 1)
        return jnp.take_along_axis(lp[:, pos, :], tgt[..., None], -1)[..., 0]

    @jax.jit
    def step(p, opt_state, k):
        kp, ks = jax.random.split(k)
        prompt, gold = make_prompts(kp, NP)
        prompt = jnp.repeat(prompt, G, 0)
        gold = jnp.repeat(gold, G, 0)
        tokens = jnp.concatenate(
            [prompt, jnp.full((B, R_LEN), PAD, jnp.int32)], 1)
        for t in range(R_LEN):
            logits = lm.apply({"params": p}, tokens)[:, P_LEN + t - 1]
            ks, kk = jax.random.split(ks)
            tokens = tokens.at[:, P_LEN + t].set(
                jax.random.categorical(kk, logits / cfg["temperature"], -1))
        reward = (tokens[:, P_LEN:] == gold).mean(-1).reshape(NP, G)
        # top-k selection within each prompt group (TopKRewardSelector
        # semantics, device-side): SFT weight 1 on winners, 0 elsewhere
        kth = -jnp.sort(-reward, axis=1)[:, K - 1:K]
        weight = (reward >= kth).astype(jnp.float32).reshape(B, 1)
        mask = jnp.ones((B, R_LEN), bool)

        def total(q):
            lp = response_log_probs(q, tokens)
            return sft_loss(lp * weight, mask)

        loss, grads = jax.value_and_grad(total)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        exact = (tokens[:, P_LEN:] == gold).all(-1).mean()
        return (optax.apply_updates(p, updates), opt_state, loss,
                reward.mean(), exact)

    for it in range(cfg["iters"]):
        key, k = jax.random.split(key)
        params, opt_state, loss, rew, acc = step(params, opt_state, k)
        if it % 20 == 0:
            logger.log_scalar("train/reward", float(rew), step=it)
            logger.log_scalar("train/exact_match", float(acc), step=it)
            print(f"iter {it}: reward={float(rew):.3f} "
                  f"exact={float(acc):.3f} loss={float(loss):.4f}")
    return params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
