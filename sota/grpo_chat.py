"""GRPO / expert-iteration through the LLM collector layer.

The collector-driven counterpart of ``sota/grpo_arithmetic.py`` /
``sota/expert_iteration_arithmetic.py`` and of the reference GRPO recipe
(``/root/reference/sota-implementations/grpo/grpo-sync.py`` over
``LLMCollector``, reference collectors/llm/base.py:26): a ``ChatEnv``
serves arithmetic prompts as TEXT, a char-tokenized ``TransformerLM``
engine generates completions on device, and
:meth:`rl_tpu.collectors.LLMCollector.rollout_group` assembles the GRPO
groups the host side of the loop trains on.

Run::

    python sota/grpo_chat.py [iters=150] [mode=grpo|expert]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_tpu.collectors import LLMCollector
from rl_tpu.config import apply_overrides
from rl_tpu.data.llm.topk import TopKRewardSelector
from rl_tpu.envs.llm import ChatEnv
from rl_tpu.modules.transformer import TransformerLM
from rl_tpu.objectives.llm import grpo_loss, mc_advantage, sft_loss
from rl_tpu.record import CSVLogger, generate_exp_name

DEFAULTS = dict(
    iters=150, num_prompts=16, group_size=8, topk=2, lr=3e-4,
    clip_low=0.2, clip_high=0.2, kl_coeff=0.01, temperature=1.0,
    mode="grpo", seed=0,
)

# char vocab: 0-9 digits, 10='+', 11='=', 12=EOS, 13=PAD
PLUS, EQ, EOS, PAD = 10, 11, 12, 13
VOCAB = 14
P_LEN, R_LEN = 6, 3  # "dd+dd=" -> "dd<eos>"
CHARS = "0123456789+=$_"


def encode(text: str) -> np.ndarray:
    return np.asarray([CHARS.index(c) for c in text], np.int32)


def decode(ids) -> str:
    return "".join(CHARS[int(i)] for i in np.asarray(ids).reshape(-1))


def make_env(seed: int) -> ChatEnv:
    rng_holder = {}

    def prompt_fn(rng):
        a, b = int(rng.randint(50)), int(rng.randint(50))
        rng_holder["gold"] = f"{(a + b) // 10}{(a + b) % 10}$"
        return f"{a // 10}{a % 10}+{b // 10}{b % 10}="

    def reward_fn(history, response: str) -> float:
        gold = rng_holder["gold"]
        n = min(len(response), len(gold))
        return float(np.mean([response[i] == gold[i] for i in range(n)])
                     if n else 0.0) * (len(response) == len(gold))

    return ChatEnv(prompt_fn, reward_fn=reward_fn, max_turns=1, seed=seed)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    lm = TransformerLM(vocab_size=VOCAB, n_layers=2, d_model=64)
    params = lm.init(key, jnp.zeros((1, P_LEN + R_LEN), jnp.int32))["params"]
    ref_params = jax.tree.map(lambda x: x, params)
    tx = optax.adam(cfg["lr"])
    opt_state = tx.init(params)
    logger = CSVLogger(generate_exp_name("grpo_chat", cfg["mode"]))
    G, NP = cfg["group_size"], cfg["num_prompts"]

    # -- engine: host wrapper over a jitted autoregressive char sampler ----
    @jax.jit
    def sample(p, prompt_tokens, k):
        B = prompt_tokens.shape[0]
        tokens = jnp.concatenate(
            [prompt_tokens, jnp.full((B, R_LEN), PAD, jnp.int32)], 1)
        lps = jnp.zeros((B, R_LEN))
        for t in range(R_LEN):
            logits = lm.apply({"params": p}, tokens)[:, P_LEN + t - 1]
            k, kk = jax.random.split(k)
            nxt = jax.random.categorical(kk, logits / cfg["temperature"], -1)
            lp = jax.nn.log_softmax(logits / cfg["temperature"], -1)
            lps = lps.at[:, t].set(jnp.take_along_axis(lp, nxt[:, None], 1)[:, 0])
            tokens = tokens.at[:, P_LEN + t].set(nxt)
        return tokens[:, P_LEN:], lps

    state = {"params": params, "key": key}

    def engine(history):
        """(text, token_ids, log_probs) for the last user prompt."""
        prompt = history.messages[-1].content
        ids = encode(prompt)[None, :]
        state["key"], k = jax.random.split(state["key"])
        resp, lps = sample(state["params"], jnp.asarray(ids), k)
        resp = np.asarray(resp)[0]
        return decode(resp), resp, np.asarray(lps)[0]

    env = make_env(cfg["seed"])
    collector = LLMCollector(env, engine, max_tokens=R_LEN)
    collector.on_weights = lambda p: state.update(params=p)
    selector = TopKRewardSelector(G, cfg["topk"], prompt_key="prompt")

    def response_log_probs(p, tokens):
        logits = lm.apply({"params": p}, tokens)
        lp = jax.nn.log_softmax(logits, -1)
        pos = jnp.arange(R_LEN) + P_LEN - 1
        tgt = jax.lax.dynamic_slice_in_dim(tokens, P_LEN, R_LEN, 1)
        return jnp.take_along_axis(lp[:, pos, :], tgt[..., None], -1)[..., 0]

    @jax.jit
    def update_grpo(p, opt_state, tokens, adv, old_lp, ref_lp, mask):
        def total(q):
            lp = response_log_probs(q, tokens)
            return grpo_loss(lp, old_lp, adv, mask,
                             clip_low=cfg["clip_low"],
                             clip_high=cfg["clip_high"],
                             ref_log_probs=ref_lp, kl_coeff=cfg["kl_coeff"])

        (l, m), grads = jax.value_and_grad(total, has_aux=True)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, l

    @jax.jit
    def update_sft(p, opt_state, tokens, weight, mask):
        def total(q):
            lp = response_log_probs(q, tokens)
            return sft_loss(lp * weight[:, None], mask)

        l, grads = jax.value_and_grad(total)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, l

    for it in range(cfg["iters"]):
        groups = []
        for _ in range(NP):
            groups.append(collector.rollout_group(group_size=G))
        steps = [s for g in groups for s in g]
        prompts = np.stack([encode(_prompt_text(s)) for s in steps])
        tokens = jnp.asarray(np.concatenate(
            [prompts, np.stack([s["tokens"] for s in steps])], 1))
        rewards = jnp.asarray(np.asarray([s["reward"] for s in steps]))
        mask = jnp.asarray(np.stack([s["attention_mask"] for s in steps]))
        if cfg["mode"] == "expert":
            kept_flags = np.zeros(len(steps), np.float32)
            released = selector([dict(s) for s in steps])
            # selector returns copies; mark winners by (prompt, response)
            kept_keys = {(r["prompt"], r["response"]) for r in released}
            for i, s in enumerate(steps):
                if (s["prompt"], s["response"]) in kept_keys:
                    kept_flags[i] = 1.0
            params_, opt_state, loss = update_sft(
                state["params"], opt_state, tokens,
                jnp.asarray(kept_flags), mask)
        else:
            group_ids = jnp.repeat(jnp.arange(NP), G)
            adv = mc_advantage(rewards, group_ids, NP)
            old_lp = jnp.asarray(np.stack([s["log_probs"] for s in steps]))
            ref_lp = response_log_probs(ref_params, tokens)
            params_, opt_state, loss = update_grpo(
                state["params"], opt_state, tokens, adv, old_lp, ref_lp,
                mask)
        collector.update_policy_weights_(params_)
        exact = float(np.mean([s["reward"] >= 1.0 for s in steps]))
        if it % 20 == 0 or it == cfg["iters"] - 1:
            logger.log_scalar("train/reward", float(rewards.mean()), step=it)
            logger.log_scalar("train/exact_match", exact, step=it)
            print(f"iter {it}: reward={float(rewards.mean()):.3f} "
                  f"exact={exact:.3f} loss={float(loss):.4f} "
                  f"policy_version={collector.policy_version}", flush=True)
    return state["params"]


def _prompt_text(step: dict) -> str:
    """Recover the raw user prompt from the step's stored history."""
    h = step["history"]
    for m in h.messages:
        if m.role == "user":
            return m.content
    raise ValueError("no user message in history")


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
