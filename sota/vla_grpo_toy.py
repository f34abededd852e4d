"""GRPO fine-tuning of a VLA policy on the toy tracking task
(counterpart of ``/root/reference/sota-implementations/vla_grpo/``).

The reference runs GRPO over OpenVLA's discretized action tokens on a
robot-sim benchmark; here the same loop runs on-device with ``TinyVLA``'s
token action head on ``ToyVLAEnv``: G sampled action-token vectors per
observation, tracking reward, group-normalized advantages
(``mc_advantage``) and the token-level clipped surrogate (``grpo_loss``).
Run::

    python sota/vla_grpo_toy.py [iters=300]
"""
import sys

import jax
import jax.numpy as jnp
import optax

from rl_tpu.config import apply_overrides
from rl_tpu.envs import BatchedEnv, ToyVLAEnv
from rl_tpu.modules import TinyVLA
from rl_tpu.objectives.llm import grpo_loss, mc_advantage
from rl_tpu.record import CSVLogger, generate_exp_name

DEFAULTS = dict(
    iters=300, num_envs=16, group_size=8, lr=3e-4, vocab=64,
    clip=0.2, temperature=1.0, seed=0,
)

ACT, STATE = 2, 4


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    env = BatchedEnv(
        ToyVLAEnv(action_dim=ACT, state_dim=STATE, success_steps=3),
        cfg["num_envs"])
    V = int(cfg["vocab"])
    model = TinyVLA(action_dim=ACT, chunk_size=1, action_head="tokens",
                    vocab_size=V, hidden_dim=64)
    NP, G = cfg["num_envs"], cfg["group_size"]
    B = NP * G

    k0, key = jax.random.split(key)
    state, td0 = env.reset(k0)
    params = model.init(
        k0, td0["image"], td0["state"], td0["instruction_idx"][..., 0]
    )["params"]
    tx = optax.adam(cfg["lr"])
    opt_state = tx.init(params)
    logger = CSVLogger(generate_exp_name("vla_grpo", "toy"))

    def decode(tokens):  # token ∈ [0, V) → action ∈ [-1, 1]
        return 2.0 * tokens.astype(jnp.float32) / (V - 1) - 1.0

    def token_log_probs(p, obs, tokens):
        logits = model.apply(
            {"params": p}, obs["image"], obs["state"],
            obs["instruction_idx"][..., 0])  # [B, 1, ACT, V]
        lp = jax.nn.log_softmax(logits[:, 0], -1)  # [B, ACT, V]
        return jnp.take_along_axis(lp, tokens[..., None], -1)[..., 0]

    @jax.jit
    def train_step(p, opt_state, state, k):
        k_s, k_e = jax.random.split(k)
        _, td = env.reset(k_s)  # fresh targets each iteration
        obs = jax.tree.map(lambda x: jnp.repeat(x, G, 0),
                           td.select("image", "state", "instruction_idx"))
        logits = model.apply(
            {"params": p}, obs["image"], obs["state"],
            obs["instruction_idx"][..., 0])[:, 0]  # [B, ACT, V]
        tokens = jax.random.categorical(
            k_e, logits / cfg["temperature"], -1)  # [B, ACT]
        actions = decode(tokens)
        target = obs["state"][:, ACT:2 * ACT]
        reward = -jnp.linalg.norm(actions - target, axis=-1)
        success = (jnp.abs(actions - target).max(-1) <= 0.1)
        group_ids = jnp.repeat(jnp.arange(NP), G)
        adv = mc_advantage(reward, group_ids, NP)
        old_lp = jax.lax.stop_gradient(token_log_probs(p, obs, tokens))
        mask = jnp.ones(tokens.shape, bool)

        def total(q):
            lp = token_log_probs(q, obs, tokens)
            return grpo_loss(lp, old_lp, adv, mask,
                             clip_low=cfg["clip"], clip_high=cfg["clip"])

        (l, m), grads = jax.value_and_grad(total, has_aux=True)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return (optax.apply_updates(p, updates), opt_state, l,
                reward.mean(), success.mean())

    for it in range(cfg["iters"]):
        key, k = jax.random.split(key)
        params, opt_state, loss, rew, succ = train_step(
            params, opt_state, state, k)
        if it % 20 == 0:
            logger.log_scalar("train/reward", float(rew), step=it)
            logger.log_scalar("train/success", float(succ), step=it)
            print(f"iter {it}: reward={float(rew):.3f} "
                  f"success={float(succ):.3f}")
    return params


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
