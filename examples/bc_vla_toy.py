"""VLA behavioral cloning on ToyVLAEnv: TinyVLA + action chunks.

Counterpart of ``/root/reference/sota-implementations/vla_grpo/`` BC
pretraining stage: an oracle generates (observation, action-chunk) pairs
on the tracking task; TinyVLA is trained with chunked BC and evaluated by
success rate via MultiStepActorWrapper-style chunk playback.  Run::

    python examples/bc_vla_toy.py [iters=300]
"""
import sys

import jax
import jax.numpy as jnp
import optax

from rl_tpu.config import apply_overrides
from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, ToyVLAEnv
from rl_tpu.modules import TinyVLA

DEFAULTS = dict(
    iters=300,
    batch_size=64,
    chunk_size=4,
    lr=1e-3,
    seed=0,
)

ACT, STATE = 2, 4


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    key = jax.random.PRNGKey(cfg["seed"])
    env = BatchedEnv(
        ToyVLAEnv(action_dim=ACT, state_dim=STATE, success_steps=3), 8
    )
    model = TinyVLA(action_dim=ACT, chunk_size=cfg["chunk_size"],
                    hidden_dim=64)

    # oracle data: target sits in state[ACT:2*ACT]; expert chunk repeats it
    def make_batch(k):
        k1, k2 = jax.random.split(k)
        target = jax.random.uniform(
            k1, (cfg["batch_size"], ACT), jnp.float32, -1, 1
        )
        state = jnp.concatenate(
            [jnp.zeros((cfg["batch_size"], ACT)), target], -1
        )
        img = jax.random.randint(
            k2, (cfg["batch_size"], 16, 16, 3), 0, 256
        ).astype(jnp.uint8)
        chunk = jnp.tile(target[:, None], (1, cfg["chunk_size"], 1))
        return img, state, chunk

    img, state, chunk = make_batch(key)
    params = model.init(key, img, state)["params"]
    opt = optax.adam(cfg["lr"])
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        img, state, chunk = make_batch(k)

        def loss_fn(p):
            pred = model.apply({"params": p}, img, state)
            return jnp.abs(pred - chunk).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(cfg["iters"]):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        if it % 50 == 0:
            print(f"iter {it}: bc_loss={float(loss):.4f}")

    # eval: play the first chunk action each step; success = tracked target
    k_eval = jax.random.PRNGKey(cfg["seed"] + 1)
    estate, obs = env.reset(k_eval)
    successes = jnp.zeros((8,), bool)
    for t in range(20):
        pred = model.apply({"params": params}, obs["image"], obs["state"])
        td = TDict(action=pred[:, 0])
        k_eval, k = jax.random.split(k_eval)
        estate, out = env.step(estate, obs.update(td), k)
        successes = successes | out["next", "success"][:, 0]
        from rl_tpu.envs import step_mdp

        obs = step_mdp(out)
    rate = float(successes.mean())
    print(f"success rate: {rate:.2f}")
    return params, rate


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
