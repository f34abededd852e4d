"""Bandits via DQN (counterpart of
``/root/reference/sota-implementations/bandits/dqn.py`` — the reference
trains a DQN on an OpenML bandit task; no downloads here, so the task is a
native contextual Bernoulli bandit with a linear reward structure).  Run::

    python sota/bandits_dqn.py [total_frames=50000]
"""
import sys

import jax
import jax.numpy as jnp

from rl_tpu.config import apply_overrides
from rl_tpu.data import Categorical as CategoricalSpec
from rl_tpu.data import Composite, TDict, Unbounded
from rl_tpu.envs import BatchedEnv, Env
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.modules import MLP, QValueActor
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import DQNTrainer

DEFAULTS = dict(
    n_arms=8, context_dim=4, num_envs=16, frames_per_batch=128,
    total_frames=50_000, buffer_capacity=50_000, batch_size=128,
    utd=4, lr=1e-3, seed=0, logger="csv",
)


class ContextualBanditEnv(Env):
    """One-step episodes: context -> arm -> Bernoulli reward whose logit is
    a fixed random linear function of the context."""

    def __init__(self, n_arms: int, context_dim: int, seed: int = 0):
        self.n_arms = n_arms
        self.context_dim = context_dim
        self.w = jax.random.normal(jax.random.PRNGKey(seed),
                                   (context_dim, n_arms))

    @property
    def observation_spec(self):
        return Composite(observation=Unbounded((self.context_dim,),
                                               jnp.float32))

    def _action_spec(self):
        return CategoricalSpec(self.n_arms, (), jnp.int32)

    def _reset(self, key):
        ctx = jax.random.normal(key, (self.context_dim,))
        return TDict(ctx=ctx), TDict(observation=ctx)

    def _step(self, state, td, key):
        ctx = state["ctx"]
        logits = ctx @ self.w
        p = jax.nn.sigmoid(logits[jnp.asarray(td["action"], jnp.int32)])
        r = jax.random.bernoulli(key, p).astype(jnp.float32).reshape(1)
        return state, TDict(observation=ctx, reward=r,
                            terminated=jnp.ones((1,), jnp.bool_))


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(
        ContextualBanditEnv(cfg["n_arms"], cfg["context_dim"], cfg["seed"]),
        cfg["num_envs"])
    qactor = QValueActor(
        MLP(out_features=cfg["n_arms"], num_cells=(64, 64),
            activation="relu"), in_keys=["observation"])
    logger = (CSVLogger(generate_exp_name("bandits", "dqn"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: qactor(p["value"], td, key=k),
                          max_steps=16, logger=logger)
    trainer = DQNTrainer(
        env, qactor, action_spec=CategoricalSpec(cfg["n_arms"]),
        frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"],
        buffer_capacity=cfg["buffer_capacity"], batch_size=cfg["batch_size"],
        utd=cfg["utd"], lr=cfg["lr"], gamma=0.0,  # bandit: no bootstrapping
        seed=cfg["seed"], logger=logger, evaluator=evaluator,
        eval_interval=50,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
