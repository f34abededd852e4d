"""PPO on Breakout pixels — the on-device pixel-pipeline config.

Counterpart of the reference Atari PPO
(``/root/reference/sota-implementations/ppo/ppo_atari.py``) on the native
MinAtar-style Breakout env: thousands of envs step in lockstep on-chip, the
conv policy trains on the same chip, zero host traffic.  Run::

    python examples/ppo_breakout.py [num_envs=1024] [total_frames=10000000]
"""
import sys

import jax
import jax.numpy as jnp

from rl_tpu.config import apply_overrides
from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv
from rl_tpu.envs.minatar import BreakoutEnv
from rl_tpu.modules import MLP, Categorical, ConvNet, ProbabilisticActor, Seq, TDModule
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import PPOTrainer

DEFAULTS = dict(
    num_envs=1024,
    frames_per_batch=65536,
    total_frames=10_000_000,
    num_epochs=3,
    minibatches=8,
    lr_actor=3e-4,
    lr_critic=1e-3,
    gamma=0.99,
    anneal_lr=False,
    seed=0,
    logger="csv",
)


class ConvCritic:
    in_keys = ["pixels"]
    out_keys = ["state_value"]

    def __init__(self):
        self.seq = Seq(
            TDModule(ConvNet(channels=(16, 32), kernel_sizes=(3, 3), strides=(1, 1)),
                     ["pixels"], ["hidden_v"]),
            TDModule(MLP(out_features=1, num_cells=(128,), activation="relu"),
                     ["hidden_v"], ["state_value"]),
        )

    def init(self, key, td):
        return self.seq.init(key, td)

    def __call__(self, params, td, key=None):
        return self.seq(params, td, key=key)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(BreakoutEnv(), cfg["num_envs"])
    net = Seq(
        TDModule(ConvNet(channels=(16, 32), kernel_sizes=(3, 3), strides=(1, 1)),
                 ["pixels"], ["hidden"]),
        TDModule(MLP(out_features=3, num_cells=(128,), activation="relu"),
                 ["hidden"], ["logits"]),
    )
    actor = ProbabilisticActor(net, Categorical, dist_keys=["logits"])
    critic = ConvCritic()
    logger = (
        CSVLogger(generate_exp_name("ppo", "breakout")) if cfg["logger"] == "csv" else None
    )
    evaluator = Evaluator(
        env, lambda p, td, k: actor(p["actor"], td, k), max_steps=500, logger=logger
    )
    trainer = PPOTrainer(
        env, actor, critic,
        frames_per_batch=cfg["frames_per_batch"], total_frames=cfg["total_frames"],
        num_epochs=cfg["num_epochs"], minibatches=cfg["minibatches"],
        lr_actor=cfg["lr_actor"], lr_critic=cfg["lr_critic"], gamma=cfg["gamma"],
        anneal_lr=cfg["anneal_lr"], seed=cfg["seed"], logger=logger,
        evaluator=evaluator, eval_interval=10,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
