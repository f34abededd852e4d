"""REINFORCE with learned baseline on Pendulum (counterpart of the
reference ``reinforce_trainer`` sota config).  Run::

    python sota/reinforce_pendulum.py [total_frames=200000]
"""
import sys

import jax

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.envs.transforms import RewardScaling, TransformedEnv
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import ReinforceTrainer

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import gaussian_actor, value_module

DEFAULTS = dict(
    num_envs=32, frames_per_batch=4096, total_frames=200_000,
    lr_actor=3e-4, lr_critic=1e-3, gamma=0.9, lmbda=0.95,
    reward_scale=0.1, seed=0, logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = TransformedEnv(BatchedEnv(PendulumEnv(), cfg["num_envs"]),
                         RewardScaling(scale=cfg["reward_scale"]))
    actor = gaussian_actor(1, low=-2.0, high=2.0, num_cells=(64, 64))
    critic = value_module(num_cells=(64, 64))
    logger = (CSVLogger(generate_exp_name("reinforce", "pendulum"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td, key=k),
                          max_steps=200, logger=logger)
    trainer = ReinforceTrainer(
        env, actor, critic, frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"], lr_actor=cfg["lr_actor"],
        lr_critic=cfg["lr_critic"], gamma=cfg["gamma"], lmbda=cfg["lmbda"],
        seed=cfg["seed"], logger=logger, evaluator=evaluator,
        eval_interval=20,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
