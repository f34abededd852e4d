"""Discrete SAC on CartPole (counterpart of
``/root/reference/sota-implementations/discrete_sac/discrete_sac.py``).
Run::

    python sota/discrete_sac_cartpole.py [total_frames=100000]
"""
import sys

import jax

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, CartPoleEnv
from rl_tpu.modules import MLP, Categorical, ProbabilisticActor, TDModule
from rl_tpu.objectives import DiscreteSACLoss
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import GenericOffPolicyTrainer

DEFAULTS = dict(
    num_envs=8, frames_per_batch=256, total_frames=100_000,
    buffer_capacity=100_000, batch_size=256, utd=4, lr=3e-4,
    gamma=0.99, tau=0.005, init_random_frames=1_000, seed=0, logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(CartPoleEnv(), cfg["num_envs"])
    actor = ProbabilisticActor(
        TDModule(MLP(out_features=2, num_cells=(256, 256),
                     activation="relu"), ["observation"], ["logits"]),
        Categorical, dist_keys=["logits"],
    )
    qvalue = TDModule(MLP(out_features=2, num_cells=(256, 256),
                          activation="relu"),
                      ["observation"], ["action_value"])
    loss = DiscreteSACLoss(actor, qvalue, num_actions=2, gamma=cfg["gamma"])
    logger = (CSVLogger(generate_exp_name("discrete_sac", "cartpole"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td, key=k),
                          max_steps=500, logger=logger)
    trainer = GenericOffPolicyTrainer(
        env, loss, lambda p, td, k: actor(p["actor"], td, key=k),
        target_keys=[("target_qvalue", "qvalue")],
        lr=cfg["lr"], tau=cfg["tau"],
        frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"],
        buffer_capacity=cfg["buffer_capacity"], batch_size=cfg["batch_size"],
        utd=cfg["utd"], init_random_frames=cfg["init_random_frames"],
        seed=cfg["seed"], logger=logger, evaluator=evaluator,
        eval_interval=50,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
