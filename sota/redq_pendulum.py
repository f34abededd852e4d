"""REDQ on Pendulum — 10-critic ensemble, sub-sampled targets, high UTD
(counterpart of ``/root/reference/sota-implementations/redq/redq.py``).
Run::

    python sota/redq_pendulum.py [total_frames=100000]
"""
import sys

import jax

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.objectives import REDQLoss
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import GenericOffPolicyTrainer

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import gaussian_actor, q_module

DEFAULTS = dict(
    num_envs=8, frames_per_batch=256, total_frames=100_000,
    buffer_capacity=200_000, batch_size=256, utd=16,
    num_qvalue_nets=10, sub_sample_len=2, lr=3e-4, gamma=0.99, tau=0.005,
    init_random_frames=2_000, seed=0, logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(PendulumEnv(), cfg["num_envs"])
    actor = gaussian_actor(1, low=-2.0, high=2.0)
    loss = REDQLoss(actor, q_module(), action_dim=1,
                    num_qvalue_nets=cfg["num_qvalue_nets"],
                    sub_sample_len=cfg["sub_sample_len"], gamma=cfg["gamma"])
    logger = (CSVLogger(generate_exp_name("redq", "pendulum"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td, key=k),
                          max_steps=200, logger=logger)
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
