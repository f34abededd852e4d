"""Diffusion-policy behaviour cloning on expert Pendulum data
(counterpart of ``/root/reference/sota-implementations/diffusion_bc/``):
a DDPM noise-prediction actor trained with ``DiffusionBCLoss``, evaluated
by running the reverse chain per environment step.  Run::

    python sota/diffusion_bc_pendulum.py [gradient_steps=5000]
"""
import sys

import jax
import jax.numpy as jnp

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.modules import DiffusionActor
from rl_tpu.objectives import DiffusionBCLoss
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import OfflineTrainer

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import collect_dataset, expert_policy

DEFAULTS = dict(
    dataset_frames=50_000, gradient_steps=5_000, batch_size=256,
    num_diffusion_steps=32, lr=3e-4, seed=0, logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(PendulumEnv(), 16)
    dataset = collect_dataset(env, cfg["dataset_frames"], cfg["seed"],
                              expert_policy(env))
    # normalize actions to the DDPM's [-1, 1] domain (torque range ±2)
    dataset = dataset.set("action", jnp.asarray(dataset["action"]) / 2.0)
    actor = DiffusionActor(action_dim=1,
                           num_steps=cfg["num_diffusion_steps"])
    loss = DiffusionBCLoss(actor)

    def policy(p, td, k):
        out = actor(p, td, k)
        return out.set("action", 2.0 * jnp.asarray(out["action"]))

    logger = (CSVLogger(generate_exp_name("diffusion_bc", "pendulum"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, policy, max_steps=200, logger=logger)
    trainer = OfflineTrainer(
        dataset, loss, batch_size=cfg["batch_size"],
        gradient_steps=cfg["gradient_steps"], lr=cfg["lr"], target_keys=(),
        seed=cfg["seed"], logger=logger, evaluator=evaluator,
        eval_interval=10,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
