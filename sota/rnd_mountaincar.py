"""PPO + Random Network Distillation on MountainCar — intrinsic exploration
bonus (counterpart of ``/root/reference/sota-implementations/rnd/``).  Run::

    python sota/rnd_mountaincar.py [total_frames=200000]
"""
import sys

import jax

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, MountainCarEnv
from rl_tpu.envs.transforms import RNDTransform, TransformedEnv
from rl_tpu.modules import MLP, Categorical, ProbabilisticActor, TDModule, ValueOperator
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import PPOTrainer

DEFAULTS = dict(
    num_envs=32, frames_per_batch=4096, total_frames=200_000,
    intrinsic_weight=1.0, num_epochs=4, minibatches=8,
    lr_actor=3e-4, lr_critic=1e-3, gamma=0.99, lmbda=0.95,
    entropy_coeff=0.01, seed=0, logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    # RND adds its intrinsic bonus directly to the env reward stream
    env = TransformedEnv(
        BatchedEnv(MountainCarEnv(), cfg["num_envs"]),
        RNDTransform(intrinsic_weight=cfg["intrinsic_weight"]),
    )
    actor = ProbabilisticActor(
        TDModule(MLP(out_features=3, num_cells=(128, 128)),
                 ["observation"], ["logits"]),
        Categorical, dist_keys=["logits"],
    )
    critic = ValueOperator(MLP(out_features=1, num_cells=(128, 128)))
    logger = (CSVLogger(generate_exp_name("rnd", "mountaincar"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td, key=k),
                          max_steps=200, logger=logger)
    trainer = PPOTrainer(
        env, actor, critic, frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"], num_epochs=cfg["num_epochs"],
        minibatches=cfg["minibatches"], lr_actor=cfg["lr_actor"],
        lr_critic=cfg["lr_critic"], gamma=cfg["gamma"], lmbda=cfg["lmbda"],
        entropy_coeff=cfg["entropy_coeff"], seed=cfg["seed"], logger=logger,
        evaluator=evaluator, eval_interval=20,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
