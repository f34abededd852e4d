"""PPO on Pendulum — the on-policy baseline config.

Counterpart of the reference sota script
(``/root/reference/sota-implementations/ppo/ppo_mujoco.py``) adapted to the
native Pendulum env.  Run::

    python examples/ppo_pendulum.py [total_frames=200000] [num_envs=64]
"""
import sys

import jax

from rl_tpu.config import apply_overrides
from rl_tpu.envs import BatchedEnv, PendulumEnv, TransformedEnv
from rl_tpu.envs.transforms import RewardScaling
from rl_tpu.modules import (
    MLP,
    NormalParamExtractor,
    ProbabilisticActor,
    Seq,
    TanhNormal,
    TDModule,
    ValueOperator,
)
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import PPOTrainer

DEFAULTS = dict(
    num_envs=64,
    frames_per_batch=8192,
    total_frames=400_000,
    num_epochs=6,
    minibatches=8,
    lr_actor=3e-4,
    lr_critic=1e-3,
    gamma=0.9,
    lmbda=0.95,
    clip_epsilon=0.2,
    entropy_coeff=0.01,
    reward_scale=0.1,
    seed=0,
    logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = TransformedEnv(
        BatchedEnv(PendulumEnv(), cfg["num_envs"]),
        RewardScaling(scale=cfg["reward_scale"]),
    )
    net = Seq(
        TDModule(MLP(out_features=2, num_cells=(64, 64)), ["observation"], ["pre"]),
        TDModule(NormalParamExtractor(), ["pre"], ["loc", "scale"]),
    )
    actor = ProbabilisticActor(net, TanhNormal, dist_kwargs={"low": -2.0, "high": 2.0})
    critic = ValueOperator(MLP(out_features=1, num_cells=(64, 64)))
    logger = (
        CSVLogger(generate_exp_name("ppo", "pendulum")) if cfg["logger"] == "csv" else None
    )
    evaluator = Evaluator(
        env, lambda p, td, k: actor(p["actor"], td, k), max_steps=200, logger=logger
    )
    trainer = PPOTrainer(
        env, actor, critic,
        frames_per_batch=cfg["frames_per_batch"], total_frames=cfg["total_frames"],
        num_epochs=cfg["num_epochs"], minibatches=cfg["minibatches"],
        lr_actor=cfg["lr_actor"], lr_critic=cfg["lr_critic"],
        gamma=cfg["gamma"], lmbda=cfg["lmbda"], clip_epsilon=cfg["clip_epsilon"],
        entropy_coeff=cfg["entropy_coeff"], seed=cfg["seed"],
        logger=logger, evaluator=evaluator, eval_interval=10,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    overrides = apply_overrides({}, sys.argv[1:])
    main(overrides)
