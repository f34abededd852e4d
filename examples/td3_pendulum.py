"""TD3 on Pendulum — twin critics, delayed policy updates.

Counterpart of ``/root/reference/sota-implementations/td3/td3.py``
(mirrors sota-check/run_td3.sh) on the native Pendulum env.  Run::

    python examples/td3_pendulum.py [total_frames=100000]
"""
import sys

import jax

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.modules import MLP, TanhModule, TDModule, Seq
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import TD3Trainer

DEFAULTS = dict(
    num_envs=8,
    frames_per_batch=256,
    total_frames=100_000,
    buffer_capacity=200_000,
    batch_size=256,
    utd=16,
    lr_actor=3e-4,
    lr_critic=3e-4,
    gamma=0.99,
    tau=0.005,
    sigma_init=0.5,
    sigma_end=0.2,
    sigma_anneal_iters=150,
    policy_delay=2,
    init_random_frames=2_000,
    seed=0,
    logger="csv",
)

ACT_LOW, ACT_HIGH = -2.0, 2.0


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(PendulumEnv(), cfg["num_envs"])
    actor = Seq(
        TDModule(MLP(out_features=1, num_cells=(256, 256), activation="relu"),
                 ["observation"], ["pre_action"]),
        TanhModule(in_keys=["pre_action"], out_keys=["action"],
                   low=ACT_LOW, high=ACT_HIGH),
    )
    qvalue = TDModule(
        MLP(out_features=1, num_cells=(256, 256), activation="relu"),
        ["observation", "action"], ["state_action_value"],
    )
    logger = (
        CSVLogger(generate_exp_name("td3", "pendulum"))
        if cfg["logger"] == "csv" else None
    )
    evaluator = Evaluator(
        env, lambda p, td, k: actor(p["actor"], td, key=k), max_steps=200,
        logger=logger,
    )
    trainer = TD3Trainer(
        env, actor, qvalue, action_low=ACT_LOW, action_high=ACT_HIGH,
        policy_delay=cfg["policy_delay"],
        frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"],
        buffer_capacity=cfg["buffer_capacity"], batch_size=cfg["batch_size"],
        utd=cfg["utd"], lr_actor=cfg["lr_actor"], lr_critic=cfg["lr_critic"],
        gamma=cfg["gamma"], tau=cfg["tau"], sigma_init=cfg["sigma_init"],
        sigma_end=cfg["sigma_end"], sigma_anneal_iters=cfg["sigma_anneal_iters"],
        init_random_frames=cfg["init_random_frames"], seed=cfg["seed"],
        logger=logger, evaluator=evaluator, eval_interval=50,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
