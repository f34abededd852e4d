"""DQN on CartPole — the uniform-replay baseline config.

Counterpart of ``/root/reference/sota-implementations/dqn/dqn_cartpole.py``
(mirrors sota-check/run_dqn_cartpole.sh).  Run::

    python examples/dqn_cartpole.py [total_frames=100000]
"""
import sys

import jax

from rl_tpu.config import apply_overrides
from rl_tpu.data import Categorical as CategoricalSpec
from rl_tpu.envs import BatchedEnv, CartPoleEnv
from rl_tpu.modules import MLP, QValueActor
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import DQNTrainer

# mirrors /root/reference/sota-implementations/dqn/config_cartpole.yaml:
# 500k frames, fpb 1000, eps 1.0->0.05 over 250k frames, 10k-slot buffer,
# batch 128, lr 2.5e-4, 100 updates per 1000 frames, target refresh every
# 50 updates (here: soft tau=0.02 per update, the same timescale)
DEFAULTS = dict(
    num_envs=16,
    frames_per_batch=128,
    total_frames=500_000,
    buffer_capacity=10_000,
    batch_size=128,
    utd=13,
    lr=2.5e-4,
    gamma=0.99,
    tau=0.02,
    eps_anneal_iters=1950,
    init_random_frames=10_000,
    seed=0,
    logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(CartPoleEnv(), cfg["num_envs"])
    qactor = QValueActor(
        MLP(out_features=2, num_cells=(120, 84), activation="relu"),
        in_keys=["observation"],
    )
    logger = (
        CSVLogger(generate_exp_name("dqn", "cartpole")) if cfg["logger"] == "csv" else None
    )
    evaluator = Evaluator(
        env, lambda p, td, k: qactor(p["value"], td, key=k), max_steps=500,
        logger=logger,
    )
    trainer = DQNTrainer(
        env, qactor, action_spec=CategoricalSpec(2),
        frames_per_batch=cfg["frames_per_batch"], total_frames=cfg["total_frames"],
        buffer_capacity=cfg["buffer_capacity"], batch_size=cfg["batch_size"],
        utd=cfg["utd"], lr=cfg["lr"], gamma=cfg["gamma"], tau=cfg["tau"],
        eps_anneal_iters=cfg["eps_anneal_iters"],
        init_random_frames=cfg["init_random_frames"], seed=cfg["seed"],
        logger=logger, evaluator=evaluator, eval_interval=50,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
