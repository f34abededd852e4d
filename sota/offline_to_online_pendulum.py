"""Offline-to-online on Pendulum (counterpart of
``/root/reference/sota-implementations/offline_to_online/``): SAC
pretrained on an offline expert dataset, then fine-tuned online with the
replay buffer warm-started from the same dataset.  Run::

    python sota/offline_to_online_pendulum.py [total_frames=60000]
"""
import sys

import jax

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.modules import MLP, TDModule
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import OfflineToOnlineTrainer, SACTrainer

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import collect_dataset, expert_policy, gaussian_actor, q_module

DEFAULTS = dict(
    dataset_frames=20_000, pretrain_steps=5_000, total_frames=60_000,
    frames_per_batch=256, batch_size=256, utd=4, lr=3e-4, gamma=0.99,
    seed=0, logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(PendulumEnv(), 8)
    dataset = collect_dataset(env, cfg["dataset_frames"], cfg["seed"],
                              expert_policy(env))
    actor = gaussian_actor(1, low=-2.0, high=2.0)
    logger = (CSVLogger(generate_exp_name("o2o_sac", "pendulum"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td, key=k),
                          max_steps=200, logger=logger)
    online = SACTrainer(
        env, actor, q_module(), action_dim=1,
        frames_per_batch=cfg["frames_per_batch"],
        total_frames=cfg["total_frames"], batch_size=cfg["batch_size"],
        utd=cfg["utd"], lr=cfg["lr"], gamma=cfg["gamma"],
        init_random_frames=0, seed=cfg["seed"], logger=logger,
        evaluator=evaluator, eval_interval=50,
    )
    trainer = OfflineToOnlineTrainer(
        dataset, online, pretrain_steps=cfg["pretrain_steps"], logger=logger)
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
