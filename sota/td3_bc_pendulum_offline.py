"""Offline TD3+BC on a random-policy Pendulum dataset (counterpart of
``/root/reference/sota-implementations/td3_bc/td3_bc.py``).  Run::

    python sota/td3_bc_pendulum_offline.py [gradient_steps=20000]
"""
import sys

import jax

from rl_tpu.config import apply_overrides
from rl_tpu.collectors.evaluator import Evaluator
from rl_tpu.envs import BatchedEnv, PendulumEnv
from rl_tpu.modules import MLP, Seq, TanhModule, TDModule
from rl_tpu.record import CSVLogger, generate_exp_name
from rl_tpu.trainers import TD3BCTrainer

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _common import collect_dataset, q_module

DEFAULTS = dict(
    dataset_frames=50_000, gradient_steps=20_000, batch_size=256,
    lr=3e-4, gamma=0.99, alpha_bc=2.5, seed=0, logger="csv",
)


def main(cfg=None):
    cfg = {**DEFAULTS, **(cfg or {})}
    env = BatchedEnv(PendulumEnv(), 16)
    dataset = collect_dataset(env, cfg["dataset_frames"], cfg["seed"])
    actor = Seq(
        TDModule(MLP(out_features=1, num_cells=(256, 256),
                     activation="relu"), ["observation"], ["pre_action"]),
        TanhModule(in_keys=["pre_action"], out_keys=["action"],
                   low=-2.0, high=2.0),
    )
    qvalue = q_module()
    logger = (CSVLogger(generate_exp_name("td3bc", "pendulum-offline"))
              if cfg["logger"] == "csv" else None)
    evaluator = Evaluator(env, lambda p, td, k: actor(p["actor"], td, key=k),
                          max_steps=200, logger=logger)
    trainer = TD3BCTrainer(
        dataset, actor, qvalue, action_low=-2.0, action_high=2.0,
        alpha_bc=cfg["alpha_bc"], gamma=cfg["gamma"],
        gradient_steps=cfg["gradient_steps"], batch_size=cfg["batch_size"],
        lr=cfg["lr"], seed=cfg["seed"], logger=logger, evaluator=evaluator,
        eval_interval=50,
    )
    params = trainer.train()
    stats = evaluator.evaluate(params, jax.random.PRNGKey(cfg["seed"] + 1))
    print("final eval:", stats)
    return params, stats


if __name__ == "__main__":
    main(apply_overrides({}, sys.argv[1:]))
